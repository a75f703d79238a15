"""AttractorTrainer end-to-end on a synthetic ideal-mask dataset."""
import numpy as np

from dnn_based_source_separation_tpu.criterion import L2Loss, PIT2d
from dnn_based_source_separation_tpu.data import DataLoader
from dnn_based_source_separation_tpu.models import DANet
from dnn_based_source_separation_tpu.train import TrainerConfig, make_optimizer
from dnn_based_source_separation_tpu.train.attractor import AttractorTrainer


class _SyntheticSpecDataset:
    """Emits (|mix|, |sources|, ibm assignment, threshold weight)."""

    def __init__(self, n=8, F=17, T=12, seed=0):
        self.n, self.F, self.T, self.seed = n, F, T, seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.seed, idx))
        src = np.abs(rng.standard_normal((2, self.F, self.T))).astype(np.float32)
        mix = src.sum(axis=0, keepdims=True)
        ibm = np.eye(2, dtype=np.float32)[np.argmax(src, axis=0)]
        ibm = np.moveaxis(ibm, -1, 0)
        weight = np.ones((1, self.F, self.T), np.float32)
        return mix, src, ibm, weight


def test_attractor_trainer_runs(tmp_path):
    F = 17
    model = DANet(n_bins=F, embed_dim=6, hidden_channels=8, num_blocks=1)
    train_loader = DataLoader(_SyntheticSpecDataset(n=8, F=F), batch_size=4, shuffle=True)
    valid_loader = DataLoader(_SyntheticSpecDataset(n=4, F=F, seed=1), batch_size=2)

    criterion = PIT2d(L2Loss(), n_sources=2)
    opt = make_optimizer("adam", 1e-3)
    cfg = TrainerConfig(epochs=2, exp_dir=str(tmp_path / "exp"), save_valid_wavs=0)
    trainer = AttractorTrainer(model, train_loader, valid_loader, criterion, opt, cfg)
    trainer.run()
    assert len(trainer.train_loss) == 2
    assert np.isfinite(trainer.train_loss[-1])
