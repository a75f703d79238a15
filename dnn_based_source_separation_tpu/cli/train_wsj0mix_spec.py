"""wsj0-mix spectrogram-domain training CLI (DANet / ADANet / deep clustering).

Capability parity: the reference's per-recipe `local/train.py` entry points
for the attractor/embedding family (`egs/wsj0-mix/danet/local/train.py`,
`egs/wsj0-mix/adanet/local/train.py`,
`egs/wsj0-mix/deep-clustering/local/train.py`): same hyperparameter flags
(n_fft/hop, ideal-mask type + threshold, K embed dim, H hidden, B blocks,
N anchors, take_log/take_db, criterion, optimizer incl. momentum-sgd).

Usage (see egs/wsj0-mix/{danet,adanet,deep-clustering}/train.sh):
  python -m dnn_based_source_separation_tpu.cli.train_wsj0mix_spec \
      --model danet --train_wav_root ... --train_list_path ... ...
"""
from __future__ import annotations

import argparse

from ..criterion import AffinityLoss, L2Loss, PIT2d
from ..data import DataLoader
from ..data.wsj0mix import IdealMaskSpectrogramTrainDataset
from ..models import ADANet, DANet, DeepEmbedding
from ..parallel import make_mesh
from ..train import TrainerConfig, make_optimizer
from ..train.attractor import AnchoredAttractorTrainer, AttractorTrainer, EmbeddingTrainer
from ..utils import enable_persistent_compilation_cache, set_seed


def build_parser():
    p = argparse.ArgumentParser("train_wsj0mix_spec")
    # data
    p.add_argument("--train_wav_root", type=str, required=True)
    p.add_argument("--train_list_path", type=str, required=True)
    p.add_argument("--valid_wav_root", type=str, required=True)
    p.add_argument("--valid_list_path", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--duration", type=float, default=0.8)
    p.add_argument("--n_sources", type=int, default=2)
    # STFT front end
    p.add_argument("--n_fft", type=int, default=256)
    p.add_argument("--hop_length", type=int, default=64)
    p.add_argument("--window_fn", type=str, default="hann")
    p.add_argument("--ideal_mask", type=str, default="ibm", choices=["ibm", "irm", "wfm"])
    p.add_argument("--threshold", type=float, default=40.0)
    # model
    p.add_argument("--model", type=str, default="danet",
                   choices=["danet", "adanet", "deep-clustering"])
    p.add_argument("--embed_dim", "-K", type=int, default=20)
    p.add_argument("--hidden_channels", "-H", type=int, default=300)
    p.add_argument("--num_blocks", "-B", type=int, default=4)
    p.add_argument("--num_anchors", "-N", type=int, default=6)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--causal", type=int, default=0)
    p.add_argument("--mask_nonlinear", type=str, default="sigmoid")
    p.add_argument("--take_log", type=int, default=1)
    p.add_argument("--take_db", type=int, default=0)
    p.add_argument("--iter_clustering", type=int, default=10)
    # optimization
    p.add_argument("--criterion", type=str, default="se",
                   help="se/l2loss (mask family) or affinity (deep clustering)")
    p.add_argument("--optimizer", type=str, default="rmsprop")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--max_norm", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=150)
    # infra
    p.add_argument("--exp_dir", type=str, default="./exp")
    p.add_argument("--continue_from", type=str, default=None)
    p.add_argument("--overwrite", type=int, default=0)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--num_workers", type=int, default=0, help="background loader threads")
    p.add_argument("--n_devices", type=int, default=None)
    return p


def build_spec_model(args, n_bins: int):
    common = dict(
        n_bins=n_bins, embed_dim=args.embed_dim,
        hidden_channels=args.hidden_channels,
        causal=bool(args.causal),
        take_log=bool(args.take_log), take_db=bool(args.take_db),
    )
    if args.model == "danet":
        return DANet(num_blocks=args.num_blocks, dropout=args.dropout,
                     mask_nonlinear=args.mask_nonlinear,
                     iter_clustering=args.iter_clustering, **common)
    if args.model == "adanet":
        return ADANet(num_blocks=args.num_blocks, num_anchors=args.num_anchors,
                      dropout=args.dropout, mask_nonlinear=args.mask_nonlinear,
                      **common)
    if args.model == "deep-clustering":
        return DeepEmbedding(num_layers=args.num_blocks, **common)
    raise ValueError(f"Unsupported model: {args.model}")


def main(args=None):
    args = build_parser().parse_args(args)
    set_seed(args.seed)
    enable_persistent_compilation_cache()

    samples = int(args.duration * args.sample_rate)
    ds_kwargs = dict(
        n_fft=args.n_fft, hop_length=args.hop_length, window_fn=args.window_fn,
        mask_type=args.ideal_mask, threshold=args.threshold,
        samples=samples, n_sources=args.n_sources,
    )
    train_ds = IdealMaskSpectrogramTrainDataset(
        args.train_wav_root, args.train_list_path, **ds_kwargs)
    valid_ds = IdealMaskSpectrogramTrainDataset(
        args.valid_wav_root, args.valid_list_path, **ds_kwargs)
    print(f"Training dataset includes {len(train_ds)} samples.", flush=True)
    print(f"Valid dataset includes {len(valid_ds)} samples.", flush=True)

    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, seed=args.seed,
                              num_workers=args.num_workers)
    valid_loader = DataLoader(valid_ds, batch_size=args.batch_size)

    n_bins = args.n_fft // 2 + 1
    model = build_spec_model(args, n_bins)

    max_norm = args.max_norm if args.max_norm else None
    optimizer = make_optimizer(args.optimizer, args.lr, max_norm=max_norm,
                               momentum=args.momentum)
    mesh = make_mesh(args.n_devices) if args.n_devices else None
    config = TrainerConfig(
        epochs=args.epochs, exp_dir=args.exp_dir,
        continue_from=args.continue_from, overwrite=bool(args.overwrite),
        sample_rate=args.sample_rate, save_valid_wavs=0,
    )

    if args.model == "deep-clustering":
        if args.criterion != "affinity":
            raise ValueError("deep-clustering expects --criterion affinity")
        trainer = EmbeddingTrainer(
            model, train_loader, valid_loader, AffinityLoss(), optimizer,
            config, mesh=mesh, n_sources=args.n_sources)
    else:
        if args.criterion not in ("se", "l2loss"):
            raise ValueError(f"Unsupported criterion for {args.model}: {args.criterion}")
        criterion = PIT2d(L2Loss(), n_sources=args.n_sources)
        if args.model == "danet":
            trainer = AttractorTrainer(
                model, train_loader, valid_loader, criterion, optimizer,
                config, mesh=mesh, n_sources=args.n_sources)
        else:
            import jax

            dropout_rng = jax.random.PRNGKey(args.seed) if args.dropout > 0 else None
            trainer = AnchoredAttractorTrainer(
                model, train_loader, valid_loader, criterion, optimizer,
                config, mesh=mesh, n_sources=args.n_sources,
                dropout_rng=dropout_rng)
    trainer.run()
    return trainer


if __name__ == "__main__":
    main()
