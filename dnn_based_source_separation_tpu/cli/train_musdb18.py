"""MUSDB18 training CLI: UMX (per-stem parallel) or X-UMX (bridged).

Capability parity: reference `egs/musdb18/umx/local/train.py` and
`egs/musdb18/x-umx/local/train.py` + their adhoc drivers: UMX trains
magnitude MSE; X-UMX trains the multi-domain combination loss
(`adhoc_criterion.py:9-80`). Random-remix augmentation dataset by default
(`dataset.py:518-697`).

TPU-first: the loaders ship waveforms; STFT/|.|/the model/the loss compile
into one jitted step (see models.wrappers / criterion.spectral).
"""
from __future__ import annotations

import argparse

from ..augmentation import RandomFlip, RandomGain, SequentialAugmentation
from ..criterion.distance import MSELoss
from ..criterion.multidomain import MultiDomainLoss
from ..criterion.spectral import SpectralTargetAdapter
from ..data import DataLoader
from ..data import musdb18 as musdb
from ..models.umx import ParallelOpenUnmix
from ..models.wrappers import SpectrogramMaskingWrapper
from ..models.xumx import CrossNetOpenUnmix
from ..ops.windows import build_window
from ..parallel import make_mesh
from ..train import Trainer, TrainerConfig, make_optimizer
from ..utils import set_seed


def build_parser():
    p = argparse.ArgumentParser("train_musdb18")
    p.add_argument("--musdb18_root", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--duration", type=float, default=6.0)
    p.add_argument("--valid_duration", type=float, default=10.0)
    p.add_argument("--samples_per_epoch", type=int, default=None)
    p.add_argument("--augmentation", type=int, default=1)
    p.add_argument("--model", type=str, default="umx", choices=["umx", "xumx", "d3net"])
    p.add_argument("--d3net_config", type=str, default=None, help="band-structured YAML (egs/musdb18/d3net/config)")
    p.add_argument("--n_fft", type=int, default=4096)
    p.add_argument("--hop_length", type=int, default=1024)
    p.add_argument("--window_fn", type=str, default="hann")
    p.add_argument("--hidden_channels", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--max_bin", type=int, default=1487)
    p.add_argument("--dropout", type=float, default=0.4)
    p.add_argument("--sources", type=str, default="bass,drums,other,vocals")
    # loss weights (X-UMX)
    p.add_argument("--weight_time", type=float, default=10.0)
    p.add_argument("--weight_frequency", type=float, default=1.0)
    p.add_argument("--combination", type=int, default=1)
    # optimization
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max_norm", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--exp_dir", type=str, default="./exp")
    p.add_argument("--continue_from", type=str, default=None)
    p.add_argument("--overwrite", type=int, default=0)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--n_devices", type=int, default=None)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    set_seed(args.seed)
    sources = args.sources.split(",")

    aug = None
    if args.augmentation:
        aug = SequentialAugmentation(RandomFlip(flip_rate=0.5, axis=0), RandomGain(0.25, 1.25))
        train_ds = musdb.AugmentationWaveTrainDataset(
            args.musdb18_root, duration=args.duration, sample_rate=args.sample_rate,
            samples_per_epoch=args.samples_per_epoch, sources=sources,
            augmentation=aug, seed=args.seed,
        )
    else:
        train_ds = musdb.WaveTrainDataset(
            args.musdb18_root, duration=args.duration, sample_rate=args.sample_rate,
            sources=sources,
        )
    valid_ds = musdb.WaveEvalDataset(
        args.musdb18_root, max_duration=args.valid_duration,
        sample_rate=args.sample_rate, sources=sources,
    )
    print(f"Training dataset includes {len(train_ds)} samples.", flush=True)
    print(f"Valid dataset includes {len(valid_ds)} samples.", flush=True)

    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, seed=args.seed)
    valid_loader = DataLoader(valid_ds, batch_size=1)

    n_bins = args.n_fft // 2 + 1
    base_kwargs = dict(
        in_channels=2, hidden_channels=args.hidden_channels,
        num_layers=args.num_layers, n_bins=n_bins,
        max_bin=min(args.max_bin, n_bins), dropout=args.dropout,
        sources=tuple(sources),
    )
    if args.model == "umx":
        base = ParallelOpenUnmix(**base_kwargs)
    elif args.model == "xumx":
        base = CrossNetOpenUnmix(**base_kwargs)
    else:  # d3net: one backbone per stem from the band-structured YAML
        import dataclasses

        from ..models.d3net import ParallelD3Net
        from ..utils.config import build_d3net_from_config

        assert args.d3net_config, "--d3net_config is required for model=d3net"
        single = build_d3net_from_config(args.d3net_config)
        cfg = {f.name: getattr(single, f.name) for f in dataclasses.fields(single)
               if f.name not in ("parent", "name")}
        base = ParallelD3Net(sources=tuple(sources), **cfg)
    model = SpectrogramMaskingWrapper(base, args.n_fft, args.hop_length, args.window_fn)

    window = build_window(args.n_fft, args.window_fn)
    if args.model in ("umx", "d3net"):
        criterion = SpectralTargetAdapter(
            MSELoss(dim=(-2, -1)), args.n_fft, args.hop_length, args.window_fn,
        )
    else:
        criterion = SpectralTargetAdapter(
            MultiDomainLoss(
                args.n_fft, args.hop_length, window=window,
                weight_time=args.weight_time, weight_frequency=args.weight_frequency,
                combination=bool(args.combination),
            ),
            args.n_fft, args.hop_length, args.window_fn, complex_target=True,
        )

    optimizer = make_optimizer(args.optimizer, args.lr, max_norm=args.max_norm)
    mesh = make_mesh(args.n_devices) if args.n_devices else None
    config = TrainerConfig(
        epochs=args.epochs, exp_dir=args.exp_dir,
        continue_from=args.continue_from, overwrite=bool(args.overwrite),
        sample_rate=args.sample_rate, save_valid_wavs=0,
    )
    # UMX/X-UMX apply inter-layer LSTM dropout when training; D3Net has none.
    import jax

    dropout_rng = (
        jax.random.PRNGKey(args.seed)
        if args.model in ("umx", "xumx") and args.dropout > 0.0
        else None
    )
    trainer = Trainer(
        model, train_loader, valid_loader, criterion, optimizer, config,
        mesh=mesh, train_kwargs={"train": True}, dropout_rng=dropout_rng,
    )
    trainer.run()
    return trainer


if __name__ == "__main__":
    main()
