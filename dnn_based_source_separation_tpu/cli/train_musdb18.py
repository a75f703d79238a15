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
from ..criterion.distance import MAELoss, MSELoss
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
from ..utils import enable_persistent_compilation_cache, set_seed


def build_parser():
    p = argparse.ArgumentParser("train_musdb18")
    p.add_argument("--musdb18_root", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--duration", type=float, default=6.0)
    p.add_argument("--valid_duration", type=float, default=10.0)
    p.add_argument("--samples_per_epoch", type=int, default=None)
    p.add_argument("--augmentation", type=int, default=1)
    p.add_argument("--model", type=str, default="umx",
                   choices=["umx", "xumx", "d3net", "mm-densenet", "mm-dense-lstm",
                            "conv-tasnet", "mrx", "meta-tasnet", "hrnet", "cunet"])
    p.add_argument("--d3net_config", type=str, default=None, help="band-structured YAML (egs/musdb18/d3net/config)")
    p.add_argument("--mmdense_config", type=str, default=None,
                   help="band-structured YAML (egs/musdb18/mm-densenet or mm-dense-lstm config)")
    p.add_argument("--criterion", type=str, default=None,
                   help="override the per-model default (mse/mae/l1loss/sisdr)")
    # conv-tasnet / meta-tasnet (time domain) hyperparameters
    p.add_argument("--n_basis", "-N", type=int, default=256)
    p.add_argument("--kernel_size", "-L", type=int, default=20)
    p.add_argument("--sep_hidden_channels", "-HH", type=int, default=512)
    p.add_argument("--sep_bottleneck_channels", "-B", type=int, default=256)
    p.add_argument("--sep_skip_channels", "-Sc", type=int, default=128)
    p.add_argument("--sep_num_layers", "-X", type=int, default=10)
    p.add_argument("--sep_num_blocks", "-R", type=int, default=4)
    # hrnet (per-target)
    p.add_argument("--target", type=str, default="vocals")
    p.add_argument("--hrnet_hidden", type=str, default="16,32,64")
    # cunet
    p.add_argument("--cunet_channels", type=str, default="2,16,32,64,128,256")
    p.add_argument("--cunet_control_channels", type=str, default="4,16,64")
    p.add_argument("--conditioning", type=str, default="film",
                   choices=["film", "pocm", "gpocm"])
    # mrx
    p.add_argument("--mrx_n_fft", type=str, default="512,1024,2048")
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
    p.add_argument("--time_budget_sec", type=float, default=None,
                   help="stop after this wall-clock budget (soak harnesses)")
    p.add_argument("--overwrite", type=int, default=0)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--num_workers", type=int, default=0, help="background loader threads")
    p.add_argument("--cache_in_memory", type=int, default=0,
                   help="cache decoded stems in RAM after first use "
                        "(~4B x channels x corpus samples x (1+n_src); "
                        "full musdb18 train split ~40 GB)")
    p.add_argument("--n_devices", type=int, default=None)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    set_seed(args.seed)
    enable_persistent_compilation_cache()
    sources = args.sources.split(",")
    if args.model == "hrnet":
        # Per-target recipe: the loader ships only the target stem.
        assert args.target in sources, f"--target {args.target} not in --sources"
        sources = [args.target]

    aug = None
    if args.augmentation:
        aug = SequentialAugmentation(RandomFlip(flip_rate=0.5, axis=0), RandomGain(0.25, 1.25))
        train_ds = musdb.AugmentationWaveTrainDataset(
            args.musdb18_root, duration=args.duration, sample_rate=args.sample_rate,
            samples_per_epoch=args.samples_per_epoch, sources=sources,
            augmentation=aug, seed=args.seed,
            cache_in_memory=bool(args.cache_in_memory),
        )
    else:
        train_ds = musdb.WaveTrainDataset(
            args.musdb18_root, duration=args.duration, sample_rate=args.sample_rate,
            sources=sources, cache_in_memory=bool(args.cache_in_memory),
        )
    valid_ds = musdb.WaveEvalDataset(
        args.musdb18_root, max_duration=args.valid_duration,
        sample_rate=args.sample_rate, sources=sources,
    )
    print(f"Training dataset includes {len(train_ds)} samples.", flush=True)
    print(f"Valid dataset includes {len(valid_ds)} samples.", flush=True)

    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, seed=args.seed,
                              num_workers=args.num_workers)
    valid_loader = DataLoader(valid_ds, batch_size=1)

    n_bins = args.n_fft // 2 + 1
    base_kwargs = dict(
        in_channels=2, hidden_channels=args.hidden_channels,
        num_layers=args.num_layers, n_bins=n_bins,
        max_bin=min(args.max_bin, n_bins), dropout=args.dropout,
        sources=tuple(sources),
    )
    spec_mse = SpectralTargetAdapter(
        MSELoss(dim=(-2, -1)), args.n_fft, args.hop_length, args.window_fn)
    spec_mae = SpectralTargetAdapter(
        MAELoss(dim=(-2, -1)), args.n_fft, args.hop_length, args.window_fn)

    if args.model == "umx":
        model = SpectrogramMaskingWrapper(
            ParallelOpenUnmix(**base_kwargs), args.n_fft, args.hop_length, args.window_fn)
        criterion = spec_mse
    elif args.model == "xumx":
        window = build_window(args.n_fft, args.window_fn)
        model = SpectrogramMaskingWrapper(
            CrossNetOpenUnmix(**base_kwargs), args.n_fft, args.hop_length, args.window_fn)
        criterion = SpectralTargetAdapter(
            MultiDomainLoss(
                args.n_fft, args.hop_length, window=window,
                weight_time=args.weight_time, weight_frequency=args.weight_frequency,
                combination=bool(args.combination),
            ),
            args.n_fft, args.hop_length, args.window_fn, complex_target=True,
        )
    elif args.model == "d3net":
        # d3net: one backbone per stem from the band-structured YAML
        import dataclasses

        from ..models.d3net import ParallelD3Net
        from ..utils.config import build_d3net_from_config

        assert args.d3net_config, "--d3net_config is required for model=d3net"
        single = build_d3net_from_config(args.d3net_config)
        cfg = {f.name: getattr(single, f.name) for f in dataclasses.fields(single)
               if f.name not in ("parent", "name")}
        model = SpectrogramMaskingWrapper(
            ParallelD3Net(sources=tuple(sources), **cfg),
            args.n_fft, args.hop_length, args.window_fn)
        criterion = spec_mse
    elif args.model in ("mm-densenet", "mm-dense-lstm"):
        # Reference egs/musdb18/mm-densenet, mm-dense-lstm: per-stem
        # band-split backbones, magnitude MSE.
        from ..utils.config import (
            build_mmdenselstm_from_config,
            build_mmdensenet_from_config,
        )

        assert args.mmdense_config, "--mmdense_config is required"
        builder = (build_mmdensenet_from_config if args.model == "mm-densenet"
                   else build_mmdenselstm_from_config)
        base = builder(args.mmdense_config, parallel=True, sources=tuple(sources))
        model = SpectrogramMaskingWrapper(base, args.n_fft, args.hop_length, args.window_fn)
        criterion = spec_mse
    elif args.model == "conv-tasnet":
        # Reference egs/musdb18/conv-tasnet: joint stereo encoder
        # (in_channels=2), waveform MSE, no PIT (fixed stem order).
        from ..models import ConvTasNet
        from ..models.wrappers import WaveChannelAdapter

        base = ConvTasNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size,
            enc_basis="trainable", dec_basis="trainable",
            sep_hidden_channels=args.sep_hidden_channels,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_skip_channels=args.sep_skip_channels,
            sep_num_blocks=args.sep_num_blocks,
            sep_num_layers=args.sep_num_layers,
            causal=False, n_sources=len(sources), in_channels=2,
        )
        model = WaveChannelAdapter(base)
        criterion = MSELoss(dim=-1)
    elif args.model == "mrx":
        # Reference egs/musdb18/mrx: multi-resolution crossnet, SI-SDR.
        from ..criterion import NegSISDR
        from ..models.mrx import MultiResolutionCrossNet
        from ..models.wrappers import WaveChannelAdapter

        base = MultiResolutionCrossNet(
            in_channels=2, hidden_channels=args.hidden_channels,
            num_layers=args.num_layers,
            n_fft=tuple(int(v) for v in args.mrx_n_fft.split(",")),
            hop_length=args.hop_length, sources=tuple(sources),
        )
        model = WaveChannelAdapter(base)
        criterion = NegSISDR()
    elif args.model == "meta-tasnet":
        # Reference egs/musdb18/meta-tasnet: mono cascade; single stage here,
        # SI-SDR on the mono downmix.
        from ..criterion import NegSISDR
        from ..criterion.spectral import MonoTargetAdapter
        from ..models.meta_tasnet import MetaTasNet
        from ..models.wrappers import MonoWaveAdapter

        base = MetaTasNet(
            n_basis=args.n_basis, kernel_size=args.kernel_size,
            sep_hidden_channels=args.sep_hidden_channels,
            sep_bottleneck_channels=args.sep_bottleneck_channels,
            sep_skip_channels=args.sep_skip_channels,
            sep_num_blocks=args.sep_num_blocks,
            sep_num_layers=args.sep_num_layers,
            n_sources=len(sources),
        )
        model = MonoWaveAdapter(base)
        criterion = MonoTargetAdapter(NegSISDR())
    elif args.model == "hrnet":
        # Reference egs/musdb18/hrnet: per-target magnitude MAE.
        from ..models.hrnet import HRNet
        from ..models.wrappers import SingleStemSpectrogramWrapper

        base = HRNet(
            in_channels=2,
            hidden_channels=tuple(int(v) for v in args.hrnet_hidden.split(",")),
        )
        model = SingleStemSpectrogramWrapper(base, args.n_fft, args.hop_length, args.window_fn)
        criterion = spec_mae
    elif args.model == "cunet":
        # Reference egs/musdb18/cunet: FiLM/PoCM conditioned U-Net, L1 loss.
        from ..models.cunet import ConditionedUNet2d
        from ..models.wrappers import ConditionedSpectrogramWrapper

        base = ConditionedUNet2d(
            channels=tuple(int(v) for v in args.cunet_channels.split(",")),
            kernel_size=(5, 5), stride=(2, 2),
            control_channels=tuple(int(v) for v in args.cunet_control_channels.split(",")),
            conditioning=args.conditioning, masking=True,
        )
        model = ConditionedSpectrogramWrapper(
            base, args.n_fft, args.hop_length, args.window_fn,
            n_sources=len(sources))
        criterion = spec_mae
    else:
        raise ValueError(f"Unsupported model: {args.model}")

    if args.criterion:
        # Override table per OUTPUT DOMAIN: spectrogram models compare
        # magnitudes via SpectralTargetAdapter; waveform models compare
        # time samples directly (the adapter's STFT'd targets cannot match
        # waveform estimates); meta-tasnet additionally targets the mono
        # downmix.
        if args.model in ("conv-tasnet", "mrx"):
            table = {"mse": MSELoss(dim=-1), "mae": MAELoss(dim=-1),
                     "l1loss": MAELoss(dim=-1)}
        elif args.model == "meta-tasnet":
            from ..criterion.spectral import MonoTargetAdapter

            table = {"mse": MonoTargetAdapter(MSELoss(dim=-1)),
                     "mae": MonoTargetAdapter(MAELoss(dim=-1)),
                     "l1loss": MonoTargetAdapter(MAELoss(dim=-1))}
        else:
            table = {"mse": spec_mse, "mae": spec_mae, "l1loss": spec_mae}
        if args.criterion in table:
            criterion = table[args.criterion]

    optimizer = make_optimizer(args.optimizer, args.lr, max_norm=args.max_norm)
    mesh = make_mesh(args.n_devices) if args.n_devices else None
    config = TrainerConfig(
        epochs=args.epochs, exp_dir=args.exp_dir,
        continue_from=args.continue_from, overwrite=bool(args.overwrite),
        sample_rate=args.sample_rate, save_valid_wavs=0,
        time_budget_sec=args.time_budget_sec,
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
