"""wsj0-mix training CLI (Conv-TasNet / DPRNN-TasNet / SepFormer / ...).

Capability parity: the reference's per-recipe `local/train.py` argparse
entry points (`egs/wsj0-mix/conv-tasnet/local/train.py:16-129`): same flag
names for model hyperparameters, optimizer choice, seeding, resume.

TPU additions: --n_devices shards the batch over a jax.sharding.Mesh data
axis (replacing nn.DataParallel, reference local/train.py:95).

Usage (see egs/wsj0-mix/<model>/train.sh):
  python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
      --model conv-tasnet --train_wav_root ... --train_list_path ... ...
"""
from __future__ import annotations

import argparse

from ..criterion import NegSISDR, PIT1d
from ..data import DataLoader, WaveEvalDataset, WaveTrainDataset
from ..parallel import make_mesh
from ..train import Trainer, TrainerConfig, make_optimizer
from ..utils import enable_persistent_compilation_cache, set_seed
from .model_factory import build_wsj0mix_model


def build_parser():
    p = argparse.ArgumentParser("train_wsj0mix")
    # data
    p.add_argument("--train_wav_root", type=str, required=True)
    p.add_argument("--train_list_path", type=str, required=True)
    p.add_argument("--valid_wav_root", type=str, required=True)
    p.add_argument("--valid_list_path", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--duration", type=float, default=4.0)
    p.add_argument("--valid_duration", type=float, default=8.0)
    p.add_argument("--n_sources", type=int, default=2)
    # model
    p.add_argument("--model", type=str, default="conv-tasnet")
    p.add_argument("--n_basis", "-N", type=int, default=512)
    p.add_argument("--kernel_size", "-L", type=int, default=16)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--enc_basis", type=str, default="trainable")
    p.add_argument("--dec_basis", type=str, default="trainable")
    p.add_argument("--enc_nonlinear", type=str, default="relu")
    p.add_argument("--sep_hidden_channels", "-H", type=int, default=512)
    p.add_argument("--sep_bottleneck_channels", "-B", type=int, default=128)
    p.add_argument("--sep_skip_channels", "-Sc", type=int, default=128)
    p.add_argument("--sep_kernel_size", "-P", type=int, default=3)
    p.add_argument("--sep_num_blocks", "-R", type=int, default=3)
    p.add_argument("--sep_num_layers", "-X", type=int, default=8)
    p.add_argument("--sep_chunk_size", "-K", type=int, default=100)
    p.add_argument("--sep_hop_size", type=int, default=50)
    p.add_argument("--sep_down_chunk_size", "-Q", type=int, default=32)
    p.add_argument("--sep_num_heads", type=int, default=4)
    p.add_argument("--rnn_type", type=str, default="lstm",
                   choices=["lstm", "gru", "sru"],
                   help="dprnn-tasnet recurrence (gru is ~20%% faster on TPU "
                        "at the recipe config; sru replaces the sequential "
                        "recurrence with a parallel prefix scan, see "
                        "BENCHMARKS.md)")
    p.add_argument("--conv_hidden_channels", "-Hc", type=int, default=128,
                   help="furcanet gated-conv hidden channels")
    p.add_argument("--rnn_hidden_channels", "-Hr", type=int, default=128,
                   help="furcanet BiLSTM hidden channels per direction")
    p.add_argument("--num_conv_blocks", "-Bc", type=int, default=6,
                   help="furcanet gated-conv blocks")
    p.add_argument("--num_rnn_blocks", "-Br", type=int, default=6,
                   help="furcanet BiLSTM layers")
    p.add_argument("--causal", type=int, default=0)
    p.add_argument("--mask_nonlinear", type=str, default="sigmoid")
    # optimization
    p.add_argument("--criterion", type=str, default="sisdr")
    p.add_argument("--pit", type=str, default="exhaustive",
                   choices=["exhaustive", "hungarian", "prob", "sink"],
                   help="permutation search: exhaustive n!-table PIT "
                        "(reference behavior), hungarian O(n^3) exact "
                        "matching (use for n_sources > 5), prob soft-min "
                        "ProbPIT, sink Sinkhorn relaxation")
    p.add_argument("--pit_gamma", type=float, default=1.0,
                   help="ProbPIT temperature (--pit prob)")
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="enable the DPTNet recipe LR schedule (Noam-style "
                        "ramp over this many steps, then 0.98^(epoch//2) "
                        "decay; reference dptnet/train.sh: 4000)")
    p.add_argument("--k1", type=float, default=2e-1,
                   help="warmup ramp coefficient (reference k1)")
    p.add_argument("--k2", type=float, default=4e-4,
                   help="post-warmup decay coefficient (reference k2)")
    p.add_argument("--max_norm", type=float, default=5.0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    # infra
    p.add_argument("--exp_dir", type=str, default="./exp")
    p.add_argument("--continue_from", type=str, default=None)
    p.add_argument("--overwrite", type=int, default=0)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--num_workers", type=int, default=0, help="background loader threads")
    p.add_argument("--cache_in_memory", type=int, default=0,
                   help="cache decoded waveforms in RAM after first use "
                        "(~4B x (1+n_src) x corpus samples; removes all "
                        "file IO from epochs 2+)")
    p.add_argument("--device_resident_data", type=int, default=0,
                   help="stage the ENTIRE training corpus in device HBM "
                        "once and assemble batches on-chip (jitted window "
                        "gather; data/device_cache.py). Removes the "
                        "per-step host->device transfer and the host "
                        "loader from the hot path. Single-device runs "
                        "with corpora that fit HBM (wsj0-protocol: "
                        "~0.5 GB/h)")
    p.add_argument("--n_devices", type=int, default=None, help="mesh data-parallel size")
    p.add_argument("--mixed_precision", type=int, default=0, help="bf16 compute, f32 master params")
    p.add_argument("--time_budget_min", type=float, default=None,
                   help="stop after this many wall-clock minutes (epoch "
                        "boundary; last.ckpt still written, resumable)")
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    args.causal = bool(args.causal)
    set_seed(args.seed)
    enable_persistent_compilation_cache()

    samples = int(args.duration * args.sample_rate)
    valid_samples = int(args.valid_duration * args.sample_rate)

    optimizer = make_optimizer(args.optimizer, args.lr, max_norm=args.max_norm)
    mesh = make_mesh(args.n_devices) if args.n_devices else None
    config = TrainerConfig(
        epochs=args.epochs, exp_dir=args.exp_dir,
        continue_from=args.continue_from, overwrite=bool(args.overwrite),
        sample_rate=args.sample_rate,
        time_budget_sec=(args.time_budget_min * 60.0
                         if args.time_budget_min else None),
    )
    import jax.numpy as jnp

    if args.criterion == "orpit":
        # One-and-Rest PIT: variable #speakers per utterance, model always
        # estimates the (one, rest) pair (reference egs/wsj0-mix/
        # orpit_conv-tasnet/). args.n_sources is interpreted as max_sources.
        from ..criterion import ORPIT
        from ..data.wsj0mix import WaveTrainVariableSourcesDataset
        from ..train.trainer import ORPITTrainer

        max_sources = args.n_sources
        args.n_sources = 2  # (one, rest) estimate pair
        model = build_wsj0mix_model(args)
        train_ds = WaveTrainVariableSourcesDataset(
            args.train_wav_root, args.train_list_path, samples=samples,
            max_sources=max_sources)
        valid_ds = WaveTrainVariableSourcesDataset(
            args.valid_wav_root, args.valid_list_path, samples=valid_samples,
            max_sources=max_sources)
        print(f"Training dataset includes {len(train_ds)} samples.", flush=True)
        print(f"Valid dataset includes {len(valid_ds)} samples.", flush=True)
        train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True, seed=args.seed,
                              num_workers=args.num_workers)
        valid_loader = DataLoader(valid_ds, batch_size=args.batch_size)
        trainer = ORPITTrainer(
            model, train_loader, valid_loader, ORPIT(NegSISDR()), optimizer,
            config, mesh=mesh)
        trainer.run()
        return trainer

    train_ds = WaveTrainDataset(args.train_wav_root, args.train_list_path,
                                samples=samples, n_sources=args.n_sources,
                                cache_in_memory=bool(args.cache_in_memory))
    valid_ds = WaveEvalDataset(args.valid_wav_root, args.valid_list_path,
                               max_samples=valid_samples, n_sources=args.n_sources)
    print(f"Training dataset includes {len(train_ds)} samples.", flush=True)
    print(f"Valid dataset includes {len(valid_ds)} samples.", flush=True)

    if args.device_resident_data and mesh is None:
        from ..data.device_cache import DeviceResidentTrainLoader

        train_loader = DeviceResidentTrainLoader(
            train_ds, batch_size=args.batch_size, seed=args.seed)
        print(f"Training data device-resident: "
              f"{train_loader._mix.nbytes / 1e9:.2f} GB mixtures + "
              f"{train_loader._srcs.nbytes / 1e9:.2f} GB sources in HBM.",
              flush=True)
    else:
        train_loader = DataLoader(train_ds, batch_size=args.batch_size,
                                  shuffle=True, seed=args.seed,
                                  num_workers=args.num_workers)
    valid_loader = DataLoader(valid_ds, batch_size=1)

    if args.warmup_steps > 0:
        from ..train.steps import make_warmup_optimizer

        optimizer = make_warmup_optimizer(
            args.k1, args.k2, d_model=args.sep_bottleneck_channels,
            warmup_steps=args.warmup_steps,
            steps_per_epoch=len(train_loader), max_norm=args.max_norm)

    model = build_wsj0mix_model(args)

    if args.criterion != "sisdr":
        raise ValueError(f"Unsupported criterion: {args.criterion}")
    if args.pit == "hungarian":
        from ..criterion import HungarianLoss
        criterion = HungarianLoss(NegSISDR())
    elif args.pit == "prob":
        from ..criterion import ProbPIT
        criterion = ProbPIT(NegSISDR(), n_sources=args.n_sources,
                            gamma=args.pit_gamma)
    elif args.pit == "sink":
        from ..criterion import SinkPIT
        criterion = SinkPIT(NegSISDR(), n_sources=args.n_sources)
    else:
        criterion = PIT1d(NegSISDR(), n_sources=args.n_sources)

    trainer = Trainer(
        model, train_loader, valid_loader, criterion, optimizer, config,
        mesh=mesh, compute_dtype=jnp.bfloat16 if args.mixed_precision else None,
    )
    trainer.run()
    return trainer


if __name__ == "__main__":
    main()
