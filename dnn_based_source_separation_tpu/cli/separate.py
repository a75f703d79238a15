"""Separate a WAV file with a trained checkpoint (file-based demo).

Counterpart of the reference's pyaudio mic demo
(`egs/wsj0-mix/conv-tasnet/local/demo.py:26-60`) without the audio-device
dependency: read a mixture WAV, run the model, write per-source WAVs.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio_io import read_wav, write_wav
from ..models.base import load_model


def build_parser():
    p = argparse.ArgumentParser("separate")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--input", type=str, required=True, help="mixture wav")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--chunk_duration", type=float, default=None,
                   help="optional fixed chunking for long inputs (one compile)")
    p.add_argument("--streaming_hop", type=float, default=None,
                   help="causal checkpoints only: process the file through "
                        "the exact chunk-by-chunk streaming path (per-layer "
                        "state; output identical to the offline forward) "
                        "with this hop in seconds — demonstrates/validates "
                        "realtime serving behavior")
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    model, params, _ = load_model(args.model_path)
    # Inference-time gLN affine fold, pad-free 'heads' mode: pure algebra,
    # parity-tested (tests/test_fold.py), measured +5% on the paper-config
    # forward (BENCHMARKS.md "gLN affine folding"). Non-causal
    # Conv-TasNet-family checkpoints only; anything else is left untouched.
    if (type(model).__name__ == "ConvTasNet"
            and not getattr(model, "causal", True)
            and (getattr(model, "separable", False)
                 or not getattr(model, "sep_norm", True))):
        from ..models.fold import fold_gln_affine

        model, params = fold_gln_affine(model, params, mode="heads")
    x, sr = read_wav(args.input)
    if x.ndim > 1:
        x = x.mean(axis=1)
    T = x.shape[0]
    forward = jax.jit(model.apply)

    if args.streaming_hop:
        # Exact realtime-style streaming: per-layer state, output matches
        # the offline forward to float rounding (models/streaming.py).
        from ..models.streaming import ExactStreamingSeparator

        stride = int(getattr(model, "stride", 0) or model.kernel_size // 2)
        L = int(model.kernel_size)
        hop = max(int(args.streaming_hop * sr) // stride, 1) * stride
        hop = max(hop, L)
        stream = ExactStreamingSeparator(model, params, hop_samples=hop)
        # Match the offline forward's stride-grid padding EXACTLY
        # (skeleton.extract_latent center-pads (pl, pr) before framing);
        # then pad the tail further to a whole number of hops and trim the
        # extra emission, so streamed == offline for ANY input length.
        grid_pad = (stride - (T - L) % stride) % stride
        pl = grid_pad // 2
        xp = np.concatenate(
            [np.zeros(pl, np.float32), x,
             np.zeros(grid_pad - pl, np.float32)])
        n_full = len(xp) // hop
        outs = [stream.process(xp[None, lo : lo + hop])
                for lo in range(0, n_full * hop, hop)]
        outs.append(stream.finish(xp[None, n_full * hop :]))
        est = np.concatenate(outs, axis=-1)[:, pl : pl + T]
    elif args.chunk_duration:
        # Overlapped chunked scan with triangular crossfade (no hard
        # boundaries), one compiled program per chunk-count bucket.
        from ..models.longform import separate_longform

        chunk = int(args.chunk_duration * sr)
        n_src = getattr(model, "n_sources", 2)
        est = np.asarray(separate_longform(
            model.apply, params, jnp.asarray(x[None, None]), chunk, n_src)[0])
    else:
        est = np.asarray(forward(params, jnp.asarray(x[None, None]))[0])

    os.makedirs(args.out_dir, exist_ok=True)
    for s in range(est.shape[0]):
        sig = est[s] / (np.abs(est[s]).max() + 1e-9)
        write_wav(os.path.join(args.out_dir, f"source{s}.wav"), sig, sr)
    print(f"wrote {est.shape[0]} sources to {args.out_dir}", flush=True)


if __name__ == "__main__":
    main()
