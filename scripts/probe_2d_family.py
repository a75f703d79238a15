"""Per-family stage evidence for the 2-D / spectrogram model families.

Round-3 verdict item 3: MMDenseLSTM/MRX/CUNet/HRNet carried D3Net's
"small-channel lane underutilization" diagnosis by analogy. probe_mmdense*
established the actual regime for the dense families: the convs are
PER-OP LATENCY-bound (4 independent block convs in one program: 2.0 ms vs
0.37 ms as single-op scans — op latency, not lanes), BN/ReLU and the
split-accumulate slicing are near-free, and batch is the only lever that
moves throughput (B=4 = 1.4x; B>=8 regresses).

This probe gives each remaining family its own measured split:

  MMDenseLSTM — full vs RNN-disabled (hidden_channels zeroed) at B=2,
                plus B=4: separates FrameRNN recurrence from conv time
  MRX         — B=2 vs B=4: the core is a 512-wide UMX-style biLSTM over
                3 STFT resolutions, i.e. the LSTM per-step floor family,
                not a conv problem
  CUNet       — B=2 vs B=4 at the recipe 128-frame patches
  HRNet       — B=2 vs B=4

Usage: python scripts/probe_2d_family.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from probe_mmdense import timed_apply, flops_of  # noqa: E402

PEAK = 197e12
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def cpu_init(init_fn, *args):
    """Run flax init on the host CPU backend: eager init through the axon
    tunnel pays the ~25 ms per-op latency THOUSANDS of times for a big
    model (measured: MMDenseLSTM init alone dominated a 37-minute probe
    stage); on the in-process CPU it is sub-second. The Pallas LSTM path
    cannot execute on CPU, so it is disabled for the init trace only —
    parameter shapes are identical either way."""
    saved = os.environ.get("DNNTPU_PALLAS_LSTM")
    os.environ["DNNTPU_PALLAS_LSTM"] = "0"
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            v = init_fn(*args)
    finally:
        if saved is None:
            os.environ.pop("DNNTPU_PALLAS_LSTM", None)
        else:
            os.environ["DNNTPU_PALLAS_LSTM"] = saved
    return jax.device_put(v, jax.devices()[0])


def bench(tag, model, x, audio_sec, train_arg=False):
    cd = jnp.bfloat16
    v = cpu_init(model.init, jax.random.PRNGKey(0), x)
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, v)
    xb = x.astype(cd)

    def run(x, v):
        return model.apply(v, x)

    ms = timed_apply(run, xb, vb, iters=8)
    f = flops_of(run, xb, vb)
    print(f"{tag:42s} {ms:8.2f} ms  {f/(ms/1e3)/PEAK:5.1%} MFU  "
          f"{audio_sec/(ms/1e3):6.0f} audio-s/s", flush=True)
    return ms


def main():
    import yaml

    from dnn_based_source_separation_tpu.utils.config import (
        build_mmdenselstm_from_config)

    rng = np.random.default_rng(0)

    # ---- MMDenseLSTM: full vs RNN-off vs B=4 ------------------------------
    cfg_path = os.path.join(ROOT, "egs/musdb18/mm-dense-lstm/config/paper.yaml")
    sec_per_frame = 2048 / 44100
    for tag, hidden_off, B in (("MMDenseLSTM paper B=2", False, 2),
                               ("MMDenseLSTM paper B=2 (RNN off)", True, 2),
                               ("MMDenseLSTM paper B=4", False, 4)):
        path = cfg_path
        if hidden_off:
            with open(cfg_path) as f:
                cfg = yaml.safe_load(f)
            for k, v in cfg.items():
                if isinstance(v, dict) and "hidden_channels" in v:
                    hc = v["hidden_channels"]
                    if isinstance(hc, list):
                        # keep the RNN on depth-0 levels (the block's ONLY
                        # content there — high band has one; removing it
                        # would leave an empty level and break shapes)
                        depth = v.get("depth", [1] * len(hc))
                        if not isinstance(depth, list):
                            depth = [depth] * len(hc)
                        v["hidden_channels"] = [
                            (h if d == 0 else 0) for h, d in zip(hc, depth)]
                    # int hidden_channels (the 'full'/'final' sections) stay
            path = "/tmp/mmdl_rnn_off.yaml"
            with open(path, "w") as f:
                yaml.safe_dump(cfg, f)
        model = build_mmdenselstm_from_config(path)
        x = jnp.asarray(np.abs(rng.standard_normal((B, 2, 2049, 128))),
                        jnp.float32)
        bench(tag, model, x, B * 128 * sec_per_frame)

    # ---- MRX: B=2 vs B=4 ---------------------------------------------------
    from dnn_based_source_separation_tpu.models.mrx import (
        MultiResolutionCrossNet)

    mrx = MultiResolutionCrossNet(in_channels=2, hidden_channels=512,
                                  num_layers=3, n_fft=(512, 1024, 2048),
                                  hop_length=256)
    for B in (2, 4):
        x = jnp.asarray(rng.standard_normal((B, 2, 4 * 44100)), jnp.float32)
        bench(f"MRX recipe B={B}", mrx, x, B * 4.0)

    # ---- CUNet: recipe B=4 vs B=16 (small patches amortize further) -------
    from dnn_based_source_separation_tpu.models.cunet import ConditionedUNet2d

    base = ConditionedUNet2d(channels=(2, 16, 32, 64, 128, 256),
                             kernel_size=(5, 5), stride=(2, 2),
                             control_channels=(4, 16, 64),
                             conditioning="film", masking=True)
    sec_per_frame = 768 / 44100

    for B in (4, 16):
        spec = jnp.asarray(np.abs(rng.standard_normal((B, 2, 513, 128))),
                           jnp.float32)
        cond = jnp.tile(jnp.eye(4, dtype=jnp.float32)[:1], (B, 1))
        v = cpu_init(base.init, jax.random.PRNGKey(0), spec, cond)
        vb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

        def run(x, v):
            return base.apply(v, x, cond)

        ms = timed_apply(run, spec.astype(jnp.bfloat16), vb, iters=8)
        f = flops_of(run, spec.astype(jnp.bfloat16), vb)
        print(f"{f'CUNet recipe B={B}':42s} {ms:8.2f} ms  "
              f"{f/(ms/1e3)/PEAK:5.1%} MFU  "
              f"{B * 128 * sec_per_frame/(ms/1e3):6.0f} audio-s/s", flush=True)

    # ---- HRNet: B=2 vs B=4 --------------------------------------------------
    from dnn_based_source_separation_tpu.models.hrnet import HRNet

    hr = HRNet(in_channels=2, hidden_channels=(16, 32, 64))
    sec_per_frame = 1024 / 44100
    for B in (2, 4):
        x = jnp.asarray(np.abs(rng.standard_normal((B, 2, 2049, 192))),
                        jnp.float32)
        bench(f"HRNet recipe B={B}", hr, x, B * 192 * sec_per_frame)


if __name__ == "__main__":
    main()
