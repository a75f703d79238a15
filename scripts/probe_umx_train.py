"""Stage-time the UMX x4-stems TRAINING step (the 1.6% MFU row).

The training table's UMX row (bench_train.py: SpectrogramMaskingWrapper +
ParallelOpenUnmix paper cfg + SpectralTargetAdapter MSE, B=16 x 6 s stereo
@44.1 kHz, bf16) runs at 1.6% step MFU while the forward alone measures
21.9% (probe_umx_galr.py). This probe decomposes the step on-chip:

  * full train step / fwd+loss / fwd+bwd (same protocol as
    probe_train_stages.py, whose timed_scan it reuses: on-device scan chain,
    scalar-fetch barrier, carry feeding the body, floor-subtracted)
  * the target STFT alone (SpectralTargetAdapter rffts 64 stereo stems/step)
  * the 3-layer biLSTM stack fwd and fwd+bwd at the training shape (the
    custom_vjp backward is two XLA scans per layer -- kernel-notes candidate)
  * the spectrogram-domain model fwd+bwd with both STFT paths removed
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from probe_train_stages import PEAK, flops_of, timed_scan


def main():
    from dnn_based_source_separation_tpu.criterion import MSELoss
    from dnn_based_source_separation_tpu.criterion.spectral import SpectralTargetAdapter
    from dnn_based_source_separation_tpu.models import ParallelOpenUnmix
    from dnn_based_source_separation_tpu.models.wrappers import SpectrogramMaskingWrapper
    from dnn_based_source_separation_tpu.ops.stft import stft
    from dnn_based_source_separation_tpu.ops.windows import build_window
    from dnn_based_source_separation_tpu.train.steps import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    B, T, sr = 16, 6 * 44100, 44100
    n_fft, hop = 4096, 1024
    audio_sec = B * T / sr
    mix = jnp.asarray(rng.standard_normal((B, 1, 2, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 4, 2, T)), jnp.float32)

    def make_base():
        return ParallelOpenUnmix(in_channels=2, hidden_channels=512,
                                 num_layers=3, n_bins=2049, max_bin=1487,
                                 dropout=0.0)

    umx = SpectrogramMaskingWrapper(make_base(), n_fft, hop, "hann")
    spec_mse = SpectralTargetAdapter(MSELoss(dim=(-2, -1)), n_fft, hop, "hann")
    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    variables = umx.init(jax.random.PRNGKey(0), mix)
    opt_state = optimizer.init(variables["params"])
    cd = jnp.bfloat16

    print(f"UMX x4 train probe: B={B} x {T / sr:.0f}s stereo, bf16 compute",
          flush=True)

    aux = {k: v for k, v in variables.items() if k != "params"}

    def _cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, tree)

    def loss_fn(p, mix, src):
        # Mirrors make_train_step's _step_core: grad w.r.t. params only,
        # batch_stats threaded through mutable apply (UMX's TransformBlock1d
        # uses nn.BatchNorm; applying train=True without mutable raises).
        v = {"params": _cast(p), **_cast(aux)}
        est, _ = umx.apply(v, mix.astype(cd), train=True,
                           mutable=list(aux.keys()))
        return spec_mse(est.astype(jnp.float32), src)

    def fwd_once(c, p, mix, src):
        return c + loss_fn(p, mix + 1e-20 * c, src)

    params = variables["params"]
    print("[stage] fwd chain...", flush=True)
    ms_fwd = timed_scan(fwd_once, jnp.float32(0.0), params, mix, src, iters=8)
    f_fwd = flops_of(jax.jit(loss_fn), params, mix, src)
    print(f"forward+loss:        {ms_fwd:7.2f} ms  "
          f"({f_fwd / (ms_fwd / 1e3) / PEAK:5.1%} MFU of {f_fwd / 1e9:.1f} GF)",
          flush=True)

    gfn = jax.value_and_grad(loss_fn)

    def grad_once(p, mix, src):
        _, g = gfn(p, mix, src)
        return jax.tree_util.tree_map(lambda pi, gi: pi - 1e-20 * gi, p, g)

    print("[stage] grad chain...", flush=True)
    ms_grad = timed_scan(grad_once, params, mix, src, iters=4)
    f_grad = flops_of(jax.jit(gfn), params, mix, src)
    print(f"forward+backward:    {ms_grad:7.2f} ms  "
          f"({f_grad / (ms_grad / 1e3) / PEAK:5.1%} MFU of {f_grad / 1e9:.1f} GF)",
          flush=True)

    step = make_train_step(umx, spec_mse, optimizer, compute_dtype=cd,
                           train_kwargs={"train": True}, donate=False)

    def step_once(carry, mix, src):
        v, o = carry
        v, o, _ = step(v, o, mix, src)
        return (v, o)

    print("[stage] step chain...", flush=True)
    ms_step = timed_scan(step_once, (variables, opt_state), mix, src, iters=4)
    f_step = flops_of(step, variables, opt_state, mix, src)
    print(f"full train step:     {ms_step:7.2f} ms  "
          f"({f_step / (ms_step / 1e3) / PEAK:5.1%} MFU of {f_step / 1e9:.1f} GF)"
          f"  -> {audio_sec / (ms_step / 1e3):.0f} audio-sec/s", flush=True)

    # --- target STFT alone (inside the loss every step) ----------------------
    window = build_window(n_fft, "hann")

    def tgt_stft_once(c, s):
        sp = stft((s + 1e-20 * c).astype(cd), n_fft, hop, window=window)
        return c + jnp.sum(jnp.abs(sp).astype(jnp.float32))

    print("[stage] target-STFT chain...", flush=True)
    ms_tstft = timed_scan(tgt_stft_once, jnp.float32(0.0), src, iters=8)
    print(f"target STFT (64 stereo stems): {ms_tstft:7.2f} ms", flush=True)

    # --- spectrogram-domain model only (both STFT paths removed) -------------
    base = make_base()
    S = T // hop + 1  # center-padded frame count
    amp = jnp.asarray(rng.standard_normal((B, 1, 2, 2049, S)) ** 2, jnp.float32)
    amp_t = jnp.asarray(rng.standard_normal((B, 4, 2, 2049, S)) ** 2, jnp.float32)
    vb = base.init(jax.random.PRNGKey(0), amp)
    aux_b = {k: v for k, v in vb.items() if k != "params"}

    def base_loss(p, a, t):
        v = {"params": _cast(p), **_cast(aux_b)}
        est, _ = base.apply(v, a.astype(cd), train=True,
                            mutable=list(aux_b.keys()))
        return jnp.mean((est.astype(jnp.float32) - t) ** 2)

    bgfn = jax.value_and_grad(base_loss)

    def base_grad_once(p, a, t):
        _, g = bgfn(p, a, t)
        return jax.tree_util.tree_map(lambda pi, gi: pi - 1e-20 * gi, p, g)

    pb = vb["params"]
    print("[stage] spec-domain model grad chain...", flush=True)
    ms_base = timed_scan(base_grad_once, pb, amp, amp_t, iters=4)
    f_base = flops_of(jax.jit(bgfn), pb, amp, amp_t)
    print(f"spec-model fwd+bwd (no STFT): {ms_base:7.2f} ms  "
          f"({f_base / (ms_base / 1e3) / PEAK:5.1%} MFU of {f_base / 1e9:.1f} GF)",
          flush=True)

    # --- the biLSTM stack alone at the training shape -------------------------
    from dnn_based_source_separation_tpu.ops.rnn import LSTM

    rows = B * 4  # 4 stems through the vmapped backbones
    H = 256  # umx: rnn_hidden = hidden_channels // 2 per direction
    seq = jnp.asarray(rng.standard_normal((rows, S, 512)), cd)
    lstm = LSTM(hidden_size=H, num_layers=3, bidirectional=True)
    vl = lstm.init(jax.random.PRNGKey(0), seq)

    def lstm_loss(v, x):
        return jnp.sum(lstm.apply(v, x).astype(jnp.float32))

    def lstm_fwd_once(c, v, x):
        return c + lstm_loss(v, x + (1e-20 * c).astype(x.dtype))

    print("[stage] biLSTM fwd chain...", flush=True)
    ms_lf = timed_scan(lstm_fwd_once, jnp.float32(0.0), vl, seq, iters=8)
    print(f"biLSTM x3 fwd (rows={rows}, S={S}): {ms_lf:7.2f} ms", flush=True)

    lgfn = jax.value_and_grad(lstm_loss)

    def lstm_grad_once(v, x):
        _, g = lgfn(v, x)
        return jax.tree_util.tree_map(lambda p, gi: p - 1e-20 * gi, v, g)

    print("[stage] biLSTM grad chain...", flush=True)
    ms_lfb = timed_scan(lstm_grad_once, vl, seq, iters=4)
    print(f"biLSTM x3 fwd+bwd:            {ms_lfb:7.2f} ms", flush=True)

    print("\nsummary:", flush=True)
    print(f"  backward adds (fwd_bwd - fwd)   {ms_grad - ms_fwd:8.2f} ms")
    print(f"  optimizer (step - fwd_bwd)      {ms_step - ms_grad:8.2f} ms")
    print(f"  lstm bwd share                  {ms_lfb - ms_lf:8.2f} ms")
    print(f"  stft-path share (fwd_bwd - spec-model fwd_bwd) "
          f"{ms_grad - ms_base:8.2f} ms (approx; different input dtypes)")


if __name__ == "__main__":
    main()
