"""Pallas fused LSTM step for the dual-path workloads.

The stock path (`ops/rnn.py`) precomputes the input projection as one large
MXU matmul and runs the recurrence as a `lax.scan`. On TPU that scan is the
throughput ceiling for DPRNN/DPTNet/SepFormer/UMX (BENCHMARKS.md: ~10x below
the conv models): every step XLA re-launches a small (B, H) x (H, 4H) matmul
plus pointwise gates, and the carry plus per-step intermediates bounce
through HBM.

This kernel fuses the whole recurrence into ONE pallas_call:

  * `w_hh` lives in VMEM for the entire sequence (index_map pins block 0, so
    Mosaic never re-fetches it);
  * the (B, H) h/c carry lives in f32 VMEM scratch, which persists across
    sequential grid steps — it never touches HBM;
  * the precomputed input gates `xw` stream in as (CHUNK, B, 4H) blocks and
    hidden states stream out as (CHUNK, B, H) blocks; Pallas double-buffers
    both DMAs against compute automatically;
  * per-step matmul feeds the MXU with f32 accumulation
    (`preferred_element_type`), gate pointwise math runs on the VPU in f32.

HBM traffic is therefore the information-theoretic floor for this op — read
xw once, write hs (and cs for autodiff) once.

Autodiff: `pallas_call` is not differentiable, so `lstm_scan` is a
`jax.custom_vjp`. The backward pass recomputes gate pre-activations from the
saved (hs, cs) with ONE large matmul (rematerialization: trades FLOPs for
the (B, T, 4H) activation save) and runs the reverse recurrence as a
`lax.scan` — the same cost shape the forward had before this kernel, so
training throughput only improves.

Capability parity: torch nn.LSTM forward semantics (reference
`src/utils/model.py:22` choose_rnn); gate order i, f, g, o.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Cap on the xw bytes held in VMEM per grid step (double-buffered by Mosaic,
# so the real footprint is ~2x this plus the hs/cs output blocks).
_VMEM_BLOCK_BYTES = 1 << 21  # 2 MiB


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_lstm_enabled() -> bool:
    """Pallas recurrence on real TPU by default; DNNTPU_PALLAS_LSTM=0/1 overrides."""
    flag = os.environ.get("DNNTPU_PALLAS_LSTM")
    if flag is not None:
        return flag not in ("0", "false", "False")
    return _is_tpu()


def _lstm_kernel(xw_ref, whh_ref, hs_ref, cs_ref, h_ref, c_ref, *, chunk: int, hidden: int):
    """One grid step = `chunk` timesteps of one batch tile.

    Grid is (batch_tiles, time_tiles) with time innermost; the h/c scratch
    persists across sequential grid steps, so each new batch tile re-zeros
    it at its first time tile.
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def step(i, _):
        xt = xw_ref[i]  # (B, 4H)
        h = h_ref[:]
        gates = xt.astype(jnp.float32) + jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(gates[:, :hidden])
        gf = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = gf * c_ref[:] + gi * gg
        h = go * jnp.tanh(c)
        h_ref[:] = h
        c_ref[:] = c
        hs_ref[i] = h.astype(hs_ref.dtype)
        cs_ref[i] = c.astype(cs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=False)


def _tile_plan(T: int, B: int, four_h: int, itemsize: int,
               budget: int = _VMEM_BLOCK_BYTES) -> tuple[int, int]:
    """Pick (batch_tile, time_chunk) so each streamed block fits `budget`.

    Large chunk-batches (e.g. DPTNet: B·S ~ 2500 chunks, 4H = 1024, f32)
    exceed VMEM with even a single-timestep block, so the batch axis is
    tiled too; batch tiles are independent recurrences (grid-outer), time
    stays grid-inner and sequential.
    """
    per_row = max(1, four_h * itemsize)  # one batch row, one timestep
    per_step = B * per_row
    if per_step <= budget:
        # Whole batch per sequential step (max chains/step — the per-step
        # cost is machinery-bound, so batch rides along free); stream as
        # many timesteps per grid block as fit.
        return B, min(T, max(1, budget // per_step))
    # Even one timestep of the full batch exceeds VMEM: tile the batch.
    # Batch tiles multiply the sequential-step count, so use as few as the
    # budget allows and equalize them (ceil(B / n_tiles), 8-sublane rounded)
    # to avoid a mostly-padding final tile.
    b_max = max(8, (budget // per_row) // 8 * 8)
    n_tiles = -(-B // b_max)
    b_tile = -(-(-(-B // n_tiles)) // 8) * 8
    return min(B, b_tile), 1


def _lstm_pallas_raw(xw: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool):
    """xw (B, T, 4H) -> (hs, cs) each (B, T, H)."""
    B, T, four_h = xw.shape
    H = four_h // 4
    dtype = xw.dtype

    b_tile, chunk = _tile_plan(T, B, four_h, jnp.dtype(dtype).itemsize)
    T_pad = -(-T // chunk) * chunk
    B_pad = -(-B // b_tile) * b_tile
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)
    if T_pad != T or B_pad != B:
        # Trailing zero-padding is harmless: padded steps/rows are discarded
        # and never feed back into the real ones.
        xw_t = jnp.pad(xw_t, ((0, T_pad - T), (0, B_pad - B), (0, 0)))

    grid = (B_pad // b_tile, T_pad // chunk)  # time innermost (sequential)
    kernel = functools.partial(_lstm_kernel, chunk=chunk, hidden=H)
    hs, cs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, b_tile, four_h), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, b_tile, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b_tile, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B_pad, H), dtype),
            jax.ShapeDtypeStruct((T_pad, B_pad, H), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, w_hh)
    hs = jnp.swapaxes(hs[:T, :B], 0, 1)
    cs = jnp.swapaxes(cs[:T, :B], 0, 1)
    return hs, cs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool = False):
    """Fused LSTM recurrence: xw (B, T, 4H) input gates -> hidden (B, T, H).

    Drop-in replacement for `ops.rnn._lstm_scan`'s semantics (zero initial
    state, torch gate order). `interpret=True` runs the Mosaic interpreter so
    the CPU test mesh exercises identical code.
    """
    hs, _ = _lstm_pallas_raw(xw, w_hh, interpret)
    return hs


def _lstm_fwd(xw, w_hh, interpret):
    hs, cs = _lstm_pallas_raw(xw, w_hh, interpret)
    return hs, (xw, w_hh, hs, cs)


def _lstm_bwd_core(xw, w_hh, hs, cs, g_hs):
    B, T, H = hs.shape
    f32 = jnp.float32

    h_prev = jnp.concatenate([jnp.zeros((B, 1, H), hs.dtype), hs[:, :-1]], axis=1)
    c_prev = jnp.concatenate([jnp.zeros((B, 1, H), cs.dtype), cs[:, :-1]], axis=1)

    # Rematerialize all gate activations with one MXU matmul.
    gates = xw.astype(f32) + jnp.einsum(
        "bth,hk->btk", h_prev.astype(w_hh.dtype), w_hh, preferred_element_type=f32
    )
    gi = jax.nn.sigmoid(gates[..., :H])
    gf = jax.nn.sigmoid(gates[..., H:2 * H])
    gg = jnp.tanh(gates[..., 2 * H:3 * H])
    go = jax.nn.sigmoid(gates[..., 3 * H:])
    tc = jnp.tanh(cs.astype(f32))

    w_hh_t = w_hh.astype(f32).T  # (4H, H)

    def step(carry, xs):
        dh_rec, dc_rec = carry
        g_h, gi_t, gf_t, gg_t, go_t, tc_t, cp_t = xs
        dh = g_h.astype(f32) + dh_rec
        da_o = dh * tc_t * go_t * (1.0 - go_t)
        dc = dc_rec + dh * go_t * (1.0 - tc_t * tc_t)
        da_i = dc * gg_t * gi_t * (1.0 - gi_t)
        da_f = dc * cp_t * gf_t * (1.0 - gf_t)
        da_g = dc * gi_t * (1.0 - gg_t * gg_t)
        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)  # (B, 4H)
        dh_prev = jnp.dot(da, w_hh_t, preferred_element_type=f32)
        dc_prev = dc * gf_t
        return (dh_prev, dc_prev), da

    xs = tuple(
        jnp.swapaxes(a, 0, 1)
        for a in (g_hs, gi, gf, gg, go, tc, c_prev.astype(f32))
    )
    init = (jnp.zeros((B, H), f32), jnp.zeros((B, H), f32))
    _, das = jax.lax.scan(step, init, xs, reverse=True)
    das = jnp.swapaxes(das, 0, 1)  # (B, T, 4H)

    d_xw = das.astype(xw.dtype)
    d_whh = jnp.einsum(
        "bth,btk->hk", h_prev.astype(f32), das, preferred_element_type=f32
    ).astype(w_hh.dtype)
    return d_xw, d_whh


def _lstm_bwd(interpret, res, g_hs):
    xw, w_hh, hs, cs = res
    return _lstm_bwd_core(xw, w_hh, hs, cs, g_hs)


lstm_scan.defvjp(_lstm_fwd, _lstm_bwd)


# -- fused bidirectional recurrence ------------------------------------------
#
# Measured on v5e (B=1028, T=250, H=128, bf16): one direction costs ~3.4 ms
# and the cost is per-SEQUENTIAL-STEP machinery, not compute or DMA (a
# copy-only kernel body costs the same 3.4 ms; manual double-buffered DMA
# from HBM is no faster). Two independent XLA scans cost ~4.5 ms jointly.
# Fusing both directions into ONE stepper amortizes the per-step cost across
# two chains: ~3.6 ms for the pair (1.25x over XLA, ~1.9x over sequential
# scans). The forward chain and the (pre-flipped) backward chain advance in
# lockstep; their matmuls and pointwise stages are independent, so Mosaic
# overlaps one chain's VPU work with the other's MXU step.

def _bidir_kernel(xw0_ref, xw1_ref, w0_ref, w1_ref,
                  hs0_ref, hs1_ref, cs0_ref, cs1_ref,
                  h0_ref, c0_ref, h1_ref, c1_ref, *, chunk: int, hidden: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        for r in (h0_ref, c0_ref, h1_ref, c1_ref):
            r[:] = jnp.zeros_like(r)

    H = hidden

    def step(i, _):
        g0 = jnp.dot(h0_ref[:].astype(w0_ref.dtype), w0_ref[:],
                     preferred_element_type=jnp.float32)
        g1 = jnp.dot(h1_ref[:].astype(w1_ref.dtype), w1_ref[:],
                     preferred_element_type=jnp.float32)
        for g, xr, hr, cr, hs, cs in (
            (g0, xw0_ref, h0_ref, c0_ref, hs0_ref, cs0_ref),
            (g1, xw1_ref, h1_ref, c1_ref, hs1_ref, cs1_ref),
        ):
            gates = g + xr[i].astype(jnp.float32)
            gi = jax.nn.sigmoid(gates[:, :H])
            gf = jax.nn.sigmoid(gates[:, H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            go = jax.nn.sigmoid(gates[:, 3 * H:])
            c = gf * cr[:] + gi * gg
            h = go * jnp.tanh(c)
            hr[:] = h
            cr[:] = c
            hs[i] = h.astype(hs.dtype)
            cs[i] = c.astype(cs.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=False)


def _bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, interpret):
    """xw_* (B, T, 4H) input gates (xw_b already time-reversed).
    Returns (hs_f, hs_b, cs_f, cs_b), each (B, T, H)."""
    B, T, four_h = xw_f.shape
    H = four_h // 4
    dtype = xw_f.dtype

    item = jnp.dtype(dtype).itemsize
    # Two xw streams: halve the per-stream budget so the pair of blocks
    # (plus 4 output blocks) still fits VMEM with double buffering.
    b_tile, chunk = _tile_plan(T, B, four_h, item, budget=_VMEM_BLOCK_BYTES // 2)
    T_pad = -(-T // chunk) * chunk
    B_pad = -(-B // b_tile) * b_tile

    def prep(xw):
        x = jnp.swapaxes(xw, 0, 1)
        if T_pad != T or B_pad != B:
            x = jnp.pad(x, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        return x

    inspec = pl.BlockSpec((chunk, b_tile, four_h), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, four_h), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((chunk, b_tile, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((T_pad, B_pad, H), dtype)
    kernel = functools.partial(_bidir_kernel, chunk=chunk, hidden=H)
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // b_tile, T_pad // chunk),
        in_specs=[inspec, inspec, wspec, wspec],
        out_specs=(ospec,) * 4,
        out_shape=(oshape,) * 4,
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)] * 4,
        interpret=interpret,
    )(prep(xw_f), prep(xw_b), whh_f, whh_b)
    return tuple(jnp.swapaxes(o[:T, :B], 0, 1) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_bidir(xw_f, xw_b, whh_f, whh_b, interpret: bool = False):
    """Fused bidirectional LSTM recurrence.

    xw_f: (B, T, 4H) forward input gates; xw_b: backward input gates over the
    TIME-REVERSED sequence. Returns (hs_f, hs_b) where hs_b is in reversed
    time order (flip it back outside, exactly like the two-scan path).
    """
    hs_f, hs_b, _, _ = _bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, interpret)
    return hs_f, hs_b


def _bidir_fwd(xw_f, xw_b, whh_f, whh_b, interpret):
    hs_f, hs_b, cs_f, cs_b = _bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, interpret)
    return (hs_f, hs_b), (xw_f, xw_b, whh_f, whh_b, hs_f, hs_b, cs_f, cs_b)


def _bidir_bwd(interpret, res, grads):
    xw_f, xw_b, whh_f, whh_b, hs_f, hs_b, cs_f, cs_b = res
    g_f, g_b = grads
    d_xw_f, d_whh_f = _lstm_bwd_core(xw_f, whh_f, hs_f, cs_f, g_f)
    d_xw_b, d_whh_b = _lstm_bwd_core(xw_b, whh_b, hs_b, cs_b, g_b)
    return d_xw_f, d_xw_b, d_whh_f, d_whh_b


lstm_scan_bidir.defvjp(_bidir_fwd, _bidir_bwd)


# -- fused bidirectional GRU --------------------------------------------------
#
# Same design as the biLSTM stepper: both directional chains advance in one
# kernel, weights + carry resident in VMEM, batch tiled when a timestep
# exceeds the block budget. torch GRU semantics (gate order r, z, n;
# n = tanh(x_n + r * (W_hn h + b_hn))) matching ops/rnn._gru_scan.

def _gru_bidir_kernel(xw0_ref, xw1_ref, w0_ref, w1_ref, b0_ref, b1_ref,
                      hs0_ref, hs1_ref, h0_ref, h1_ref, *, chunk: int, hidden: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        for r in (h0_ref, h1_ref):
            r[:] = jnp.zeros_like(r)

    H = hidden

    def step(i, _):
        g0 = jnp.dot(h0_ref[:].astype(w0_ref.dtype), w0_ref[:],
                     preferred_element_type=jnp.float32) + b0_ref[:].astype(jnp.float32)
        g1 = jnp.dot(h1_ref[:].astype(w1_ref.dtype), w1_ref[:],
                     preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
        for g, xr_ref, hr, hs in ((g0, xw0_ref, h0_ref, hs0_ref),
                                  (g1, xw1_ref, h1_ref, hs1_ref)):
            xt = xr_ref[i].astype(jnp.float32)
            r = jax.nn.sigmoid(xt[:, :H] + g[:, :H])
            z = jax.nn.sigmoid(xt[:, H:2 * H] + g[:, H:2 * H])
            n = jnp.tanh(xt[:, 2 * H:] + r * g[:, 2 * H:])
            h = (1.0 - z) * n + z * hr[:]
            hr[:] = h
            hs[i] = h.astype(hs.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=False)


def _gru_bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, interpret):
    """xw_* (B, T, 3H) input gates (xw_b time-reversed). Returns (hs_f, hs_b)."""
    B, T, three_h = xw_f.shape
    H = three_h // 3
    dtype = xw_f.dtype

    item = jnp.dtype(dtype).itemsize
    b_tile, chunk = _tile_plan(T, B, three_h, item, budget=_VMEM_BLOCK_BYTES // 2)
    T_pad = -(-T // chunk) * chunk
    B_pad = -(-B // b_tile) * b_tile

    def prep(xw):
        x = jnp.swapaxes(xw, 0, 1)
        if T_pad != T or B_pad != B:
            x = jnp.pad(x, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        return x

    inspec = pl.BlockSpec((chunk, b_tile, three_h), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, three_h), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, three_h), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((chunk, b_tile, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((T_pad, B_pad, H), dtype)
    kernel = functools.partial(_gru_bidir_kernel, chunk=chunk, hidden=H)
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // b_tile, T_pad // chunk),
        in_specs=[inspec, inspec, wspec, wspec, bspec, bspec],
        out_specs=(ospec,) * 2,
        out_shape=(oshape,) * 2,
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)] * 2,
        interpret=interpret,
    )(prep(xw_f), prep(xw_b), whh_f, whh_b,
      bhh_f.reshape(1, -1), bhh_b.reshape(1, -1))
    return tuple(jnp.swapaxes(o[:T, :B], 0, 1) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gru_scan_bidir(xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, interpret: bool = False):
    """Fused bidirectional GRU recurrence (torch gate order r, z, n).

    xw_f/xw_b: (B, T, 3H) input projections (+b_ih), xw_b over the
    time-reversed sequence; returns (hs_f, hs_b) with hs_b reversed.
    """
    return _gru_bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, interpret)


def _gru_bwd_core(xw, w_hh, b_hh, hs, g_hs):
    B, T, H = hs.shape
    f32 = jnp.float32

    h_prev = jnp.concatenate([jnp.zeros((B, 1, H), hs.dtype), hs[:, :-1]], axis=1)
    # Rematerialize gates with one MXU matmul.
    hw = jnp.einsum("bth,hk->btk", h_prev.astype(w_hh.dtype), w_hh,
                    preferred_element_type=f32) + b_hh.astype(f32)
    xwf = xw.astype(f32)
    r = jax.nn.sigmoid(xwf[..., :H] + hw[..., :H])
    z = jax.nn.sigmoid(xwf[..., H:2 * H] + hw[..., H:2 * H])
    n = jnp.tanh(xwf[..., 2 * H:] + r * hw[..., 2 * H:])

    w_hh_t = w_hh.astype(f32).T  # (3H, H)

    def step(dh_rec, xs):
        g_h, r_t, z_t, n_t, hn_t, hp_t = xs
        dh = g_h.astype(f32) + dh_rec
        da_z = dh * (hp_t - n_t) * z_t * (1.0 - z_t)
        dn = dh * (1.0 - z_t) * (1.0 - n_t * n_t)
        da_r = dn * hn_t * r_t * (1.0 - r_t)
        d_xw = jnp.concatenate([da_r, da_z, dn], axis=-1)
        d_hw = jnp.concatenate([da_r, da_z, dn * r_t], axis=-1)
        dh_prev = dh * z_t + jnp.dot(d_hw, w_hh_t, preferred_element_type=f32)
        return dh_prev, (d_xw, d_hw)

    xs = tuple(jnp.swapaxes(a, 0, 1) for a in
               (g_hs, r, z, n, hw[..., 2 * H:], h_prev.astype(f32)))
    _, (d_xws, d_hws) = jax.lax.scan(step, jnp.zeros((B, H), f32), xs, reverse=True)
    d_xw = jnp.swapaxes(d_xws, 0, 1).astype(xw.dtype)
    d_hw = jnp.swapaxes(d_hws, 0, 1)
    d_whh = jnp.einsum("bth,btk->hk", h_prev.astype(f32), d_hw,
                       preferred_element_type=f32).astype(w_hh.dtype)
    d_bhh = jnp.sum(d_hw, axis=(0, 1)).astype(b_hh.dtype)
    return d_xw, d_whh, d_bhh


def _gru_bidir_fwd(xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, interpret):
    hs_f, hs_b = _gru_bidir_pallas_raw(xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, interpret)
    return (hs_f, hs_b), (xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, hs_f, hs_b)


def _gru_bidir_bwd(interpret, res, grads):
    xw_f, xw_b, whh_f, whh_b, bhh_f, bhh_b, hs_f, hs_b = res
    g_f, g_b = grads
    d_xw_f, d_whh_f, d_bhh_f = _gru_bwd_core(xw_f, whh_f, bhh_f, hs_f, g_f)
    d_xw_b, d_whh_b, d_bhh_b = _gru_bwd_core(xw_b, whh_b, bhh_b, hs_b, g_b)
    return d_xw_f, d_xw_b, d_whh_f, d_whh_b, d_bhh_f, d_bhh_b


gru_scan_bidir.defvjp(_gru_bidir_fwd, _gru_bidir_bwd)
