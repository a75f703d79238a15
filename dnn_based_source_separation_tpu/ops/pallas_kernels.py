"""Pallas TPU kernels.

Hand-written kernels for ops where explicit VMEM scheduling beats XLA's
default lowering, written per the Pallas TPU guide. Every kernel has an
`interpret` escape hatch so the CPU test mesh exercises identical code.

Kernels:
  * quantize_int8 / dequantize_int8 -- symmetric per-tile int8 quantization
    with optional stochastic rounding (the TPU analog of the reference's
    quantizable model twins, src/models/d3net.py:1055 QuantizableD3Net).
  * fused_mask_decode -- masked-latent synthesis matmul for the TasNet
    decoder: w_hat = (w * mask) @ kernel computed tile-by-tile in VMEM so
    the (B, n_src, T', N) masked latent is never materialized in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


# -- int8 quantization -------------------------------------------------------

def _quantize_kernel(x_ref, seed_ref, values_ref, scales_ref, *, stochastic: bool):
    if stochastic:
        pltpu.prng_seed(seed_ref[0])
    abs_max = jnp.max(jnp.abs(x_ref[:]))
    scale = jnp.maximum(abs_max / 127.0, 1e-12)
    scaled = x_ref[:] / scale
    if stochastic:
        bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        values_ref[:] = pltpu.stochastic_round(scaled, bits, target_dtype=jnp.int8)
    else:
        values_ref[:] = jnp.round(scaled).astype(jnp.int8)
    scales_ref[0, 0] = scale


def quantize_int8(x: jnp.ndarray, seed: int = 0, stochastic: bool = False,
                  interpret: bool | None = None):
    """x (M, N) float32 -> (values int8 (M, N), scale (1, 1) float32)."""
    if interpret is None:
        interpret = not _is_tpu()
    if interpret and stochastic:
        # Interpreter path: deterministic rounding (host PRNG primitives
        # are TPU-only); tests exercise the deterministic branch on CPU.
        stochastic = False
    kernel = functools.partial(_quantize_kernel, stochastic=stochastic)
    seed_arr = jnp.asarray([seed], jnp.int32)
    values, scales = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.SMEM),
        ),
        interpret=interpret,
    )(x, seed_arr)
    return values, scales


def dequantize_int8(values: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return values.astype(jnp.float32) * scale.reshape(())


def quantize_params(params, stochastic: bool = False):
    """Quantize every >=2D float leaf of a params tree to (int8, scale).

    TPU analog of the reference's quantizable model twins: weights live in
    HBM at 1/4 the footprint and dequantize on use.
    """
    flat, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, leaf in enumerate(flat):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32 and leaf.ndim >= 2:
            v, s = quantize_int8(leaf.reshape(leaf.shape[0], -1), seed=i, stochastic=stochastic)
            out.append({"q": v.reshape(leaf.shape), "scale": s})
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def dequantize_params(qparams):
    def _maybe(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
            return dequantize_int8(leaf["q"], leaf["scale"])
        return leaf

    return jax.tree_util.tree_map(
        _maybe, qparams, is_leaf=lambda l: isinstance(l, dict) and set(l) == {"q", "scale"}
    )


# -- fused mask + decode -----------------------------------------------------

def _mask_decode_kernel(w_ref, mask_ref, kernel_ref, out_ref):
    w_hat = w_ref[:] * mask_ref[:]
    out_ref[:] = jnp.dot(w_hat, kernel_ref[:], preferred_element_type=jnp.float32)


def fused_mask_decode(w: jnp.ndarray, mask: jnp.ndarray, kernel: jnp.ndarray,
                      tile_t: int = 512, interpret: bool | None = None):
    """frames = (w * mask) @ kernel without materializing w * mask in HBM.

    w: (B, T', N); mask: (B, n_src, T', N); kernel: (N, L).
    Returns (B, n_src, T', L) synthesis frames (overlap-add happens outside;
    see ops.filterbank.ConvDecoder).
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, Tp, N = w.shape
    n_src = mask.shape[1]
    L = kernel.shape[1]
    grid_t = -(-Tp // tile_t)
    pad_t = grid_t * tile_t - Tp
    if pad_t:
        w = jnp.pad(w, ((0, 0), (0, pad_t), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_t), (0, 0)))

    out = pl.pallas_call(
        _mask_decode_kernel,
        grid=(B, n_src, grid_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, N), lambda b, s, t: (b, t, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, N), lambda b, s, t: (b, s, t, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((N, L), lambda b, s, t: (0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_t, L), lambda b, s, t: (b, s, t, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_src, grid_t * tile_t, L), jnp.float32),
        interpret=interpret,
    )(w, mask, kernel)
    return out[:, :, :Tp]
