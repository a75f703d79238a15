"""Pallas kernel tests (interpreter mode on the CPU mesh)."""
import numpy as np
import jax.numpy as jnp

from dnn_based_source_separation_tpu.ops.pallas_kernels import (
    dequantize_int8,
    dequantize_params,
    fused_mask_decode,
    quantize_int8,
    quantize_params,
)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    values, scale = quantize_int8(x)
    assert values.dtype == jnp.int8
    y = dequantize_int8(values, scale)
    # Max error bounded by half an int8 step.
    step = float(scale.reshape(()))
    assert float(jnp.max(jnp.abs(y - x))) <= 0.51 * step + 1e-7


def test_quantize_params_tree():
    params = {
        "dense": {"kernel": jnp.ones((16, 32)) * 0.5, "bias": jnp.zeros((32,))},
    }
    q = quantize_params(params)
    assert q["dense"]["kernel"]["q"].dtype == jnp.int8
    assert q["dense"]["bias"].dtype == jnp.float32  # 1-D left alone
    back = dequantize_params(q)
    np.testing.assert_allclose(np.asarray(back["dense"]["kernel"]), 0.5, atol=0.01)


def test_fused_mask_decode_matches_reference():
    rng = np.random.default_rng(1)
    B, Tp, N, n_src, L = 2, 70, 32, 2, 16
    w = jnp.asarray(rng.standard_normal((B, Tp, N)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, n_src, Tp, N)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((N, L)), jnp.float32)

    out = fused_mask_decode(w, mask, kernel, tile_t=32)
    expected = jnp.einsum("btn,bstn,nl->bstl", w, mask, kernel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)
