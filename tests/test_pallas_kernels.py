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


# -- fused LSTM -------------------------------------------------------------

def _lstm_scan_reference(xw, w_hh):
    import jax

    B, _, four_h = xw.shape
    H = four_h // 4
    xw_t = jnp.swapaxes(xw, 0, 1)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), xw.dtype), jnp.zeros((B, H), xw.dtype))
    _, hs = jax.lax.scan(step, init, xw_t)
    return jnp.swapaxes(hs, 0, 1)


def test_pallas_lstm_forward_matches_scan():
    from dnn_based_source_separation_tpu.ops.pallas_lstm import lstm_scan

    rng = np.random.default_rng(2)
    B, T, H = 3, 23, 16  # T not a multiple of the time chunk
    xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    out = lstm_scan(xw, w_hh, True)
    ref = _lstm_scan_reference(xw, w_hh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_lstm_grads_match_scan():
    import jax
    from dnn_based_source_separation_tpu.ops.pallas_lstm import lstm_scan

    rng = np.random.default_rng(3)
    B, T, H = 2, 17, 8
    xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)

    def loss_fused(xw, w):
        return jnp.sum(lstm_scan(xw, w, True) ** 2)

    def loss_ref(xw, w):
        return jnp.sum(_lstm_scan_reference(xw, w) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(xw, w_hh)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xw, w_hh)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pallas_lstm_bidir_matches_two_scans():
    import jax
    from dnn_based_source_separation_tpu.ops.pallas_lstm import lstm_scan_bidir

    rng = np.random.default_rng(4)
    B, T, H = 2, 19, 8
    xw_f = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
    xw_b = jnp.asarray(rng.standard_normal((B, T, 4 * H)), jnp.float32)
    w_f = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)
    w_b = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.3, jnp.float32)

    hs_f, hs_b = lstm_scan_bidir(xw_f, xw_b, w_f, w_b, True)
    np.testing.assert_allclose(
        np.asarray(hs_f), np.asarray(_lstm_scan_reference(xw_f, w_f)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hs_b), np.asarray(_lstm_scan_reference(xw_b, w_b)), atol=1e-5)

    def loss_fused(args):
        h0, h1 = lstm_scan_bidir(*args, True)
        return jnp.sum(h0 ** 2) + jnp.sum(jnp.abs(h1))

    def loss_ref(args):
        xwf, xwb, wf, wb = args
        return (jnp.sum(_lstm_scan_reference(xwf, wf) ** 2)
                + jnp.sum(jnp.abs(_lstm_scan_reference(xwb, wb))))

    g1 = jax.grad(loss_fused)((xw_f, xw_b, w_f, w_b))
    g2 = jax.grad(loss_ref)((xw_f, xw_b, w_f, w_b))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_lstm_module_fused_bidir_matches_scan_path():
    """LSTM flax module: pallas fused-bidir path == lax.scan path."""
    import os

    import jax
    from dnn_based_source_separation_tpu.ops.rnn import LSTM

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 11, 6)), jnp.float32)
    model = LSTM(hidden_size=5, num_layers=2, bidirectional=True)
    params = model.init(jax.random.PRNGKey(0), x)

    os.environ["DNNTPU_PALLAS_LSTM"] = "1"
    try:
        out_fused = model.apply(params, x)
    finally:
        os.environ["DNNTPU_PALLAS_LSTM"] = "0"
    out_scan = model.apply(params, x)
    del os.environ["DNNTPU_PALLAS_LSTM"]
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_scan), atol=1e-5)


def test_pallas_lstm_batch_tiled_path():
    """Large-batch shapes tile the batch axis (the DPTNet VMEM-OOM case):
    force a tiny budget so b_tile < B and a non-multiple batch is padded."""
    from dnn_based_source_separation_tpu.ops import pallas_lstm as PL

    b_tile, chunk = PL._tile_plan(T=16, B=100, four_h=64, itemsize=4, budget=8192)
    assert b_tile < 100 and chunk == 1

    rng = np.random.default_rng(11)
    B, T, H = 100, 6, 8
    xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.2, jnp.float32)

    orig = PL._VMEM_BLOCK_BYTES
    PL._VMEM_BLOCK_BYTES = 4 * H * 4 * 16  # forces b_tile=16, pad to 112
    try:
        out = PL.lstm_scan(xw, w, True)
        hs_f, hs_b = PL.lstm_scan_bidir(xw, xw[:, ::-1], w, w, True)
    finally:
        PL._VMEM_BLOCK_BYTES = orig
    ref = _lstm_scan_reference(xw, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hs_b),
        np.asarray(_lstm_scan_reference(xw[:, ::-1], w)), atol=1e-5)


def _gru_scan_reference(xw, w_hh, b_hh):
    import jax

    B, T, three_h = xw.shape
    H = three_h // 3

    def step(h, xt):
        hw = jnp.dot(h, w_hh) + b_hh
        r = jax.nn.sigmoid(xt[:, :H] + hw[:, :H])
        z = jax.nn.sigmoid(xt[:, H:2 * H] + hw[:, H:2 * H])
        n = jnp.tanh(xt[:, 2 * H:] + r * hw[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    import jax.lax as lax

    _, hs = lax.scan(step, jnp.zeros((B, H), xw.dtype), jnp.swapaxes(xw, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def test_pallas_gru_bidir_matches_scans():
    import jax

    from dnn_based_source_separation_tpu.ops.pallas_lstm import gru_scan_bidir

    rng = np.random.default_rng(12)
    B, T, H = 5, 9, 8
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    xw_f, xw_b = mk(B, T, 3 * H), mk(B, T, 3 * H)
    w_f, w_b = mk(H, 3 * H), mk(H, 3 * H)
    b_f, b_b = mk(3 * H), mk(3 * H)

    hs_f, hs_b = gru_scan_bidir(xw_f, xw_b, w_f, w_b, b_f, b_b, True)
    np.testing.assert_allclose(
        np.asarray(hs_f), np.asarray(_gru_scan_reference(xw_f, w_f, b_f)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hs_b), np.asarray(_gru_scan_reference(xw_b, w_b, b_b)), atol=1e-5)

    def loss_fused(*args):
        h0, h1 = gru_scan_bidir(*args, True)
        return jnp.sum(h0 ** 2) + jnp.sum(jnp.abs(h1))

    def loss_ref(xwf, xwb, wf, wb, bf, bb):
        return (jnp.sum(_gru_scan_reference(xwf, wf, bf) ** 2)
                + jnp.sum(jnp.abs(_gru_scan_reference(xwb, wb, bb))))

    args = (xw_f, xw_b, w_f, w_b, b_f, b_b)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
