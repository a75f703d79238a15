"""Dual-path family tests: DPRNN-TasNet, LSTM-TasNet, SepFormer, DPTNet, GALRNet."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import (
    DPRNNTasNet,
    DPTNet,
    GALRNet,
    LSTMTasNet,
    SepFormer,
)
from dnn_based_source_separation_tpu.ops.rnn import LSTM, GRU, SRU
from dnn_based_source_separation_tpu.models.base import save_model, load_model

import torch


def test_lstm_matches_torch():
    """Our fused-gate scan must reproduce torch.nn.LSTM numerics exactly."""
    B, T, F, H = 3, 12, 5, 7
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, F)).astype(np.float32)

    model = LSTM(hidden_size=H, bidirectional=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = torch.nn.LSTM(F, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        p = params["params"]
        ref.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih_l0"]).T))
        ref.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh_l0"]).T))
        ref.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_l0"])))
        ref.bias_hh_l0.zero_()
        ref.weight_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(p["w_ih_l0_reverse"]).T))
        ref.weight_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(p["w_hh_l0_reverse"]).T))
        ref.bias_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(p["b_l0_reverse"])))
        ref.bias_hh_l0_reverse.zero_()
        expected, _ = ref(torch.from_numpy(x))

    ours = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)


def test_gru_matches_torch():
    B, T, F, H = 2, 10, 4, 6
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, F)).astype(np.float32)

    model = GRU(hidden_size=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = torch.nn.GRU(F, H, batch_first=True)
    with torch.no_grad():
        p = params["params"]
        ref.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih_l0"]).T))
        ref.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh_l0"]).T))
        ref.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_ih_l0"])))
        ref.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["b_hh_l0"])))
        expected, _ = ref(torch.from_numpy(x))

    ours = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(), atol=1e-5)


def _sru_sequential_reference(x, w, b, w_hx=None):
    """Step-by-step SRU light recurrence (the O(T) definition) in numpy."""
    B, T, F = x.shape
    H = w.shape[1] // 3
    u = x @ w
    xt, fp, rp = u[..., :H], u[..., H : 2 * H], u[..., 2 * H :]
    bf, br = b[:H], b[H:]
    hw = x if w_hx is None else x @ w_hx
    c = np.zeros((B, H), np.float32)
    hs = np.zeros((B, T, H), np.float32)
    for t in range(T):
        f = 1.0 / (1.0 + np.exp(-(fp[:, t] + bf)))
        r = 1.0 / (1.0 + np.exp(-(rp[:, t] + br)))
        c = f * c + (1.0 - f) * xt[:, t]
        hs[:, t] = r * c + (1.0 - r) * hw[:, t]
    return hs


def test_sru_parallel_scan_matches_sequential():
    """The associative-scan evaluation must equal the O(T) step recurrence."""
    B, T, F, H = 3, 50, 5, 7
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, T, F)).astype(np.float32)

    model = SRU(hidden_size=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = params["params"]
    expected = _sru_sequential_reference(
        x, np.asarray(p["w_ih_l0"]), np.asarray(p["b_l0"]),
        np.asarray(p["w_hx_l0"]))

    ours = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_sru_highway_identity_when_widths_match():
    """F == H uses x itself as the highway term (no w_hx parameter)."""
    B, T, H = 2, 16, 6
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    model = SRU(hidden_size=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "w_hx_l0" not in params["params"]
    expected = _sru_sequential_reference(
        x, np.asarray(params["params"]["w_ih_l0"]),
        np.asarray(params["params"]["b_l0"]))
    np.testing.assert_allclose(
        np.asarray(model.apply(params, jnp.asarray(x))), expected, atol=1e-5)


def test_sru_unidirectional_is_causal():
    B, T, F, H = 2, 24, 4, 5
    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    model = SRU(hidden_size=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    base = np.asarray(model.apply(params, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, T // 2 :] += 10.0
    pert = np.asarray(model.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(pert[:, : T // 2], base[:, : T // 2], atol=1e-6)
    assert np.abs(pert[:, T // 2 :] - base[:, T // 2 :]).max() > 1e-3


def test_sru_bidirectional_stacked_jit_and_grad():
    B, T, F, H = 2, 12, 4, 6
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    model = SRU(hidden_size=H, num_layers=2, bidirectional=True)
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (B, T, 2 * H)

    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_dprnn_tasnet_sru_forward():
    model = DPRNNTasNet(
        n_basis=16, kernel_size=8, stride=4,
        sep_num_blocks=2, sep_chunk_size=10, sep_hop_size=5,
        sep_hidden_channels=12, sep_bottleneck_channels=8,
        rnn_type="sru", n_sources=2,
    )
    x = jnp.zeros((2, 1, 320), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 2, 320)


@pytest.mark.parametrize(
    "model",
    [
        DPRNNTasNet(
            n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
            dec_basis="trainable", enc_nonlinear="relu",
            sep_bottleneck_channels=8, sep_hidden_channels=8,
            sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=2,
            causal=False, n_sources=2,
        ),
        LSTMTasNet(
            n_basis=16, kernel_size=8, stride=4, enc_basis="trainableGated",
            dec_basis="trainable", sep_num_blocks=2, sep_num_layers=1,
            sep_hidden_channels=12, causal=False, n_sources=2,
        ),
        SepFormer(
            n_basis=16, kernel_size=4, stride=2, enc_nonlinear="relu",
            sep_bottleneck_channels=8, sep_chunk_size=10, sep_hop_size=5,
            sep_num_blocks=1, sep_num_layers_intra=1, sep_num_layers_inter=1,
            sep_num_heads_intra=2, sep_num_heads_inter=2,
            sep_d_ff_intra=16, sep_d_ff_inter=16, n_sources=2,
        ),
        DPTNet(
            n_basis=16, kernel_size=4, stride=2, enc_nonlinear="relu",
            sep_bottleneck_channels=8, sep_hidden_channels=8,
            sep_chunk_size=10, sep_num_blocks=2, sep_num_heads=2,
            causal=False, n_sources=2,
        ),
        GALRNet(
            n_basis=16, kernel_size=4, stride=2, enc_nonlinear="relu",
            sep_hidden_channels=8, sep_chunk_size=10, sep_hop_size=5,
            sep_down_chunk_size=4, sep_num_blocks=2, sep_num_heads=2,
            low_dimension=True, causal=False, n_sources=2,
        ),
    ],
    ids=["dprnn", "lstm-tasnet", "sepformer", "dptnet", "galrnet"],
)
def test_dual_path_forward_shapes(model):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 160)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, 160)
    assert np.all(np.isfinite(np.asarray(y)))


def test_dprnn_checkpoint_roundtrip(tmp_path):
    model = DPRNNTasNet(
        n_basis=16, kernel_size=4, stride=2, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=8, sep_hidden_channels=8,
        sep_chunk_size=10, sep_hop_size=5, sep_num_blocks=1,
        causal=False, n_sources=2,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 160)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y0 = model.apply(params, x)
    path = str(tmp_path / "m.ckpt")
    save_model(path, model, params)
    model2, params2, _ = load_model(path)
    y1 = model2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_tasnet_base_fourier_reconstruction():
    """Fourier autoencoder reconstructs the interior exactly (reference
    _test_fourier harness, src/models/filterbank.py:440-509)."""
    from dnn_based_source_separation_tpu.models.lstm_tasnet import TasNetBase

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, 160)), jnp.float32)
    for onesided, return_complex, h in [(True, True, 17), (False, True, 16), (True, False, 18)]:
        m = TasNetBase(hidden_channels=h, kernel_size=16, stride=8,
                       onesided=onesided, return_complex=return_complex)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        err = float(jnp.linalg.norm(y[..., 16:-16] - x[..., 16:-16]) /
                    jnp.linalg.norm(x[..., 16:-16]))
        assert err < 1e-5, f"onesided={onesided} complex={return_complex}: {err}"


def test_deep_embedding_pp():
    from dnn_based_source_separation_tpu.models.deep_clustering import DeepEmbeddingPlus

    model = DeepEmbeddingPlus(n_bins=17, hidden_channels=8, embed_dim=4, num_layers=1)
    a = jnp.abs(jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, 17, 9)), jnp.float32))
    v = model.init(jax.random.PRNGKey(0), a)
    emb = model.apply(v, a)
    assert emb.shape == (2, 17, 9, 4)
    assert np.all((np.asarray(emb) >= 0) & (np.asarray(emb) <= 1))
