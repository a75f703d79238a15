"""Attractor/embedding family tests: DANet, ADANet, DeepEmbedding, Chimera."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import (
    ADANet,
    ChimeraNet,
    DANet,
    DeepEmbedding,
    FixedAttractorDANet,
)


def _amp(seed=0, B=2, F=17, T=12):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.abs(rng.standard_normal((B, 1, F, T))), jnp.float32)


def test_danet_train_path_with_oracle_assignment():
    x = _amp()
    B, _, F, T = x.shape
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, size=(B, F, T))
    assignment = jnp.asarray(np.moveaxis(np.eye(2)[labels], -1, 1), jnp.float32)
    weight = jnp.ones((B, 1, F, T), jnp.float32)

    model = DANet(n_bins=F, embed_dim=8, hidden_channels=16, num_blocks=1)
    vars_ = model.init(jax.random.PRNGKey(0), x, assignment, weight)
    y = model.apply(vars_, x, assignment, weight)
    assert y.shape == (B, 2, F, T)


def test_danet_inference_kmeans_path():
    x = _amp(2)
    B, _, F, T = x.shape
    model = DANet(n_bins=F, embed_dim=8, hidden_channels=16, num_blocks=1)
    labels = np.zeros((B, F, T), int)
    assignment = jnp.asarray(np.moveaxis(np.eye(2)[labels], -1, 1), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, assignment)
    y = model.apply(vars_, x, None, None, 2)  # clustering inference
    assert y.shape == (B, 2, F, T)
    assert np.all(np.isfinite(np.asarray(y)))


def test_fixed_attractor_danet():
    x = _amp(3)
    B, _, F, T = x.shape
    model = FixedAttractorDANet(n_bins=F, embed_dim=8, hidden_channels=16, num_blocks=1, n_sources=2)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (B, 2, F, T)


def test_adanet_selects_combination():
    x = _amp(4)
    B, _, F, T = x.shape
    model = ADANet(n_bins=F, embed_dim=8, hidden_channels=16, num_blocks=1, num_anchors=4)
    vars_ = model.init(jax.random.PRNGKey(0), x, None, 2)
    y = model.apply(vars_, x, None, 2)
    assert y.shape == (B, 2, F, T)


def test_deep_embedding_unit_norm():
    x = _amp(5)
    B, _, F, T = x.shape
    model = DeepEmbedding(n_bins=F, hidden_channels=16, embed_dim=6, num_layers=1)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(vars_, x)
    assert emb.shape == (B, F, T, 6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)


def test_chimera_outputs():
    x = _amp(6)
    B, _, F, T = x.shape
    model = ChimeraNet(n_bins=F, hidden_channels=16, embed_dim=6, num_layers=1, n_sources=2)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    mask, emb = model.apply(vars_, x)
    assert mask.shape == (B, 2, F, T)
    np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 1.0, atol=1e-4)
    assert emb.shape == (B, F, T, 6)
