"""Tests for Meta-TasNet, FurcaNet, LaSAFT, vision extras."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import (
    FurcaNet,
    MetaTasNet,
    MLPMixer,
    PoolFormer,
    TFCLaSAFT,
    ViT,
)


def test_meta_tasnet_generated_weights():
    model = MetaTasNet(
        n_basis=16, kernel_size=8, embed_dim=6, bottleneck_channels=6,
        sep_hidden_channels=12, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, n_sources=3,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 160)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 3, 160)
    assert np.all(np.isfinite(np.asarray(y)))


def test_furcanet():
    model = FurcaNet(conv_hidden_channels=8, rnn_hidden_channels=8,
                     num_conv_blocks=2, num_rnn_blocks=1, n_sources=2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 64)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 2, 64)


def test_tfc_lasaft():
    model = TFCLaSAFT(growth_rate=5, hidden_dim=8, n_bins=16, bottleneck_bins=6,
                      kernel_size=(3, 3), num_layers=2, num_heads=2)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 10, 3)), jnp.float32)
    emb = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, emb)
    y = model.apply(vars_, x, emb)
    assert y.shape == (2, 16, 10, 5)
    # Conditioning must change the output.
    emb2 = emb + 1.0
    y2 = model.apply(vars_, x, emb2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_vision_models():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 16, 16, 1)), jnp.float32)
    for model in (
        MLPMixer(patch_size=(4, 4), dim=8, depth=1, tokens_hidden=4, channels_hidden=16, num_classes=3),
        PoolFormer(patch_size=(4, 4), dim=8, depth=1, mlp_hidden=16, num_classes=3),
        ViT(patch_size=(4, 4), dim=8, depth=1, num_heads=2, mlp_hidden=16, num_classes=3),
    ):
        vars_ = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(vars_, x)
        assert y.shape == (2, 3)


def test_vision_embed_checkpoint_migration():
    """Advisor round-2 low: PatchEmbedding2d moved the kernel under
    embed/proj/*; old flax param trees (embed/kernel) must migrate."""
    from flax.core import unfreeze
    from flax.serialization import from_state_dict, to_state_dict

    from dnn_based_source_separation_tpu.models.base import _migrate_vision_embed

    model = MLPMixer(patch_size=(4, 4), dim=8, depth=1, tokens_hidden=4,
                     channels_hidden=16, num_classes=3)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 16, 16, 1)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y_ref = model.apply(vars_, x)

    # Forge the pre-rename layout: hoist embed/proj/* up to embed/*.
    state = to_state_dict(unfreeze(vars_))
    state["params"]["embed"] = state["params"]["embed"]["proj"]
    migrated = _migrate_vision_embed(state)
    restored = from_state_dict(vars_, migrated)
    y = model.apply(restored, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref))
