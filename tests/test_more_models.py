"""Tests for WaveNet, MRX, UNet1d/2d, ConditionedUNet2d, FiLM/PoCM."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import (
    ConditionedUNet2d,
    MultiResolutionCrossNet,
    UNet1d,
    UNet2d,
    WaveNet,
)
from dnn_based_source_separation_tpu.models.film import film, gpocm, pocm


def test_wavenet_shapes_and_causality():
    model = WaveNet(in_channels=1, out_channels=8, hidden_channels=8,
                    skip_channels=8, num_blocks=1, num_layers=3, causal=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 64)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 8, 64)
    # Causality: changing the future must not change the past.
    x2 = np.asarray(x).copy()
    x2[..., 40:] = 5.0
    y2 = model.apply(vars_, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y)[..., :40], np.asarray(y2)[..., :40], atol=1e-5)


def test_wavenet_global_conditioning():
    model = WaveNet(in_channels=1, out_channels=4, hidden_channels=8,
                    skip_channels=8, num_blocks=1, num_layers=2,
                    conditioning="global", enc_dim=6)
    x = jnp.zeros((2, 1, 32))
    h = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, h)
    y = model.apply(vars_, x, h)
    assert y.shape == (2, 4, 32)


def test_mrx_shapes():
    model = MultiResolutionCrossNet(
        in_channels=1, hidden_channels=16, num_layers=1,
        n_fft=(32, 64), hop_length=16, sources=("music", "speech", "sfx"),
    )
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 1, 800)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 3, 1, 800)


def test_unet2d_shape():
    model = UNet2d(channels=[1, 4, 8], kernel_size=(3, 3), stride=(2, 2))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, 16, 20)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape


def test_unet1d_shape():
    model = UNet1d(channels=[1, 4, 8], kernel_size=4, stride=2, out_channels=2)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 1, 64)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 2, 64)


def test_cunet_film_conditioning_changes_output():
    model = ConditionedUNet2d(
        channels=[1, 4, 8], kernel_size=(3, 3), stride=(2, 2),
        control_channels=(4, 8), masking=True,
    )
    x = jnp.asarray(np.abs(np.random.default_rng(5).standard_normal((1, 1, 16, 20))), jnp.float32)
    onehot_a = jnp.asarray([[1, 0, 0, 0]], jnp.float32)
    onehot_b = jnp.asarray([[0, 1, 0, 0]], jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, onehot_a)
    ya = model.apply(vars_, x, onehot_a)
    yb = model.apply(vars_, x, onehot_b)
    assert ya.shape == x.shape
    assert not np.allclose(np.asarray(ya), np.asarray(yb))


def test_film_pocm_functions():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 5, 6, 3)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    assert film(x, g, b).shape == x.shape

    gm = jnp.asarray(rng.standard_normal((2, 4, 3)), jnp.float32)
    bm = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    assert pocm(x, gm, bm).shape == (2, 5, 6, 4)

    gs = jnp.asarray(rng.standard_normal((2, 3, 3)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    assert gpocm(x, gs, bs).shape == x.shape


def test_tdc_cunet_choi_shapes_and_conditioning():
    """cunet_choi TDC U-Net (reference egs/musdb18/cunet_choi/src/
    adhoc_model.py:_test_tdc_cunet shape contract, scaled down)."""
    from dnn_based_source_separation_tpu.models import TDCUNet2d

    model = TDCUNet2d(
        channels=[1, 4, 6, 8], kernel_size=3, control_channels=(4, 8),
        conditioning="film", masking=True,
    )
    x = jnp.asarray(np.abs(np.random.default_rng(7).standard_normal((2, 1, 16, 12))), jnp.float32)
    onehot_a = jnp.asarray(np.tile([[1, 0, 0, 0]], (2, 1)), jnp.float32)
    onehot_b = jnp.asarray(np.tile([[0, 1, 0, 0]], (2, 1)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, onehot_a)
    ya = model.apply(vars_, x, onehot_a)
    yb = model.apply(vars_, x, onehot_b)
    assert ya.shape == x.shape
    assert not np.allclose(np.asarray(ya), np.asarray(yb))


def test_tdc_cunet_choi_gpocm():
    from dnn_based_source_separation_tpu.models import TDCUNet2d

    model = TDCUNet2d(
        channels=[1, 4, 6], kernel_size=3, control_channels=(4, 8),
        conditioning="gpocm",
    )
    x = jnp.asarray(np.random.default_rng(8).standard_normal((1, 1, 8, 8)), jnp.float32)
    onehot = jnp.asarray([[0, 0, 1, 0]], jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(1), x, onehot)
    y = model.apply(vars_, x, onehot)
    assert y.shape == x.shape
