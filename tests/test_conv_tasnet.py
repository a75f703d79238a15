"""Conv-TasNet model tests: shapes, configs, jit, checkpoint round trip."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import ConvTasNet
from dnn_based_source_separation_tpu.models.base import save_model, load_model


def tiny_model(**over):
    kw = dict(
        n_basis=16,
        kernel_size=8,
        stride=4,
        enc_basis="trainable",
        dec_basis="trainable",
        enc_nonlinear="relu",
        sep_hidden_channels=16,
        sep_bottleneck_channels=8,
        sep_skip_channels=8,
        sep_num_blocks=2,
        sep_num_layers=2,
        causal=False,
        n_sources=2,
    )
    kw.update(over)
    return ConvTasNet(**kw)


def test_forward_shape():
    model = tiny_model()
    x = jnp.zeros((2, 1, 320))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, 320)


def test_forward_shape_unaligned_length():
    model = tiny_model()
    x = jnp.zeros((1, 1, 333))  # not on the stride grid
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 2, 333)


def test_jit_compiles_and_matches_eager():
    model = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 160)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    eager = model.apply(params, x)
    jitted = jax.jit(model.apply)(params, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_causal_and_noncausal(causal):
    model = tiny_model(causal=causal)
    x = jnp.zeros((1, 1, 160))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 2, 160)


def test_fourier_basis_variant():
    model = tiny_model(
        n_basis=17, kernel_size=16, stride=8,  # odd for onesided+complex
        enc_basis="Fourier", dec_basis="Fourier", enc_nonlinear=None,
        enc_onesided=True, enc_return_complex=True, window_fn="hann",
    )
    x = jnp.zeros((1, 1, 160))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 2, 160)


def test_pinv_decoder_variant():
    model = tiny_model(dec_basis="pinv", enc_nonlinear=None)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 160)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 2, 160)


def test_softmax_masks_sum_to_one():
    model = tiny_model(mask_nonlinear="softmax")
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 1, 160)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    _, latent = model.apply(params, x, method=model.extract_latent)
    assert latent.shape[1] == 2


def test_config_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, 160)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y0 = model.apply(params, x)

    path = os.path.join(tmp_path, "best.ckpt")
    save_model(path, model, params, extra={"epoch": 3})
    model2, params2, extra = load_model(path)
    assert extra["epoch"] == 3
    assert model2.get_config() == model.get_config()
    y1 = model2.apply(params2, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_num_parameters_counts():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 160)))
    n = model.num_parameters(params)
    assert n > 1000
