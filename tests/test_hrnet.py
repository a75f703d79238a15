"""HRNet tests."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.hrnet import HRNet


def test_hrnet_shape():
    model = HRNet(in_channels=2, hidden_channels=(4, 8), bottleneck_channels=4,
                  num_stacks=1, in_num_stacks=1, out_num_stacks=1)
    x = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal((1, 2, 16, 20))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.asarray(y) >= 0)  # relu mask x nonneg input


def test_hrnet_three_levels():
    model = HRNet(in_channels=1, hidden_channels=(4, 6, 8), bottleneck_channels=4,
                  num_stacks=1, in_num_stacks=1, out_num_stacks=1)
    x = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal((2, 1, 32, 24))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
