"""D3Net tests: D2/D3 blocks, backbone, full multi-band model, multidilated conv."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.d3net import D2Block, D3Block, D3Net
from dnn_based_source_separation_tpu.ops.multidilated import MultiDilatedConv2d


def test_d2block_shape():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 8, 3)), jnp.float32)
    block = D2Block(growth_rate=[2, 3, 4], kernel_size=3)
    vars_ = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(vars_, x)
    assert y.shape == (1, 16, 8, 4)  # last growth rate


def test_d3block_shape():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 8, 3)), jnp.float32)
    block = D3Block(growth_rate=[2, 3], kernel_size=3, depth=2)
    vars_ = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(vars_, x)
    assert y.shape == (1, 16, 8, 3)


def test_multidilated_conv():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 8, 6)), jnp.float32)
    conv = MultiDilatedConv2d(out_channels=4, kernel_size=3, groups=3)
    vars_ = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply(vars_, x)
    assert y.shape == (1, 16, 8, 4)


def test_d3net_full_model():
    band = lambda v: {"low": v, "middle": v, "full": v}
    model = D3Net(
        in_channels=2,
        num_features=band(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]},
        kernel_size=band(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band((2, 2)),
        num_d2blocks={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2, 2, 2]},
        depth={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2, 2, 2]},
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    x = jnp.asarray(np.abs(np.random.default_rng(3).standard_normal((1, 2, 32, 16))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
