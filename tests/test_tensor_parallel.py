"""Tensor-parallel (Megatron col/row sharding) tests on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_based_source_separation_tpu.parallel.mesh import make_mesh
from dnn_based_source_separation_tpu.parallel.tensor import tp_dense_block


@pytest.fixture()
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_names=("data", "model"), shape=(2, 4))


def _dense_ref(x, w1, b1, w2, b2):
    return jnp.tanh(x @ w1 + b1) @ w2 + b2


def test_tp_dense_block_matches_unsharded(mesh2d):
    rng = np.random.default_rng(0)
    F, H, O = 16, 32, 8  # H divisible by model axis size 4
    x = jnp.asarray(rng.standard_normal((6, 10, F)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((F, H)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, O)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(O) * 0.1, jnp.float32)

    got = tp_dense_block(mesh2d, x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_dense_ref(x, w1, b1, w2, b2)),
        rtol=2e-5, atol=2e-5)


def test_tp_dense_block_grads_match(mesh2d):
    rng = np.random.default_rng(1)
    F, H, O = 8, 16, 4
    x = jnp.asarray(rng.standard_normal((3, 5, F)), jnp.float32)
    args = [
        jnp.asarray(rng.standard_normal((F, H)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((H, O)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(O) * 0.1, jnp.float32),
    ]

    g_tp = jax.grad(lambda *a: jnp.sum(tp_dense_block(mesh2d, x, *a) ** 2), argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(lambda *a: jnp.sum(_dense_ref(x, *a) ** 2), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_tp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_tp_composes_with_jit_and_data_sharding(mesh2d):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(2)
    F, H, O = 8, 16, 4
    x = jnp.asarray(rng.standard_normal((4, 5, F)), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh2d, P("data")))
    args = [
        jnp.asarray(rng.standard_normal((F, H)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((H, O)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(O) * 0.1, jnp.float32),
    ]
    f = jax.jit(lambda x, *a: tp_dense_block(mesh2d, x, *a))
    np.testing.assert_allclose(
        np.asarray(f(x, *args)), np.asarray(_dense_ref(x, *args)),
        rtol=2e-5, atol=2e-5)


def test_tp_openunmix_forward_matches_plain():
    """TP-sharded UMX transform blocks inside the REAL model forward
    (round-2 verdict #6): TPOpenUnmix loads the plain model's variables
    verbatim and must reproduce its output on the (data, model) mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnn_based_source_separation_tpu.models import OpenUnmix
    from dnn_based_source_separation_tpu.parallel.mesh import make_mesh
    from dnn_based_source_separation_tpu.parallel.tensor import TPOpenUnmix

    mesh = make_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    kwargs = dict(in_channels=2, hidden_channels=8, num_layers=2,
                  n_bins=33, max_bin=24, causal=False)
    plain = OpenUnmix(dropout=0.0, **kwargs)
    x = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal((2, 2, 33, 12))),
                    jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)
    expected = plain.apply(variables, x)

    tp = TPOpenUnmix(mesh=mesh, **kwargs)
    ours = jax.jit(lambda v, a: tp.apply(v, a))(variables, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)
