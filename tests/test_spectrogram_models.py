"""Spectrogram-family tests: UMX, ParallelUMX, X-UMX."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models.umx import OpenUnmix, ParallelOpenUnmix
from dnn_based_source_separation_tpu.models.xumx import CrossNetOpenUnmix


def test_umx_masks_input():
    model = OpenUnmix(in_channels=2, hidden_channels=16, num_layers=1, n_bins=33, max_bin=20)
    x = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal((2, 2, 33, 10))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == x.shape
    assert np.all(np.asarray(y) >= 0)


def test_umx_batchnorm_train_updates_stats():
    model = OpenUnmix(in_channels=1, hidden_channels=8, num_layers=1, n_bins=17)
    x = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal((2, 1, 17, 8))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in vars_
    y, updates = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = np.asarray(vars_["batch_stats"]["block"]["norm"]["mean"])
    after = np.asarray(updates["batch_stats"]["block"]["norm"]["mean"])
    assert not np.allclose(before, after)


def test_parallel_umx_stems():
    model = ParallelOpenUnmix(in_channels=1, hidden_channels=8, num_layers=1, n_bins=17)
    x = jnp.asarray(np.abs(np.random.default_rng(2).standard_normal((1, 1, 1, 17, 6))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 4, 1, 17, 6)


def test_xumx_bridge_and_no_bridge():
    for bridge in (True, False):
        model = CrossNetOpenUnmix(
            in_channels=2, hidden_channels=8, num_layers=1, n_bins=17, max_bin=10, bridge=bridge,
        )
        x = jnp.asarray(np.abs(np.random.default_rng(3).standard_normal((1, 1, 2, 17, 6))), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(vars_, x)
        assert y.shape == (1, 4, 2, 17, 6)
        assert np.all(np.isfinite(np.asarray(y)))


def test_umx_train_step_with_batch_stats():
    """The generic train step must thread batch_stats through updates."""
    from dnn_based_source_separation_tpu.criterion import MSELoss
    from dnn_based_source_separation_tpu.train import make_optimizer, make_train_step

    model = OpenUnmix(in_channels=1, hidden_channels=8, num_layers=1, n_bins=17)
    rng = np.random.default_rng(4)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 1, 17, 8))), jnp.float32)
    target = jnp.asarray(np.abs(rng.standard_normal((2, 1, 17, 8))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(vars_["params"])
    step = make_train_step(model, MSELoss(), opt, train_kwargs={"train": True})
    new_vars, opt_state, loss = step(vars_, opt_state, x, target)
    assert "batch_stats" in new_vars
    assert np.isfinite(float(loss))


def test_umx_train_step_sharded_with_batch_stats():
    """batch_stats models must train correctly under mesh sharding too."""
    import jax

    from dnn_based_source_separation_tpu.criterion import MSELoss
    from dnn_based_source_separation_tpu.parallel import make_mesh, shard_batch
    from dnn_based_source_separation_tpu.train import make_optimizer, make_train_step

    mesh = make_mesh(8)
    model = OpenUnmix(in_channels=1, hidden_channels=8, num_layers=1, n_bins=17)
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.abs(rng.standard_normal((8, 1, 17, 8))), jnp.float32)
    target = jnp.asarray(np.abs(rng.standard_normal((8, 1, 17, 8))), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(vars_["params"])

    step_sharded = make_train_step(model, MSELoss(), opt, mesh=mesh, train_kwargs={"train": True})
    step_single = make_train_step(model, MSELoss(), opt, train_kwargs={"train": True})

    batch = shard_batch(mesh, (x, target))
    v1, _, loss_sharded = step_sharded(vars_, opt_state, *batch)

    vars2 = model.init(jax.random.PRNGKey(0), x)
    opt_state2 = opt.init(vars2["params"])
    v2, _, loss_single = step_single(vars2, opt_state2, x, target)

    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-5)
    a = np.asarray(v1["batch_stats"]["block"]["norm"]["mean"])
    b = np.asarray(v2["batch_stats"]["block"]["norm"]["mean"])
    np.testing.assert_allclose(a, b, atol=1e-5)
