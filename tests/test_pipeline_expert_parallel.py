"""Pipeline (stage) and expert (per-stem) parallelism on the 8-device mesh.

Ground truth for every test is the sequential computation with the SAME
parameters — pipelining/expert placement must be a pure layout change.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnn_based_source_separation_tpu.parallel import make_mesh
from dnn_based_source_separation_tpu.parallel.expert import (
    ep_apply, ep_parallel_umx, stack_expert_params,
)
from dnn_based_source_separation_tpu.parallel.pipeline import (
    pipeline_apply, pp_tdcn_forward, stack_stage_params,
)


def _stage_mesh(n):
    return make_mesh(n, axis_names=("stage",))


# ---------------------------------------------------------------------------
# pipeline_apply
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_micro", [1, 4, 8])
def test_pipeline_dense_chain_matches_sequential(n_micro):
    """8 dense stages pipelined == applied in order."""
    assert len(jax.devices()) == 8
    mesh = _stage_mesh(8)
    rng = np.random.default_rng(0)
    B, F = 16, 12
    ws = jnp.asarray(rng.standard_normal((8, F, F)) * 0.3, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((8, F)) * 0.1, jnp.float32)
    params = {"w": ws, "b": bs}
    x = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)

    def stage_fn(p, a):
        return jnp.tanh(a @ p["w"] + p["b"])

    expected = x
    for i in range(8):
        expected = stage_fn({"w": ws[i], "b": bs[i]}, expected)

    got = pipeline_apply(mesh, stage_fn, params, x, n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_pipeline_pytree_activations_under_jit():
    """(x, skip) carry pytrees pipeline correctly, inside jit."""
    mesh = _stage_mesh(8)
    rng = np.random.default_rng(1)
    B, F = 8, 6
    ws = jnp.asarray(rng.standard_normal((8, F, F)) * 0.3, jnp.float32)
    params = {"w": ws}
    x = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)

    def stage_fn(p, act):
        h, skip = act
        h = jnp.tanh(h @ p["w"])
        return h, skip + h

    expected_h, expected_skip = x, jnp.zeros_like(x)
    for i in range(8):
        expected_h, expected_skip = stage_fn(
            {"w": ws[i]}, (expected_h, expected_skip))

    f = jax.jit(lambda p, a: pipeline_apply(
        mesh, stage_fn, p, a, n_microbatches=4))
    got_h, got_skip = f(params, (x, jnp.zeros_like(x)))
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(expected_h),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_skip),
                               np.asarray(expected_skip), atol=1e-5)


def test_pipeline_grad_matches_sequential():
    """Reverse-mode through the pipelined chain == sequential grads: the
    backward pass is itself pipelined (ppermute transposes to the reverse
    hop), so pp training steps are a pure layout change too."""
    mesh = _stage_mesh(8)
    rng = np.random.default_rng(5)
    B, F = 8, 5
    ws = jnp.asarray(rng.standard_normal((8, F, F)) * 0.3, jnp.float32)
    params = {"w": ws}
    x = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)

    def stage_fn(p, a):
        return jnp.tanh(a @ p["w"])

    def seq_loss(p, a):
        for i in range(8):
            a = stage_fn({"w": p["w"][i]}, a)
        return jnp.sum(a ** 2)

    def pp_loss(p, a):
        out = pipeline_apply(mesh, stage_fn, p, a, n_microbatches=4)
        return jnp.sum(out ** 2)

    g_seq = jax.grad(seq_loss)(params, x)
    g_pp = jax.jit(jax.grad(pp_loss))(params, x)
    np.testing.assert_allclose(np.asarray(g_pp["w"]), np.asarray(g_seq["w"]),
                               atol=1e-4)


def test_pipeline_rejects_indivisible_batch():
    mesh = _stage_mesh(8)
    x = jnp.zeros((6, 4))
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(mesh, lambda p, a: a, {"w": jnp.zeros((8, 1))}, x, 4)


def test_pp_tdcn_matches_sequential_blocks():
    """Conv-TasNet separator repeats pipelined over 8 stages == the chain."""
    from dnn_based_source_separation_tpu.models.tdcn import (
        TimeDilatedConvBlock1d,
    )

    mesh = _stage_mesh(8)
    B, T, Cb = 8, 40, 8
    block = TimeDilatedConvBlock1d(
        num_features=Cb, hidden_channels=12, skip_channels=6,
        kernel_size=3, num_layers=2, separable=True, causal=False,
        nonlinear="prelu", dual_head=True,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, Cb)), jnp.float32)
    per_stage = [
        block.init(jax.random.PRNGKey(i), x)["params"] for i in range(8)
    ]
    stacked = stack_stage_params(per_stage)

    expected_x, expected_skip = x, 0.0
    for p in per_stage:
        expected_x, s = block.apply({"params": p}, expected_x)
        expected_skip = expected_skip + s

    got = pp_tdcn_forward(mesh, block, stacked, x, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected_skip),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# ep_apply / ep_parallel_umx
# ---------------------------------------------------------------------------


def test_ep_apply_matches_stacked_sequential():
    mesh = make_mesh(8, axis_names=("expert",))
    rng = np.random.default_rng(3)
    B, F, O = 4, 10, 5
    ws = jnp.asarray(rng.standard_normal((8, F, O)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, F)), jnp.float32)

    def expert_fn(p, a):
        return jnp.tanh(a @ p["w"])

    expected = jnp.stack([expert_fn({"w": ws[i]}, x) for i in range(8)])
    got = ep_apply(mesh, expert_fn, {"w": ws}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_ep_apply_output_structure_differs_from_input():
    """Experts may emit a different pytree than they consume (e.g. a dict
    of heads); out_specs follows the OUTPUT structure."""
    mesh = make_mesh(8, axis_names=("expert",))
    rng = np.random.default_rng(6)
    ws = jnp.asarray(rng.standard_normal((8, 4, 3)) * 0.5, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)

    def expert_fn(p, a):
        y = a @ p["w"]
        return {"mask": jax.nn.sigmoid(y), "logit": y}

    got = ep_apply(mesh, expert_fn, {"w": ws}, x)
    assert set(got) == {"mask", "logit"}
    expected = jnp.stack([x @ ws[i] for i in range(8)])
    np.testing.assert_allclose(np.asarray(got["logit"]), np.asarray(expected),
                               atol=1e-5)


def test_ep_parallel_umx_matches_plain_forward():
    """Per-stem sharded ParallelOpenUnmix == the plain 4-stem forward,
    on a 2-D dp(2) x ep(4) mesh with the batch data-sharded."""
    from dnn_based_source_separation_tpu.models import ParallelOpenUnmix

    mesh = make_mesh(8, axis_names=("data", "expert"), shape=(2, 4))
    model = ParallelOpenUnmix(
        in_channels=2, hidden_channels=8, num_layers=1,
        n_bins=9, max_bin=7, dropout=0.0, causal=False,
    )
    rng = np.random.default_rng(4)
    spec = jnp.asarray(
        np.abs(rng.standard_normal((4, 1, 2, 9, 12))), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), spec)
    expected = model.apply(variables, spec)

    got = ep_parallel_umx(mesh, model, variables, spec, batch_axis="data")
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_stack_expert_params_roundtrip():
    trees = [{"a": jnp.full((2,), float(i)), "b": {"c": jnp.ones((3,)) * i}}
             for i in range(4)]
    stacked = stack_expert_params(trees)
    assert stacked["a"].shape == (4, 2)
    np.testing.assert_array_equal(
        np.asarray(stacked["b"]["c"][2]), np.asarray(trees[2]["b"]["c"]))
