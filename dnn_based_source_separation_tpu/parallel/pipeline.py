"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference has no pipeline parallelism (`nn.DataParallel` is its whole
story, SURVEY.md §2.3); this is the TPU-native staging path for the one
model whose depth partitions naturally — Conv-TasNet's TDCN separator,
whose R repeats (reference `src/models/tdcn.py:13-41`) are R structurally
identical blocks chained through a (features, skip-sum) carry.

Mechanics (the standard collective-pipelining recipe):
  * stage parameters are STACKED on a leading axis and sharded over the
    mesh 'stage' axis — each device holds exactly one stage's weights;
  * the batch is split into M microbatches; a `lax.scan` runs
    M + n_stages - 1 ticks. Each tick every device applies its stage to
    the activation it holds, then a single `ppermute` shifts activations
    one hop down the chain (neighbour traffic only — rides ICI);
  * stage 0 feeds itself microbatch t on tick t; the last stage emits
    microbatch t - (n_stages-1) on tick t. The warm-up/drain bubble is
    (n_stages-1)/(M + n_stages - 1) of the ticks — choose M >= 4x stages.

Everything is a static-shape scan: XLA sees one compiled program with a
per-tick ppermute, no data-dependent control flow.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _tree_spec(tree: Any, spec: P) -> Any:
    return jax.tree_util.tree_map(lambda _: spec, tree)


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    n_microbatches: int,
    axis: str = "stage",
) -> Any:
    """Run `n_stages` chained stages over the mesh `axis`, microbatched.

    stage_fn(params_i, act) -> act' must be shape-homogeneous: activations
    enter and leave every stage with the same pytree structure/shapes
    (chain-of-identical-blocks models; the TDCN carry is (features, skip)).

    stacked_params: pytree whose leaves carry a leading `n_stages` dim
    (stage i's weights at index i); sharded over `axis`, one stage per
    device. x: activation pytree whose leaves have a leading batch dim
    divisible by n_microbatches. Returns the pipelined equivalent of
        for i in range(n_stages): x = stage_fn(params[i], x)
    replicated across the mesh.
    """
    n_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(x)
    batch = leaves[0].shape[0]
    if batch % n_microbatches:
        raise ValueError(
            f"batch {batch} not divisible by n_microbatches {n_microbatches}")
    mb = batch // n_microbatches
    # (B, ...) -> (M, mb, ...): tick t consumes slot t.
    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((n_microbatches, mb) + a.shape[1:]), x)

    n_ticks = n_microbatches + n_stages - 1
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def pipelined(params, micro):
        params = jax.tree_util.tree_map(lambda p: p[0], params)  # this stage
        stage = jax.lax.axis_index(axis)
        zero_act = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), micro)
        outputs = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), micro)

        def tick(carry, t):
            recv, outputs = carry
            # Stage 0 ingests microbatch t (clamped: past-the-end ticks
            # reread the last microbatch; their results never surface).
            t_in = jnp.minimum(t, n_microbatches - 1)
            feed = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, t_in, keepdims=False),
                micro)
            inp = jax.tree_util.tree_map(
                lambda f, r: jnp.where(stage == 0, f, r), feed, recv)
            out = stage_fn(params, inp)
            # Last stage owns microbatch t-(n_stages-1) on this tick. The
            # index is clamped at 0: warm-up ticks write garbage to slot 0
            # and the valid tick (t = n_stages-1) overwrites it last.
            t_out = jnp.maximum(t - (n_stages - 1), 0)
            outputs = jax.tree_util.tree_map(
                lambda buf, o: jax.lax.dynamic_update_index_in_dim(
                    buf, o, t_out, axis=0),
                outputs, out)
            # One-hop shift down the chain; stage 0 receives zeros (unused).
            recv = jax.tree_util.tree_map(
                lambda o: jax.lax.ppermute(o, axis, fwd_perm), out)
            return (recv, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (zero_act, outputs), jnp.arange(n_ticks))
        # Only the last stage's buffer is the real result; replicate it.
        mask = (stage == n_stages - 1).astype(leaves[0].dtype)
        outputs = jax.tree_util.tree_map(
            lambda o: jax.lax.psum(o * mask.astype(o.dtype), axis), outputs)
        return outputs

    out_mb = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(_tree_spec(stacked_params, P(axis)), _tree_spec(x_mb, P())),
        out_specs=_tree_spec(x_mb, P()),
        check_rep=False,
    )(stacked_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((batch,) + a.shape[2:]), out_mb)


def stack_stage_params(per_stage: list) -> Any:
    """Stack identical-structure per-stage param trees on a leading axis."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_stage)


# ---------------------------------------------------------------------------
# The flagship wiring: Conv-TasNet's TDCN repeats as pipeline stages.
# ---------------------------------------------------------------------------


def pp_tdcn_forward(
    mesh: Mesh,
    block: "flax.linen.Module",  # noqa: F821 - a TimeDilatedConvBlock1d
    stacked_params: Any,
    features: jnp.ndarray,
    n_microbatches: int,
    axis: str = "stage",
) -> jnp.ndarray:
    """Pipelined TimeDilatedConvNet forward (reference `src/models/tdcn.py:13`).

    Each mesh device runs one R-repeat (`TimeDilatedConvBlock1d`); the
    (features, skip-sum) pair is the carried activation. All stages are
    dual-head (the reference drops the final repeat's unused residual head
    as a micro-optimisation; keeping it makes the chain homogeneous and
    costs one idle 1x1 conv on the last stage). Returns the summed skip
    connections — the TDCN output.
    """

    def stage_fn(params, act):
        x, skip = act
        x_out, s = block.apply({"params": params}, x)
        return x_out, skip + s

    skip0 = jnp.zeros(
        features.shape[:-1] + (block.skip_channels,), features.dtype)
    _, skip = pipeline_apply(
        mesh, stage_fn, stacked_params, (features, skip0),
        n_microbatches, axis=axis)
    return skip
