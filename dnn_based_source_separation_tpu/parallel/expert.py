"""Expert parallelism: per-stem/per-source models sharded over a mesh axis.

The reference's multi-source music models are literal per-stem ensembles —
ParallelOpenUnmix runs four independent OpenUnmix backbones, one per stem
(reference `src/models/umx.py:20`), and X-UMX/MMDense* follow the same
shape. On a device mesh that IS expert parallelism: stack the per-stem
parameter trees on a leading axis, shard that axis over an 'expert' mesh
axis, and every device runs its own stem's full forward with ZERO
communication until the final stem stack (one all_gather via out_specs).

Composes with data parallelism on a 2-D ('data', 'expert') mesh: the batch
shards over 'data' while each expert-column holds one stem — the serving
layout for a 4-stem model on 8 chips (dp=2 x ep=4).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .pipeline import stack_stage_params as stack_expert_params  # same op


def _tree_spec(tree: Any, spec: P) -> Any:
    return jax.tree_util.tree_map(lambda _: spec, tree)


def ep_apply(
    mesh: Mesh,
    expert_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    axis: str = "expert",
    batch_axis: Optional[str] = None,
) -> Any:
    """Run n_experts independent models, one per device down `axis`.

    expert_fn(params_i, x) -> y_i applies expert i's full forward; all
    experts see the same input x and must emit the same output shape.
    stacked_params: pytree with a leading n_experts dim (n_experts ==
    mesh.shape[axis]). Returns the stacked outputs (n_experts, ...) —
    exactly `jnp.stack([expert_fn(p_i, x) for i])` — sharded over `axis`
    on the leading dim (an all_gather materialises it only if the
    consumer needs it replicated).

    batch_axis: name of a data-parallel mesh axis x's leading (batch) dim
    is sharded over, for 2-D dp x ep layouts; None = x replicated.
    """
    x_spec = P(batch_axis) if batch_axis else P()
    out_spec = P(axis, batch_axis) if batch_axis else P(axis)

    def run(params, xs):
        params = jax.tree_util.tree_map(lambda p: p[0], params)  # this expert
        y = expert_fn(params, xs)
        return jax.tree_util.tree_map(lambda a: a[None], y)

    # out_specs must mirror the expert's OUTPUT pytree (which need not share
    # the input's structure); shape it with an abstract eval of one expert.
    params0 = jax.tree_util.tree_map(lambda p: p[:1], stacked_params)
    out_shape = jax.eval_shape(run, params0, x)

    return shard_map(
        run,
        mesh=mesh,
        in_specs=(_tree_spec(stacked_params, P(axis)), _tree_spec(x, x_spec)),
        out_specs=_tree_spec(out_shape, out_spec),
        check_rep=False,
    )(stacked_params, x)


def ep_parallel_umx(
    mesh: Mesh,
    model: "flax.linen.Module",  # noqa: F821 - a ParallelOpenUnmix
    variables: Any,
    spectrogram,
    axis: str = "expert",
    batch_axis: Optional[str] = None,
    sources: Optional[Sequence[str]] = None,
):
    """ParallelOpenUnmix forward with each stem backbone on its own device.

    Takes the PLAIN ParallelOpenUnmix model + its variables verbatim
    (params and batch_stats keyed `backbone_{source}`), restacks them per
    stem, and returns (B, n_sources, C, n_bins, n_frames) matching
    `model.apply(variables, input)` exactly.
    """
    import jax.numpy as jnp

    from ..models.umx import OpenUnmix

    sources = tuple(sources or model.sources)
    if len(sources) != mesh.shape[axis]:
        raise ValueError(
            f"{len(sources)} stems need mesh axis '{axis}' of that size, "
            f"got {mesh.shape[axis]}")
    backbone = OpenUnmix(
        model.in_channels, model.hidden_channels, model.num_layers,
        n_bins=model.n_bins, max_bin=model.max_bin, dropout=model.dropout,
        causal=model.causal, rnn_type=model.rnn_type, eps=model.eps,
    )
    per_stem = [
        {col: variables[col][f"backbone_{s}"]
         for col in variables if f"backbone_{s}" in variables[col]}
        for s in sources
    ]
    stacked = stack_expert_params(per_stem)

    def expert_fn(vs, x):
        return backbone.apply(vs, x)

    x = spectrogram[:, 0]  # (B, C, n_bins, T) - ParallelOpenUnmix convention
    y = ep_apply(mesh, expert_fn, stacked, x, axis=axis, batch_axis=batch_axis)
    return jnp.swapaxes(y, 0, 1)  # (n_sources, B, ...) -> (B, n_sources, ...)
