"""Tensor parallelism: Megatron-style column/row sharding over a mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.3: models are <=
~30M params and `nn.DataParallel` is its entire story); this module is the
demonstration TP path for the one sub-model where width sharding is
natural — UMX's per-frame dense blocks (fc -> nonlinear -> fc, hidden 512,
reference `src/models/umx.py:533` TransformBlock1d).

Layout (the standard two-matmul recipe from the scaling playbook):
  * W1 (F, H) column-sharded over the 'model' axis — each device computes
    its H/n slice of the hidden activations, no communication;
  * W2 (H, O) row-sharded — each device contracts its hidden slice into a
    PARTIAL (.., O) result;
  * one psum over the 'model' axis completes the contraction (rides ICI).

Per block that is a single collective of the output size — the minimum any
width-sharded pair of matmuls can do.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def tp_dense_block(mesh: Mesh, x, w1, b1, w2, b2, nonlinear=jnp.tanh,
                   axis: str = "model"):
    """y = nonlinear(x @ w1 + b1) @ w2 + b2, hidden dim sharded over `axis`.

    x: (..., F) replicated. w1: (F, H), b1: (H,) — column-sharded (H).
    w2: (H, O) — row-sharded. b2: (O,) replicated. Returns replicated
    (..., O), numerically identical to the unsharded computation (up to
    psum summation order).
    """

    def block(xs, w1s, b1s, w2s, b2s):
        h = nonlinear(xs @ w1s + b1s)          # (..., H/n) local columns
        y = h @ w2s                             # (..., O) partial sums
        y = jax.lax.psum(y, axis)               # one collective over ICI
        return y + b2s

    return shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P()),
        out_specs=P(),
    )(x, w1, b1, w2, b2)


def tp_umx_transform(mesh: Mesh, x, params, axis: str = "model"):
    """Width-sharded UMX input transform: fc (column) -> tanh is fused into
    the following block via tp_dense_block; convenience wrapper applying a
    whole {w1, b1, w2, b2} param dict."""
    return tp_dense_block(
        mesh, x, params["w1"], params["b1"], params["w2"], params["b2"],
        axis=axis,
    )
