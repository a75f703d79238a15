"""Chunk-axis (sequence) parallelism for dual-path models.

The reference has no distributed sequence parallelism; its algorithmic
analog is dual-path chunking (SURVEY.md §2.3). This module provides the
TPU-native distributed form: the chunk axis S of a (B, S, K, N) dual-path
tensor is sharded across the mesh, intra-chunk work stays device-local, and
the overlap-add boundary halo rides a `ppermute` over ICI.

`sharded_overlap_add` is the core primitive: each device folds its local
chunks, ships the (K - hop) boundary tail to its right neighbor with one
ppermute, and emits a T-sharded waveform. Output length is S_global * hop
(the final tail is truncated; dual-path separators pad and crop around OLA
anyway, see models/dprnn_tasnet.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.segment import overlap_add


def sharded_overlap_add(chunks: jnp.ndarray, hop_size: int, mesh: Mesh, axis: str = "data"):
    """chunks (B, S, K, N) with S sharded on `axis` -> (B, S*hop, N) T-sharded.

    Requires K >= hop (standard 50% dual-path overlap is K = 2*hop) and
    S divisible by the mesh axis size.
    """
    B, S, K, N = chunks.shape
    n_dev = mesh.shape[axis]
    assert S % n_dev == 0, f"S={S} must divide over {n_dev} devices"
    overlap = K - hop_size
    assert 0 <= overlap <= hop_size * (S // n_dev), "halo must fit one shard"

    def local_fn(local):
        # local: (B, S_local, K, N)
        S_local = local.shape[1]
        y = overlap_add(local, hop_size)  # (B, (S_local-1)*hop + K, N)
        body, tail = y[:, : S_local * hop_size], y[:, S_local * hop_size :]
        # Ship my tail to the right neighbor; receive from the left.
        idx = jax.lax.axis_index(axis)
        perm = [(d, (d + 1) % n_dev) for d in range(n_dev)]
        prev_tail = jax.lax.ppermute(tail, axis, perm)
        # Device 0 receives the (circularly wrapped) tail of the last
        # device, which must NOT fold into the start: mask it out.
        prev_tail = jnp.where(idx == 0, jnp.zeros_like(prev_tail), prev_tail)
        body = body.at[:, :overlap].add(prev_tail)
        return body  # (B, S_local*hop, N)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None),
    )(chunks)
