"""Multi-host data parallelism: jax.distributed bootstrap + global mesh.

The reference scales with single-host `nn.DataParallel` only; this module is
the TPU-pod counterpart (SURVEY.md §7 stage 8): every host runs the same
program, `initialize()` wires the JAX distributed runtime, and the Mesh
spans all hosts' devices so `psum` gradient reduction rides ICI/DCN via the
same sharded train steps used single-host (`train/steps.py`).

Per-host input pipeline: each process loads only its shard of the global
batch (`host_batch_slice`), then `make_global_array` assembles the global
sharded array from per-host shards (jax.make_array_from_process_local_data).

Single-host behavior is a no-op passthrough, so recipes can call these
helpers unconditionally.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _looks_like_multihost_env() -> bool:
    """Heuristic: are we inside a TPU-pod / managed-cluster environment where
    jax.distributed.initialize() can auto-detect its arguments?"""
    import os

    # Cloud TPU pod metadata lists every worker host; a single entry (as the
    # single-chip runtime also sets) means single-host.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    coordinator_markers = (
        "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",    # generic/jax cluster bootstrap
        "COORDINATOR_ADDRESS",
    )
    return any(os.environ.get(k) for k in coordinator_markers)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap jax.distributed (idempotent; no-op for single-process runs).

    With no arguments: if the environment looks like a TPU pod / managed
    cluster (metadata env vars present), jax.distributed.initialize() is
    called with full auto-detection; otherwise this is a single-host no-op.
    Elsewhere pass coordinator_address="host:port", num_processes and
    process_id explicitly.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        if not _looks_like_multihost_env():
            return  # single host
        # Pod/cluster detected: let JAX auto-detect everything.
        jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axis_names: Sequence[str] = ("data",),
                     shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL devices across hosts (jax.devices() is global)."""
    devices = jax.devices()
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def host_batch_slice(global_batch_size: int) -> slice:
    """Index range of the global batch this host should load."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} hosts")
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_array(mesh: Mesh, host_local, axis: str = "data"):
    """Assemble a globally-sharded array from this host's local batch shard.

    host_local: numpy array holding ONLY this host's rows (see
    host_batch_slice). Returns a jax.Array sharded over `axis` whose global
    leading dim is process_count * local rows.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(host_local), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(host_local))


def shard_global_batch(mesh: Mesh, batch, axis: str = "data"):
    """Pytree version of make_global_array."""
    return jax.tree_util.tree_map(lambda x: make_global_array(mesh, x, axis), batch)
