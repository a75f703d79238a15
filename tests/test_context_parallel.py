"""Sequence-parallel overlap-add: sharded result must equal the local fold."""
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.ops.segment import overlap_add
from dnn_based_source_separation_tpu.parallel import make_mesh
from dnn_based_source_separation_tpu.parallel.context import sharded_overlap_add


def test_sharded_overlap_add_matches_local():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    B, S, K, N = 2, 16, 20, 4  # hop 10, 2 chunks per device
    hop = 10
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((B, S, K, N)), jnp.float32)

    local = overlap_add(chunks, hop)  # (B, (S-1)*hop + K, N)
    sharded = sharded_overlap_add(chunks, hop, mesh)

    # Sharded output covers the first S*hop samples (tail truncated).
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local[:, : S * hop]), atol=1e-5
    )


def test_sharded_overlap_add_under_jit():
    mesh = make_mesh(8)
    B, S, K, N = 1, 8, 8, 2
    hop = 4
    rng = np.random.default_rng(1)
    chunks = jnp.asarray(rng.standard_normal((B, S, K, N)), jnp.float32)
    f = jax.jit(lambda c: sharded_overlap_add(c, hop, mesh))
    out = f(chunks)
    ref = overlap_add(chunks, hop)[:, : S * hop]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_multihost_helpers_single_process_equivalence():
    """multihost helpers on one process == plain mesh data sharding."""
    import jax
    import numpy as np

    from dnn_based_source_separation_tpu.parallel import multihost

    multihost.initialize()  # no-op single host
    mesh = multihost.make_global_mesh()
    assert mesh.devices.size == len(jax.devices())

    sl = multihost.host_batch_slice(16)
    assert (sl.start, sl.stop) == (0, 16)

    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = multihost.make_global_array(mesh, x[sl])
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")

    tree = multihost.shard_global_batch(mesh, {"a": x[sl], "b": x[sl] * 2})
    np.testing.assert_array_equal(np.asarray(tree["b"]), x * 2)


def test_multihost_initialize_pod_autodetect(monkeypatch):
    """Advisor round-2 low: on a TPU pod (metadata env vars present) a bare
    initialize() must reach jax.distributed.initialize, not silently no-op."""
    import jax

    from dnn_based_source_separation_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    # Clean env: bare call is a single-host no-op.
    for k in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    multihost.initialize()
    assert calls == []
    # Pod marker present: auto-detecting initialize() is invoked.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    multihost.initialize()
    assert calls == [((), {})]
    # Explicit args still pass through.
    multihost.initialize("h:1234", 2, 0)
    assert calls[-1][1]["num_processes"] == 2
