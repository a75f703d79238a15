"""Serving a 4-stem model with expert + data parallelism on a device mesh.

Runs anywhere: on CPU it bootstraps a virtual 8-device mesh (the same
mechanism the test suite uses), on a TPU slice it uses the real chips.
Shows the three mesh layouts a musdb18 serving deployment would pick from:

  1. dp only   — replicate the model, shard requests (the throughput play);
  2. ep only   — one stem per device, zero inter-stem communication;
  3. dp x ep   — both: requests shard over 'data', stems over 'expert'
                 (the natural layout for a 4-stem model on 8 chips).

All three produce bit-identical stems to the plain single-device forward;
the parallel placement is purely a layout annotation (PARALLELISM.md).

Usage: python egs/tutorials/parallel_serving_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

if len(jax.devices()) < 8:  # force a virtual 8-device CPU mesh
    import jax._src.xla_bridge as xb

    if xb.backends_are_initialized():
        xb._clear_backends()
        jax.clear_caches()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.models import ParallelOpenUnmix
from dnn_based_source_separation_tpu.parallel import make_mesh, shard_batch
from dnn_based_source_separation_tpu.parallel.expert import ep_parallel_umx


def main():
    model = ParallelOpenUnmix(
        in_channels=2, hidden_channels=32, num_layers=1,
        n_bins=129, max_bin=100, dropout=0.0, causal=False,
    )
    rng = np.random.default_rng(0)
    # A batch of 8 requests: (B, 1, stereo, bins, frames) magnitudes.
    spec = jnp.asarray(np.abs(rng.standard_normal((8, 1, 2, 129, 24))),
                       jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), spec)
    reference = model.apply(variables, spec)  # plain single-device forward

    # 1. Data parallel: batch sharded, params replicated. XLA partitions
    # the jitted forward; no code change beyond the input sharding.
    mesh_dp = make_mesh(8)  # ('data',)
    spec_dp = shard_batch(mesh_dp, spec)
    out_dp = jax.jit(model.apply)(variables, spec_dp)
    print("dp   max err:", float(jnp.max(jnp.abs(out_dp - reference))))

    # 2. Expert parallel: one stem backbone per device, using the SAME
    # checkpoint variables. Note only 4 of 8 devices carry stems here;
    # a 4-device 'expert' mesh is the pure-ep fit.
    mesh_ep = make_mesh(4, axis_names=("expert",))
    out_ep = ep_parallel_umx(mesh_ep, model, variables, spec)
    print("ep   max err:", float(jnp.max(jnp.abs(out_ep - reference))))

    # 3. dp(2) x ep(4): requests shard over 'data' within each stem column.
    mesh_2d = make_mesh(8, axis_names=("data", "expert"), shape=(2, 4))
    out_2d = ep_parallel_umx(mesh_2d, model, variables, spec,
                             batch_axis="data")
    print("dpxep max err:", float(jnp.max(jnp.abs(out_2d - reference))))

    assert float(jnp.max(jnp.abs(out_2d - reference))) < 1e-5
    print("all three layouts match the single-device stems")


if __name__ == "__main__":
    main()
