"""Root pytest conftest.

Forces tests onto a virtual 8-device CPU mesh so multi-chip sharding logic
(`jax.sharding.Mesh` + pjit/shard_map) is exercised without TPU hardware.

Note: this image's sitecustomize force-registers the 'axon' TPU backend and
sets jax_platforms="axon,cpu" in-process (overriding the JAX_PLATFORMS env
var), so we must both set XLA_FLAGS before the CPU client is created AND
override the jax config after import.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
