"""2-process jax.distributed smoke test (round-2 verdict #10).

Launches two local CPU processes with a localhost coordinator, exercising
`parallel/multihost.py:initialize/make_global_mesh/make_global_array` for
real: the global mesh must assemble (2 procs x 2 virtual devices = 4), and
a jitted cross-host reduction over the globally-sharded batch must match
the single-process numpy value — i.e. one genuine gloo collective runs.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import numpy as np

pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from dnn_based_source_separation_tpu.parallel import multihost

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
mesh = multihost.make_global_mesh()
print(f"RESULT devices {jax.device_count()} {jax.local_device_count()}")

x = (np.arange(16, dtype=np.float32) ** 1.5).reshape(8, 2)
sl = multihost.host_batch_slice(8)
batch = multihost.shard_global_batch(mesh, {"x": x[sl]})
# Cross-host reduction: each process holds only half the rows, so the mean
# requires a real inter-process collective.
mean = jax.jit(lambda t: jax.numpy.mean(t["x"] * 2.0 + 1.0))(batch)
print(f"RESULT mean {float(mean):.6f}")
"""


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), str(port), REPO],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    x = (np.arange(16, dtype=np.float32) ** 1.5).reshape(8, 2)
    expected = float(np.mean(x * 2.0 + 1.0))
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        dev_line = next(ln for ln in lines if "devices" in ln).split()
        assert dev_line[2:] == ["4", "2"], out  # global=4, local=2
        mean = float(next(ln for ln in lines if "mean" in ln).split()[-1])
        assert abs(mean - expected) < 1e-4, out
