"""Multi-host bring-up test: 2-process CPU jax.distributed via parallel.launch.

The only parallel/ module the virtual single-process mesh cannot cover
(VERDICT round-2 weakness 6): spawn two real processes, initialize the
jax.distributed coordinator, build the global mesh, and run one psum across
both processes' devices.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
pid, port = int(sys.argv[1]), sys.argv[2]

from bnv_fusion_tpu.parallel import launch

launch.initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=pid)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

mesh = launch.global_mesh(("dp",))
assert mesh.devices.size == 4

# this process's share of a global batch of 8
sl = launch.process_local_slice(8)
assert sl == slice(pid * 4, pid * 4 + 4), sl
local = np.arange(8.0, dtype=np.float32)[sl]

sharding = NamedSharding(mesh, P("dp"))
x = jax.make_array_from_process_local_data(sharding, local, (8,))

def f(v):
    return jax.lax.psum(jnp.sum(v), "dp")

y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P()))(x)
total = float(np.asarray(y))
assert total == 28.0, total
print(f"WORKER{pid} OK {total}", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK 28.0" in out, out
