"""Multi-host machinery validated with 2 real processes on CPU:
jax.distributed.initialize + global mesh + per-process data shards assembled
into global arrays + a psum'd train step (the actual multi-host DP recipe).
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2
assert jax.device_count() == 4        # 2 procs x 2 virtual devices
mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
sharding = NamedSharding(mesh, P("data"))

# per-process shard of a global batch (each host loads only its own rows)
local = np.arange(8, dtype=np.float32) + 100 * proc_id
global_batch = jax.make_array_from_process_local_data(
    sharding, local.reshape(8, 1))

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(global_batch))
expected = float(np.arange(8).sum() * 2 + 100 * 8)
assert abs(total - expected) < 1e-3, (total, expected)
print(f"proc {proc_id} OK total={total}", flush=True)
"""


def test_two_process_distributed(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out
        assert "OK" in out
