"""Real 2-process jax.distributed runtime on CPU (VERDICT r2 item 6).

Spawns two local processes that each call ``distributed_init`` against a
localhost coordinator, build the hybrid DCN mesh, and run a global psum —
exercising ``jax.distributed.initialize`` for real (the prior test only
asserted the single-process no-op).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys

sys.path.insert(0, {repo!r})
from retinal_oct_image_segmentation_via_deep_learning_tpu.parallel.mesh import (
    DATA_AXIS,
    create_hybrid_mesh,
    distributed_init,
)

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
assert distributed_init(coord, nproc, pid) is True
assert distributed_init(coord, nproc, pid) is True  # idempotent
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = create_hybrid_mesh(space=1)
ndev = len(jax.devices())
assert ndev == nproc * len(jax.local_devices())

# one shard per device; the jitted global sum all-reduces across processes
sharding = NamedSharding(mesh, P(DATA_AXIS))
x = jax.make_array_from_callback(
    (ndev, 4), sharding,
    lambda idx: jnp.full((1, 4), 1.0 + float(idx[0].start or 0)),
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
print("PSUM_OK", pid, float(total), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_psum():
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    script = WORKER.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(nproc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-2000:]}"
        assert "PSUM_OK" in out, out
    # expected global sum: 4 device shards of 4 elems with values
    # 1 + shard_row_start: rows 0..3 -> values 1,2,3,4 -> sum 4*(1+2+3+4)
    for rc, out, err in outs:
        val = float(out.strip().split()[-1])
        assert val == 40.0, out
