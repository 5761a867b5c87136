"""Genuine two-process `jax.distributed` bring-up on localhost (CPU backend).

The reference's only multi-node analogue is `accelerate launch` + DDP/NCCL
(README.md:53-57), exercised nowhere in its repo. Here two OS processes form a
real JAX cluster through `maybe_initialize_distributed` (coordination service
over localhost, collectives over Gloo), build the global data mesh, assemble a
cross-host global batch from per-process shards, and run a jitted
loss-and-gradient whose mean/grad reductions cross the process boundary — the
DCN psum path of multi-host training. The parent asserts both workers computed
the single-process ground truth.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from adt_str_tpu.parallel import mesh as mesh_lib

mesh_lib.maybe_initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
pid = jax.process_index()

import jax.numpy as jnp

mesh = mesh_lib.make_mesh(n_data=4, n_model=1)
sharding = mesh_lib.batch_sharding(mesh)

B, D = 8, 16
rng = np.random.default_rng(0)  # same seed on both hosts: full global view
x_global = rng.normal(size=(B, D)).astype(np.float32)
w = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))

# per-host rows: device order in the mesh groups process 0's devices first
local = x_global[pid * 4 : (pid + 1) * 4]
x = jax.make_array_from_process_local_data(sharding, local)

@jax.jit
def loss_and_grad(w, x):
    def loss(w):
        return jnp.mean((x @ w) ** 2)
    return jax.value_and_grad(loss)(w)

loss, grad = loss_and_grad(w, x)
out = {
    "pid": pid,
    "loss": float(loss),
    "grad": np.asarray(grad).tolist(),
}
with open(os.path.join(sys.argv[1], f"out_{pid}.json"), "w") as f:
    json.dump(out, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_bringup(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(**__import__("os").environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]

    # ground truth: single-process computation over the full global batch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    y = x @ w
    loss = float(np.mean(y**2))
    grad = (2.0 / 8) * (x.T @ y)

    for pid in range(2):
        out = json.loads((Path(tmp_path) / f"out_{pid}.json").read_text())
        assert out["pid"] == pid
        np.testing.assert_allclose(out["loss"], loss, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["grad"]), grad, rtol=1e-4)
