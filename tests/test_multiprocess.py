"""Multi-process distributed coverage (VERDICT r1 item 8).

Spawns 2 OS processes × 4 virtual CPU devices each and runs a DP+TP
sharded train step over the resulting 8-device global mesh via
``jax.distributed.initialize`` — the cross-host (DCN-analog) path the
single-process virtual mesh cannot exercise.  Each process feeds its own
data shard; the test asserts both processes converge to the SAME global
loss (the collectives really crossed process boundaries).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
import jax

coord = sys.argv[1]
pid = int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid,
    local_device_ids=list(range(4)),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

devices = np.array(jax.devices()).reshape(2, 4)
mesh = Mesh(devices, ("data", "model"))

# Tiny two-layer MLP, weights TP-sharded on "model", batch DP-sharded.
k = jax.random.PRNGKey(0)
w1 = jax.random.normal(k, (64, 128), jnp.float32) * 0.05
w2 = jax.random.normal(jax.random.fold_in(k, 1), (128, 64), jnp.float32) * 0.05
x = jax.random.normal(jax.random.fold_in(k, 2), (16, 64), jnp.float32)
y = jax.random.normal(jax.random.fold_in(k, 3), (16, 64), jnp.float32)

w1 = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
w2 = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
x = jax.device_put(x, NamedSharding(mesh, P("data", None)))
y = jax.device_put(y, NamedSharding(mesh, P("data", None)))

@jax.jit
def loss_and_grads(w1, w2, x, y):
    def loss(w1, w2):
        h = jnp.maximum(x @ w1, 0.0)
        return jnp.mean((h @ w2 - y) ** 2)
    l, g = jax.value_and_grad(loss, argnums=(0, 1))(w1, w2)
    return l, g

l0 = None
for step in range(3):
    l, (g1, g2) = loss_and_grads(w1, w2, x, y)
    w1 = w1 - 0.1 * g1
    w2 = w2 - 0.1 * g2
    l0 = float(l)
print(f"FINAL_LOSS {l0:.10f}")
"""


@pytest.mark.skipif(
    os.environ.get("MFA_TPU_TESTS") == "1",
    reason="multi-process CPU harness; covered on CPU CI",
)
@pytest.mark.slow
def test_two_process_dp_tp_train_step(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("FINAL_LOSS"):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2, outs
    # Cross-process collectives must agree exactly on the global loss.
    assert losses[0] == losses[1], losses
