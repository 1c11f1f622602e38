"""Multi-process (multi-host) DP test over `jax.distributed`.

SURVEY.md §4 prescribes multi-process CPU testing the reference never had:
two OS processes, each with 2 virtual CPU devices, joined through
`genrec_tpu.parallel.mesh.initialize_multihost` (jax.distributed over a
local coordinator) into one 4-device 'data' mesh. One train step runs with
the batch sharded across processes; both processes must agree with each
other and with a single-process numpy reference — proving the psum grad
reduction crosses the process (DCN-equivalent) boundary correctly.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

DRIVER = """
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
# this host's sitecustomize pins a tunneled TPU backend before -c code
# runs, so the CPU override must go through jax.config (backends are lazy)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from genrec_tpu.parallel.mesh import initialize_multihost, make_mesh
initialize_multihost(f"localhost:{{port}}", nproc, pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from genrec_tpu.configs import MeshConfig
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
mesh = make_mesh(MeshConfig(data_axis=4, model_axis=1))
rng = np.random.default_rng(0)
X = rng.normal(size=(16, 8)).astype(np.float32)
Y = rng.normal(size=(16, 4)).astype(np.float32)
W1 = (rng.normal(size=(8, 16)) * 0.1).astype(np.float32)
W2 = (rng.normal(size=(16, 4)) * 0.1).astype(np.float32)
bs, rs = NamedSharding(mesh, P("data")), NamedSharding(mesh, P())
mk = lambda a, sh: jax.make_array_from_callback(a.shape, sh, lambda i: a[i])
Xd, Yd = mk(X, bs), mk(Y, bs)
params = {{"w1": mk(W1, rs), "w2": mk(W2, rs)}}

def loss_fn(p, x, y):
    h = jnp.tanh(x @ p["w1"])
    return jnp.mean((h @ p["w2"] - y) ** 2)

@jax.jit
def step(p, x, y):
    l, g = jax.value_and_grad(loss_fn)(p, x, y)
    return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g), l

p2, l1 = step(params, Xd, Yd)
l2 = jax.jit(loss_fn)(p2, Xd, Yd)
print(f"RESULT:{{float(l1):.8f}}:{{float(l2):.8f}}", flush=True)
jax.distributed.shutdown()
""".format(repo=REPO)


def _numpy_reference():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(16, 8)).astype(np.float32)
    Y = rng.normal(size=(16, 4)).astype(np.float32)
    W1 = (rng.normal(size=(8, 16)) * 0.1).astype(np.float32)
    W2 = (rng.normal(size=(16, 4)) * 0.1).astype(np.float32)

    def loss(w1, w2):
        h = np.tanh(X @ w1)
        return float(np.mean((h @ w2 - Y) ** 2))

    # analytic grads of the same loss
    H = np.tanh(X @ W1)
    E = H @ W2 - Y                        # (16, 4)
    n = E.size
    gW2 = H.T @ (2 * E / n)
    gH = (2 * E / n) @ W2.T
    gW1 = X.T @ (gH * (1 - H ** 2))
    return loss(W1, W2), loss(W1 - 0.1 * gW1, W2 - 0.1 * gW2)


def test_two_process_dp_step_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", DRIVER, str(i), "2", str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc failed:\n{out[-2000:]}\n{err[-3000:]}"
        m = re.search(r"RESULT:([-\d.]+):([-\d.]+)", out)
        assert m, f"no RESULT in output:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append((float(m.group(1)), float(m.group(2))))

    # both processes observe identical (replicated) losses
    assert outs[0] == outs[1]
    l1_ref, l2_ref = _numpy_reference()
    np.testing.assert_allclose(outs[0][0], l1_ref, rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], l2_ref, rtol=1e-5)
    assert outs[0][1] < outs[0][0]  # the step descended
