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


# ---------------------------------------------------------------------------
# Real-framework multi-process runs (VERDICT r4 #1/#5): the same pipeline
# code — genrec_tpu.pipelines.tiger_pipeline.train and the SASRecLarge
# sharded-table step — must run unmodified across 2 OS processes × 2 CPU
# devices and agree bitwise-closely with the 1-process × 4-device run.
# The Trainer's sharded-dataset mode (cfg.shard_dataset / auto on
# process_count>1) makes batch composition a function of the DATA-AXIS SIZE
# only, so both topologies see identical batches.

def _run_driver(driver, nproc, ndev, args, timeout=900):
    """Spawn `nproc` processes of `driver` (argv: pid nproc port ndev *args);
    returns each process's stdout."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", driver, str(i), str(nproc), str(port),
             str(ndev)] + [str(a) for a in args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc failed:\n{out[-2000:]}\n{err[-4000:]}"
        outs.append(out)
    return outs


TIGER_DRIVER = """
import os, sys
pid, nproc, port, ndev = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
data_dir, ckpt_dir, epochs, resume = sys.argv[5], sys.argv[6], int(sys.argv[7]), sys.argv[8] == "1"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)
from genrec_tpu.parallel.mesh import initialize_multihost
if nproc > 1:
    initialize_multihost(f"localhost:{{port}}", nproc, pid)
from genrec_tpu.configs import TIGERConfig, T5ArchConfig, TrainerConfig, MeshConfig
from genrec_tpu.pipelines import tiger_pipeline
cfg = TIGERConfig(
    code_path=os.path.join(data_dir, "course", "course_rqvae_codes.npy"),
    train_dataset_path=os.path.join(data_dir, "tiger", "train_dataset.h5"),
    test_dataset_path=os.path.join(data_dir, "tiger", "test_dataset.h5"),
    arch=T5ArchConfig(vocab_size=64, num_layers=1, num_decoder_layers=1,
                      d_model=16, d_ff=32, num_heads=2, d_kv=8,
                      dropout_rate=0.0),
    max_len=4,
    trainer=TrainerConfig(batch_size=16, eval_batch_size=16, epochs=epochs,
                          lr=1e-3, ckpt_dir=ckpt_dir, early_stop_patience=99,
                          seed=5, resume=resume, shard_dataset=True),
    mesh=MeshConfig())
art = tiger_pipeline.train(cfg)
r = art.result
print("TLOSS:" + ",".join(f"{{x:.9f}}" for x in r.train_losses) +
      "|" + ",".join(f"{{x:.9f}}" for x in r.val_losses), flush=True)
if nproc > 1:
    jax.distributed.shutdown()
""".format(repo=REPO)


def _tiger_losses(out):
    m = re.search(r"TLOSS:([^|]+)\|(\S+)", out)
    assert m, f"no TLOSS in output:\n{out[-2000:]}"
    return ([float(x) for x in m.group(1).split(",")],
            [float(x) for x in m.group(2).split(",")])


@pytest.fixture(scope="module")
def tiger_data(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mpdata"))
    from genrec_tpu.data import contracts, synthetic, tiger_tokens
    data = synthetic.make_interactions(48, 30, min_len=3, max_len=6, seed=0)
    codes = synthetic.make_codes(30, seed=0)
    train, test = tiger_tokens.build_tiger_splits(
        data.item_id_lists, data.user_ids, codes)
    contracts.write_codes(
        os.path.join(out, "course", "course_rqvae_codes.npy"), codes)
    contracts.write_tiger_split(
        os.path.join(out, "tiger", "train_dataset.h5"), train)
    contracts.write_tiger_split(
        os.path.join(out, "tiger", "test_dataset.h5"), test)
    return out


def test_tiger_pipeline_two_process_matches_single(tiger_data, tmp_path):
    """The unmodified TIGER pipeline trains across 2 processes × 2 devices
    and reproduces the 1-process × 4-device run's losses (train AND val)."""
    o1 = _run_driver(TIGER_DRIVER, 1, 4,
                     [tiger_data, tmp_path / "a", 2, 0])
    o2 = _run_driver(TIGER_DRIVER, 2, 2,
                     [tiger_data, tmp_path / "b", 2, 0])
    t1, v1 = _tiger_losses(o1[0])
    t2a, v2a = _tiger_losses(o2[0])
    t2b, v2b = _tiger_losses(o2[1])
    assert (t2a, v2a) == (t2b, v2b)  # replicated across processes
    np.testing.assert_allclose(t1, t2a, rtol=1e-6)
    np.testing.assert_allclose(v1, v2a, rtol=1e-6)
    assert t1[-1] < t1[0]  # it actually trained


def test_multiprocess_checkpoint_resume(tiger_data, tmp_path):
    """Orbax save from BOTH processes → restart → restore into the same
    sharded layout; the resumed epoch must equal the uninterrupted run's
    (dropout=0 → the only epoch-state is params/opt/step, all restored)."""
    _run_driver(TIGER_DRIVER, 2, 2, [tiger_data, tmp_path / "c", 2, 0])
    o_res = _run_driver(TIGER_DRIVER, 2, 2, [tiger_data, tmp_path / "c", 3, 1])
    o_full = _run_driver(TIGER_DRIVER, 2, 2, [tiger_data, tmp_path / "d", 3, 0])
    t_res, _ = _tiger_losses(o_res[0])
    t_full, _ = _tiger_losses(o_full[0])
    assert len(t_res) == 1  # resumed at epoch 3 only
    np.testing.assert_allclose(t_res[-1], t_full[-1], rtol=1e-6)


SASREC_LARGE_DRIVER = """
import os, sys
pid, nproc, port, ndev = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)
from genrec_tpu.parallel.mesh import initialize_multihost
if nproc > 1:
    initialize_multihost(f"localhost:{{port}}", nproc, pid)
import numpy as np
import jax.numpy as jnp
import optax
from genrec_tpu.configs import (MeshConfig, SASRecLargeConfig,
                                ShardedEmbeddingConfig, TrainerConfig)
from genrec_tpu.models.sasrec_large import SASRecLarge, train_loss_sampled
from genrec_tpu.parallel.mesh import make_mesh, make_global_array, process_rows
from genrec_tpu.parallel.sharding import batch_spec, shard_params
mesh = make_mesh(MeshConfig(data_axis=2, model_axis=2))
cfg = SASRecLargeConfig(
    max_len=8, num_blocks=1, num_heads=1, mlp_layer=16, dropout=0.0,
    num_neg_samples=4,
    embedding=ShardedEmbeddingConfig(vocab_size=4096, dim=8),
    trainer=TrainerConfig(batch_size=16))
item_num = cfg.embedding.vocab_size - 1
m_sh = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh, use_sharded=True)
m_rep = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh, use_sharded=False)
rng = np.random.default_rng(3)
x = rng.integers(1, item_num, size=(16, 8)).astype(np.int32); x[:, :2] = 0
t = rng.integers(1, item_num, size=(16, 8)).astype(np.int32); t[:, :2] = 0
params = m_rep.init(jax.random.PRNGKey(0), jnp.asarray(x))
params_sh = shard_params(params, mesh)
bs = batch_spec(mesh)
lo, hi = process_rows(bs, 16)   # per-host loader: read only OUR rows
xs = make_global_array(x[lo:hi], bs, process_local=True)
ts = make_global_array(t[lo:hi], bs, process_local=True)
key = jax.random.PRNGKey(7)
# cross-process arrays must be jit ARGUMENTS, not closure constants
def loss_sh(p, a, b):
    l, _ = train_loss_sampled(m_sh, p, a, b, key, cfg, item_num)
    return l
l1, g1 = jax.jit(jax.value_and_grad(loss_sh))(params_sh, xs, ts)
tx = optax.adam(1e-3)
opt = tx.init(params_sh)
up, opt = tx.update(g1, opt, params_sh)
p2 = optax.apply_updates(params_sh, up)
l2 = jax.jit(loss_sh)(p2, xs, ts)
spec_ok = (p2["params"]["item_table"].sharding.spec
           == params_sh["params"]["item_table"].sharding.spec)
print(f"SRESULT:{{float(l1):.9f}}:{{float(l2):.9f}}:{{int(spec_ok)}}", flush=True)
if nproc > 1:
    jax.distributed.shutdown()
""".format(repo=REPO)


def test_sasrec_large_two_process_sharded_table(tmp_path):
    """SASRecLarge with the row-sharded ('model'-axis) item table trains a
    step across 2 processes × 2 devices on a data=2 × model=2 mesh, with
    per-host input loading (process_rows + make_global_array). Loss and the
    post-step loss must match the 1-process × 4-device run."""
    def parse(out):
        m = re.search(r"SRESULT:([-\d.]+):([-\d.]+):(\d)", out)
        assert m, f"no SRESULT in output:\n{out[-2000:]}"
        return float(m.group(1)), float(m.group(2)), int(m.group(3))

    o1 = _run_driver(SASREC_LARGE_DRIVER, 1, 4, [])
    o2 = _run_driver(SASREC_LARGE_DRIVER, 2, 2, [])
    l1a, l2a, sp1 = parse(o1[0])
    r0, r1 = parse(o2[0]), parse(o2[1])
    assert r0 == r1  # replicated losses across processes
    assert sp1 == 1 and r0[2] == 1  # table stays P('model', None)
    np.testing.assert_allclose(r0[0], l1a, rtol=1e-5)
    np.testing.assert_allclose(r0[1], l2a, rtol=1e-5)
    assert r0[1] < r0[0]  # the optimizer step descended


STREAMING_DRIVER = """
import os, sys
pid, nproc, port, ndev = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)
from genrec_tpu.parallel.mesh import initialize_multihost
if nproc > 1:
    initialize_multihost(f"localhost:{{port}}", nproc, pid)
import numpy as np
import jax.numpy as jnp
from genrec_tpu.configs import TrainerConfig, MeshConfig
from genrec_tpu.parallel.auto import dp_shardings
from genrec_tpu.parallel.mesh import process_rows
from genrec_tpu.train.trainer import Trainer

rng = np.random.default_rng(0)
n, d = 64, 8
w_true = rng.normal(size=(d,)).astype(np.float32)
x = rng.normal(size=(n, d)).astype(np.float32)
y = (x @ w_true).astype(np.float32)

def loss_fn(p, batch, rng_):
    pred = batch["x"] @ p["w"]
    se = (pred - batch["y"]) ** 2
    return se.mean(), {{"sum_loss": se.sum(),
                        "valid": jnp.asarray(float(len(se)))}}

mesh, bs, rs = dp_shardings(MeshConfig())
cfg = TrainerConfig(epochs=3, batch_size=16, lr=0.1, shard_dataset=False,
                    ckpt_dir=sys.argv[5], early_stop_patience=99)
tr = Trainer(cfg, init_params={{"w": jnp.zeros(d)}}, loss_fn=loss_fn,
             batch_sharding=bs, replicate_sharding=rs)

# STREAMING factory path: each process's iterator yields ITS local rows
# of every global batch (Trainer._put uses make_array_from_process_local_data)
lo, hi = process_rows(bs, 16)

def batches(epoch):
    order = np.random.default_rng(epoch).permutation(n)
    for s in range(0, n, 16):
        rows = order[s:s + 16]
        yield {{"x": x[rows][lo:hi], "y": y[rows][lo:hi]}}

res = tr.fit(batches)
print("SLOSS:" + ",".join(f"{{v:.9f}}" for v in res.train_losses), flush=True)
if nproc > 1:
    jax.distributed.shutdown()
""".format(repo=REPO)


def test_streaming_factory_path_two_process(tmp_path):
    """The non-device-resident (batch factory) path also crosses
    processes: each process feeds its process_rows slice of every batch;
    losses must equal the 1-process run's exactly."""
    o1 = _run_driver(STREAMING_DRIVER, 1, 4, [tmp_path / "a"])
    o2 = _run_driver(STREAMING_DRIVER, 2, 2, [tmp_path / "b"])

    def parse(out):
        m = re.search(r"SLOSS:(\S+)", out)
        assert m, out[-1500:]
        return [float(v) for v in m.group(1).split(",")]

    l1, l2a, l2b = parse(o1[0]), parse(o2[0]), parse(o2[1])
    assert l2a == l2b
    np.testing.assert_allclose(l1, l2a, rtol=1e-6)
    assert l1[-1] < l1[0]
