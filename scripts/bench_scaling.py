"""Scaling benchmark harness: examples/s at 1 chip → N-device mesh.

On real multi-chip hardware this measures the DP/TP scaling curve the
north-star asks for (BASELINE.json: near-linear multi-host). Without
multi-chip hardware it still validates the sharded program end-to-end on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) and
reports per-config step time — the same code path that runs on a pod.

    python scripts/bench_scaling.py                 # current backend
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --virtual

Also exercises the row-sharded 10M-row embedding path when the device
memory allows (--big-table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_tiger_dp(mesh, batch_per_device: int = 256, steps: int = 30):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER
    from genrec_tpu.parallel.sharding import DEFAULT_RULES, shard_params

    n_data = mesh.shape["data"]
    B = batch_per_device * n_data
    cfg = TIGERConfig()
    model = TIGER(cfg)
    seq = cfg.max_len * cfg.code_dim
    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(1, 33, size=(B, seq)), jnp.int32)
    am = jnp.ones((B, seq), jnp.int32)
    # HONEST teacher-forcing targets (up to 2*max_len-1 items, -100
    # padded). The r2 artifact used code_dim-token labels here, which made
    # its 86K ex/s row look 4.5x faster than bench.py's — it was a
    # different (much lighter) workload, not a dispatch gap.
    tgt_items = 2 * cfg.max_len - 1
    lab_np = rng.integers(1, 33, size=(B, tgt_items * cfg.code_dim)).astype(np.int32)
    tgt_lens = rng.integers(1, tgt_items + 1, size=B) * cfg.code_dim
    for i, L in enumerate(tgt_lens):
        lab_np[i, L:] = -100
    lab = jnp.asarray(lab_np)

    params = model.init(jax.random.PRNGKey(0), ii, am, lab)
    params = shard_params(params, mesh, DEFAULT_RULES)
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), NamedSharding(mesh, P()))
    bs = NamedSharding(mesh, P("data"))
    ii, am, lab = (jax.device_put(x, bs) for x in (ii, am, lab))

    @jax.jit
    def step(params, opt_state, ii, am, lab):
        def loss_fn(p):
            loss, _ = model.apply(p, ii, am, lab)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), opt_state, loss

    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, ii, am, lab)
    float(loss)  # value fetch: remote-PJRT block_until_ready under-reports
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, ii, am, lab)
    float(loss)
    dt = time.perf_counter() - t0
    return {"devices": int(np.prod(list(mesh.shape.values()))),
            "global_batch": B, "examples_per_sec": steps * B / dt,
            "step_ms": 1000 * dt / steps}


def bench_sharded_table(mesh, rows: int, dim: int = 64, batch: int = 8192,
                        steps: int = 20):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genrec_tpu.ops.embedding import sharded_embedding_lookup

    M = mesh.shape["model"]
    rows = (rows // max(M, 1)) * max(M, 1)
    table = jax.device_put(
        jnp.zeros((rows, dim), jnp.float32),
        NamedSharding(mesh, P("model", None)))
    rng = np.random.default_rng(0)
    ids = jax.device_put(
        jnp.asarray(rng.integers(0, rows, size=batch), jnp.int32),
        NamedSharding(mesh, P("data")))

    @jax.jit
    def grad_step(t, ids):
        def loss(t):
            e = sharded_embedding_lookup(t, ids, mesh)
            return jnp.sum(e * e)
        return jax.grad(loss)(t)

    g = grad_step(table, ids)
    float(jnp.sum(g))  # value fetch (see above)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = grad_step(table, ids)
    float(jnp.sum(g))
    dt = time.perf_counter() - t0
    return {"rows": rows, "dim": dim, "batch": batch,
            "lookups_per_sec": steps * batch / dt,
            "step_ms": 1000 * dt / steps}


def bench_sasrec_large(mesh, rows: int, dim: int = 64,
                       batch_per_device: int = 512, steps: int = 20):
    """Full SASRecLarge train step (sampled BCE, every embedding read via
    the sharded psum-gather) on a ``rows``-row table."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genrec_tpu.configs import SASRecLargeConfig, ShardedEmbeddingConfig
    from genrec_tpu.models.sasrec_large import SASRecLarge, make_train_step
    from genrec_tpu.parallel.sharding import shard_params

    M = mesh.shape["model"]
    rows = (rows // max(M, 1)) * max(M, 1)
    cfg = SASRecLargeConfig(
        embedding=ShardedEmbeddingConfig(vocab_size=rows, dim=dim))
    item_num = rows - 1
    B = batch_per_device * mesh.shape["data"]
    model = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, item_num, size=(B, cfg.max_len)), jnp.int32)
    t = jnp.asarray(rng.integers(1, item_num, size=(B, cfg.max_len)), jnp.int32)
    params = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh,
                         use_sharded=False).init(jax.random.PRNGKey(0), x)
    params = shard_params(params, mesh)
    # adafactor at ≥10M rows: adam's mu/nu triple the table footprint
    # (3 × rows·dim·4B) and blow HBM on one 16 GB chip; factored second
    # moments keep the optimizer state ~rows+dim floats — the production
    # choice for giant embedding tables.
    tx = (optax.adafactor(1e-3) if rows >= 10_000_000 else optax.adam(1e-3))
    opt_state = tx.init(params)
    bs = NamedSharding(mesh, P("data"))
    x, t = jax.device_put(x, bs), jax.device_put(t, bs)
    step = make_train_step(model, tx, cfg, item_num)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, key)
    float(loss)  # value fetch (see above)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, x, t, key)
    float(loss)
    dt = time.perf_counter() - t0
    return {"model": "sasrec_large", "rows": rows, "dim": dim,
            "global_batch": B, "examples_per_sec": steps * B / dt,
            "step_ms": 1000 * dt / steps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--big-table", action="store_true",
                    help="bench the 10M-row sharded table")
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--out", default=None,
                    help="write all rows to this JSON artifact")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from genrec_tpu.configs import MeshConfig
    from genrec_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    results = []
    shapes = [(1, 1)]
    if n >= 2:
        shapes += [(n, 1), (n // 2, 2)]
    for data, model in shapes:
        mesh = make_mesh(MeshConfig(data_axis=data, model_axis=model),
                         devices=jax.devices()[:data * model])
        r = bench_tiger_dp(mesh, args.batch_per_device)
        r["mesh"] = f"{data}x{model}"
        results.append(r)
        print(json.dumps(r), flush=True)

    table_rows = 10_000_000 if args.big_table else 1_000_000
    mesh = make_mesh(MeshConfig(data_axis=max(n // 2, 1),
                                model_axis=2 if n >= 2 else 1))
    for fn in (bench_sharded_table, bench_sasrec_large):
        r = fn(mesh, table_rows)
        r["mesh"] = f"{mesh.shape['data']}x{mesh.shape['model']}"
        results.append(r)
        print(json.dumps(r), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device_count": n, "results": results}, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
