"""Long-context capability artifact (VERDICT r3 weak #8 / next-round #6).

Two halves, one artifact (artifacts/ring_cp_r4.json):

- ``--virtual``: the `long_context_sasrec_config` (L=2048) trains on an
  8-device CPU mesh (data=2 × ctx=4) with the sequence axis sharded and
  every attention a ppermute ring. Records correctness (CP forward vs the
  single-path model), the loss trajectory of real optimizer steps, and
  the per-step collective bytes from the compiled HLO (the honest
  cross-device traffic number — virtual-mesh wall clock is meaningless).

- ``--chip``: the SAME config single-chip on the real TPU: L=2048 crosses
  the `ops/attention._use_pallas` gate so every block runs the blockwise
  flash kernel fwd+bwd. Asserts the Mosaic custom-call is in the compiled
  program and measures ms/step.

Usage: run --virtual under JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8; --chip on the default
backend.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "ring_cp_r4.json")


def _merge(update: dict) -> None:
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data.update(update)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1, default=float)
    print("WROTE", OUT, json.dumps(update, default=float)[:400], flush=True)


def run_virtual() -> None:
    import jax
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bench_lookup_comms import collective_bytes

    from genrec_tpu.configs import (ShardedEmbeddingConfig,
                                    long_context_sasrec_config)
    from genrec_tpu.models.sasrec_large import SASRecLarge, make_train_step

    L, B = 2048, 4
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "ctx"))
    cfg = dataclasses.replace(
        long_context_sasrec_config(max_len=L, dim=32),
        num_blocks=2, num_heads=2, mlp_layer=64,
        embedding=ShardedEmbeddingConfig(vocab_size=4096, dim=32))
    item_num = cfg.embedding.vocab_size - 1
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, item_num, size=(B, L)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, item_num, size=(B, L)), jnp.int32)

    ref = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh,
                      use_sharded=False)
    params = ref.init(jax.random.PRNGKey(0), ids)
    cp = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh,
                     use_sharded=False, ctx_axis=cfg.context_parallel_axis)
    sh = NamedSharding(mesh, P("data", "ctx"))
    ids_sh, tgt_sh = jax.device_put(ids, sh), jax.device_put(tgt, sh)

    out_ref = jax.jit(lambda p, x: ref.apply(p, x))(params, ids)
    out_cp = jax.jit(lambda p, x: cp.apply(p, x))(params, ids_sh)
    fwd_err = float(jnp.max(jnp.abs(out_cp - out_ref)))

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(cp, tx, cfg, item_num)
    comp = step.lower(
        params, opt, ids_sh, tgt_sh, jax.random.PRNGKey(0)).compile()
    comms = collective_bytes(comp.as_text())

    losses = []
    p = params
    for i in range(12):
        p, opt, loss = step(p, opt, ids_sh, tgt_sh, jax.random.PRNGKey(i))
        losses.append(float(loss))

    # analytic ring traffic: per hop each device sends its local K and V
    # blocks — (B/dp)·(L/M)·D f32 each — for M−1 hops per attention layer
    # on the forward pass (the backward roughly doubles this through the
    # transposed permutes)
    dp, M = mesh.shape["data"], mesh.shape["ctx"]
    per_hop = 2 * (B // dp) * (L // M) * cfg.embedding.dim * 4
    analytic_fwd = cfg.num_blocks * (M - 1) * per_hop
    _merge({"virtual": {
        "mesh": {"data": dp, "ctx": M}, "L": L, "B": B,
        "dim": cfg.embedding.dim, "num_blocks": cfg.num_blocks,
        "fwd_max_abs_err_vs_single_path": fwd_err,
        "train_losses": losses,
        "train_step_collective_bytes": comms,
        "analytic_ring_bytes_fwd_per_device": analytic_fwd,
        "note": "collective bytes from compiled HLO; includes fwd+bwd "
                "ppermutes and the DP grad all-reduce",
    }})
    assert fwd_err < 1e-4, fwd_err
    # per-step sampled-BCE loss is noisy (fresh negatives each step);
    # compare the first-vs-last halves of the trajectory instead
    assert (np.mean(losses[-3:]) < np.mean(losses[:3])), losses
    assert comms["ops"].get("collective-permute", 0) > 0, comms


def run_chip(L: int = 2048, B: int = 16) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import MeshConfig, long_context_sasrec_config
    from genrec_tpu.models.sasrec_large import SASRecLarge, make_train_step
    from genrec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data_axis=1, model_axis=1))
    cfg = long_context_sasrec_config(max_len=L, dim=64)
    item_num = cfg.embedding.vocab_size - 1
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, item_num, size=(B, L)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, item_num, size=(B, L)), jnp.int32)

    model = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh,
                        use_sharded=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_train_step(model, tx, cfg, item_num)
    comp = step.lower(
        params, opt, ids, tgt, jax.random.PRNGKey(0)).compile()
    hlo = comp.as_text()
    has_mosaic = ("tpu_custom_call" in hlo) or ("mosaic" in hlo.lower())

    losses = []
    p = params
    t0 = None
    steps = 30
    for i in range(steps + 5):
        if i == 5:  # past compile+warmup
            t0 = time.perf_counter()
        p, opt, loss = step(p, opt, ids, tgt, jax.random.PRNGKey(i))
        if i in (0, steps + 4):
            losses.append(float(loss))
    dt = (time.perf_counter() - t0) / steps
    _merge({("chip" if L == 2048 else f"chip_L{L}"): {
        "device": jax.devices()[0].device_kind, "L": L, "B": B,
        "dim": cfg.embedding.dim, "num_blocks": cfg.num_blocks,
        "flash_kernel_in_program": bool(has_mosaic),
        "ms_per_step": 1e3 * dt,
        "examples_per_sec": B / dt,
        "tokens_per_sec": B * L / dt,
        "loss_first": losses[0], "loss_last": losses[-1],
    }})
    assert has_mosaic, f"L={L} step compiled without the flash kernel"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--chip-L", type=int, nargs="*", default=[2048],
                    help="sequence lengths for the single-chip sweep; B "
                    "scales down to keep B*L tokens/step constant")
    args = ap.parse_args()
    if args.virtual:
        run_virtual()
    if args.chip:
        for L in args.chip_L:
            # B halves twice as fast as L grows past 2048: XLA scopes the
            # dkv kernel's (B·H, L, d) output pair to VMEM, and (32, 4096,
            # 16) f32 ×2 already exceeds the 16 MB scoped limit by 52 KB
            B = 16 if L <= 2048 else max(2, 8 * 2048 // L)
            run_chip(L=L, B=B)
