"""Collective-bytes accounting for the FULL five-pipeline dryrun meshes.

VERDICT r4 #6: the strongest multi-chip-correctness evidence a single-chip
host can produce — lower + compile every pipeline step `dryrun_multichip`
runs, at data=8×model=1 and data=4×model=2, and extract each program's
per-step collective bytes/ops from the compiled HLO. The artifact records
the observed traffic next to the sharding-math expectations:

- pure-DP meshes (8×1): each train step's all-reduce volume ≈ the gradient
  tree (params bytes) — data parallelism syncs exactly one grad per param;
- DP×TP meshes (4×2): the all-reduce volume must DROP (TP-sharded params
  sync only their shard over 'data') while activation collectives
  (all-gather / reduce-scatter / a2a over 'model') appear;
- SASRecLarge: the row-sharded lookups' psum terms scale with B·L·D, not
  with the table size (that is the point of sharding the table).

Usage: python scripts/r5_dryrun_comms.py  (runs on the virtual CPU mesh)
Writes artifacts/dryrun_comms_r5.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from scripts.bench_lookup_comms import collective_bytes  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from genrec_tpu.configs import MeshConfig  # noqa: E402
from genrec_tpu.parallel.mesh import make_mesh  # noqa: E402

OUT = os.path.join(REPO, "artifacts", "dryrun_comms_r5.json")


def tree_bytes(tree) -> int:
    return int(sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "dtype")))


def main() -> None:
    result = {"n_devices": 8, "meshes": {}}
    for data_axis, model_axis in ((8, 1), (4, 2)):
        mesh = make_mesh(MeshConfig(data_axis=data_axis,
                                    model_axis=model_axis))
        key = f"{data_axis}x{model_axis}"
        entry = {}
        for name, fn, args, _check in ge.pipeline_steps(mesh, 8):
            compiled = jax.jit(fn).lower(*args).compile()
            acc = collective_bytes(compiled.as_text())
            if name.endswith("_train"):
                # grads tree == params tree (args[0] is params)
                acc["params_bytes"] = tree_bytes(args[0])
            entry[name] = acc
            print(f"[{key}] {name}: {acc['total_bytes']:,} B "
                  f"{acc['bytes']}", flush=True)
        result["meshes"][key] = entry

    # ---- sharding-math checks (hard-fail if the compiled traffic does
    # not behave as the math predicts) --------------------------------
    m81 = result["meshes"]["8x1"]
    m42 = result["meshes"]["4x2"]
    checks = {}
    # 1. pure DP: grad all-reduce ≈ params bytes (loss scalars add noise,
    #    XLA may pad/fuse buffers — accept 0.8–1.3×)
    for name in ("tiger_train", "rqvae_train", "tiger_prefix_train",
                 "dense_t5_train"):
        ar = m81[name]["bytes"].get("all-reduce", 0)
        pb = m81[name]["params_bytes"]
        ratio = ar / pb
        checks[f"{name}_dp_allreduce_over_params"] = round(ratio, 4)
        assert 0.8 <= ratio <= 1.3, (name, ar, pb)
    # 2. DP×TP decomposition. TP trades grad-sync volume (∝ params, the
    #    8×1 number) for per-layer ACTIVATION all-reduces (∝ B·L·d —
    #    Megatron math: the row/col-sharded matmul pairs partial-sum their
    #    outputs each direction). At these tiny parity dims the activation
    #    term DOMINATES, so 4×2 moves MORE all-reduce than 8×1 — and the
    #    falsifiable prediction separating the two terms is B-scaling:
    #    doubling the batch must leave the pure-DP (8×1) all-reduce bytes
    #    unchanged (grad-sized) while growing the 4×2 bytes by the
    #    activation term. Verified below with a B-doubled TIGER step.
    for name in ("tiger_train", "tiger_prefix_train", "dense_t5_train"):
        ar81 = m81[name]["bytes"].get("all-reduce", 0)
        ar42 = m42[name]["bytes"].get("all-reduce", 0)
        checks[f"{name}_tp_allreduce_ratio_42_over_81"] = round(ar42 / ar81, 4)

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER
    from genrec_tpu.parallel.sharding import DEFAULT_RULES, shard_params

    def tiger_allreduce(mesh, B):
        cfg = TIGERConfig()
        model = TIGER(cfg)
        rng = np.random.default_rng(0)
        seq = cfg.max_len * cfg.code_dim
        ii = jnp.asarray(rng.integers(1, 33, size=(B, seq)), np.int32)
        am = jnp.ones((B, seq), jnp.int32)
        lab = jnp.asarray(rng.integers(1, 33, size=(B, cfg.code_dim)),
                          np.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ii, am, lab)
        params = shard_params(params, mesh, DEFAULT_RULES)
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        bsh = NamedSharding(mesh, P("data"))
        ii, am, lab = (jax.device_put(a, bsh) for a in (ii, am, lab))

        def step(p, o, ii, am, lab):
            def lf(p):
                loss, _ = model.apply(p, ii, am, lab)
                return loss
            loss, g = jax.value_and_grad(lf)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        txt = jax.jit(step).lower(params, opt, ii, am, lab).compile().as_text()
        return collective_bytes(txt)["bytes"].get("all-reduce", 0)

    mesh81 = make_mesh(MeshConfig(data_axis=8, model_axis=1))
    mesh42 = make_mesh(MeshConfig(data_axis=4, model_axis=2))
    b_scale = {}
    for key2, mesh in (("8x1", mesh81), ("4x2", mesh42)):
        arB = tiger_allreduce(mesh, 16)
        ar2B = tiger_allreduce(mesh, 32)
        b_scale[key2] = {"B16": arB, "B32": ar2B,
                         "growth": round(ar2B / arB, 4)}
        print(f"[b-scale {key2}] all-reduce B16={arB:,} B32={ar2B:,}")
    checks["tiger_allreduce_b_scaling"] = b_scale
    # pure DP: grad-sized, batch-independent
    assert b_scale["8x1"]["B16"] == b_scale["8x1"]["B32"], b_scale
    # DP×TP: the activation term grows with B
    assert b_scale["4x2"]["B32"] > b_scale["4x2"]["B16"], b_scale
    # and the B-dependent part is the activation term exactly: removing it
    # (extrapolating to B→0) leaves approximately the sharded grad sync,
    # which must be BELOW the pure-DP grad sync (TP shards the params)
    act_per_b16 = b_scale["4x2"]["B32"] - b_scale["4x2"]["B16"]
    grad_part_42 = b_scale["4x2"]["B16"] - act_per_b16
    checks["tiger_42_grad_component_bytes"] = grad_part_42
    checks["tiger_42_activation_component_bytes_at_B16"] = act_per_b16
    assert grad_part_42 < b_scale["8x1"]["B16"], (
        grad_part_42, b_scale["8x1"]["B16"])
    # 3. SASRecLarge table-size decomposition. The LOOKUP path's traffic
    #    is table-size independent (psum of assembled (B·L·D) rows, local
    #    top-k + (B, M·k) merge) — asserted exactly on the eval/top-k
    #    program below. The TRAIN step additionally carries the dense
    #    table GRADIENT's data-parallel sync, which is ∝ V·D (each
    #    'model' shard all-reduces its (V/M, D) grad over 'data') —
    #    growing the vocab 8× must grow collective bytes by ≈ the extra
    #    table-grad rows and nothing else. (A 10M-row production config
    #    would switch to sparse/unique-ids grad exchange; the dense sync
    #    is the faithful cost of plain autodiff and is recorded here.)
    import optax as _optax

    from genrec_tpu.configs import SASRecLargeConfig, ShardedEmbeddingConfig
    from genrec_tpu.models.sasrec_large import SASRecLarge, make_train_step
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

    def sasrec_large_bytes(mesh, vocab, program="train",
                           lookup_impl="psum"):
        lcfg = SASRecLargeConfig(
            max_len=8, num_blocks=1, num_heads=1, mlp_layer=16, dropout=0.2,
            num_neg_samples=4,
            embedding=ShardedEmbeddingConfig(vocab_size=vocab, dim=16))
        item_num = vocab - 1
        lmodel = SASRecLarge(item_num=item_num, cfg=lcfg, mesh=mesh,
                             lookup_impl=lookup_impl, alltoall_capacity=1.25)
        rng = np.random.default_rng(0)
        import jax.numpy as jnp
        x = jnp.asarray(rng.integers(1, item_num, size=(16, 8)), np.int32)
        t = jnp.asarray(rng.integers(1, item_num, size=(16, 8)), np.int32)
        lp = SASRecLarge(item_num=item_num, cfg=lcfg, mesh=mesh,
                         use_sharded=False).init(jax.random.PRNGKey(3), x)
        from genrec_tpu.parallel.sharding import shard_params as _sp
        lp = _sp(lp, mesh)
        ltx = _optax.adam(1e-3)
        lopt = ltx.init(lp)
        bsh = _NS(mesh, _P("data"))
        x, t = jax.device_put(x, bsh), jax.device_put(t, bsh)
        if program == "topk":
            fn = lambda p, xx: lmodel.apply(p, xx, 10,
                                            method=SASRecLarge.predict_topk)
            txt = jax.jit(fn).lower(lp, x).compile().as_text()
        else:
            step = make_train_step(lmodel, ltx, lcfg, item_num, jit=False)
            txt = jax.jit(step).lower(lp, lopt, x, t,
                                      jax.random.PRNGKey(4)).compile().as_text()
        return collective_bytes(txt)["total_bytes"]

    mesh42b = make_mesh(MeshConfig(data_axis=4, model_axis=2))
    V0, V1 = 8192, 65536
    t_small = sasrec_large_bytes(mesh42b, V0)
    t_large = sasrec_large_bytes(mesh42b, V1)
    e_small = sasrec_large_bytes(mesh42b, V0, "topk")
    e_large = sasrec_large_bytes(mesh42b, V1, "topk")
    checks["sasrec_large_train_bytes_v8192"] = t_small
    checks["sasrec_large_train_bytes_v65536"] = t_large
    checks["sasrec_large_topk_bytes_v8192"] = e_small
    checks["sasrec_large_topk_bytes_v65536"] = e_large
    print(f"[table-scale 4x2] train v8192={t_small:,} v65536={t_large:,}; "
          f"topk v8192={e_small:,} v65536={e_large:,}")
    # eval lookup/top-k traffic: EXACTLY table-size independent
    assert e_small == e_large, (e_small, e_large)
    # train delta = the extra table-grad rows' sync, a small per-row
    # constant × D floats (k·D·4 with k a small integer — XLA may sync
    # the grad and optimizer-moment buffers per its layout choices);
    # anything outside [1, 4]·D·4 would mean collectives scale with the
    # table in a way the sharding math does not predict
    per_row = (t_large - t_small) / (V1 - V0)
    checks["sasrec_large_train_extra_bytes_per_table_row"] = round(per_row, 2)
    D = 16
    assert 1 * D * 4 <= per_row <= 4 * D * 4, per_row

    # 4. the DIFFERENTIABLE all_to_all lookup's TRAINING bytes (VERDICT
    #    r4 #3 "bytes-per-step comparison row"): compile the same train
    #    step with lookup_impl='alltoall' (capacity 1.25, the low-skew
    #    regime where the rule prefers a2a) and record both impls —
    #    backward traffic mirrors forward, so the a2a step must carry
    #    all-to-all ops in its compiled HLO and its total must stay the
    #    same order as psum's.
    t_a2a = sasrec_large_bytes(mesh42b, V0, "train", lookup_impl="alltoall")
    checks["sasrec_large_train_bytes_psum_v8192"] = t_small
    checks["sasrec_large_train_bytes_alltoall_c1.25_v8192"] = t_a2a
    print(f"[lookup-impl 4x2] train bytes psum={t_small:,} a2a={t_a2a:,}")
    assert 0.3 * t_small < t_a2a < 3 * t_small, (t_small, t_a2a)
    result["checks"] = checks
    result["note"] = (
        "bytes = sum of result-shape bytes of all-reduce/all-gather/"
        "all-to-all/reduce-scatter/collective-permute ops in the compiled "
        "HLO (scripts/bench_lookup_comms.collective_bytes), i.e. the "
        "logical payload each device assembles per step. Checks hard-fail "
        "when compiled traffic deviates from the sharding math.")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
