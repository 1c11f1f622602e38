"""Roofline + device-op breakdown of the beam-20 TIGER eval step.

VERDICT r4 missing #4: training has a full per-op roofline
(artifacts/roofline_r4.json); the beam-20 eval step (21.6K seq/s) had
none, and the no-KV-cache design choice in `ops/beam_search.py:10-12` was
asserted, not measured. This script:

1. times the exact program bench.py's `bench_tiger_beam_eval` runs
   (4 device-resident batches of 256, beam 20, scan over batches),
2. captures an xprof device trace and parses the per-op HLO table
   (self time, HBM bandwidth, bound-by) via the r4_roofline recipe,
3. places the step on the roofline: analytic FLOPs (encoder once +
   cross-KV hoist + 4 unrolled decode calls over the growing token
   buffer + beam top-k) vs measured bytes,
4. groups device time by op category so "is decoder re-attention a top
   op?" is answered with data.

Writes artifacts/beam_roofline_r5.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from scripts.r4_roofline import PEAK_FLOPS, PEAK_HBM, _hlo_table  # noqa: E402

OUT = os.path.join(REPO, "artifacts", "beam_roofline_r5.json")


def build_eval(num_beams=20, n_batches=4, B=256):
    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models import tiger as tiger_mod
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    rng = np.random.default_rng(1)
    seq = cfg.max_len * cfg.code_dim
    ii = rng.integers(1, 33, size=(n_batches, B, seq)).astype(np.int32)
    pad = np.zeros((n_batches, B, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=(n_batches, B)) * cfg.code_dim
    for b in range(n_batches):
        for i, L in enumerate(lens[b]):
            pad[b, i, seq - L:] = 1
    ii *= pad
    batches = jax.device_put(jnp.asarray(ii))
    masks = jax.device_put(jnp.asarray((ii != 0).astype(np.int32)))
    labels = jnp.asarray(rng.integers(1, 33, size=(B, cfg.code_dim)),
                         jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0], masks[0],
                                 labels)
    dims = {"num_beams": num_beams, "n_batches": n_batches, "B": B,
            "enc_len": seq}

    @jax.jit
    def eval_scan(params, batches, masks):
        def body(acc, bm):
            ii, am = bm
            toks, scores = tiger_mod.generate(model, params, ii, am,
                                              num_beams=num_beams,
                                              constraint=None)
            return acc + jnp.sum(scores), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              (batches, masks))
        return acc

    return cfg, eval_scan, (params, batches, masks), dims


def analytic_flops(cfg, B, num_beams):
    """Forward FLOPs of one generate() call on a B-batch (2·m·n·k per
    matmul). Encoder runs once per sample; decode runs max_gen_len-1
    unrolled steps over B·beams rows with the token buffer grown by one
    each step; cross-K/V is hoisted per sample (models/tiger.py:87-91)."""
    a = cfg.arch
    d, h, dk, d_ff, V = a.d_model, a.num_heads, a.d_kv, a.d_ff, a.vocab_size
    Le = cfg.max_len * cfg.code_dim
    Bb = B * num_beams

    def mm(m, n, k):
        return 2 * m * n * k

    # encoder (per sample)
    enc = 0
    for _ in range(a.num_layers):
        enc += mm(B * Le, h * dk, d) * 4          # q,k,v,o
        enc += 2 * mm(B * h * Le, Le, dk)         # scores + ctx
        enc += mm(B * Le, d_ff, d) + mm(B * Le, d, d_ff)
    # cross-K/V hoist (per sample, per decoder layer)
    hoist = a.num_decoder_layers * 2 * mm(B * Le, h * dk, d)
    # decode steps: token buffer length s = 1..max_gen_len-1
    dec = 0
    for s in range(1, cfg.max_gen_len):
        for _ in range(a.num_decoder_layers):
            dec += mm(Bb * s, h * dk, d) * 4          # self q,k,v,o
            dec += 2 * mm(Bb * h * s, s, dk)          # self scores+ctx
            dec += mm(Bb * s, h * dk, d) * 2          # cross q, o
            dec += 2 * mm(Bb * h * s, Le, dk)         # cross scores+ctx
            dec += mm(Bb * s, d_ff, d) + mm(Bb * s, d, d_ff)
        dec += mm(Bb, V, d)                            # lm head (last pos)
    return enc + hoist + dec


def main():
    import jax

    cfg, eval_scan, args, dims = build_eval()
    n_batches, B, beams = dims["n_batches"], dims["B"], dims["num_beams"]

    t = time.perf_counter()
    float(np.asarray(eval_scan(*args)))
    compile_s = time.perf_counter() - t

    calls = 5
    t0 = time.perf_counter()
    for _ in range(calls):
        acc = eval_scan(*args)
    float(np.asarray(acc))
    dt = time.perf_counter() - t0
    seqs_per_s = calls * n_batches * B / dt
    ms_per_call = 1e3 * dt / (calls * n_batches)  # per generate() batch

    logdir = tempfile.mkdtemp(prefix="beam_roofline_")
    with jax.profiler.trace(logdir):
        for _ in range(2):
            acc = eval_scan(*args)
        float(np.asarray(acc))
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    n_profiled = 2 * n_batches  # generate() calls inside the trace

    cols, rows = _hlo_table(xplanes)
    rows.sort(key=lambda r: -r["self_us"])
    device_total_us = sum(r["self_us"] for r in rows)
    total_bytes = sum(r["hbm_bytes"] for r in rows)
    by_cat = {}
    bound_by_us = {}
    for r in rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + r["self_us"]
        b = str(r["bound_by"] or "?")
        bound_by_us[b] = bound_by_us.get(b, 0.0) + r["self_us"]

    flops = analytic_flops(cfg, B, beams)
    flop_ms = 1e3 * flops / PEAK_FLOPS
    byte_ms = 1e3 * (total_bytes / n_profiled) / PEAK_HBM
    attainable = max(flop_ms, byte_ms)

    out = {
        "config": {"B": B, "num_beams": beams, "n_batches": n_batches,
                   "d_model": cfg.arch.d_model, "enc_len": dims["enc_len"],
                   "max_gen_len": cfg.max_gen_len},
        "seqs_per_sec": round(seqs_per_s, 1),
        "ms_per_batch_call": round(ms_per_call, 3),
        "compile_s": round(compile_s, 1),
        "analytic_fwd_flops_per_call": flops,
        "flop_roofline_ms": round(flop_ms, 4),
        "profiler_bytes_per_call": round(total_bytes / n_profiled),
        "byte_roofline_ms": round(byte_ms, 4),
        "attainable_ms": round(attainable, 4),
        "roofline_fraction": round(attainable / ms_per_call, 4),
        "bound": "memory" if byte_ms > flop_ms else "compute",
        "device_total_us_per_call": round(device_total_us / n_profiled, 1),
        "bound_by_us_per_call": {k: round(v / n_profiled, 1)
                                 for k, v in sorted(bound_by_us.items(),
                                                    key=lambda kv: -kv[1])},
        "category_us_per_call": {k: round(v / n_profiled, 1)
                                 for k, v in sorted(by_cat.items(),
                                                    key=lambda kv: -kv[1])},
        "top_ops": [{k: r[k] for k in ("op", "category", "self_us",
                                       "hbm_gib_per_s", "bound_by",
                                       "dma_stall_pct")}
                    for r in rows[:15]],
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("seqs_per_sec", "ms_per_batch_call", "flop_roofline_ms",
                       "byte_roofline_ms", "roofline_fraction", "bound")},
                     indent=1))
    print("top categories:", out["category_us_per_call"])
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
