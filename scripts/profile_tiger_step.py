"""Device-level op breakdown of the TIGER train step via xprof.

Captures a jax.profiler trace of one scan-stepped epoch on chip, then
parses the xplane with xprof's converter into per-HLO-op self-times.

    python scripts/profile_tiger_step.py [--dropout] [--dec-items 39]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dec-items", type=int, default=39)
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    from genrec_tpu.configs import TIGERConfig
    from scripts.exp_tiger_step import build, time_step  # noqa: F401

    import dataclasses
    import time

    import jax.numpy as jnp
    import optax

    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
    rng = np.random.default_rng(0)
    ii, am, lab = build(cfg, B, args.dec_items, rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ii, am, lab)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    dropout = not args.no_dropout

    def epoch(params, opt_state, key, n):
        def body(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(p):
                loss, _ = model.apply(p, ii, am, lab,
                                      deterministic=not dropout,
                                      rngs={"dropout": sub} if dropout else {})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=n)
        return params, opt_state, key, losses[-1]

    fit = jax.jit(epoch, static_argnums=(3,))
    try:
        key = jax.random.key(1, impl="rbg")
    except TypeError:
        key = jax.random.PRNGKey(1)
    state = fit(params, opt_state, key, args.steps)
    float(np.asarray(state[-1]))

    logdir = tempfile.mkdtemp(prefix="tigerprof_")
    with jax.profiler.trace(logdir):
        state = fit(params, opt_state, key, args.steps)
        float(np.asarray(state[-1]))

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        except Exception as e:
            print(f"{tool}: FAILED {e}", file=sys.stderr)
            continue
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except Exception:
                pass
            try:
                data = data.decode()
            except Exception:
                print(f"{tool}: binary, {len(data)} bytes", file=sys.stderr)
                continue
        out = os.path.join(logdir, tool + ".json")
        with open(out, "w") as f:
            f.write(data)
        print(f"{tool}: wrote {out} ({len(data)} chars)", file=sys.stderr)
        if tool == "hlo_stats":
            try:
                d = json.loads(data)
                _summarize_hlo(d, args.top)
            except Exception as e:
                print("summarize failed:", e, file=sys.stderr)
    print(logdir)


def _summarize_hlo(d, top):
    # gviz-style table: {cols: [...], rows: [{c: [{v:..}, ..]}]}
    cols = [c.get("label") or c.get("id") for c in d.get("cols", [])]
    rows = d.get("rows", [])
    print("columns:", cols, file=sys.stderr)

    def col(name_part):
        for i, c in enumerate(cols):
            if c and name_part.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("hlo op name") or col("name")
    i_time = col("total time") or col("self time") or col("time (us)")
    agg = {}
    for r in rows:
        c = r["c"]
        cat = c[i_cat]["v"] if i_cat is not None else "?"
        t = float(c[i_time]["v"]) if i_time is not None and c[i_time] else 0.0
        agg[cat] = agg.get(cat, 0.0) + t
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v:12.1f}  {k}")


if __name__ == "__main__":
    main()
