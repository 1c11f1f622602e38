"""Speed-of-light microbench: Pallas flash attention vs XLA attention.

SURVEY.md §7.7: per-kernel benches on the real chip. Runs both paths
COMPILED (no interpret mode) at long-context shapes, checks numerics
agree, and reports ms + achieved FLOP/s against the chip's peak.

    python scripts/bench_attention.py --out artifacts/attention_microbench.json

The parity configs top out at 83 tokens, where XLA's fused attention wins
(that's why `_use_pallas` gates the kernel to >=256); this bench is the
evidence for that gate and for the long-context readiness claim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_one(B, H, L, D, causal, dtype_name, steps=30):
    import jax
    import jax.numpy as jnp

    from genrec_tpu.ops.attention import _xla_attention, flash_attention

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), dtype)

    pallas_fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))
    xla_fn = jax.jit(lambda q, k, v: _xla_attention(q, k, v, None, causal))

    o_p = pallas_fn(q, k, v)
    o_x = xla_fn(q, k, v)
    err = float(jnp.max(jnp.abs(o_p.astype(jnp.float32)
                                - o_x.astype(jnp.float32))))
    # On TPU the MXU truncates f32 matmul inputs to bf16 at DEFAULT
    # precision on BOTH paths, and the two paths sum in different orders
    # (online softmax vs direct), so f32 agreement is bounded by bf16
    # granularity too — hence one tolerance for both dtypes.
    tol = 2e-2
    assert err < tol, f"pallas/xla mismatch {err} at {(B, H, L, D, causal)}"

    def timed(fn):
        # best-of-3 timed blocks: the tunneled PJRT link adds sporadic
        # multi-ms hiccups that average-of-one overstates.
        r = fn(q, k, v)
        float(jnp.sum(r.astype(jnp.float32)))  # force value fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                r = fn(q, k, v)
            float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / steps)
        return best

    t_pallas = timed(pallas_fn)
    t_xla = timed(xla_fn)
    # 4*B*H*L^2*D matmul FLOPs (QK^T + PV), halved when causal
    flops = 4.0 * B * H * L * L * D * (0.5 if causal else 1.0)
    return {
        "B": B, "H": H, "L": L, "D": D, "causal": causal,
        "dtype": dtype_name, "max_abs_err": err,
        "pallas_ms": 1000 * t_pallas, "xla_ms": 1000 * t_xla,
        "pallas_tflops": flops / t_pallas / 1e12,
        "xla_tflops": flops / t_xla / 1e12,
        "speedup_pallas_over_xla": t_xla / t_pallas,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "attention_microbench.json"))
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax

    shapes = [
        # (B, H, L, D, causal)
        (8, 8, 256, 64, True),
        (8, 8, 512, 64, True),
        (8, 8, 1024, 64, True),
        (8, 8, 2048, 64, True),
        (4, 8, 1024, 128, True),
        (8, 8, 1024, 64, False),
    ]
    rows = []
    for B, H, L, D, causal in shapes:
        for dt in ("bf16", "f32"):
            r = bench_one(B, H, L, D, causal, dt, args.steps)
            rows.append(r)
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in r.items()}), flush=True)

    dev = jax.devices()[0]
    out = {"backend": jax.default_backend(),
           "device_kind": dev.device_kind, "results": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
