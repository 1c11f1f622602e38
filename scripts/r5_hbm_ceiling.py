"""Measure the PRACTICAL HBM bandwidth ceiling of this chip.

VERDICT r4 weak #1 says the TIGER step leaves "~2× bandwidth headroom"
against the 819 GB/s v5e paper peak. But the step's HBM-bound device time
already sustains ~496 GB/s (4.8 GB / 9.67 ms, artifacts/roofline_r4.json)
— so the question is what a TPU v5e can ACTUALLY sustain on the access
patterns XLA emits. This microbench measures:

- copy   (1 read + 1 write per element)
- scale  (1R + 1W with a multiply)
- triad  (2R + 1W, a = b + s*c — the classic STREAM upper bound)
- fused elementwise chain mimicking the step's residual/norm traffic

at sizes from 64 MB to 1 GB, and a d512 matmul's effective bandwidth for
reference. The sustained number defines the honest roofline denominator
for roofline_r4/step_opt_r5 fractions.

Writes artifacts/hbm_ceiling_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "hbm_ceiling_r5.json")


def timed(fn, x, *rest, iters=100):
    """One jit dispatch running `iters` serially-dependent iterations via
    fori_loop (no cross-iteration fusion, no per-iter RPC latency — the
    tunneled link costs ~ms per dispatch), ended with a VALUE fetch (this
    device's block_until_ready returns before work lands)."""
    import jax
    from jax import lax

    @jax.jit
    def loop(x, *rest):
        return lax.fori_loop(0, iters, lambda i, xx: fn(xx, *rest), x)

    r = loop(x, *rest)
    float(np.asarray(r.ravel()[0]))
    t0 = time.perf_counter()
    r = loop(x, *rest)
    float(np.asarray(r.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    results = {"device": jax.devices()[0].device_kind, "paper_peak_gbps": 819,
               "kernels": []}
    for mb in (64, 256, 512):
        n = mb * 1024 * 1024 // 4
        a = jnp.arange(n, dtype=jnp.float32)
        b = jnp.ones((n,), jnp.float32)

        copy = jax.jit(lambda x: x * 1.0000001)  # not foldable to identity
        scale = jax.jit(lambda x: x * 1.01)
        triad = jax.jit(lambda x, y: x + 1.7 * y)

        for name, fn, args, bytes_moved in (
            ("copy", copy, (a,), 2 * n * 4),
            ("scale", scale, (a,), 2 * n * 4),
            ("triad", triad, (a, b), 3 * n * 4),
        ):
            dt = timed(fn, *args)
            gbps = bytes_moved / dt / 1e9
            results["kernels"].append(
                {"kernel": name, "mb": mb, "gbps": round(gbps, 1)})
            print(f"{name} {mb}MB: {gbps:.0f} GB/s", flush=True)

    # a residual+norm-like chain (what the step's loop fusions do):
    # x = norm(x + y) over (B, L, d) f32, reading 2 tensors writing 1
    B, L, d = 256, 156, 1024
    x = jnp.ones((B, L, d), jnp.float32)
    y = jnp.ones((B, L, d), jnp.float32)

    @jax.jit
    def resnorm(x, y):
        h = x + y
        var = jnp.mean(h * h, axis=-1, keepdims=True)
        return h * jax.lax.rsqrt(var + 1e-6)

    dt = timed(resnorm, x, y)
    bytes_moved = 3 * B * L * d * 4
    results["kernels"].append({"kernel": "residual_rmsnorm", "mb": round(
        bytes_moved / 2 ** 20), "gbps": round(bytes_moved / dt / 1e9, 1)})
    print(f"residual_rmsnorm: {bytes_moved / dt / 1e9:.0f} GB/s", flush=True)

    # softmax over a score-shaped tensor (the attention chain's pattern)
    s = jnp.ones((256 * 4, 156, 156), jnp.float32)
    sm = jax.jit(lambda t: jax.nn.softmax(t, axis=-1))
    dt = timed(sm, s)
    bytes_moved = 2 * s.size * 4
    results["kernels"].append({"kernel": "softmax_156x156",
                               "mb": round(bytes_moved / 2 ** 20),
                               "gbps": round(bytes_moved / dt / 1e9, 1)})
    print(f"softmax: {bytes_moved / dt / 1e9:.0f} GB/s", flush=True)

    # memory-bound matmul reference (d64 parity shapes): effective BW of
    # (B·L, d) @ (d, d_ff) @ (d_ff, d) at the step's actual operand sizes
    # (round-trip through d_ff so iterations chain)
    xx = jnp.ones((256 * 156, 64), jnp.float32) * 0.01
    w1 = jnp.full((64, 256), 0.01, jnp.float32)
    w2 = jnp.full((256, 64), 0.01, jnp.float32)
    mm = jax.jit(lambda x, a, b: jnp.tanh(x @ a) @ b)
    dt = timed(mm, xx, w1, w2)
    bytes_moved = (2 * xx.size + 2 * 256 * 156 * 256) * 4
    results["kernels"].append({"kernel": "matmul_d64_dff256",
                               "mb": round(bytes_moved / 2 ** 20),
                               "gbps": round(bytes_moved / dt / 1e9, 1)})
    print(f"matmul d64: {bytes_moved / dt / 1e9:.0f} GB/s", flush=True)

    best = max(k["gbps"] for k in results["kernels"])
    results["practical_ceiling_gbps"] = best
    results["note"] = (
        "practical_ceiling_gbps = best sustained stream kernel; use this "
        "as the roofline denominator instead of the 819 GB/s paper peak "
        "when judging whether a step is at speed of light.")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"ceiling {best} GB/s — wrote {OUT}")


if __name__ == "__main__":
    main()
