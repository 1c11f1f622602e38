"""Attention-dropout mask cost experiments (VERDICT r3 next-round #4).

The fused T5 kernel loses with dropout on (15.9 vs 12.9 ms/step at the
parity shape) because the (H·B, Lq, Lk) multiplicative mask must be
produced XLA-side. This script isolates the mask pipeline and measures:

1. mask GENERATION alone, per variant × key impl (threefry vs rbg):
   - ``bernoulli``: current `make_dropout_mask` (f32 uniform → where → bf16)
   - ``u8cmp``: `random.bits(u8) < ceil(keep·256)` → bf16 · 1/keep
     (quantizes the rate to 1/256 steps — irrelevant for dropout — and
     never materializes a 4-byte-per-element intermediate)
   - ``u8mask``: same comparison but emitting a {0,1} u8 mask (¼ the HBM
     bytes of bf16; needs an in-kernel convert to consume)
2. the full TIGER train step (fused kernel, dropout 0.1) with
   `make_dropout_mask` monkeypatched per generation variant, against the
   XLA path — the decision measurement for flipping `fused_attention`.

Writes artifacts/dropout_mask_exp_r4.json.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "dropout_mask_exp_r4.json")
RES = {}


def main():
    import jax
    import jax.numpy as jnp

    from genrec_tpu.ops import t5_attention as t5a

    rate = 0.1
    keep = 1.0 - rate
    # the three mask shapes of the TIGER parity step (B=256, enc 80,
    # dec 156, H=4): enc self, dec self, cross
    shapes = [(1024, 80, 80), (1024, 156, 156), (1024, 156, 80)]

    def gen_bernoulli(key, shape):
        kp = jax.random.bernoulli(key, keep, shape)
        return jnp.where(kp, 1.0 / keep, 0.0).astype(jnp.bfloat16)

    def gen_u8cmp(key, shape):
        t = int(np.ceil(keep * 256))
        bits = jax.random.bits(key, shape, dtype=jnp.uint8)
        return (bits < t).astype(jnp.bfloat16) * jnp.bfloat16(1.0 / keep)

    def gen_u8mask(key, shape):
        t = int(np.ceil(keep * 256))
        bits = jax.random.bits(key, shape, dtype=jnp.uint8)
        return (bits < t).astype(jnp.uint8)

    def timed(fn, key, steps=50):
        o = fn(key)
        jax.block_until_ready(o)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(steps):
                o = fn(jax.random.fold_in(key, i))
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / steps)
        return 1e3 * best

    RES["generation_ms"] = {}
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        for name, gen in (("bernoulli", gen_bernoulli),
                          ("u8cmp", gen_u8cmp), ("u8mask", gen_u8mask)):
            def all_masks(k, gen=gen):
                ks = jax.random.split(k, len(shapes))
                return [gen(kk, s) for kk, s in zip(ks, shapes)]
            ms = timed(jax.jit(all_masks), key)
            RES["generation_ms"][f"{impl}_{name}"] = ms
            print(f"gen {impl} {name}: {ms:.3f} ms", flush=True)

    # --- full train step with patched generation variants ----------------
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    base_cfg = TIGERConfig()
    B = 256
    rng = np.random.default_rng(0)
    seq = base_cfg.max_len * base_cfg.code_dim
    ii = rng.integers(1, 33, size=(B, seq)).astype(np.int32)
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, base_cfg.max_len + 1, size=B) * base_cfg.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    ii *= pad
    Lt = (2 * base_cfg.max_len - 1) * base_cfg.code_dim
    lab = rng.integers(1, 33, size=(B, Lt)).astype(np.int32)
    tl = rng.integers(1, 2 * base_cfg.max_len, size=B) * base_cfg.code_dim
    for i, L in enumerate(tl):
        lab[i, L:] = -100
    ii = jnp.asarray(ii)
    am = jnp.asarray((np.asarray(ii) != 0).astype(np.int32))
    lab = jnp.asarray(lab)

    def step_time(mode, steps=60):
        cfg = dataclasses.replace(base_cfg, arch=dataclasses.replace(
            base_cfg.arch, fused_attention=mode))
        model = TIGER(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ii, am, lab)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def epoch(params, opt, key, n):
            def body(carry, _):
                params, opt, key = carry
                key, sub = jax.random.split(key)

                def lf(p):
                    loss, _ = model.apply(p, ii, am, lab,
                                          deterministic=False,
                                          rngs={"dropout": sub})
                    return loss
                loss, g = jax.value_and_grad(lf)(params)
                u, opt = tx.update(g, opt, params)
                return (optax.apply_updates(params, u), opt, key), loss
            (params, opt, key), losses = jax.lax.scan(
                body, (params, opt, key), None, length=n)
            return params, opt, key, losses[-1]

        fit = jax.jit(epoch, static_argnums=(3,), donate_argnums=(0, 1))
        key = jax.random.key(1, impl="rbg")
        st = fit(params, opt, key, steps)
        l0 = float(np.asarray(st[-1]))
        t0 = time.perf_counter()
        st = fit(*st[:3], steps)
        l1 = float(np.asarray(st[-1]))
        dt = time.perf_counter() - t0
        return {"ms_per_step": 1e3 * dt / steps, "loss_last": l1}

    def gen_u8cmp_given_key(key, hb, lq, lk, r, dtype=jnp.bfloat16):
        # u8-bits compare on the incoming (rbg-derived) key
        t = int(np.ceil((1.0 - r) * 256))
        bits = jax.random.bits(key, (hb, lq, lk), dtype=jnp.uint8)
        return (bits < t).astype(dtype) * jnp.asarray(256.0 / t, dtype)

    def gen_u8cmp_threefry(key, hb, lq, lk, r, dtype=jnp.bfloat16):
        # convert the key to threefry first (fast in isolation, slower
        # in-step — the conversion defeats XLA's rbg/compute overlap)
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            data = jax.random.key_data(key).ravel()
            key = jax.random.wrap_key_data(data[:2], impl="threefry2x32")
        return gen_u8cmp_given_key(key, hb, lq, lk, r, dtype)

    orig = t5a.make_dropout_mask
    variants = {
        # the SHIPPED implementation: bernoulli on the given key (fastest
        # in-step of everything measured — the retirement rationale)
        "bernoulli_given_key": orig,
        "u8cmp_given_key": gen_u8cmp_given_key,
        "u8cmp_threefry_converted": gen_u8cmp_threefry,
    }
    RES["train_step"] = {}
    try:
        RES["train_step"]["xla_off_drop1"] = step_time("off")
        print("xla off:", RES["train_step"]["xla_off_drop1"], flush=True)
        for name, fn in variants.items():
            t5a.make_dropout_mask = fn
            # "on" — the shipped "auto" gate excludes dropout configs
            # (that retirement is this experiment's conclusion), so the
            # fused path must be forced to measure it
            RES["train_step"][f"fused_{name}"] = step_time("on")
            print(f"fused {name}:", RES["train_step"][f"fused_{name}"],
                  flush=True)
    finally:
        t5a.make_dropout_mask = orig

    RES["device"] = jax.devices()[0].device_kind
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print("WROTE", OUT)


if __name__ == "__main__":
    main()
