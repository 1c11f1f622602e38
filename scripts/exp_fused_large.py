"""Does the fused T5 attention kernel pay at SCALED configs?

The parity-shape measurement (d_model 64, H4/D16) found it neutral; this
sweeps the scaled T5 stack (d_model 512, 8 heads x d_kv 64 — the bf16
scaling config from ARCHITECTURE.md) and a mid shape, timing the full
TIGER train step fused vs XLA, dropout on and off. Appends results to
artifacts/t5_attention_validate.json under "scaled_configs".
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(arch_over, mode, dropout, B=64, steps=30):
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    base = TIGERConfig()
    cfg = dataclasses.replace(base, arch=dataclasses.replace(
        base.arch, fused_attention=mode, **arch_over))
    model = TIGER(cfg)
    rng = np.random.default_rng(0)
    seq = cfg.max_len * cfg.code_dim
    ii = rng.integers(1, 33, size=(B, seq)).astype(np.int32)
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=B) * cfg.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    ii *= pad
    Lt = (2 * cfg.max_len - 1) * cfg.code_dim
    lab = rng.integers(1, 33, size=(B, Lt)).astype(np.int32)
    tl = rng.integers(1, 2 * cfg.max_len, size=B) * cfg.code_dim
    for i, L in enumerate(tl):
        lab[i, L:] = -100
    ii = jnp.asarray(ii)
    am = jnp.asarray((np.asarray(ii) != 0).astype(np.int32))
    lab = jnp.asarray(lab)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), ii, am, lab)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def epoch(params, opt, key, n):
        def body(carry, _):
            params, opt, key = carry
            key, sub = jax.random.split(key)

            def lf(p):
                loss, _ = model.apply(p, ii, am, lab,
                                      deterministic=not dropout,
                                      rngs={"dropout": sub})
                return loss

            loss, g = jax.value_and_grad(lf)(params)
            u, opt = tx.update(g, opt, params)
            return (optax.apply_updates(params, u), opt, key), loss

        (params, opt, key), losses = jax.lax.scan(
            body, (params, opt, key), None, length=n)
        return params, opt, key, losses

    fit = jax.jit(epoch, static_argnums=(3,), donate_argnums=(0, 1))
    key = jax.random.key(1, impl="rbg")
    params, opt, key, losses = fit(params, opt, key, steps)
    float(np.asarray(losses[-1]))
    t0 = time.perf_counter()
    params, opt, key, losses = fit(params, opt, key, steps)
    l1 = float(np.asarray(losses[-1]))
    dt = time.perf_counter() - t0
    return {"ms_per_step": round(1e3 * dt / steps, 3),
            "examples_per_sec": round(B * steps / dt, 1),
            "loss_last": l1}


def main():
    shapes = {
        "d512_h8_dkv64": {"d_model": 512, "num_heads": 8, "d_kv": 64,
                          "d_ff": 2048},
        "d256_h8_dkv32": {"d_model": 256, "num_heads": 8, "d_kv": 32,
                          "d_ff": 1024},
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                            "t5_attention_validate.json")
    with open(out_path) as f:
        art = json.load(f)
    art.setdefault("scaled_configs", {})
    for name, over in shapes.items():
        for mode in ("off", "auto"):
            for dropout in (True, False):
                k = f"{name}_{mode}_drop{int(dropout)}"
                try:
                    art["scaled_configs"][k] = timed(over, mode, dropout)
                except Exception as e:
                    art["scaled_configs"][k] = {
                        "error": f"{type(e).__name__}: {e}"[:200]}
                print(k, art["scaled_configs"][k], flush=True)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print("WROTE", out_path)


if __name__ == "__main__":
    main()
