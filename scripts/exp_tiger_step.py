"""Decompose the TIGER train-step time on chip: which knob owns the ms?

Variants over the honest bench workload (B=256, enc 80 tokens, dec 156
teacher-forcing tokens): decoder length, dropout on/off, f32 vs bf16
compute, scan-stepped vs single-call. Prints one JSON dict.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(cfg, B, Lt_items, rng):
    import jax.numpy as jnp

    seq = cfg.max_len * cfg.code_dim
    ii = rng.integers(1, 33, size=(B, seq)).astype(np.int32)
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=B) * cfg.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    ii *= pad
    Lt = Lt_items * cfg.code_dim
    lab = rng.integers(1, 33, size=(B, Lt)).astype(np.int32)
    tgt_lens = rng.integers(1, Lt_items + 1, size=B) * cfg.code_dim
    for i, L in enumerate(tgt_lens):
        lab[i, L:] = -100
    return (jnp.asarray(ii), jnp.asarray((ii != 0).astype(np.int32)),
            jnp.asarray(lab))


def time_step(cfg, B=256, Lt_items=39, dropout=True, steps=60):
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.models.tiger import TIGER

    model = TIGER(cfg)
    rng = np.random.default_rng(0)
    ii, am, lab = build(cfg, B, Lt_items, rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ii, am, lab)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

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

    fit = jax.jit(epoch, static_argnums=(3,), donate_argnums=(0, 1))
    try:
        key = jax.random.key(1, impl="rbg")
    except TypeError:
        key = jax.random.PRNGKey(1)
    params, opt_state, key, loss = fit(params, opt_state, key, steps)
    float(np.asarray(loss))
    t0 = time.perf_counter()
    params, opt_state, key, loss = fit(params, opt_state, key, steps)
    float(np.asarray(loss))
    dt = time.perf_counter() - t0
    return 1e3 * dt / steps


def main():
    from genrec_tpu.configs import TIGERConfig

    out = {}
    base = TIGERConfig()
    out["base_f32_drop_dec156"] = time_step(base)
    out["dec80"] = time_step(base, Lt_items=20)
    out["dec4"] = time_step(base, Lt_items=1)
    out["no_dropout"] = time_step(base, dropout=False)
    bf = dataclasses.replace(base, arch=dataclasses.replace(
        base.arch, dtype="bfloat16"))
    out["bf16"] = time_step(bf)
    out["bf16_no_dropout"] = time_step(bf, dropout=False)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
