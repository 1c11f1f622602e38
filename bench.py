"""Benchmark: TIGER training throughput at the reference parity config.

Headline metric matching BASELINE.md: TIGER (2+2 layers, d_model 64,
vocab 64) training examples/s at batch 256 — the *real* training workload:
80-token left-padded histories AND teacher-forcing decoder targets (the
reference trains on target = seq[1:-1], up to ~38 items ≈ 152 tokens,
padded to the batch max — `RQVAE-T5/data_vision.py:119-140`). Reference
throughput on this workload: ≈12 it/s × 256 ≈ 3.1K ex/s on a GTX 1080 Ti
(`RQVAE-T5-prefix/output.txt` progress bars); target ≥3× per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EX_S = 3100.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
    seq = cfg.max_len * cfg.code_dim  # 80 tokens
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(1, 33, size=(B, seq)), jnp.int32)
    # realistic left-padding: ~half the history is padding
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=B) * cfg.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    input_ids = input_ids * jnp.asarray(pad)
    attention_mask = (input_ids != 0).astype(jnp.int32)
    # teacher-forcing targets: up to (max_len*2 - 2) items flattened, padded
    # with -100 like the reference collate — the decoder-side workload
    # dominates the step, so faking short targets would overstate ex/s.
    tgt_items = 2 * cfg.max_len - 1  # matches the 95K-corpus max (39 items)
    Lt = tgt_items * cfg.code_dim
    lab_np = rng.integers(1, 33, size=(B, Lt)).astype(np.int32)
    tgt_lens = rng.integers(1, tgt_items + 1, size=B) * cfg.code_dim
    for i, L in enumerate(tgt_lens):
        lab_np[i, L:] = -100
    labels = jnp.asarray(lab_np)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), input_ids, attention_mask, labels)
    tx = optax.adam(cfg.trainer.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, ii, am, lab, rng):
        def loss_fn(p):
            loss, _ = model.apply(p, ii, am, lab, deterministic=False,
                                  rngs={"dropout": rng})
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    try:
        key = jax.random.key(1, impl="rbg")  # hardware RNG for dropout masks
    except TypeError:
        key = jax.random.PRNGKey(1)
    # warmup / compile; fetch a VALUE to force execution — on remote-PJRT
    # backends block_until_ready alone can return before execution
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, input_ids,
                                             attention_mask, labels, sub)
    float(loss)

    steps = 50
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, input_ids,
                                             attention_mask, labels, sub)
    float(loss)
    dt = time.perf_counter() - t0
    ex_s = steps * B / dt

    print(json.dumps({
        "metric": "tiger_train_examples_per_sec",
        "value": round(ex_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_s / BASELINE_EX_S, 2),
    }))


if __name__ == "__main__":
    main()
