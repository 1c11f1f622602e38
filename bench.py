"""Benchmarks: all three BASELINE.md throughput rows on the current backend.

Headline metric (the JSON line's value): TIGER (2+2 layers, d_model 64,
vocab 64) training examples/s at batch 256 — the *real* training workload:
80-token left-padded histories AND teacher-forcing decoder targets (the
reference trains on target = seq[1:-1], up to ~38 items ≈ 152 tokens,
padded to the batch max — `RQVAE-T5/data_vision.py:119-140`). Reference
throughput on this workload: ≈12 it/s × 256 ≈ 3.1K ex/s on a GTX 1080 Ti
(`RQVAE-T5-prefix/output.txt` progress bars); target ≥3× per chip.

The other two BASELINE.md rows ride along under "extra":
- tiger_beam20_eval_seqs_per_sec — beam-search eval throughput, batch 256.
  Reference: ≈12.3 it/s × 256 ≈ 3.1K seq/s at beam 5 (`RQVAE-T5/output.txt`
  eval bar); measured here at beam 20 (the quality-table config, beam ≥
  max(topk)=20 — strictly more work than the reference's measured beam 5).
- sasrec_train_examples_per_sec — full-vocab BCE train step, batch 128.
  Reference: 50–95 s/epoch incl. per-epoch val over the ~86K-user corpus
  (`SASRec/logs/sasrec.log` timestamps) ≈ ~1.2K ex/s train-only estimate.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
"""

from __future__ import annotations

import json
import time

import numpy as np

TIGER_TRAIN_BASELINE_EX_S = 3100.0
TIGER_EVAL_BASELINE_SEQ_S = 3100.0
# 50-95 s/epoch incl. val over ~86K train seqs → train-only ≈ 1.2K ex/s
SASREC_TRAIN_BASELINE_EX_S = 1200.0


def _timed(step, n_warmup, n_steps, *state):
    """Run step(*state)->state n_warmup times, then time n_steps; returns
    (seconds, final_state). Forces a VALUE fetch to close the async gap —
    on remote-PJRT backends block_until_ready alone can return early."""
    for _ in range(n_warmup):
        state = step(*state)
    float(np.asarray(state[-1]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(*state)
    float(np.asarray(state[-1]).ravel()[0])
    return time.perf_counter() - t0, state


def _tiger_batch(cfg, B, rng):
    import jax.numpy as jnp

    seq = cfg.max_len * cfg.code_dim  # 80 tokens
    input_ids = jnp.asarray(rng.integers(1, 33, size=(B, seq)), jnp.int32)
    # realistic left-padding: ~half the history is padding
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=B) * cfg.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    input_ids = input_ids * jnp.asarray(pad)
    attention_mask = (input_ids != 0).astype(jnp.int32)
    return input_ids, attention_mask


def bench_tiger_train(steps: int = 50) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
    rng = np.random.default_rng(0)
    input_ids, attention_mask = _tiger_batch(cfg, B, rng)
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

    params = jax.jit(model.init)(jax.random.PRNGKey(0), input_ids,
                                 attention_mask, labels)
    tx = optax.adam(cfg.trainer.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rng):
        rng, sub = jax.random.split(rng)

        def loss_fn(p):
            loss, _ = model.apply(p, input_ids, attention_mask, labels,
                                  deterministic=False, rngs={"dropout": sub})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    try:
        key = jax.random.key(1, impl="rbg")  # hardware RNG for dropout masks
    except TypeError:
        key = jax.random.PRNGKey(1)
    dt, _ = _timed(lambda p, o, k, *_: train_step(p, o, k),
                   3, steps, params, opt_state, key, jnp.zeros(()))
    return steps * B / dt


def bench_tiger_beam_eval(steps: int = 20, num_beams: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models import tiger as tiger_mod
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
    rng = np.random.default_rng(1)
    input_ids, attention_mask = _tiger_batch(cfg, B, rng)
    labels = jnp.asarray(rng.integers(1, 33, size=(B, cfg.code_dim)),
                         jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), input_ids,
                                 attention_mask, labels)

    @jax.jit
    def gen(params, ii, am):
        toks, scores = tiger_mod.generate(model, params, ii, am,
                                          num_beams=num_beams,
                                          constraint=None)
        return toks, scores

    dt, _ = _timed(lambda p, *_: (p, *gen(p, input_ids, attention_mask)),
                   2, steps, params, jnp.zeros(()), jnp.zeros(()))
    return steps * B / dt


def bench_sasrec_train(steps: int = 50) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import SASRecConfig
    from genrec_tpu.models.sasrec import SASRec, train_loss

    cfg = SASRecConfig()
    item_num = 9000  # course-catalog scale of the MOOCCube corpus
    model = SASRec(item_num=item_num, cfg=cfg)
    B = cfg.trainer.batch_size  # 128
    rng = np.random.default_rng(2)
    x = rng.integers(1, item_num, size=(B, cfg.max_len)).astype(np.int32)
    t = rng.integers(1, item_num, size=(B, cfg.max_len)).astype(np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=B)
    for i, L in enumerate(lens):  # reference pre-pads with 0
        x[i, :cfg.max_len - L] = 0
        t[i, :cfg.max_len - L] = 0
    x, t = jnp.asarray(x), jnp.asarray(t)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.adam(cfg.trainer.lr, *cfg.trainer.adam_betas)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        key, sub = jax.random.split(key)

        def loss_fn(p):
            loss, _ = train_loss(model, p, x, t, sub, cfg, item_num)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    try:
        key = jax.random.key(3, impl="rbg")
    except TypeError:
        key = jax.random.PRNGKey(3)
    dt, _ = _timed(lambda p, o, k, *_: step(p, o, k),
                   3, steps, params, opt_state, key, jnp.zeros(()))
    return steps * B / dt


def main() -> None:
    tiger_ex_s = bench_tiger_train()
    beam_seq_s = bench_tiger_beam_eval()
    sasrec_ex_s = bench_sasrec_train()

    print(json.dumps({
        "metric": "tiger_train_examples_per_sec",
        "value": round(tiger_ex_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(tiger_ex_s / TIGER_TRAIN_BASELINE_EX_S, 2),
        "extra": {
            "tiger_beam20_eval_seqs_per_sec": {
                "value": round(beam_seq_s, 1),
                "vs_baseline": round(beam_seq_s / TIGER_EVAL_BASELINE_SEQ_S, 2),
            },
            "sasrec_train_examples_per_sec": {
                "value": round(sasrec_ex_s, 1),
                "vs_baseline": round(sasrec_ex_s / SASREC_TRAIN_BASELINE_EX_S, 2),
            },
        },
    }))


if __name__ == "__main__":
    main()
