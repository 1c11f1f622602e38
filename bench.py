"""Benchmarks: all three BASELINE.md throughput rows on the current backend.

Headline metric (the JSON line's value): TIGER (2+2 layers, d_model 64,
vocab 64) training examples/s at batch 256 — the *real* training workload:
80-token left-padded histories AND teacher-forcing decoder targets (the
reference trains on target = seq[1:-1], up to ~38 items ≈ 152 tokens,
padded to the batch max — `RQVAE-T5/data_vision.py:119-140`). Reference
throughput on this workload: ≈12 it/s × 256 ≈ 3.1K ex/s on a GTX 1080 Ti
(`RQVAE-T5-prefix/output.txt` progress bars); target ≥3× per chip.

Methodology (round 3): every benchmark runs the way the production
Trainer actually runs — DEVICE-RESIDENT. The dataset is uploaded once and
a whole epoch executes as ONE jitted ``lax.scan`` over a shuffled index
matrix (mirrors `genrec_tpu/train/trainer.py` train_epoch). Timing
brackets whole-epoch calls and closes with a VALUE fetch (not just
block_until_ready, which a remote-PJRT client can satisfy early). Each
scan iteration gathers a fresh batch from the uploaded dataset and takes
a real optimizer step.

Two round-3 findings shaped this measurement:
- Scan-stepping alone is worth only ~5% here — JAX's async dispatch
  already pipelines a per-step Python loop when values are fetched only
  at the end, so round 2's 19.3K ex/s was NOT dispatch-bound. (The 86K
  ex/s row in `artifacts/scaling_r2_tpu.json` that suggested a 4.5×
  dispatch tax was a much lighter workload: 4-token decoder labels vs
  this bench's honest 156-token teacher-forcing targets.)
- The real cost is decoder PADDING: an xprof device profile
  (`scripts/profile_tiger_step.py`) shows the step dominated by
  score-shaped work that scales superlinearly in padded target length
  (13.1 ms at 156 padded tokens vs 4.7 ms at 80). Length-bucketed epochs
  (`datasets.bucket_by_target_len` + `Trainer(train_data_buckets=...)`)
  cut that cost — but are a CLOSED NEGATIVE RESULT for this workload:
  the r4 quality grid measures them 1.2-2.4% BELOW the flat-path
  Recall@10 means even chunk-interleaved (length-homogeneous batch
  composition, `artifacts/bucket_quality_r4_interleaved.json`), and the
  r5 composite-width mode (mixed-length batches at static widths,
  `TIGERConfig.target_len_composite`) is measured quality-inconsistent
  across corpora AND slower than flat at parity-corpus scale
  (`artifacts/composite_quality_r5.json`). The HEADLINE is the flat
  path; both alternatives remain available as config flags with their
  measurements documented.

Alongside ex/s we report FLOPs-based MFU so "fast for a tiny model" is
quantified: FLOPs come from XLA's own cost model for the compiled epoch
(`compiled.cost_analysis()['flops']`, falling back to an analytic
matmul count), divided by peak bf16 FLOP/s for the detected chip
(TPU v5 lite = 197 TFLOP/s). A d_model-64 model cannot saturate a
128×128 MXU — the MFU line is there to say so honestly.

The other two BASELINE.md rows ride along under "extra":
- tiger_beam20_eval_seqs_per_sec — beam-search eval throughput, batch 256,
  scanned over 4 resident batches per call. Reference: ≈12.3 it/s × 256
  ≈ 3.1K seq/s at beam 5 (`RQVAE-T5/output.txt` eval bar); measured here
  at beam 20 (the quality-table config, beam ≥ max(topk)=20 — strictly
  more work than the reference's measured beam 5).
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

# peak dense bf16 FLOP/s per chip, by PJRT device_kind
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    return kind, _PEAK_BF16.get(kind)


def _compiled_flops(jitted, *args):
    """XLA's own FLOPs estimate for one call of ``jitted(*args)``.

    Returns None when the backend doesn't expose cost analysis (some
    remote-PJRT plugins) — callers then fall back to an analytic count.
    """
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        f = float(ca["flops"])
        return f if f > 0 else None
    except Exception:
        return None


def _fetch(x):
    """Force a VALUE fetch to close the async gap — on remote-PJRT
    backends block_until_ready alone can return early."""
    return float(np.asarray(x).ravel()[0])


def _rbg_key(seed):
    import jax

    try:
        return jax.random.key(seed, impl="rbg")  # hardware RNG for dropout
    except TypeError:
        return jax.random.PRNGKey(seed)


def _tiger_corpus(cfg, N, rng):
    """Honest teacher-forcing corpus: 80-token left-padded histories and
    up-to-(2·max_len−1)-item flat targets padded with -100 like the
    reference collate (`RQVAE-T5/data_vision.py:119-140`)."""
    seq = cfg.max_len * cfg.code_dim  # 80 tokens
    ii = rng.integers(1, 33, size=(N, seq)).astype(np.int32)
    pad = np.zeros((N, seq), np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=N) * cfg.code_dim
    for i, L in enumerate(lens):  # realistic left padding
        pad[i, seq - L:] = 1
    ii *= pad
    tgt_items = 2 * cfg.max_len - 1  # matches the 95K-corpus max (39 items)
    Lt = tgt_items * cfg.code_dim
    lab = rng.integers(1, 33, size=(N, Lt)).astype(np.int32)
    tgt_lens = rng.integers(1, tgt_items + 1, size=N) * cfg.code_dim
    for i, L in enumerate(tgt_lens):
        lab[i, L:] = -100
    return {"input_ids": ii, "attention_mask": (ii != 0).astype(np.int32),
            "labels": lab}


def bench_tiger_train(epochs: int = 4, n_buckets: int = 4):
    """Scan-stepped TIGER training over a device-resident corpus — the
    production pipeline path (`trainer.py` train_epoch): one jit call per
    (epoch, bucket), each scan step gathering a fresh batch and taking a
    real Adam step. ``n_buckets=1`` is the flat-padded HEADLINE path;
    ``n_buckets>1`` is the opt-in length-bucketed path
    (`datasets.bucket_by_target_len`, `TIGERConfig.target_len_buckets` —
    static-shape analogue of the reference collate's pad-to-batch-max,
    measured 1.2-2.4% below the flat Recall@10 means, see
    `artifacts/bucket_quality_r4_interleaved.json`). Every example trains
    once per epoch either way, so ex/s is comparable end-to-end. (The
    fused Pallas attention kernel's "auto" default never engages here —
    the parity config trains with dropout; see configs.T5ArchConfig.)
    """
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.data.datasets import bucket_by_target_len
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
    N = 40 * B  # resident corpus rows (~10K examples / epoch)
    rng = np.random.default_rng(0)
    host = _tiger_corpus(cfg, N, rng)
    buckets = [{k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
               for b in bucket_by_target_len(host, n_buckets,
                                             cfg.code_dim)]
    # per-bucket shuffled index matrices (pad rows -1 → masked via labels)
    idx_mats = []
    for b in buckets:
        n = len(b["labels"])
        steps_b = -(-n // B)
        idx = np.arange(n, dtype=np.int32)
        rng.shuffle(idx)
        out = np.full((steps_b * B,), -1, np.int32)
        out[:n] = idx
        idx_mats.append(jax.device_put(jnp.asarray(out.reshape(steps_b, B))))
    total_steps = sum(m.shape[0] for m in idx_mats)

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 buckets[0]["input_ids"][:B],
                                 buckets[0]["attention_mask"][:B],
                                 buckets[0]["labels"][:B])
    tx = optax.adam(cfg.trainer.lr)
    opt_state = tx.init(params)

    def epoch(params, opt_state, key, idx_mat, data):
        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            safe = jnp.maximum(idx, 0)
            batch = {k: jnp.take(v, safe, axis=0) for k, v in data.items()}
            labels = jnp.where((idx >= 0)[:, None], batch["labels"], -100)

            def loss_fn(p):
                loss, _ = model.apply(
                    p, batch["input_ids"], batch["attention_mask"],
                    labels, deterministic=False, rngs={"dropout": sub})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), idx_mat)
        return params, opt_state, key, losses[-1]

    fit = jax.jit(epoch, donate_argnums=(0, 1))
    key = _rbg_key(1)
    xla_flops_per_epoch = 0.0
    for m, b in zip(idx_mats, buckets):
        f = _compiled_flops(fit, params, opt_state, key, m, b)
        xla_flops_per_epoch = (None if f is None or
                               xla_flops_per_epoch is None
                               else xla_flops_per_epoch + f)
    # warmup: compile every bucket shape + one full epoch
    for m, b in zip(idx_mats, buckets):
        params, opt_state, key, loss = fit(params, opt_state, key, m, b)
    _fetch(loss)
    t0 = time.perf_counter()
    for _ in range(epochs):
        for m, b in zip(idx_mats, buckets):
            params, opt_state, key, loss = fit(params, opt_state, key, m, b)
    _fetch(loss)
    dt = time.perf_counter() - t0
    ex_s = epochs * N / dt
    # analytic matmul count, fwd+bwd = 3× fwd: per token 8d² (self-attn
    # qkvo) + 4·d·d_ff (ff) per layer; decoder adds cross-attn 8d² and
    # d·V logits; score/value matmuls 4dT per token per attn head-group.
    # MFU uses THIS count — XLA's cost_analysis() under-reports heavily
    # fused TPU programs (it returned ~17M flops/ex where the matmul
    # algebra gives ~150-250M depending on bucket width).
    d, dff, V = cfg.arch.d_model, cfg.arch.d_ff, 2 + 32 * cfg.code_dim
    Le = Ld = cfg.arch.num_layers
    Te = cfg.max_len * cfg.code_dim
    fwd = 0.0
    for b in buckets:
        Td = b["labels"].shape[1]
        nb = len(b["labels"])
        fwd += nb * ((Te * Le * (8 * d * d + 4 * d * dff + 4 * d * Te)
                      + Td * Ld * (16 * d * d + 4 * d * dff + 4 * d * Td
                                   + 4 * d * Te)
                      + Td * 2 * d * V) * 2)  # ×2: multiply+add per MAC
    flops_per_epoch = 3 * fwd
    return ex_s, {"step_ms": round(1e3 * dt / (epochs * total_steps), 3),
                  "n_buckets": len(buckets),
                  "bucket_widths": [int(b["labels"].shape[1])
                                    for b in buckets],
                  "flops_per_example": round(flops_per_epoch / N),
                  "xla_cost_model_flops_per_example":
                      (round(xla_flops_per_epoch / N)
                       if xla_flops_per_epoch else None),
                  "model_tflops_per_sec":
                      round(flops_per_epoch * epochs / dt / 1e12, 3)}


def bench_tiger_beam_eval(calls: int = 5, n_batches: int = 4,
                          num_beams: int = 20) -> float:
    """Beam-20 generation over device-resident eval batches: one jit call
    scans ``n_batches`` resident batches through generate()."""
    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models import tiger as tiger_mod
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    model = TIGER(cfg)
    B = 256
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

    _fetch(eval_scan(params, batches, masks))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(calls):
        acc = eval_scan(params, batches, masks)
    _fetch(acc)
    dt = time.perf_counter() - t0
    return calls * n_batches * B / dt


def bench_tiger_prefix_train(epochs: int = 4) -> float:
    """Scan-stepped TIGER-PREFIX training (3 cross-attention adapters +
    prof-embedding prefix tokens). This is the LIKE-FOR-LIKE row against
    the 3.1K ex/s GPU baseline: BASELINE.md's "TIGER training ≈12 it/s ×
    256" figure is read off `RQVAE-T5-prefix/output.txt`'s epoch progress
    bars — i.e. the reference measured the PREFIX model."""
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERPrefixConfig
    from genrec_tpu.models.tiger_prefix import TIGERPrefix

    cfg = TIGERPrefixConfig()
    model = TIGERPrefix(cfg)
    B = 256
    N = 20 * B
    rng = np.random.default_rng(0)
    host = _tiger_corpus(cfg, N, rng)
    data = {k: jax.device_put(jnp.asarray(v)) for k, v in host.items()}
    profs = [jax.device_put(jnp.asarray(
        rng.normal(size=(N, cfg.num_prof_vectors, cfg.bert_dim))
        .astype(np.float32))) for _ in range(3)]
    steps = N // B
    idx = np.arange(N, dtype=np.int32)
    rng.shuffle(idx)
    idx_mat = jax.device_put(jnp.asarray(idx.reshape(steps, B)))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data["input_ids"][:B],
        data["attention_mask"][:B], data["labels"][:B],
        profs[0][:B], profs[1][:B], profs[2][:B])
    tx = optax.adam(cfg.trainer.lr)
    opt_state = tx.init(params)

    def epoch(params, opt_state, key, idx_mat, data, p1, p2, p3):
        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            bp = [jnp.take(p, idx, axis=0) for p in (p1, p2, p3)]

            def loss_fn(p):
                loss, _ = model.apply(
                    p, batch["input_ids"], batch["attention_mask"],
                    batch["labels"], *bp, deterministic=False,
                    rngs={"dropout": sub})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), idx_mat)
        return params, opt_state, key, losses[-1]

    fit = jax.jit(epoch, donate_argnums=(0, 1))
    key = _rbg_key(2)
    params, opt_state, key, loss = fit(params, opt_state, key, idx_mat,
                                       data, *profs)
    _fetch(loss)
    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, key, loss = fit(params, opt_state, key, idx_mat,
                                           data, *profs)
    _fetch(loss)
    return epochs * N / (time.perf_counter() - t0)


def bench_sasrec_train(epochs: int = 4, steps: int = 50) -> float:
    """Scan-stepped SASRec training (full-vocab BCE), device-resident."""
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import SASRecConfig
    from genrec_tpu.models.sasrec import SASRec, train_loss

    cfg = SASRecConfig()
    item_num = 9000  # course-catalog scale of the MOOCCube corpus
    model = SASRec(item_num=item_num, cfg=cfg)
    B = cfg.trainer.batch_size  # 128
    N = 4 * B
    rng = np.random.default_rng(2)
    x = rng.integers(1, item_num, size=(N, cfg.max_len)).astype(np.int32)
    t = rng.integers(1, item_num, size=(N, cfg.max_len)).astype(np.int32)
    lens = rng.integers(2, cfg.max_len + 1, size=N)
    for i, L in enumerate(lens):  # reference pre-pads with 0
        x[i, :cfg.max_len - L] = 0
        t[i, :cfg.max_len - L] = 0
    data = {"x": jax.device_put(jnp.asarray(x)),
            "t": jax.device_put(jnp.asarray(t))}
    idx_mat = jax.device_put(jnp.asarray(
        rng.integers(0, N, size=(steps, B)).astype(np.int32)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data["x"][:B])
    tx = optax.adam(cfg.trainer.lr, *cfg.trainer.adam_betas)
    opt_state = tx.init(params)

    def epoch(params, opt_state, key, idx_mat, data):
        def body(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            bx = jnp.take(data["x"], idx, axis=0)
            bt = jnp.take(data["t"], idx, axis=0)

            def loss_fn(p):
                loss, _ = train_loss(model, p, bx, bt, sub, cfg, item_num)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), idx_mat)
        return params, opt_state, key, losses[-1]

    fit = jax.jit(epoch, donate_argnums=(0, 1))
    key = _rbg_key(3)
    params, opt_state, key, loss = fit(params, opt_state, key, idx_mat, data)
    _fetch(loss)
    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, key, loss = fit(params, opt_state, key, idx_mat,
                                           data)
    _fetch(loss)
    dt = time.perf_counter() - t0
    return epochs * steps * B / dt


def main() -> None:
    import jax

    # HEADLINE = the flat-padded path. Length-bucketed epochs are a
    # DOCUMENTED NEGATIVE RESULT, no longer a bench row: the r4 grid
    # measured them 1.2-2.4% below the flat Recall@10 means even
    # chunk-interleaved (bucket_quality_r4_interleaved.json — the cost is
    # length-HOMOGENEOUS batch composition), and the r5 composite-width
    # attempt to mix lengths back at static shapes is quality-inconsistent
    # AND slower than flat (composite_quality_r5.json). Flat is simply the
    # right default on this workload.
    tiger_ex_s, tiger_stats = bench_tiger_train(n_buckets=1)
    beam_seq_s = bench_tiger_beam_eval()
    sasrec_ex_s = bench_sasrec_train()
    prefix_ex_s = bench_tiger_prefix_train()

    kind, peak = _peak_flops()
    mfu = (round(tiger_stats["model_tflops_per_sec"] * 1e12 / peak, 5)
           if peak else None)

    print(json.dumps({
        "metric": "tiger_train_examples_per_sec",
        "value": round(tiger_ex_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(tiger_ex_s / TIGER_TRAIN_BASELINE_EX_S, 2),
        "extra": {
            "length_buckets": "retired from the bench: 1.2-2.4% Recall@10 "
                              "cost (bucket_quality_r4_interleaved.json); "
                              "the composite-width mixing fix is measured "
                              "quality-inconsistent and slower than flat "
                              "(composite_quality_r5.json)",
            "tiger_beam20_eval_seqs_per_sec": {
                "value": round(beam_seq_s, 1),
                "vs_baseline": round(beam_seq_s / TIGER_EVAL_BASELINE_SEQ_S, 2),
            },
            "sasrec_train_examples_per_sec": {
                "value": round(sasrec_ex_s, 1),
                "vs_baseline": round(sasrec_ex_s / SASREC_TRAIN_BASELINE_EX_S, 2),
            },
            "tiger_prefix_train_examples_per_sec": {
                "value": round(prefix_ex_s, 1),
                "vs_baseline": round(
                    prefix_ex_s / TIGER_TRAIN_BASELINE_EX_S, 2),
                "note": "LIKE-FOR-LIKE model vs the 3.1K GPU bar: "
                        "BASELINE.md's 12 it/s x 256 is read off "
                        "RQVAE-T5-prefix/output.txt — the reference "
                        "measured THIS (d128, 4-dec-layer) model, and it "
                        "trained 4-token decoder labels where this row "
                        "trains honest 156-token flat-padded "
                        "teacher-forcing targets (~39x the decoder-token "
                        "work per example)",
            },
            "tiger_train_step_ms": tiger_stats["step_ms"],
            "tiger_train_flops_per_example": tiger_stats["flops_per_example"],
            "tiger_train_model_tflops_per_sec":
                tiger_stats["model_tflops_per_sec"],
            "device_kind": kind,
            "peak_bf16_tflops_assumed": peak / 1e12 if peak else None,
            "tiger_train_mfu": mfu,
            "roofline": "memory-bound at ~77% of the MEASURED practical "
                        "HBM floor — 613 GB/s stream ceiling vs 819 "
                        "paper peak; the step's HBM-bound ops already "
                        "sustain ~496 GB/s, above what its access "
                        "patterns sustain in isolation "
                        "(artifacts/hbm_ceiling_r5.json; r4 framing "
                        "against the paper peak: roofline_r4.json; the MFU "
                        "number is not the binding limit)",
            "methodology": "device-resident lax.scan epochs (one jit call = "
                           "50 steps), value-fetch timing; see module "
                           "docstring",
        },
    }))


if __name__ == "__main__":
    main()
