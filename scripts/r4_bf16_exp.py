"""bf16 activation experiment for the TIGER train step (roofline follow-up).

artifacts/roofline_r4.json shows every TIGER train config is MEMORY-bound
at 37-50% of the HBM roofline (parity d64: 4.0 GB/step moved, byte
roofline 4.9 ms of a 13.1 ms step). `T5ArchConfig.dtype="bfloat16"`
halves activation traffic, so it should buy a large fraction of that
headroom — this script measures it and gates it on quality:

1. step timing: parity d64 and scaled d512, dropout 0.1, f32 vs bf16;
2. full-pipeline quality at the parity protocol (25 epochs, beam 20,
   unconstrained) with bf16 activations on both corpora × 2 seeds —
   Recall@10 must land inside the f32 flat band (0.4233-0.4703 pooled,
   per-corpus means 0.4611/0.4257).

Writes artifacts/bf16_exp_r4.json (incremental).
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

OUT = os.path.join(REPO, "artifacts", "bf16_exp_r4.json")


def _save(res):
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1, default=float)


def step_timings(res):
    import jax
    import jax.numpy as jnp
    import optax

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    base = TIGERConfig()
    B = 256
    rng = np.random.default_rng(0)
    seq = base.max_len * base.code_dim
    ii = rng.integers(1, 33, size=(B, seq)).astype(np.int32)
    pad = np.zeros((B, seq), np.int32)
    lens = rng.integers(2, base.max_len + 1, size=B) * base.code_dim
    for i, L in enumerate(lens):
        pad[i, seq - L:] = 1
    ii *= pad
    Lt = (2 * base.max_len - 1) * base.code_dim
    lab = rng.integers(1, 33, size=(B, Lt)).astype(np.int32)
    tl = rng.integers(1, 2 * base.max_len, size=B) * base.code_dim
    for i, L in enumerate(tl):
        lab[i, L:] = -100
    ii = jnp.asarray(ii)
    am = jnp.asarray((np.asarray(ii) != 0).astype(np.int32))
    lab = jnp.asarray(lab)

    def timed(d_model, num_heads, d_kv, dtype, steps=60):
        cfg = dataclasses.replace(base, arch=dataclasses.replace(
            base.arch, d_model=d_model, num_heads=num_heads, d_kv=d_kv,
            dtype=dtype))
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
        return {"ms_per_step": 1e3 * dt / steps,
                "examples_per_sec": B * steps / dt,
                "loss_first": l0, "loss_last": l1}

    res["step"] = {}
    for tag, d, h, dk in (("d64", 64, 4, 16), ("d512", 512, 8, 64)):
        for dtype in ("float32", "bfloat16"):
            k = f"{tag}_{dtype}"
            res["step"][k] = timed(d, h, dk, dtype)
            print(k, res["step"][k], flush=True)
            _save(res)


def quality_runs(res, corpora=(0, 1), seeds=(42, 43)):
    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline

    res.setdefault("quality", {"flat_f32_band_recall10": [0.4233, 0.4703],
                               "flat_means": {"0": 0.4611, "1": 0.4257},
                               "runs": []})
    done = {(r["corpus"], r["seed"]) for r in res["quality"]["runs"]}
    for corpus in corpora:
        datadir = f"/tmp/parity_r3/data_s{corpus}"
        for seed in seeds:
            if (corpus, seed) in done:
                continue
            wdir = f"/tmp/bf16_exp/c{corpus}_m{seed}"
            os.makedirs(wdir, exist_ok=True)
            cfg = configs.TIGERConfig(
                code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
                train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
                test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
                constrained_decoding="none", beam_size=20,
                arch=dataclasses.replace(configs.TIGERConfig().arch,
                                         dtype="bfloat16"),
                trainer=dataclasses.replace(
                    configs.TIGERConfig().trainer, epochs=25, seed=seed,
                    early_stop_patience=10,
                    ckpt_dir=os.path.join(wdir, "ckpt"),
                    log_path=os.path.join(wdir, "tiger.log")))
            t0 = time.time()
            art = tiger_pipeline.train(cfg)
            metrics = {k: float(v) for k, v in
                       tiger_pipeline.evaluate(cfg, art).items()}
            res["quality"]["runs"].append({
                "corpus": corpus, "seed": seed, "metrics": metrics,
                "train_seconds": time.time() - t0,
                "steady_examples_per_sec":
                    art.result.steady_examples_per_sec})
            _save(res)
            print(f"[bf16 c{corpus} m{seed}] R@10="
                  f"{metrics['Recall@10']:.4f}", flush=True)


def main():
    res = {}
    if os.path.exists(OUT):
        res = json.load(open(OUT))
    step_timings(res)
    quality_runs(res)
    print("WROTE", OUT)


if __name__ == "__main__":
    main()
