"""Controlled ablation: do prefix adapters and constrained decoding pay?

VERDICT r2 weak #3: the prefix adapters and the trie-constrained decoding
are the two modeling claims on top of plain TIGER; nothing demonstrated
them at seed parity. This script trains, per (corpus seed × model seed):

- one plain TIGER model        → evaluated with none / level / trie decoding
- one TIGER-prefix model       → evaluated with none / level / trie decoding

Same corpora as the parity harness (`scripts/parity_headtohead.py
make_corpus`, 4000 users × 240 items), same protocol (25 epochs, early-stop
patience 10, beam 20). Decoding-mode arms share the SAME trained weights,
so the decode ablation is exactly controlled; the prefix arm differs only
by the three cross-attention adapters + prof_lvl inputs (the reference's
claim: +0.05 Recall@10, `RQVAE-T5-prefix/output.txt` vs
`RQVAE-T5/output.txt`).

    python scripts/ablation_tiger.py --seeds 0 1 --model-seeds 42 43

Writes artifacts/ablation_tiger_r3.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_headtohead import make_corpus  # noqa: E402


def run_tiger_arms(datadir, workdir, epochs, mseed):
    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline
    base = configs.TIGERConfig(
        code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
        test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
        beam_size=20,
        trainer=dataclasses.replace(
            configs.TIGERConfig().trainer, epochs=epochs, seed=mseed,
            early_stop_patience=10, ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "tiger.log")))
    art = tiger_pipeline.train(base)
    out = {}
    for mode in ("none", "level", "trie"):
        cfg = dataclasses.replace(base, constrained_decoding=mode)
        t0 = time.time()
        m = tiger_pipeline.evaluate(cfg, art)
        out[mode] = {k: float(v) for k, v in m.items()}
        out[mode]["eval_seconds"] = time.time() - t0
    return out


def run_prefix_arms(datadir, workdir, epochs, mseed):
    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_prefix_pipeline
    prof_paths = tuple(os.path.join(datadir, f"prof_lvl{i}.h5")
                       for i in (1, 2, 3))
    base = configs.TIGERPrefixConfig(
        code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
        test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
        prof_lvl_paths=prof_paths,
        arch=dataclasses.replace(configs.TIGERPrefixConfig().arch, d_ff=512),
        beam_size=20,
        trainer=dataclasses.replace(
            configs.TIGERPrefixConfig().trainer, epochs=epochs, seed=mseed,
            early_stop_patience=10, ckpt_dir=os.path.join(workdir, "ckpt"),
            log_path=os.path.join(workdir, "tiger.log")))
    art = tiger_prefix_pipeline.train(base)
    out = {}
    for mode in ("none", "level", "trie"):
        cfg = dataclasses.replace(base, constrained_decoding=mode)
        t0 = time.time()
        m = tiger_prefix_pipeline.evaluate(cfg, art)
        out[mode] = {k: float(v) for k, v in m.items()}
        out[mode]["eval_seconds"] = time.time() - t0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=4000)
    ap.add_argument("--items", type=int, default=240)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--model-seeds", type=int, nargs="+", default=[42, 43])
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--workdir", default="/tmp/ablation_r3")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "ablation_tiger_r3.json"))
    args = ap.parse_args()

    runs = []
    for seed in args.seeds:
        ddir = os.path.join(args.workdir, f"data_s{seed}")
        make_corpus(ddir, args.users, args.items, seed)
        for mseed in args.model_seeds:
            for name, fn in (("tiger", run_tiger_arms),
                             ("tiger_prefix", run_prefix_arms)):
                wdir = os.path.join(args.workdir, f"{name}_s{seed}_m{mseed}")
                os.makedirs(wdir, exist_ok=True)
                t0 = time.time()
                arms = fn(ddir, wdir, args.epochs, mseed)
                rec = {"model": name, "corpus_seed": seed,
                       "model_seed": mseed, "arms": arms,
                       "wall_seconds": time.time() - t0}
                runs.append(rec)
                print(f"[s{seed} m{mseed}] {name}: " + json.dumps(
                    {m: round(arms[m].get("Recall@10", float("nan")), 4)
                     for m in arms}), flush=True)
                # incremental write
                _dump(args, runs)
    _dump(args, runs, final=True)


def _dump(args, runs, final=False):
    # summary: pooled means per (model, decode-mode)
    summary = {}
    for model in ("tiger", "tiger_prefix"):
        for mode in ("none", "level", "trie"):
            vals = [r["arms"][mode] for r in runs if r["model"] == model
                    and mode in r["arms"]]
            if vals:
                summary[f"{model}/{mode}"] = {
                    m: float(np.mean([v[m] for v in vals]))
                    for m in ("Recall@10", "NDCG@10")
                    if all(m in v for v in vals)}
    out = {"config": vars(args), "runs": runs, "summary_means": summary}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2, default=float)
    if final:
        print(json.dumps(summary, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
