"""Bucket-quality grid, round 4 (VERDICT r3 next-round #2).

Round 3 left bucketed-TIGER quality at n=1 per corpus, both points 1-2%
below the flat means. This grid runs `target_len_buckets=4` at ≥3 model
seeds per corpus on the SAME parity corpora, after the round-4 trainer
changes (per-epoch shuffled bucket visit order + schedule step counts from
the buckets). Incremental writes — each run lands before the next starts.

    python scripts/r4_bucket_quality.py --seeds 42 43 44 --corpora 0 1
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "bucket_quality_r4.json")

# flat-path per-corpus Recall@10 statistics from the r3 parity grid
# (tpu_tiger, 4 model seeds per corpus, PARITY.md): the band bucketed
# means must sit inside for buckets to stay quality-neutral
FLAT_REFERENCE = {
    "0": {"mean": 0.4611, "note": "corpus 0 flat mean, n=4"},
    "1": {"mean": 0.4257, "note": "corpus 1 flat mean, n=4"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--datadir-tpl", default="/tmp/parity_r3/data_s{}")
    ap.add_argument("--workdir", default="/tmp/bucket_quality_r4")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--interleave", type=int, default=None,
                    help="override TrainerConfig.bucket_interleave_chunks")
    ap.add_argument("--out", default=OUT_DEFAULT)
    args = ap.parse_args()

    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline

    results = {"config": vars(args), "flat_reference": FLAT_REFERENCE,
               "runs": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    done = {(r["corpus"], r["seed"]) for r in results["runs"]}

    for corpus in args.corpora:
        datadir = args.datadir_tpl.format(corpus)
        for seed in args.seeds:
            if (corpus, seed) in done:
                continue
            wdir = os.path.join(args.workdir, f"c{corpus}_m{seed}")
            os.makedirs(wdir, exist_ok=True)
            cfg = configs.TIGERConfig(
                code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
                train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
                test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
                constrained_decoding="none",
                beam_size=20,
                target_len_buckets=args.buckets,
                trainer=dataclasses.replace(
                    configs.TIGERConfig().trainer, epochs=args.epochs,
                    seed=seed, early_stop_patience=10,
                    ckpt_dir=os.path.join(wdir, "ckpt"),
                    log_path=os.path.join(wdir, "tiger.log"),
                    **({"bucket_interleave_chunks": args.interleave}
                       if args.interleave else {})))
            t0 = time.time()
            art = tiger_pipeline.train(cfg)
            t1 = time.time()
            metrics = {k: float(v) for k, v in
                       tiger_pipeline.evaluate(cfg, art).items()}
            run = {"corpus": corpus, "seed": seed, "metrics": metrics,
                   "train_seconds": t1 - t0,
                   "steady_examples_per_sec":
                       art.result.steady_examples_per_sec}
            results["runs"].append(run)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            print(f"[c{corpus} m{seed}] R@10={metrics['Recall@10']:.4f} "
                  f"steady={run['steady_examples_per_sec']:.0f} ex/s",
                  flush=True)

    # summary
    for corpus in args.corpora:
        vals = [r["metrics"]["Recall@10"] for r in results["runs"]
                if r["corpus"] == corpus]
        if vals:
            flat = FLAT_REFERENCE[str(corpus)]["mean"]
            mean = sum(vals) / len(vals)
            print(f"corpus {corpus}: bucketed R@10 mean {mean:.4f} "
                  f"(n={len(vals)}, {min(vals):.4f}-{max(vals):.4f}) vs "
                  f"flat mean {flat:.4f} ({(mean - flat) / flat:+.1%})")


if __name__ == "__main__":
    main()
