"""Composite-width quality grid (VERDICT r4 next #7).

Per-bucket epochs buy 1.86× throughput but cost 1.2–2.4% Recall@10 even
chunk-interleaved — attributed to length-HOMOGENEOUS batch composition
(artifacts/bucket_quality_r4_interleaved.json). The composite-width mode
(TIGERConfig.target_len_composite + TrainerConfig.composite_mix) keeps
one flat dataset and assigns rows to static batch WIDTHS per epoch, with
half of every width group drawn from shorter rows — mixed-length batches
at a bounded padding cost. This grid measures whether that claws the
quality back and what throughput it keeps, on the same parity corpora and
protocol as the r4 bucket grids.

    python scripts/r5_composite_quality.py --seeds 42 43 44 --corpora 0 1
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
                           "composite_quality_r5.json")

# flat-path per-corpus Recall@10 means (r3 parity grid, n=4 — same
# reference band the r4 bucket grids were judged against) and the
# bucketed-interleaved means (bucket_quality_r4_interleaved.json)
REFERENCE = {
    "0": {"flat_mean": 0.4611, "bucketed_interleaved_mean": 0.4500},
    "1": {"flat_mean": 0.4257, "bucketed_interleaved_mean": 0.4204},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--datadir-tpl", default="/tmp/parity_r3/data_s{}")
    ap.add_argument("--workdir", default="/tmp/composite_quality_r5")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--widths", type=int, default=4)
    ap.add_argument("--mix", type=float, default=0.5)
    ap.add_argument("--out", default=OUT_DEFAULT)
    args = ap.parse_args()

    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline

    results = {"config": vars(args), "reference": REFERENCE, "runs": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    done = {(r["corpus"], r["seed"], r.get("mix", args.mix))
            for r in results["runs"]}

    for corpus in args.corpora:
        datadir = args.datadir_tpl.format(corpus)
        for seed in args.seeds:
            if (corpus, seed, args.mix) in done:
                continue
            wdir = os.path.join(args.workdir, f"c{corpus}_m{seed}")
            os.makedirs(wdir, exist_ok=True)
            cfg = configs.TIGERConfig(
                code_path=os.path.join(datadir, "course_rqvae_codes.npy"),
                train_dataset_path=os.path.join(datadir, "train_dataset.h5"),
                test_dataset_path=os.path.join(datadir, "test_dataset.h5"),
                constrained_decoding="none",
                beam_size=20,
                target_len_composite=args.widths,
                trainer=dataclasses.replace(
                    configs.TIGERConfig().trainer, epochs=args.epochs,
                    seed=seed, early_stop_patience=10,
                    composite_mix=args.mix,
                    ckpt_dir=os.path.join(wdir, "ckpt"),
                    log_path=os.path.join(wdir, "tiger.log")))
            t0 = time.time()
            art = tiger_pipeline.train(cfg)
            t1 = time.time()
            metrics = {k: float(v) for k, v in
                       tiger_pipeline.evaluate(cfg, art).items()}
            run = {"corpus": corpus, "seed": seed, "mix": args.mix,
                   "metrics": metrics, "train_seconds": t1 - t0,
                   "steady_examples_per_sec":
                       art.result.steady_examples_per_sec}
            results["runs"].append(run)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            print(f"[c{corpus} m{seed} mix{args.mix}] "
                  f"R@10={metrics['Recall@10']:.4f} "
                  f"steady={run['steady_examples_per_sec']:.0f} ex/s",
                  flush=True)

    for corpus in args.corpora:
        vals = [(r["metrics"]["Recall@10"], r["steady_examples_per_sec"])
                for r in results["runs"]
                if r["corpus"] == corpus and r.get("mix") == args.mix]
        if vals:
            ref = REFERENCE[str(corpus)]
            mean = sum(v for v, _ in vals) / len(vals)
            eps = sum(e for _, e in vals) / len(vals)
            print(f"corpus {corpus}: composite R@10 mean {mean:.4f} "
                  f"(n={len(vals)}) vs flat {ref['flat_mean']:.4f} "
                  f"({(mean - ref['flat_mean']) / ref['flat_mean']:+.1%}), "
                  f"bucketed-interleaved "
                  f"{ref['bucketed_interleaved_mean']:.4f}; "
                  f"steady {eps:.0f} ex/s")


if __name__ == "__main__":
    main()
