"""Quality gate for length-bucketed TIGER training: same parity corpus,
same protocol as the head-to-head runs (25 epochs, unconstrained beam
20), but with `target_len_buckets=4`. Recall/NDCG must land inside the
flat-path parity band (tpu_tiger: Recall@10 0.4233-0.4703 over 8 runs)
for bucketing to be a quality-neutral throughput feature.

    python scripts/r3_bucket_quality.py --datadir /tmp/parity_r3/data_s0
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", default="/tmp/parity_r3/data_s0")
    ap.add_argument("--workdir", default="/tmp/bucket_quality")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "bucket_quality_r3.json"))
    args = ap.parse_args()

    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline

    os.makedirs(args.workdir, exist_ok=True)
    cfg = configs.TIGERConfig(
        code_path=os.path.join(args.datadir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(args.datadir, "train_dataset.h5"),
        test_dataset_path=os.path.join(args.datadir, "test_dataset.h5"),
        constrained_decoding="none",
        beam_size=20,
        target_len_buckets=args.buckets,
        trainer=dataclasses.replace(
            configs.TIGERConfig().trainer, epochs=args.epochs,
            seed=args.seed, early_stop_patience=10,
            ckpt_dir=os.path.join(args.workdir, "ckpt"),
            log_path=os.path.join(args.workdir, "tiger.log")))
    t0 = time.time()
    art = tiger_pipeline.train(cfg)
    t1 = time.time()
    metrics = {k: float(v) for k, v in
               tiger_pipeline.evaluate(cfg, art).items()}
    out = {"config": {"buckets": args.buckets, "epochs": args.epochs,
                      "seed": args.seed, "datadir": args.datadir},
           "metrics": metrics,
           "train_seconds": t1 - t0,
           "steady_examples_per_sec": art.result.steady_examples_per_sec,
           "flat_path_band_recall10": [0.4233, 0.4703]}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("BUCKET_QUALITY", json.dumps(out["metrics"]))
    print("steady ex/s:", art.result.steady_examples_per_sec)


if __name__ == "__main__":
    main()
