"""Full-scale parity experiment on synthetic MOOCCube-scale data.

Reproduces the reference's experimental setup end-to-end on one TPU chip:
95K users × 700 items (the scale of `RQVAE-T5/output.txt:5`), reference
hyperparameters, the full train→quantize→generate pipeline:

1. SASRec at `SASRec/main.py` config → leave-one-out Hit/NDCG@k,
2. RQ-VAE at `RQ-VAE/main.py` config on the item-embedding table →
   semantic-ID codes (collision-repaired),
3. TIGER at `RQVAE-T5/main.py` config on those codes → beam-20
   Recall/NDCG@k + eval throughput.

The data is synthetic (the reference doesn't ship MOOCCube H5s), so
absolute metric values are not comparable to BASELINE.md — what this run
demonstrates is the full pipeline learning at scale plus wall-clock/
throughput on TPU. Writes artifacts/parity_synthetic.json + .md.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genrec_tpu import configs
from genrec_tpu.data import datasets, synthetic, tiger_tokens
from genrec_tpu.pipelines import rqvae_pipeline, sasrec_pipeline, tiger_pipeline

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
NUM_USERS = int(os.environ.get("EXP_USERS", 95_000))
NUM_ITEMS = int(os.environ.get("EXP_ITEMS", 700))
SASREC_EPOCHS = int(os.environ.get("EXP_SASREC_EPOCHS", 30))
RQVAE_EPOCHS = int(os.environ.get("EXP_RQVAE_EPOCHS", 100))
TIGER_EPOCHS = int(os.environ.get("EXP_TIGER_EPOCHS", 30))


def main():
    os.makedirs(ART, exist_ok=True)
    results = {"config": {"users": NUM_USERS, "items": NUM_ITEMS}}

    t0 = time.time()
    corpus = synthetic.make_interactions(NUM_USERS, NUM_ITEMS, min_len=3,
                                         max_len=40, num_topics=24,
                                         topic_stickiness=0.9, seed=11)
    item_embs = synthetic.make_item_embs(NUM_ITEMS, dim=768, num_topics=24,
                                         seed=11, noise=1.0)
    print(f"[data] {NUM_USERS} users in {time.time()-t0:.1f}s", flush=True)

    # ---------------- SASRec ----------------
    scfg = configs.SASRecConfig(trainer=dataclasses.replace(
        configs.SASRecConfig().trainer, epochs=SASREC_EPOCHS,
        early_stop_patience=5, ckpt_dir="ckpt/exp_sasrec"))
    t0 = time.time()
    sart = sasrec_pipeline.train(scfg, corpus)
    sasrec_train_s = time.time() - t0
    t0 = time.time()
    smetrics = sasrec_pipeline.evaluate(scfg, sart, corpus)
    results["sasrec"] = {
        "metrics": smetrics,
        "train_seconds": sasrec_train_s,
        "epochs": sart.result.epochs_run,
        "train_examples_per_sec": sart.result.examples_per_sec,
        "eval_seconds": time.time() - t0,
    }
    print("[sasrec]", json.dumps(results["sasrec"], default=float), flush=True)

    # ---------------- RQ-VAE ----------------
    rcfg = configs.RQVAEConfig(
        semantic_id_file=os.path.join(ART, "exp_codes.npy"),
        trainer=dataclasses.replace(configs.RQVAEConfig().trainer,
                                    epochs=RQVAE_EPOCHS,
                                    early_stop_patience=1000,
                                    ckpt_dir="ckpt/exp_rqvae"))
    t0 = time.time()
    rart = rqvae_pipeline.train(rcfg, item_embs=item_embs[1:])
    codes_no_pad = rqvae_pipeline.infer(rcfg, rart, item_embs=item_embs[1:])
    rqvae_s = time.time() - t0
    # prepend the padding row (item ids are 1-based)
    codes = np.concatenate([np.zeros((1, codes_no_pad.shape[1]), np.int64),
                            codes_no_pad], axis=0)
    results["rqvae"] = {
        "seconds": rqvae_s,
        "collision_rate_before_dedup": rart.final_collision_rate,
        "unique_codes": int(len(np.unique(codes_no_pad, axis=0))),
        "items": int(len(codes_no_pad)),
    }
    print("[rqvae]", json.dumps(results["rqvae"], default=float), flush=True)

    # ---------------- TIGER ----------------
    # dedup digits can push level-3 tokens past the reference's vocab 64;
    # our config is not stuck there — grow the vocab to fit when needed.
    max_tok = int(tiger_tokens.codes_to_token_table(codes).max())
    vocab = max(64, ((max_tok + 2 + 7) // 8) * 8)
    if vocab > 64:
        print(f"[tiger] growing vocab to {vocab} for dedup digits "
              f"(max token {max_tok})", flush=True)
    train_split, test_split = tiger_tokens.build_tiger_splits(
        corpus.item_id_lists, corpus.user_ids, codes, vocab_size=vocab)
    tcfg = configs.TIGERConfig(
        arch=dataclasses.replace(configs.T5ArchConfig(), vocab_size=vocab),
        constrained_decoding=os.environ.get("EXP_CONSTRAINED", "level"),
        trainer=dataclasses.replace(configs.TIGERConfig().trainer,
                                    epochs=TIGER_EPOCHS,
                                    early_stop_patience=5,
                                    ckpt_dir="ckpt/exp_tiger"))
    tr = datasets.build_tiger_arrays(train_split, tcfg.max_len, tcfg.code_dim)
    te = datasets.build_tiger_arrays(test_split, tcfg.max_len, tcfg.code_dim,
                                     max_target_items=1)
    print(f"[tiger] {len(tr.input_ids)} train / {len(te.input_ids)} test "
          f"samples", flush=True)
    t0 = time.time()
    tart = tiger_pipeline.train(tcfg, tr, te)
    tiger_train_s = time.time() - t0
    t0 = time.time()
    tmetrics = tiger_pipeline.evaluate(tcfg, tart, te, codes=codes[1:])
    tiger_eval_s = time.time() - t0
    results["tiger"] = {
        "metrics": tmetrics,
        "train_seconds": tiger_train_s,
        "epochs": tart.result.epochs_run,
        "train_examples_per_sec": tart.result.examples_per_sec,
        "eval_seconds": tiger_eval_s,
        "eval_sequences_per_sec": len(te.input_ids) / tiger_eval_s,
        "beam_size_effective": max(max(tcfg.topk_list), tcfg.beam_size),
    }
    print("[tiger]", json.dumps(results["tiger"], default=float), flush=True)

    with open(os.path.join(ART, "parity_synthetic.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)

    with open(os.path.join(ART, "parity_synthetic.md"), "w") as f:
        f.write("# Full-scale synthetic parity run (1 TPU chip)\n\n")
        f.write(f"- corpus: {NUM_USERS} users × {NUM_ITEMS} items "
                f"(synthetic, MOOCCube scale)\n")
        s = results["sasrec"]
        f.write(f"\n## SASRec (reference config)\n"
                f"- {s['epochs']} epochs in {s['train_seconds']:.0f}s "
                f"({s['train_examples_per_sec']:.0f} ex/s vs ref "
                f"~1-2K ex/s)\n- metrics: {s['metrics']}\n")
        r = results["rqvae"]
        f.write(f"\n## RQ-VAE (reference config)\n"
                f"- {r['seconds']:.0f}s total; collision rate "
                f"{r['collision_rate_before_dedup']:.4f}; "
                f"{r['unique_codes']}/{r['items']} unique codes\n")
        t = results["tiger"]
        f.write(f"\n## TIGER (reference config, beam 20)\n"
                f"- {t['epochs']} epochs in {t['train_seconds']:.0f}s "
                f"({t['train_examples_per_sec']:.0f} ex/s vs ref 3.1K)\n"
                f"- beam eval: {t['eval_sequences_per_sec']:.0f} seq/s "
                f"vs ref 3.1K seq/s\n- metrics: {t['metrics']}\n")
    print("experiment complete", flush=True)


if __name__ == "__main__":
    main()
