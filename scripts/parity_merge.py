"""Merge reference-side and genrec-tpu-side parity artifacts into PARITY.md.

The head-to-head harness (`scripts/parity_headtohead.py`) can run either
side alone (`--skip`); the reference (torch CPU) side takes ~30-60 min per
run while the TPU side takes seconds, so in practice they are produced in
separate invocations and merged here:

    python scripts/parity_merge.py \
        --ref artifacts/parity_ref_runs.json \
        --tpu artifacts/parity_tpu2.json

`--ref` holds the reference runs (one record per corpus-seed × model-seed,
metric keys like Hit@10 / Recall@10); `--tpu` is a harness output JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_headtohead import TOPK, _fmt_table  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="artifacts/parity_ref_runs.json")
    ap.add_argument("--tpu", default="artifacts/parity_tpu2.json")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    args = ap.parse_args()

    ref = json.load(open(args.ref))["runs"]
    tpu = json.load(open(args.tpu))["runs"]

    def seeds(runs):
        cs = sorted({r.get("corpus_seed", "?") for r in runs})
        ms = sorted({r.get("model_seed", "?") for r in runs})
        return cs, ms

    sas_cs, sas_ms = seeds(tpu["tpu_sasrec"])
    md = [
        "# PARITY — head-to-head vs the PyTorch reference",
        "",
        "Same synthetic corpora (4000 users × 240 items), same H5 contract "
        "files, same hyperparameters (the reference `main.py` param dicts), "
        "same protocol (best-val checkpoint, early-stop patience 10; SASRec "
        "60 epochs, TIGER 25). The reference side runs the *actual* "
        "`/root/reference` code on torch CPU; the genrec-tpu side runs its "
        "pipelines on one TPU v5e chip. TIGER decodes UNCONSTRAINED on both "
        "sides (trie-constrained decoding is a genrec-tpu improvement, off "
        "for parity). SASRec uses torch-matching N(0,1) embedding init "
        "(`SASRecConfig.emb_init_stddev=1.0`) so the early-stop protocol "
        "follows the reference's val-loss trajectory.",
        "",
        f"Corpus seeds {sas_cs}; model seeds per side as listed (n). The "
        "reference's early-stop-on-val-BCE protocol has large run-to-run "
        "variance on these corpora (e.g. reference SASRec Hit@10 spans "
        "0.048–0.099 across model seeds on ONE corpus), so pooled "
        "mean [min–max] is reported; both sides are run multiple times.",
        "",
    ]
    sas_metrics = [f"Hit@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    tig_metrics = [f"Recall@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    md.append(_fmt_table("SASRec (leave-one-out, strict rank)",
                         sas_metrics, ref["ref_sasrec"], tpu["tpu_sasrec"]))
    md.append(_fmt_table("TIGER (beam 20, exact-sequence match)",
                         tig_metrics, ref["ref_tiger"], tpu["tpu_tiger"]))

    # throughput summary from the tpu runs
    tt = [r for r in tpu["tpu_tiger"] if "steady_examples_per_sec" in r]
    if tt:
        steady = sum(r["steady_examples_per_sec"] for r in tt) / len(tt)
        md.append(
            f"TIGER end-to-end pipeline training throughput (steady-state, "
            f"excl. jit-compile epoch, mean of {len(tt)} runs): "
            f"**{steady:,.0f} ex/s** on one chip vs the reference GPU's "
            "3.1K (BASELINE.md).\n")
    md.append("Raw runs: `artifacts/parity_ref_runs.json` (reference side), "
              "`artifacts/parity_tpu2.json` (genrec-tpu side). Harness: "
              "`scripts/parity_headtohead.py`; merge: "
              "`scripts/parity_merge.py`.\n")
    with open(args.out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
