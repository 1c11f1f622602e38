"""Merge reference-side and genrec-tpu-side parity artifacts into PARITY.md.

The head-to-head harness (`scripts/parity_headtohead.py`) runs either side
alone (`--skip`); reference (torch CPU) runs take minutes-to-hours while
the TPU side takes seconds-to-minutes, so runs accumulate across many
invocations/artifacts and are merged here into the FIVE-pipeline table:

    python scripts/parity_merge.py \
        --inputs artifacts/parity_ref_runs.json artifacts/parity_tpu2.json ...

Runs are pooled per side and de-duplicated by (pipeline, corpus_seed,
model_seed) — the LAST artifact listed wins a duplicate cell, so list
newer artifacts after older ones.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_headtohead import TOPK, _fmt_table  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

KEYS = ("ref_sasrec", "tpu_sasrec", "ref_tiger", "tpu_tiger",
        "ref_rqvae", "tpu_rqvae", "ref_tiger_prefix", "tpu_tiger_prefix",
        "ref_dense_t5", "tpu_dense_t5")

DEFAULT_INPUTS = [
    "artifacts/parity_ref_runs.json",      # r2: ref sasrec x4 + ref tiger x2
    "artifacts/parity_ref_rqvae.json",
    "artifacts/parity_ref_prefix.json",
    "artifacts/parity_tpu2.json",          # r2: tpu sasrec/tiger x8
    "artifacts/parity_tpu3.json",          # r2: tpu rqvae/prefix
    "artifacts/parity_tpu_rqvae.json",
    "artifacts/parity_r3_ref_*.json",      # r3 fills: ref dense, sasrec
    # r4: ref TIGER m43 ×2, ref prefix s1, ref dense m43; tpu DenseT5 at the
    # reference's EFFECTIVE 6-layer architecture (T5/model.py:9-16 drops
    # num_layers → HF default 6) at the matched 9-epoch budget. These come
    # LAST so the 6-layer cells replace the r3 2-layer tpu_dense cells —
    # the 2-layer numbers compared different architectures and are retired
    # (kept in artifacts/parity_r3_tpu_dense*.json for the record).
    "artifacts/parity_r4_ref_tiger_m43.json",
    "artifacts/parity_r4_ref_prefix_s1.json",
    "artifacts/parity_r4_ref_dense_s0m43.json",
    "artifacts/parity_r4_tpu_dense6l_e9.json",
    # r4 tpu prefix rerun (adapter attention-dropout fix) + extra seeds:
    # listed last so the fixed-adapter cells replace the r2/r3 ones
    "artifacts/parity_r4_tpu_prefix.json",
    "artifacts/parity_r4_tpu_prefix_m4445.json",
    # r5 tpu SASRec rerun: the blocks now apply the reference's
    # nn.MultiheadAttention attention-weight dropout (advisor r4 finding);
    # listed last so the faithful-regularization cells replace the r2 ones
    "artifacts/parity_r5_tpu_sasrec.json",
]


def load_runs(paths):
    pooled = {k: {} for k in KEYS}
    for path in paths:
        try:
            data = json.load(open(path))
        except FileNotFoundError:
            continue
        runs = data.get("runs", data)  # bare-runs artifacts (r2 ref files)
        for k in KEYS:
            for r in runs.get(k, []) or []:
                cell = (r.get("corpus_seed", "?"), r.get("model_seed", "?"))
                pooled[k][cell] = r
    return {k: list(v.values()) for k, v in pooled.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", default=DEFAULT_INPUTS)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    args = ap.parse_args()

    paths = []
    for pat in args.inputs:
        expanded = sorted(glob.glob(os.path.join(REPO, pat))) or \
            sorted(glob.glob(pat))
        paths.extend(expanded or [pat])
    runs = load_runs(paths)

    def grid(key):
        return sorted(((r.get("corpus_seed", "?"), r.get("model_seed", "?"))
                       for r in runs[key]), key=str)

    md = [
        "# PARITY — five-pipeline head-to-head vs the PyTorch reference",
        "",
        "Same synthetic corpora (4000 users × 240 items, topic-structured), "
        "same H5 contract files, same hyperparameters (the reference "
        "`main.py` param dicts), same protocol (best-val checkpoint, "
        "early-stop patience 10; SASRec 60 epochs, TIGER 25-30, "
        "TIGER-prefix 25, RQ-VAE 100). "
        "**DenseT5 compares like-for-like at the reference's EFFECTIVE "
        "architecture**: the reference's model builder (`T5/model.py:9-16`) "
        "never forwards `params['num_layers']` into `T5Config`, so despite "
        "its param dict saying 2 encoder layers, the model it actually "
        "trains is HF's default **6-layer** (its own log: 19,603,328 params "
        "= 16.45M unused default-vocab embedding + 3.15M ≈ 6 blocks at "
        "d512/d_ff256). The tpu side therefore runs num_layers=6 "
        "(`genrec_tpu/configs.py` DenseT5Config docstring) at a matched "
        "~9-epoch budget — the reference's torch-CPU runs cost ~10 "
        "min/epoch on this 2-core host, and their per-epoch val curves "
        "(`artifacts/dense_val_curves_r4.json`) show best-val is reached "
        "at epoch 4-5 with val rising after, i.e. the 9-epoch budget is "
        "converged for the early-stop protocol, not a truncation. The "
        "earlier r3 comparison (2-layer tpu vs effective-6-layer ref, "
        "'+30%') compared different architectures and is retired. The "
        "reference side runs the *actual* `/root/reference` code on torch "
        "CPU; the genrec-tpu side runs its pipelines on one TPU chip. "
        "TIGER/prefix decode UNCONSTRAINED on both sides (trie-constrained "
        "decoding is a genrec-tpu improvement, off for parity — see "
        "`artifacts/ablation_tiger_r3.json` for what it adds). SASRec uses "
        "torch-matching N(0,1) embedding init so the early-stop protocol "
        "follows the reference's val-loss trajectory; its r5 cells train "
        "with the reference's attention-WEIGHT dropout "
        "(`nn.MultiheadAttention(..., dropout)`, `SASRec/model.py:31-32`) "
        "restored in the tpu blocks.",
        "",
        "The early-stop-on-val-loss protocol has large run-to-run variance "
        "on these corpora, so pooled mean [min–max] over all "
        "(corpus seed × model seed) runs is reported per side.",
        "",
    ]
    sas = [f"Hit@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    tig = [f"Recall@{k}" for k in TOPK] + [f"NDCG@{k}" for k in TOPK]
    rq = ["best_collision@rate", "post_unique@frac", "prefix3@distinct"]

    tables = [
        ("SASRec (leave-one-out, strict rank)", sas, "sasrec"),
        ("RQ-VAE (collision rate / post-repair code table)", rq, "rqvae"),
        ("TIGER (beam 20, exact-sequence match)", tig, "tiger"),
        ("TIGER-prefix (3 major-hierarchy adapters, beam 20)", tig,
         "tiger_prefix"),
        ("DenseT5 (encoder-only dense retrieval, cosine top-k)", tig,
         "dense_t5"),
    ]
    for title, metrics, stem in tables:
        ref, tpu = runs[f"ref_{stem}"], runs[f"tpu_{stem}"]
        if ref and tpu:
            metrics = [m for m in metrics
                       if all(m in r for r in ref) and all(m in r for r in tpu)]
            md.append(_fmt_table(title, metrics, ref, tpu))
            md.append(f"ref cells (corpus, model seed): {grid(f'ref_{stem}')};"
                      f" tpu cells: {grid(f'tpu_{stem}')}\n")
        else:
            md.append(f"### {title}\n\nINCOMPLETE: ref n={len(ref)}, "
                      f"tpu n={len(tpu)}\n")

    # full-protocol DenseT5 supplement: the reference's own num_epochs=30
    # protocol is unaffordable on its torch-CPU side (~5h/run) but free on
    # tpu — report it as the capability number, distinct from the
    # matched-budget table above
    e30_path = os.path.join(REPO, "artifacts", "parity_r4_tpu_dense6l_e30.json")
    if os.path.exists(e30_path) and runs["tpu_dense_t5"]:
        e30 = json.load(open(e30_path)).get("runs", {}).get("tpu_dense_t5", [])
        if e30:
            r10 = [r["Recall@10"] for r in e30]
            walls = [r.get("wall_seconds", 0) for r in e30]
            md.append(
                "**DenseT5 at the full 30-epoch reference protocol (tpu "
                "only)**: the reference's `T5/main.py` asks for 30 epochs "
                "but its CPU runs cost ~5h each, so the table above "
                "compares at the 9-epoch budget both sides can complete. "
                "On tpu the full protocol costs "
                f"{np.mean(walls):.0f}s/run and reaches Recall@10 "
                f"{np.mean(r10):.4f} [{min(r10):.4f}–{max(r10):.4f}] "
                f"(n={len(r10)}, same 6-layer architecture/corpora/seeds; "
                "`artifacts/parity_r4_tpu_dense6l_e30.json`) — vs "
                f"{np.mean([r['Recall@10'] for r in runs['tpu_dense_t5']]):.4f} "
                "at the matched budget. The architecture converges well "
                "past where the reference can afford to train it.\n")

    # hybrid-baseline LOO row (artifact produced by eval_baseline_loo.py)
    loo_path = os.path.join(REPO, "artifacts", "baseline_loo.json")
    if os.path.exists(loo_path):
        loo = json.load(open(loo_path))
        p14 = loo["reference_protocol_max14"]
        p200 = loo["extended_200_users"]
        md.append(
            "### LLM-hybrid baseline (leave-one-out, no-LLM α=β=0.5 mode)\n\n"
            "The reference prints these at runtime only "
            "(`Baseline/evaluation.py:229-252`, max_users=14, seed 42); the "
            "rebuild owns a standing number on a synthetic app-DB corpus "
            "(80 classes / 8 topics / 300 users, CSV→SQLite→ETL path):\n\n"
            f"| protocol | Precision@10 | Recall@10 | Hit@10 | NDCG@10 |\n"
            f"|---|---|---|---|---|\n"
            f"| reference cap (14 users) | {p14['Precision@10']:.4f} | "
            f"{p14['Recall@10']:.4f} | {p14['Hit@10']:.4f} | "
            f"{p14['NDCG@10']:.4f} |\n"
            f"| 200 users | {p200['Precision@10']:.4f} | "
            f"{p200['Recall@10']:.4f} | {p200['Hit@10']:.4f} | "
            f"{p200['NDCG@10']:.4f} |\n\n"
            f"Random floor Hit@10 ≈ {loo['random_floor_hit@10']:.3f}. "
            "Artifact: `artifacts/baseline_loo.json`.\n")

    tt = [r for r in runs["tpu_tiger"] if "steady_examples_per_sec" in r]
    if tt:
        steady = sum(r["steady_examples_per_sec"] for r in tt) / len(tt)
        md.append(
            f"TIGER end-to-end pipeline training throughput (steady-state, "
            f"excl. jit-compile epoch, mean of {len(tt)} runs): "
            f"**{steady:,.0f} ex/s** on one chip vs the reference GPU's "
            "3.1K (BASELINE.md). The bench.py HEADLINE is the flat-padded "
            "path; length-bucketed epochs "
            "(`TIGERConfig.target_len_buckets=4`) are an opt-in throughput "
            "row — the r4 quality grid (3 model seeds × 2 corpora, "
            "`artifacts/bucket_quality_r4_interleaved.json`) measures them "
            "1.2–2.4% below the flat Recall@10 means even with "
            "chunk-interleaved bucket visiting, and their speedup is "
            "target-length-distribution dependent (~2× on uniform "
            "synthetic lengths, ~+10% on this corpus). Parity runs keep "
            "buckets off.\n")
    md.append("Merged artifacts: " + ", ".join(
        f"`{os.path.relpath(p, REPO)}`" for p in paths
        if os.path.exists(p)) + ". Harness: `scripts/parity_headtohead.py`; "
        "merge: `scripts/parity_merge.py`.\n")
    with open(args.out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {args.out}")
    for k in KEYS:
        print(f"  {k}: n={len(runs[k])}")


if __name__ == "__main__":
    main()
