"""Extract per-epoch train/val curves for the DenseT5 head-to-head.

Budget evidence for PARITY.md (VERDICT r3 #1): parses the REFERENCE run
logs (`train.py` logging lines in each ref workdir) and the tpu-side
artifacts (which carry `val_losses` since r4) into one JSON so "matched
budget" is demonstrable: the ref's best-val epoch lands at 4-5 and val
rises afterwards — the 9/10-epoch budget is not a truncation of an
improving run.

    python scripts/extract_dense_curves.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(REPO, "artifacts", "dense_val_curves_r4.json")

LINE = re.compile(r"Training loss: ([\d.]+) \| Val loss: ([\d.]+)")
CONF = re.compile(r"INFO - Configuration: ")


def parse_ref_log(path: str):
    """A workdir log may hold several runs (re-invocations append); each
    starts with a Configuration line. Returns the LAST run's curves."""
    runs = []
    cur = None
    with open(path) as f:
        for line in f:
            if CONF.search(line):
                cur = {"train": [], "val": []}
                runs.append(cur)
            m = LINE.search(line)
            if m and cur is not None:
                cur["train"].append(float(m.group(1)))
                cur["val"].append(float(m.group(2)))
    return [r for r in runs if r["val"]]


def main():
    out = {"ref": {}, "tpu": {}}
    for wdir in sorted(glob.glob("/tmp/parity_r3/ref_dense_t5_s*")):
        log = os.path.join(wdir, "tiger.log")
        if not os.path.exists(log):
            continue
        runs = parse_ref_log(log)
        if not runs:
            continue
        last = runs[-1]
        best = 1 + min(range(len(last["val"])), key=last["val"].__getitem__)
        out["ref"][os.path.basename(wdir)] = {
            "epochs_completed": len(last["val"]),
            "val_losses": last["val"],
            "train_losses": last["train"],
            "best_val_epoch": best,
            "best_val_loss": min(last["val"]),
            "runs_in_log": len(runs),
        }
    for tag, path in (("e9", "parity_r4_tpu_dense6l_e9.json"),
                      ("e30", "parity_r4_tpu_dense6l_e30.json")):
        p = os.path.join(REPO, "artifacts", path)
        if not os.path.exists(p):
            continue
        for r in json.load(open(p)).get("runs", {}).get("tpu_dense_t5", []):
            if "val_losses" not in r:
                continue
            key = f"{tag}_s{r['corpus_seed']}_m{r['model_seed']}"
            out["tpu"][key] = {
                "epochs_completed": len(r["val_losses"]),
                "val_losses": r["val_losses"],
                "best_val_epoch": r.get("best_val_epoch"),
                "best_val_loss": min(r["val_losses"]),
                "num_layers": r.get("num_layers"),
                "Recall@10": r.get("Recall@10"),
            }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", OUT)
    for side in ("ref", "tpu"):
        for k, v in out[side].items():
            print(f"  {side} {k}: best ep {v['best_val_epoch']}"
                  f"/{v['epochs_completed']} val {v['best_val_loss']:.4f}")


if __name__ == "__main__":
    main()
