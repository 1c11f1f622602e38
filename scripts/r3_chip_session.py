"""One TPU claim, all round-3 chip work, strictly serialized.

The tunneled chip admits ONE client and takes ~15-20 min to release a
claim after a client exits, so separate per-task processes spend most of
their life blocked in init. This script batches every chip task of the
round into one process/claim, each stage wrapped so a failure doesn't cost
the rest, artifacts written incrementally:

  1. tpu-side DenseT5 parity runs (completes the 5-pipeline matrix)
  2. TIGER/TIGER-prefix ablation (prefix adapters + decode constraints)
  3. attention microbench fwd+bwd + long-seq train step through the kernel
  4. lookup comms chip timings (1M/10M rows)
  5. TIGER parity-config trace -> step breakdown artifact

    python scripts/r3_chip_session.py [--stages 1 2 3 4 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def stage_bench():
    import bench
    bench.main()


def stage_dense_parity():
    from parity_headtohead import make_corpus, run_tpu_dense_t5
    out_path = os.path.join(REPO, "artifacts", "parity_r3_tpu_dense.json")
    runs = {"tpu_dense_t5": []}
    for seed in (0, 1):
        ddir = f"/tmp/parity_r3_tpu/data_s{seed}"
        make_corpus(ddir, 4000, 240, seed)
        for mseed in (42, 43):
            wdir = f"/tmp/parity_r3_tpu/tpu_dense_s{seed}_m{mseed}"
            t0 = time.time()
            out = run_tpu_dense_t5(ddir, wdir, epochs=15, model_seed=mseed)
            out["corpus_seed"], out["model_seed"] = seed, mseed
            runs["tpu_dense_t5"].append(out)
            print(f"[dense s{seed} m{mseed}] {time.time()-t0:.0f}s "
                  + json.dumps({k: round(v, 4) for k, v in out.items()
                                if "@" in k}), flush=True)
            with open(out_path, "w") as f:
                json.dump({"config": {"users": 4000, "items": 240,
                                      "epochs": 15}, "runs": runs}, f,
                          indent=2, default=float)
    print(f"wrote {out_path}", flush=True)


def stage_ablation():
    import ablation_tiger
    sys.argv = ["ablation_tiger.py", "--seeds", "0", "1",
                "--model-seeds", "42", "--epochs", "25"]
    ablation_tiger.main()


def stage_attention_microbench():
    import bench_attention
    sys.argv = ["bench_attention.py"]
    bench_attention.main()


def stage_lookup_chip():
    import bench_lookup_comms
    bench_lookup_comms.run_chip()


def stage_trace():
    """TIGER parity config, 3 epochs, trace the 2nd; parse the chrome
    trace into a top-op step breakdown artifact."""
    import dataclasses
    import glob
    import gzip

    from genrec_tpu import configs
    from genrec_tpu.pipelines import tiger_pipeline
    from parity_headtohead import make_corpus

    ddir = "/tmp/parity_r3_tpu/data_s0"
    if not os.path.exists(os.path.join(ddir, "train_dataset.h5")):
        make_corpus(ddir, 4000, 240, 0)
    trace_dir = "/tmp/tiger_trace"
    cfg = configs.TIGERConfig(
        code_path=os.path.join(ddir, "course_rqvae_codes.npy"),
        train_dataset_path=os.path.join(ddir, "train_dataset.h5"),
        test_dataset_path=os.path.join(ddir, "test_dataset.h5"),
        trainer=dataclasses.replace(
            configs.TIGERConfig().trainer, epochs=3, seed=42,
            ckpt_dir="/tmp/tiger_trace_ckpt", profile_dir=trace_dir))
    art = tiger_pipeline.train(cfg)

    events = {}
    total_dur = 0.0
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True) + \
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                  recursive=True)
    for path in files:
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")[:120]
                events[name] = events.get(name, 0.0) + ev["dur"] / 1e3  # ms
                total_dur += ev["dur"] / 1e3
    top = sorted(events.items(), key=lambda kv: -kv[1])[:30]
    out = {
        "config": "TIGER parity (2+2 layers, d_model 64), 3 epochs, "
                  "2nd epoch traced (post-compile), device-resident scan",
        "trace_files": len(files),
        "total_traced_ms": total_dur,
        "note": "the tunneled PJRT backend forwards no DEVICE timeline, so "
                "the jax.profiler trace captures host threads only; the "
                "authoritative per-step accounting is the Trainer phase "
                "breakdown below (wall-clock instrumented around the "
                "device-resident epoch/val/ckpt calls, value-fetch synced)",
        "trainer_phase_seconds": art.result.phase_seconds,
        "steady_examples_per_sec": art.result.steady_examples_per_sec,
        "examples_per_sec": art.result.examples_per_sec,
        "top_host_events_ms": [{"name": n, "ms": round(ms, 2)}
                               for n, ms in top],
    }
    path = os.path.join(REPO, "artifacts", "tiger_trace_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path} ({len(files)} trace files, "
          f"{total_dur:.0f} ms traced)", flush=True)


STAGES = {
    "0": ("bench.py headline", stage_bench),
    "1": ("tpu DenseT5 parity", stage_dense_parity),
    "2": ("TIGER ablation", stage_ablation),
    "3": ("attention microbench", stage_attention_microbench),
    "4": ("lookup chip timings", stage_lookup_chip),
    "5": ("TIGER trace breakdown", stage_trace),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="+", default=list(STAGES))
    args = ap.parse_args()
    for s in args.stages:
        name, fn = STAGES[s]
        t0 = time.time()
        print(f"=== stage {s}: {name} ===", flush=True)
        try:
            fn()
            print(f"=== stage {s} OK ({time.time()-t0:.0f}s) ===", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"=== stage {s} FAILED ({time.time()-t0:.0f}s) ===",
                  flush=True)


if __name__ == "__main__":
    main()
