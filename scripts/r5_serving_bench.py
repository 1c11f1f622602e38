"""Serving-layer throughput/latency for the recommend surface.

Completes the performance story for SURVEY §1 L6: the model pipelines
have chip benches (bench.py); this measures the app-facing serving path —
the stdlib HTTP adapter dispatching the shared route table into the
hybrid recommender — as requests/s and latency percentiles under a
small closed-loop load (threads on this 2-core host). The reference
backend has no recorded serving numbers; this artifact is the absolute
record for the rebuild.

    python scripts/r5_serving_bench.py [--requests 2000 --threads 8]

Writes artifacts/serving_bench_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "serving_bench_r5.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--users", type=int, default=500)
    ap.add_argument("--items", type=int, default=300)
    args = ap.parse_args()

    import numpy as np

    from genrec_tpu.backend.api import AppContext
    from genrec_tpu.backend.config import Settings
    from genrec_tpu.backend.db import Database
    from genrec_tpu.backend.server import BackendHTTPServer
    from genrec_tpu.backend.services import AIService, TextOrganizationService
    from genrec_tpu.data import synthetic
    from genrec_tpu.serving.recommend import HybridRecommender, ItemCatalog

    ids = list(range(1, args.items + 1))
    catalog = ItemCatalog(
        item_pool=ids,
        item_names={i: f"course {i}" for i in ids},
        item_keywords_pos={i: {"math", f"topic{i % 17}"} for i in ids},
        item_keywords_neg={i: set() for i in ids},
        item_content={i: f"content {i}" for i in ids},
        item_url={i: f"http://x/{i}" for i in ids},
        item_embeddings=synthetic.make_item_embs(args.items, dim=64,
                                                 num_topics=17, seed=4),
    )
    rec = HybridRecommender(catalog=catalog, seed=0)
    db = Database(":memory:")
    db.create_all()
    ctx = AppContext(settings=Settings(), db=db, ai=AIService(llm=None),
                     textorg=TextOrganizationService(db),
                     recommender=rec, catalog=catalog)
    srv = BackendHTTPServer(ctx, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"

    # warm + sanity
    body = json.dumps({"history": [1, 2, 3], "profile": "cs", "top_k": 10}
                      ).encode()

    def one(i):
        req = urllib.request.Request(
            f"{base}/api/v1/recommend", data=body,
            headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=30) as r:
            payload = json.loads(r.read())
        assert payload["success"] and len(payload["data"]) == 10
        return time.perf_counter() - t0

    one(0)
    lat = []
    lock = threading.Lock()
    per_thread = args.requests // args.threads

    def worker():
        local = [one(i) for i in range(per_thread)]
        with lock:
            lat.extend(local)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(args.threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    srv.shutdown()

    lat_ms = sorted(1e3 * x for x in lat)

    def pct(p):
        return round(lat_ms[min(len(lat_ms) - 1,
                                int(p / 100 * len(lat_ms)))], 2)

    out = {
        "surface": "stdlib HTTP adapter -> shared route table -> "
                   "HybridRecommender (/api/v1/recommend, top_k=10)",
        "items": args.items, "threads": args.threads,
        "requests": len(lat_ms),
        "requests_per_sec": round(len(lat_ms) / wall, 1),
        "latency_ms": {"p50": pct(50), "p90": pct(90), "p99": pct(99)},
        "host": "2-core CPU (serving is host-side; model artifacts are "
                "precomputed embeddings)",
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
