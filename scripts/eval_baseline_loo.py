"""Standing leave-one-out evaluation of the hybrid baseline recommender.

VERDICT r2 missing #4: `serving/evaluation.py` mirrors the reference
(`Baseline/evaluation.py:155-238`) but no number was ever committed — the
reference prints Precision/Recall/Hit/NDCG@10 at runtime. This script owns
that number: it builds a synthetic app-DB-shaped corpus (topic-structured
keywords + embeddings so both scoring arms have signal), pushes it through
the REAL pipeline surface (CSV seeds → `backend/init_db.py` SQLite →
`data/etl.extract_app_db` → recommendation_data.h5 → ItemCatalog), and runs
the no-LLM α=β=0.5 mode (`Baseline/evaluation.py:54-62`), k=10, seeded.

Two protocols are recorded:
- the reference's exact cap (max_users=14, seed 42) — parity protocol,
- a 200-user run — the same estimator with usable error bars.

    python scripts/eval_baseline_loo.py  # writes artifacts/baseline_loo.json
"""

from __future__ import annotations

import csv
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

NUM_TOPICS = 8
NUM_CLASSES = 80
NUM_USERS = 300
KW_PER_TOPIC = 12
DIM = 768


def build_corpus(tmp, seed=0):
    rng = np.random.default_rng(seed)
    topics = [[f"t{t}_kw{j}" for j in range(KW_PER_TOPIC)]
              for t in range(NUM_TOPICS)]
    class_topic = rng.integers(0, NUM_TOPICS, size=NUM_CLASSES)
    centroids = rng.normal(size=(NUM_TOPICS, DIM))

    classes_csv = os.path.join(tmp, "class_index.csv")
    with open(classes_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "class_id", "class_name", "content", "keywords_pos",
            "keywords_neg", "url"])
        w.writeheader()
        for cid in range(1, NUM_CLASSES + 1):
            t = class_topic[cid - 1]
            pos = rng.choice(topics[t], size=4, replace=False)
            other = (t + 1 + rng.integers(0, NUM_TOPICS - 1)) % NUM_TOPICS
            neg = rng.choice(topics[other], size=2, replace=False)
            w.writerow({"class_id": cid, "class_name": f"course {cid}",
                        "content": f"content of course {cid} topic {t}",
                        "keywords_pos": ",".join(pos),
                        "keywords_neg": ",".join(neg),
                        "url": f"http://example/{cid}"})

    # topic-clustered item embeddings, row 0 = padding
    embs = np.zeros((NUM_CLASSES + 1, DIM), np.float32)
    for cid in range(1, NUM_CLASSES + 1):
        embs[cid] = centroids[class_topic[cid - 1]] + \
            0.5 * rng.normal(size=DIM)

    # users: 1-2 sticky topics, 5-15 positive interactions
    histories, profiles = {}, {}
    inter_csv = os.path.join(tmp, "interactions.csv")
    stu_csv = os.path.join(tmp, "students.csv")
    with open(inter_csv, "w", newline="") as f, \
            open(stu_csv, "w", newline="") as g:
        wi = csv.DictWriter(f, fieldnames=[
            "student_id", "class_id", "class_name", "keywords_pos",
            "keywords_neg", "preference"])
        wi.writeheader()
        ws = csv.DictWriter(g, fieldnames=[
            "student_id", "name", "major", "interest_profile",
            "interest_long_profile"])
        ws.writeheader()
        for u in range(1, NUM_USERS + 1):
            sid = str(1000 + u)  # ETL expects numeric student ids
            t_main = int(rng.integers(0, NUM_TOPICS))
            pool = [c for c in range(1, NUM_CLASSES + 1)
                    if class_topic[c - 1] == t_main]
            alt = [c for c in range(1, NUM_CLASSES + 1)
                   if class_topic[c - 1] != t_main]
            n = int(rng.integers(5, 16))
            hist = list(rng.choice(pool, size=min(n, len(pool)),
                                   replace=False))
            if rng.random() < 0.3 and alt:
                hist.append(int(rng.choice(alt)))
            rng.shuffle(hist)
            histories[u] = [int(c) for c in hist]
            profiles[u] = f"major topic {t_main}"
            ws.writerow({"student_id": sid, "name": f"user {u}",
                         "major": f"major {t_main}",
                         "interest_profile": f"topic {t_main}",
                         "interest_long_profile": f"likes topic {t_main}"})
            for cid in histories[u]:
                wi.writerow({"student_id": sid, "class_id": cid,
                             "class_name": f"course {cid}",
                             "keywords_pos": "", "keywords_neg": "",
                             "preference": "1"})  # numeric per ETL contract
    return classes_csv, inter_csv, stu_csv, embs, histories, profiles


def main():
    from genrec_tpu.backend.init_db import init_db
    from genrec_tpu.data.contracts import read_recommendation_data
    from genrec_tpu.data.etl import extract_app_db
    from genrec_tpu.serving.evaluation import evaluate_leave_one_out
    from genrec_tpu.serving.recommend import HybridRecommender, ItemCatalog

    with tempfile.TemporaryDirectory() as tmp:
        classes_csv, inter_csv, stu_csv, embs, histories, profiles = \
            build_corpus(tmp, seed=0)
        db_path = os.path.join(tmp, "app.db")
        init_db(db_path, class_index_csv=classes_csv,
                interactions_csv=inter_csv, students_csv=stu_csv)
        h5_path = os.path.join(tmp, "recommendation_data.h5")
        extract_app_db(db_path, h5_path)
        classes, interactions, students = read_recommendation_data(h5_path)

        catalog = ItemCatalog.from_recommendation_data(classes, embs)
        rec = HybridRecommender(catalog=catalog, llm_client=None, seed=42)

        results = {
            "corpus": {"classes": NUM_CLASSES, "users": NUM_USERS,
                       "topics": NUM_TOPICS, "seed": 0,
                       "path": "CSV seeds -> backend SQLite -> "
                               "etl.extract_app_db -> recommendation_data.h5"},
            "mode": "no-LLM (alpha=beta=0.5 reweighting, "
                    "Baseline/evaluation.py:54-62)",
            "reference_protocol_max14": evaluate_leave_one_out(
                rec, histories, profiles, k=10, max_users=14, seed=42),
            "extended_200_users": evaluate_leave_one_out(
                rec, histories, profiles, k=10, max_users=200, seed=42),
        }
        # random-recommendation floor for context: Hit@10 = k / (C - |hist|)
        results["random_floor_hit@10"] = 10 / (NUM_CLASSES - 10)

    out = os.path.join(REPO, "artifacts", "baseline_loo.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
