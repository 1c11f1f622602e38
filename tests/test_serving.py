"""Serving-surface tests: hybrid recommender, ETL, encoders, FastAPI app."""

import numpy as np
import pytest

from genrec_tpu.data import synthetic
from genrec_tpu.encoding.bert_encoders import (encode_item_texts,
                                               encode_user_profiles,
                                               top5_major_retrieval,
                                               user_embedding_from_items)
from genrec_tpu.serving.evaluation import evaluate_leave_one_out
from genrec_tpu.serving.recommend import (HybridRecommender, ItemCatalog,
                                          f_mat, f_sim_batch,
                                          get_user_history_labels,
                                          normalize_scores)


def _catalog(num_items=12, dim=16):
    ids = list(range(1, num_items + 1))
    embs = synthetic.make_item_embs(num_items, dim=dim, num_topics=3, seed=4)
    kw = [{"math", f"topic{i % 3}"} for i in ids]
    return ItemCatalog(
        item_pool=ids,
        item_names={i: f"course {i}" for i in ids},
        item_keywords_pos={i: k for i, k in zip(ids, kw)},
        item_keywords_neg={i: {"boring"} if i % 4 == 0 else set() for i in ids},
        item_content={i: f"content {i}" for i in ids},
        item_url={i: f"http://x/{i}" for i in ids},
        item_embeddings=embs,
    )


def test_f_mat_semantics():
    kw_pos = {1: {"a", "b"}, 2: {"a"}, 3: {"c"}}
    kw_neg = {1: {"x"}, 2: set(), 3: {"x", "y"}}
    history = [(1, 1), (3, 0)]  # item1 positive, item3 negative
    # candidate 2: pos overlap with item1 = |{a}| = 1; neg overlap = 0
    assert f_mat(history, 2, kw_pos, kw_neg) == 1.0
    # candidate 3 scored against itself in neg history: -|{x,y}| + pos |{}|
    assert f_mat(history, 3, kw_pos, kw_neg) == -2.0


def test_f_sim_batch_matches_loop():
    embs = np.eye(6, 8, dtype=np.float32) + 0.01
    history = [(1, 1), (2, 0)]
    out = f_sim_batch(history, [3, 4, 5], embs)
    # manual per-candidate
    def norm(v):
        return v / np.linalg.norm(v)
    for j, c in enumerate([3, 4, 5]):
        bp = float(np.dot(norm(embs[c]), norm(embs[1])))
        bn = float(np.dot(norm(embs[c]), norm(embs[2])))
        assert out[j] == pytest.approx(bp - bn, abs=1e-6)


def test_normalize_scores():
    assert normalize_scores([2.0, 4.0, 6.0]) == [0.0, 0.5, 1.0]
    assert normalize_scores([3.0, 3.0]) == [0.0, 0.0]
    assert normalize_scores([]) == []


def test_history_labels_balance():
    labels = get_user_history_labels([1, 2, 3], [4, 5, 6, 7, 8])
    assert sum(1 for _, f in labels if f == 1) == 3
    assert sum(1 for _, f in labels if f == 0) == 3


def test_hybrid_recommend_excludes_history():
    rec = HybridRecommender(catalog=_catalog(), seed=0)
    out = rec.recommend([1, 2, 3], "cs student", k=5)
    ids = [r["item_id"] for r in out]
    assert len(out) == 5
    assert not (set(ids) & {1, 2, 3})
    assert all(r["url"].startswith("http") for r in out)


def test_hybrid_cold_start_no_llm():
    rec = HybridRecommender(catalog=_catalog(), seed=0)
    out = rec.recommend([], "cs student", k=4)
    assert [r["item_id"] for r in out] == [1, 2, 3, 4]  # head of pool


def test_hybrid_with_fake_llm():
    rec = HybridRecommender(catalog=_catalog(), seed=0,
                            llm_client=lambda u, s: "course 7\ncourse 9")
    out = rec.recommend([1], "x", k=3)
    assert len(out) == 3


def test_leave_one_out_eval():
    rec = HybridRecommender(catalog=_catalog(), seed=0)
    hists = {1: [1, 2, 3], 2: [4, 5], 3: [6]}
    metrics = evaluate_leave_one_out(rec, hists, {1: "a", 2: "b"}, k=10,
                                     max_users=14)
    assert metrics["num_users"] == 2  # user 3 has <2 interactions
    assert 0.0 <= metrics["Hit@10"] <= 1.0
    assert metrics["Precision@10"] == pytest.approx(metrics["Hit@10"] / 10)


def test_encoders_fallback():
    table = encode_item_texts({1: "algebra", 2: "calculus"}, encoder=None, dim=32)
    assert table.shape == (3, 32)
    assert np.all(table[0] == 0)  # padding row
    users = encode_user_profiles({1: "alice", 2: "bob"}, encoder=None, dim=32)
    assert users.shape == (2, 32)
    # deterministic
    again = encode_item_texts({1: "algebra", 2: "calculus"}, encoder=None, dim=32)
    np.testing.assert_allclose(table, again)


def test_user_embedding_from_items():
    embs = np.arange(20, dtype=np.float32).reshape(5, 4)
    # ≥2 items: exclude the last
    v = user_embedding_from_items(embs, [1, 2, 3])
    np.testing.assert_allclose(v, embs[[1, 2]].mean(axis=0))
    v1 = user_embedding_from_items(embs, [4])
    np.testing.assert_allclose(v1, embs[4])
    v0 = user_embedding_from_items(embs, [])
    assert np.all(v0 == 0)


def test_top5_major_retrieval():
    majors = np.eye(8, 16, dtype=np.float32)
    users = majors[[2, 5]] + 0.01
    idx, embs = top5_major_retrieval(users, majors, top_k=5)
    assert idx.shape == (2, 5) and embs.shape == (2, 5, 16)
    assert idx[0, 0] == 2 and idx[1, 0] == 5  # best match first


def test_app_db_etl(tmp_path):
    import sqlite3
    from genrec_tpu.data.etl import app_db_to_interactions, extract_app_db
    db = str(tmp_path / "app.db")
    conn = sqlite3.connect(db)
    conn.executescript("""
    CREATE TABLE class_index (class_id INTEGER, class_name TEXT,
        keywords_pos TEXT, keywords_neg TEXT, content TEXT, url TEXT);
    CREATE TABLE interaction_records (id INTEGER, student_id INTEGER,
        class_id INTEGER, class_name TEXT, keywords_pos TEXT,
        keywords_neg TEXT, preference REAL);
    CREATE TABLE students (student_id INTEGER, major TEXT,
        interest_long_profile TEXT);
    INSERT INTO class_index VALUES (1,'algebra','math,logic','','c1','u1');
    INSERT INTO class_index VALUES (2,'poetry','art','dry','c2','u2');
    INSERT INTO interaction_records VALUES (1, 7, 1, 'algebra','m','',1.0);
    INSERT INTO interaction_records VALUES (2, 7, 2, 'poetry','a','',0.0);
    INSERT INTO interaction_records VALUES (3, 9, 2, 'poetry','a','',1.0);
    INSERT INTO students VALUES (7,'cs','ml'), (9,'art','poems');
    """)
    conn.commit(); conn.close()

    classes, inter, students = extract_app_db(db, str(tmp_path / "rec.h5"))
    assert list(classes["class_ids"]) == [1, 2]
    assert len(inter["student_ids"]) == 3
    assert (tmp_path / "rec.h5").exists()

    data = app_db_to_interactions(db)
    assert data.num_users == 2
    assert np.array_equal(data.user_ids, [1, 2])  # densified 1-based
    assert data.item_id_lists[0].tolist() == [1, 2]
    assert data.user_profiles == ["cs", "art"]


def test_fastapi_app():
    fastapi = pytest.importorskip(
        "fastapi",
        reason="fastapi is not in this image (verified: ModuleNotFoundError; "
               "pip install is disallowed). The stdlib adapter exercises the "
               "same shared handler table, so only adapter glue is untested.")
    from fastapi.testclient import TestClient
    from genrec_tpu.serving.app import create_app
    cat = _catalog()
    rec = HybridRecommender(catalog=cat, seed=0)
    app = create_app(recommender=rec, catalog=cat)
    client = TestClient(app)
    assert client.get("/health").json()["status"] == "healthy"
    assert client.get("/").status_code == 200
    r = client.post("/api/v1/recommend",
                    json={"history": [1, 2], "profile": "cs", "top_k": 3})
    assert r.status_code == 200
    data = r.json()["data"]
    assert len(data) == 3
    r2 = client.get("/api/v1/courses")
    assert len(r2.json()["data"]) == 12
    assert client.post("/api/v1/chat/ask",
                       json={"question": "hi"}).status_code == 503
    assert client.get("/api/v1/chat/suggestions").status_code == 200


def test_word_drop_augmentation():
    from genrec_tpu.encoding.bert_encoders import encode_item_texts, word_drop
    texts = ["alpha beta gamma delta epsilon zeta"] * 4
    dropped = word_drop(texts, ratio=0.5, rng=np.random.default_rng(0))
    assert all(len(d.split()) <= 6 for d in dropped)
    assert any(len(d.split()) < 6 for d in dropped)  # something dropped
    # ratio 0 keeps everything
    assert word_drop(texts, 0.0)[0] == texts[0]
    # flows through encode_item_texts deterministically
    a = encode_item_texts({1: "a b c d e f"}, encoder=None, dim=16,
                          word_drop_ratio=0.5, seed=3)
    b = encode_item_texts({1: "a b c d e f"}, encoder=None, dim=16,
                          word_drop_ratio=0.5, seed=3)
    np.testing.assert_allclose(a, b)


def test_sasrec_model_fn_serves_best_checkpoint(tmp_path):
    """Train a tiny SASRec, then serve its BEST checkpoint through the
    /api/v1/recommend/model handler: valid ids, no padding, no history,
    exactly top_k of them (the loop the reference never closed — its
    backend never calls its trained models)."""
    import dataclasses

    from genrec_tpu.backend.api import match_route
    from genrec_tpu.configs import SASRecConfig, TrainerConfig
    from genrec_tpu.data import synthetic
    from genrec_tpu.data.contracts import write_interactions
    from genrec_tpu.pipelines import sasrec_pipeline
    from genrec_tpu.serving.model_fn import sasrec_model_fn

    data = synthetic.make_interactions(num_users=40, num_items=30,
                                       min_len=4, max_len=10, seed=0)
    h5 = str(tmp_path / "user_item_interact.h5")
    write_interactions(h5, data)
    ckpt = str(tmp_path / "ckpt")
    cfg = SASRecConfig(
        data_path=h5, d=8, num_blocks=1, num_heads=1, mlp_layer=16,
        trainer=TrainerConfig(batch_size=16, eval_batch_size=16, epochs=2,
                              lr=1e-3, ckpt_dir=ckpt,
                              early_stop_patience=9))
    sasrec_pipeline.train(cfg)

    fn = sasrec_model_fn(ckpt, h5, cfg=cfg)
    assert fn is not None
    history = [1, 2, 3]
    items = fn(history, 5)
    assert len(items) == 5
    assert all(1 <= i <= 30 for i in items)
    assert not set(items) & set(history)

    # and through the real route handler
    handler, p = match_route("POST", "/api/v1/recommend/model")
    import types
    ctx = types.SimpleNamespace(model_recommend_fn=fn, catalog=None,
                                state={})
    status, body = handler(ctx, p, {}, {"history": history, "top_k": 4})
    assert status == 200
    got = [r["item_id"] for r in body["data"]]
    assert len(got) == 4 and not set(got) & set(history)

    # no checkpoint → None (route would 503)
    assert sasrec_model_fn(str(tmp_path / "empty"), h5, cfg=cfg) is None


def test_tiger_model_fn_generative_retrieval(tmp_path):
    """Train a tiny TIGER, then serve GENERATIVE retrieval from its best
    checkpoint: history items -> semantic-ID tokens -> trie-constrained
    beams -> item ids. Every returned id must be a real item outside the
    history."""
    import dataclasses
    import os

    from genrec_tpu.configs import T5ArchConfig, TIGERConfig, TrainerConfig
    from genrec_tpu.data import contracts, synthetic, tiger_tokens
    from genrec_tpu.pipelines import tiger_pipeline
    from genrec_tpu.serving.model_fn import tiger_model_fn

    data = synthetic.make_interactions(num_users=40, num_items=25,
                                       min_len=3, max_len=6, seed=0)
    codes = synthetic.make_codes(25, seed=0)
    train, test = tiger_tokens.build_tiger_splits(
        data.item_id_lists, data.user_ids, codes)
    codes_npy = str(tmp_path / "course_rqvae_codes.npy")
    contracts.write_codes(codes_npy, codes)
    contracts.write_tiger_split(str(tmp_path / "train.h5"), train)
    contracts.write_tiger_split(str(tmp_path / "test.h5"), test)

    cfg = TIGERConfig(
        code_path=codes_npy,
        train_dataset_path=str(tmp_path / "train.h5"),
        test_dataset_path=str(tmp_path / "test.h5"),
        arch=T5ArchConfig(num_layers=1, num_decoder_layers=1, d_model=16,
                          d_ff=32, num_heads=2, d_kv=8),
        max_len=4,
        trainer=TrainerConfig(batch_size=16, eval_batch_size=16, epochs=2,
                              lr=1e-3, ckpt_dir=str(tmp_path / "ck"),
                              early_stop_patience=9))
    tiger_pipeline.train(cfg)

    fn = tiger_model_fn(str(tmp_path / "ck"), codes_npy, cfg=cfg)
    assert fn is not None
    history = [1, 2]
    items = fn(history, 5)
    assert 0 < len(items) <= 5
    assert all(1 <= i <= 25 for i in items)
    assert not set(items) & set(history)
    assert len(items) == len(set(items))
    # no checkpoint -> None
    assert tiger_model_fn(str(tmp_path / "none"), codes_npy, cfg=cfg) is None


def test_dense_t5_model_fn_retrieval(tmp_path):
    """Train a tiny DenseT5, serve cosine retrieval from its best
    checkpoint: valid, history-excluded ids from the real route shape."""
    import dataclasses

    from genrec_tpu.configs import DenseT5Config, T5ArchConfig, TrainerConfig
    from genrec_tpu.data import contracts, synthetic
    from genrec_tpu.pipelines import dense_t5_pipeline
    from genrec_tpu.serving.model_fn import dense_t5_model_fn

    data = synthetic.make_interactions(num_users=30, num_items=20,
                                       min_len=4, max_len=8, seed=0)
    item_embs = synthetic.make_item_embs(20, dim=32, num_topics=4, seed=1)
    user_embs = synthetic.make_user_embs(data.num_users, dim=32, seed=2)
    inter = str(tmp_path / "inter.h5")
    iemb = str(tmp_path / "item_embs.h5")
    uemb = str(tmp_path / "user_embs.h5")
    contracts.write_interactions(inter, data)
    contracts.write_item_embs(iemb, item_embs, meta={"model_name": "syn"})
    contracts.write_user_embs(uemb, user_embs)

    base = DenseT5Config()
    cfg = dataclasses.replace(
        base, rec_path=inter, item_emb_h5_path=iemb, user_emb_h5_path=uemb,
        max_seq_len=6, input_emb_dim=32, target_emb_dim=32,
        arch=dataclasses.replace(base.arch, num_layers=1, d_model=16,
                                 d_ff=32, num_heads=2, d_kv=8),
        trainer=dataclasses.replace(base.trainer, batch_size=16,
                                    eval_batch_size=16, epochs=2,
                                    ckpt_dir=str(tmp_path / "ck"),
                                    early_stop_patience=9))
    dense_t5_pipeline.train(cfg)

    fn = dense_t5_model_fn(str(tmp_path / "ck"), iemb, cfg=cfg)
    assert fn is not None
    history = [3, 7]
    items = fn(history, 5)
    assert len(items) == 5
    assert all(1 <= i <= 20 for i in items)
    assert not set(items) & set(history)
    assert dense_t5_model_fn(str(tmp_path / "no"), iemb, cfg=cfg) is None
