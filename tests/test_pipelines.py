"""End-to-end pipeline tests on synthetic data (tiny configs, CPU).

Each test runs the real train→eval path and checks the model actually
learns (metrics beat random / loss decreases) — the CPU-runnable
golden-metric strategy from SURVEY.md §4.
"""

import dataclasses

import numpy as np
import pytest

from genrec_tpu import configs
from genrec_tpu.data import datasets, synthetic, tiger_tokens
from genrec_tpu.pipelines import (dense_t5_pipeline, rqvae_pipeline,
                                  sasrec_pipeline, tiger_pipeline,
                                  tiger_prefix_pipeline)


@pytest.fixture(scope="module")
def corpus():
    return synthetic.make_interactions(num_users=300, num_items=60, min_len=4,
                                       max_len=15, num_topics=6,
                                       topic_stickiness=0.95, seed=7)


def _trainer(tmp_path, **kw):
    base = dict(epochs=3, batch_size=64, eval_batch_size=64, lr=1e-2,
                ckpt_dir=str(tmp_path / "ckpt"), early_stop_patience=10, seed=0)
    base.update(kw)
    return configs.TrainerConfig(**base)


def test_sasrec_end_to_end(tmp_path, corpus):
    cfg = configs.SASRecConfig(
        d=16, num_blocks=1, num_heads=1, mlp_layer=32, max_len=10,
        dropout=0.1, num_neg_samples=5, topk_list=(5, 10),
        trainer=_trainer(tmp_path, epochs=8,
                         results_csv_path=str(tmp_path / "res.csv")))
    art = sasrec_pipeline.train(cfg, corpus)
    assert art.result.train_losses[-1] < art.result.train_losses[0]
    metrics = sasrec_pipeline.evaluate(cfg, art, corpus)
    # random Hit@10 on 60 items ≈ 0.167; topic structure should beat it
    assert metrics["Hit@10"] > 0.2
    assert (tmp_path / "res.csv").exists()


def test_sasrec_resume(tmp_path, corpus):
    cfg = configs.SASRecConfig(
        d=8, num_blocks=1, num_heads=1, mlp_layer=16, max_len=8,
        trainer=_trainer(tmp_path, epochs=2))
    art = sasrec_pipeline.train(cfg, corpus)
    cfg2 = dataclasses.replace(cfg, trainer=dataclasses.replace(
        cfg.trainer, epochs=3, resume=True))
    art2 = sasrec_pipeline.train(cfg2, corpus)
    # resumed run continues from epoch 3 — only one more epoch of losses
    assert len(art2.result.train_losses) == 1
    assert art2.result.epochs_run == 3


def test_rqvae_end_to_end(tmp_path):
    embs = synthetic.make_item_embs(num_items=80, dim=32, num_topics=8, seed=3)
    cfg = configs.RQVAEConfig(
        in_dim=32, num_emb_list=(8, 8, 8), e_dim=8, layers=(32, 16),
        dropout=0.0, sk_epsilons=(0.01, 0.01, 0.01), sk_iters=20,
        kmeans_init=True, kmeans_iters=10,
        semantic_id_file=str(tmp_path / "codes.npy"),
        trainer=_trainer(tmp_path, epochs=8, lr=1e-3, optimizer="adamw",
                         lr_scheduler="linear", warmup_epochs=1,
                         grad_clip_norm=1.0, batch_size=32))
    art = rqvae_pipeline.train(cfg, item_embs=embs[1:])
    assert min(art.result.train_losses) < art.result.train_losses[0]
    codes = rqvae_pipeline.infer(cfg, art, item_embs=embs[1:])
    assert codes.shape == (80, 4)
    # codes.npy contract: unique after the 4th disambiguation digit
    assert len(np.unique(codes, axis=0)) == len(codes)
    assert (tmp_path / "codes.npy").exists()
    assert (tmp_path / "codes_mapping.json").exists()


@pytest.fixture(scope="module")
def tiger_data(corpus):
    codes = synthetic.make_codes(num_items=60, codebook_size=8, num_levels=3,
                                 seed=5)
    train_split, test_split = tiger_tokens.build_tiger_splits(
        corpus.item_id_lists, corpus.user_ids, codes)
    return codes, train_split, test_split


def test_tiger_end_to_end(tmp_path, tiger_data):
    codes, train_split, test_split = tiger_data
    arch = configs.T5ArchConfig(vocab_size=64, num_layers=1,
                                num_decoder_layers=1, d_model=32, d_ff=64,
                                num_heads=2, d_kv=16, dropout_rate=0.1)
    cfg = configs.TIGERConfig(
        arch=arch, max_len=8, beam_size=5, topk_list=(1, 5),
        constrained_decoding="trie",
        trainer=_trainer(tmp_path, epochs=4, batch_size=64, lr=3e-3,
                         results_csv_path=str(tmp_path / "tiger.csv")))
    tr = datasets.build_tiger_arrays(train_split, cfg.max_len, cfg.code_dim)
    te = datasets.build_tiger_arrays(test_split, cfg.max_len, cfg.code_dim,
                                     max_target_items=1)
    art = tiger_pipeline.train(cfg, tr, te)
    assert art.result.train_losses[-1] < art.result.train_losses[0]
    metrics = tiger_pipeline.evaluate(cfg, art, te, codes=codes[1:])
    assert set(metrics) == {"Recall@1", "Recall@5", "NDCG@1", "NDCG@5"}
    assert metrics["Recall@5"] >= metrics["Recall@1"]
    # trie-constrained decoding on a tiny model should land real items
    assert metrics["Recall@5"] > 0.0


def test_tiger_device_resident_eval_matches_streaming(tmp_path, tiger_data):
    """The fused on-device eval path must agree with the streaming path."""
    import jax
    from genrec_tpu.models import tiger as tiger_mod

    codes, train_split, test_split = tiger_data
    arch = configs.T5ArchConfig(vocab_size=64, num_layers=1,
                                num_decoder_layers=1, d_model=32, d_ff=64,
                                num_heads=2, d_kv=16, dropout_rate=0.0)
    cfg = configs.TIGERConfig(
        arch=arch, max_len=8, beam_size=5, topk_list=(1, 5),
        constrained_decoding="level",
        trainer=_trainer(tmp_path, epochs=1, batch_size=64, lr=3e-3))
    te = datasets.build_tiger_arrays(test_split, cfg.max_len, cfg.code_dim,
                                     max_target_items=1)
    art = tiger_pipeline.train(
        cfg, datasets.build_tiger_arrays(train_split, cfg.max_len,
                                         cfg.code_dim), te)
    streaming = tiger_pipeline.evaluate(cfg, art, te, codes=codes[1:])
    constraint = tiger_mod.make_constraint(cfg, codes[1:])
    model = tiger_mod.TIGER(cfg)
    fused = tiger_pipeline._evaluate_device_resident(
        cfg, model, art.params, te, constraint,
        max(max(cfg.topk_list), cfg.beam_size))
    for k in streaming:
        assert abs(streaming[k] - fused[k]) < 1e-6, (k, streaming, fused)


def test_tiger_prefix_end_to_end(tmp_path, corpus, tiger_data):
    codes, train_split, test_split = tiger_data
    arch = configs.T5ArchConfig(vocab_size=64, num_layers=1,
                                num_decoder_layers=1, d_model=32, d_ff=64,
                                num_heads=2, d_kv=16, dropout_rate=0.0)
    cfg = configs.TIGERPrefixConfig(
        arch=arch, max_len=8, beam_size=5, topk_list=(5,), bert_dim=16,
        constrained_decoding="level",
        trainer=_trainer(tmp_path, epochs=2, batch_size=64, lr=3e-3))
    uids, prof = synthetic.make_prof_embs(corpus.num_users, 5, 16)
    tr = datasets.build_tiger_arrays(train_split, cfg.max_len, cfg.code_dim)
    te = datasets.build_tiger_arrays(test_split, cfg.max_len, cfg.code_dim,
                                     max_target_items=1)
    tr_d = tiger_prefix_pipeline.attach_prof(tr, [(uids, prof)] * 3)
    te_d = tiger_prefix_pipeline.attach_prof(te, [(uids, prof)] * 3)
    assert tr_d["prof_lvl1"].shape == (len(tr.input_ids), 5, 16)
    art = tiger_prefix_pipeline.train(cfg, tr_d, te_d)
    assert art.result.train_losses[-1] < art.result.train_losses[0]
    metrics = tiger_prefix_pipeline.evaluate(cfg, art, te_d)
    assert "Recall@5" in metrics and "NDCG@5" in metrics


def test_dense_t5_end_to_end(tmp_path, corpus):
    arch = configs.T5ArchConfig(d_model=32, num_layers=1, num_heads=2,
                                d_kv=16, d_ff=64, dropout_rate=0.0)
    cfg = configs.DenseT5Config(
        arch=arch, input_emb_dim=32, target_emb_dim=32, max_seq_len=8,
        topk_list=(5, 10),
        trainer=_trainer(tmp_path, epochs=3, batch_size=64, lr=1e-3))
    item_embs = synthetic.make_item_embs(60, dim=32, num_topics=6, seed=7)
    user_embs = synthetic.make_user_embs(corpus.num_users, dim=32)
    art = dense_t5_pipeline.train(cfg, corpus, item_embs, user_embs)
    assert art.result.train_losses[-1] < art.result.train_losses[0]
    metrics = dense_t5_pipeline.evaluate(cfg, art, corpus, item_embs, user_embs)
    # random Recall@10 on 60 items ≈ 1/6; embedding-cluster structure helps
    assert metrics["Recall@10"] > 0.1
