"""DenseT5 pipeline: contrastive train → cosine top-k retrieval eval.

Equivalent of `python T5/main.py` (train `T5/train.py:134-207`, working
in-training eval `T5/train.py:69-97`; the reference's standalone
`T5/evaluate.py:32` crashes on a 4-from-3 unpack — fixed here by having a
single eval path).

TPU-first: history *ids* are batched and the (I+1, 768) item-embedding
table lives on device; sequence embeddings are gathered inside the jit
step instead of materializing (N, L, 768) host arrays.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import DenseT5Config
from genrec_tpu.data import datasets
from genrec_tpu.data.contracts import (read_interactions, read_item_embs,
                                       read_user_embs)
from genrec_tpu.models.dense_t5 import DenseT5, contrastive_loss
from genrec_tpu.ops.metrics_ops import hit_ndcg_from_ranks
from genrec_tpu.parallel.auto import dp_shardings
from genrec_tpu.train.trainer import Trainer, TrainLoopResult
from genrec_tpu.utils.csv_results import append_results_csv


@dataclasses.dataclass
class DenseT5Artifacts:
    params: Dict
    result: TrainLoopResult


def _gather_batch(item_embs, user_embs, batch):
    """Build (B, L+1, 768) sequences: user-profile emb at position 0 then
    item embeddings; mask covers user emb + real items
    (`T5/data_vision.py:131-154`)."""
    hist = batch["history_ids"]                       # (B, L)
    seq = jnp.take(item_embs, hist, axis=0)           # (B, L, D)
    uemb = jnp.take(user_embs, batch["user_ids"] - 1, axis=0)  # (B, D)
    seq = jnp.concatenate([uemb[:, None, :], seq], axis=1)     # (B, L+1, D)
    L = hist.shape[1]
    pos = jnp.arange(L + 1)[None, :]
    mask = (pos <= batch["seq_lens"][:, None]).astype(jnp.int32)
    tgt = jnp.take(item_embs, batch["target_ids"], axis=0)
    return seq, mask, tgt


def train(cfg: DenseT5Config,
          data=None, item_embs: Optional[np.ndarray] = None,
          user_embs: Optional[np.ndarray] = None) -> DenseT5Artifacts:
    if data is None:
        data = read_interactions(cfg.rec_path)
    if item_embs is None:
        item_embs, _ = read_item_embs(cfg.item_emb_h5_path)
    if user_embs is None:
        user_embs = read_user_embs(cfg.user_emb_h5_path)
    item_embs = jnp.asarray(item_embs)
    user_embs = jnp.asarray(user_embs)

    tr = datasets.build_dense_t5_arrays(data, cfg.max_seq_len, "train")
    te = datasets.build_dense_t5_arrays(data, cfg.max_seq_len, "test")

    model = DenseT5(cfg)
    L = cfg.max_seq_len
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.trainer.seed),
                        jnp.zeros((1, L + 1, cfg.input_emb_dim)),
                        jnp.ones((1, L + 1), jnp.int32))

    def loss_fn(params, batch, rng):
        ex = batch.get("_extra", {})
        seq, mask, tgt = _gather_batch(ex.get("item_embs", item_embs),
                                       ex.get("user_embs", user_embs), batch)
        _, pred = model.apply(params, seq, mask, None, deterministic=False,
                              rngs={"dropout": rng})
        loss = contrastive_loss(pred, tgt, cfg.temperature,
                                valid=batch["valid"])
        n = batch["valid"].astype(jnp.float32).sum()
        return loss, {"sum_loss": loss * n, "valid": n}

    def val_fn(params, batch, rng):
        ex = batch.get("_extra", {})
        seq, mask, tgt = _gather_batch(ex.get("item_embs", item_embs),
                                       ex.get("user_embs", user_embs), batch)
        _, pred = model.apply(params, seq, mask, None, deterministic=True)
        loss = contrastive_loss(pred, tgt, cfg.temperature,
                                valid=batch["valid"])
        n = batch["valid"].astype(jnp.float32).sum()
        return loss, {"sum_loss": loss * n, "valid": n}

    tcfg = cfg.trainer
    steps = datasets.num_batches(len(tr.history_ids), tcfg.batch_size)
    _mesh, _bs, _rs = dp_shardings(cfg.mesh)
    # device-resident on any device count (datasets replicated, batches
    # gathered + sharded on device inside the epoch scan)
    trainer = Trainer(tcfg, init_params=params, loss_fn=loss_fn,
                      eval_loss_fn=val_fn, steps_per_epoch=steps,
                      logger_name="dense_t5",
                      batch_sharding=_bs, replicate_sharding=_rs,
                      train_data=tr.arrays, val_data=te.arrays,
                      extra_data={"item_embs": item_embs,
                                  "user_embs": user_embs})
    result = trainer.fit()
    return DenseT5Artifacts(params=result.best_params, result=result)


def evaluate(cfg: DenseT5Config, artifacts: DenseT5Artifacts,
             data=None, item_embs: Optional[np.ndarray] = None,
             user_embs: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Cosine top-k retrieval against the normalized item table
    (`T5/train.py:69-97` / `T5/evaluate.py:45-67`), reported as strict-rank
    Recall/NDCG with the padding row masked."""
    if data is None:
        data = read_interactions(cfg.rec_path)
    if item_embs is None:
        item_embs, _ = read_item_embs(cfg.item_emb_h5_path)
    if user_embs is None:
        user_embs = read_user_embs(cfg.user_emb_h5_path)
    item_embs = jnp.asarray(item_embs)
    user_embs = jnp.asarray(user_embs)

    te = datasets.build_dense_t5_arrays(data, cfg.max_seq_len, "test")
    model = DenseT5(cfg)
    norms = jnp.linalg.norm(item_embs, axis=1, keepdims=True)
    item_norm = item_embs / jnp.maximum(norms, 1e-8)

    @jax.jit
    def rank_batch(params, batch):
        seq, mask, _ = _gather_batch(item_embs, user_embs, batch)
        _, pred = model.apply(params, seq, mask, None, deterministic=True)
        scores = jnp.dot(pred, item_norm.T,
                         preferred_element_type=jnp.float32)
        scores = scores.at[:, 0].set(-1e9)
        tgt = jnp.take_along_axis(scores, batch["target_ids"][:, None], 1)
        return jnp.sum(scores > tgt, axis=1) + 1

    ranks, valids = [], []
    for batch in datasets.iterate_batches(te.arrays, cfg.trainer.eval_batch_size,
                                          shuffle=False):
        ranks.append(np.asarray(rank_batch(artifacts.params, batch)))
        valids.append(np.asarray(batch["valid"]))
    ranks = np.concatenate(ranks) if ranks else np.zeros(0)
    valids = np.concatenate(valids) if valids else np.zeros(0, bool)
    hits = hit_ndcg_from_ranks(ranks, cfg.topk_list, valids)
    metrics = {}
    for k in cfg.topk_list:  # reference reports Recall@k (1 relevant ⇒ = Hit@k)
        metrics[f"Recall@{k}"] = hits[f"Hit@{k}"]
        metrics[f"NDCG@{k}"] = hits[f"NDCG@{k}"]
    if cfg.trainer.results_csv_path:
        a = cfg.arch
        row = {"task_id": cfg.task_id, "d_model": a.d_model,
               "num_layers": a.num_layers, "dropout_rate": a.dropout_rate,
               "temperature": cfg.temperature, "lr": cfg.trainer.lr,
               "batch_size": cfg.trainer.batch_size, **metrics}
        append_results_csv(cfg.trainer.results_csv_path, row)
    return metrics


def main(cfg: DenseT5Config = DenseT5Config()):
    artifacts = train(cfg)
    return evaluate(cfg, artifacts)
