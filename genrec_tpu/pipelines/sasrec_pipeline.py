"""SASRec end-to-end pipeline: train → evaluate → results CSV.

Equivalent of `python SASRec/main.py` (train `SASRec/train.py:84-220`,
evaluate `SASRec/evaluate.py:10-54`), rebuilt on the shared Trainer with an
on-device jit step (negative sampling included — no host round trips).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import SASRecConfig
from genrec_tpu.data import datasets
from genrec_tpu.data.contracts import InteractionData, read_interactions
from genrec_tpu.eval.evaluator import rank_evaluate
from genrec_tpu.models.sasrec import SASRec, eval_loss, train_loss
from genrec_tpu.parallel.auto import dp_shardings, param_shardings
from genrec_tpu.train.trainer import Trainer, TrainLoopResult
from genrec_tpu.utils.csv_results import append_results_csv


@dataclasses.dataclass
class SASRecArtifacts:
    params: Dict
    item_num: int
    result: TrainLoopResult


def _make_loss_fns(model: SASRec, cfg: SASRecConfig, item_num: int):
    def loss_fn(params, batch, rng):
        loss, valid = train_loss(model, params, batch["inputs"], batch["targets"],
                                 rng, cfg, item_num,
                                 batch_valid=batch.get("valid"))
        return loss, {"sum_loss": loss * valid, "valid": valid}

    def val_fn(params, batch, rng):
        s, v = eval_loss(model, params, batch["inputs"], batch["targets"], rng,
                         cfg, item_num, batch_valid=batch.get("valid"))
        return s / jnp.maximum(v, 1.0), {"sum_loss": s, "valid": v}

    return loss_fn, val_fn


def train(cfg: SASRecConfig,
          data: Optional[InteractionData] = None) -> SASRecArtifacts:
    if data is None:
        data = read_interactions(cfg.data_path)
    tr = datasets.build_sasrec_arrays(data, cfg.max_len, "train", cfg.min_seq_len)
    te = datasets.build_sasrec_arrays(data, cfg.max_len, "test", cfg.min_seq_len)
    item_num = tr.item_num

    model = SASRec(item_num=item_num, cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.trainer.seed),
                        jnp.zeros((1, cfg.max_len), jnp.int32))
    loss_fn, val_fn = _make_loss_fns(model, cfg, item_num)

    tcfg = cfg.trainer
    steps = datasets.num_batches(len(tr.inputs), tcfg.batch_size)
    _mesh, _bs, _rs = dp_shardings(cfg.mesh)
    # device-resident on any device count (datasets replicated, batches
    # gathered + sharded on device inside the epoch scan)
    trainer = Trainer(tcfg, init_params=params, loss_fn=loss_fn,
                      eval_loss_fn=val_fn, steps_per_epoch=steps,
                      logger_name="sasrec",
                      batch_sharding=_bs, replicate_sharding=_rs,
                      param_shardings=param_shardings(_mesh, params),
                      train_data=tr.arrays, val_data=te.arrays)
    result = trainer.fit()
    return SASRecArtifacts(params=result.best_params, item_num=item_num,
                           result=result)


def evaluate(cfg: SASRecConfig, artifacts: SASRecArtifacts,
             data: Optional[InteractionData] = None) -> Dict[str, float]:
    """Leave-one-out rank evaluation + CSV append
    (`SASRec/evaluate.py:10-89`)."""
    if data is None:
        data = read_interactions(cfg.data_path)
    te = datasets.build_sasrec_arrays(data, cfg.max_len, "test", cfg.min_seq_len)
    model = SASRec(item_num=artifacts.item_num, cfg=cfg)
    params = artifacts.params

    predict = jax.jit(functools.partial(model.apply, method=SASRec.predict))

    metrics = rank_evaluate(
        lambda batch: predict(params, jnp.asarray(batch["inputs"])),
        datasets.iterate_batches(te.arrays, cfg.trainer.eval_batch_size,
                                 shuffle=False),
        cfg.topk_list,
    )
    if cfg.trainer.results_csv_path:
        row = {"task_id": cfg.task_id, "d": cfg.d, "num_blocks": cfg.num_blocks,
               "num_heads": cfg.num_heads, "dropout": cfg.dropout,
               "lr": cfg.trainer.lr, "batch_size": cfg.trainer.batch_size,
               "epochs": cfg.trainer.epochs, "mlp_layer": cfg.mlp_layer,
               "max_len": cfg.max_len, "top_k": cfg.top_k, **metrics}
        append_results_csv(cfg.trainer.results_csv_path, row)
    return metrics


def main(cfg: SASRecConfig = SASRecConfig()):
    artifacts = train(cfg)
    return evaluate(cfg, artifacts)
