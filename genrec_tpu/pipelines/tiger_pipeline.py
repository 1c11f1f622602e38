"""TIGER pipeline: train → beam-search eval → results CSV.

Equivalent of `python RQVAE-T5/main.py` (train `RQVAE-T5/train.py:62-151`,
eval `RQVAE-T5/evaluate.py:12-125`), on the shared Trainer with the
fixed-shape jit beam search of `genrec_tpu.ops.beam_search`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import TIGERConfig
from genrec_tpu.data import datasets
from genrec_tpu.data.contracts import read_codes, read_tiger_split
from genrec_tpu.eval.evaluator import beam_evaluate
from genrec_tpu.models import tiger as tiger_mod
from genrec_tpu.models.tiger import TIGER
from genrec_tpu.parallel.auto import dp_shardings, param_shardings
from genrec_tpu.train.trainer import Trainer, TrainLoopResult
from genrec_tpu.utils.csv_results import append_results_csv


@dataclasses.dataclass
class TIGERArtifacts:
    params: Dict
    result: TrainLoopResult


def _loss_fn(model: TIGER):
    def loss_fn(params, batch, rng):
        labels = batch["labels"]
        valid_rows = batch["valid"]
        # padded rows: neutralize by setting their labels to -100
        labels = jnp.where(valid_rows[:, None], labels, -100)
        loss, _ = model.apply(params, batch["input_ids"],
                              batch["attention_mask"], labels,
                              deterministic=False, rngs={"dropout": rng})
        n_valid = jnp.sum((labels != -100).astype(jnp.float32))
        return loss, {"sum_loss": loss * n_valid, "valid": n_valid}

    def val_fn(params, batch, rng):
        labels = jnp.where(batch["valid"][:, None], batch["labels"], -100)
        loss, _ = model.apply(params, batch["input_ids"],
                              batch["attention_mask"], labels,
                              deterministic=True)
        n_valid = jnp.sum((labels != -100).astype(jnp.float32))
        return loss, {"sum_loss": loss * n_valid, "valid": n_valid}

    return loss_fn, val_fn


def train(cfg: TIGERConfig,
          train_arrays: Optional[datasets.TigerArrays] = None,
          test_arrays: Optional[datasets.TigerArrays] = None) -> TIGERArtifacts:
    if train_arrays is None:
        train_arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.train_dataset_path), cfg.max_len, cfg.code_dim)
    if test_arrays is None:
        test_arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.test_dataset_path), cfg.max_len, cfg.code_dim,
            max_target_items=1)

    model = TIGER(cfg)
    seq_tokens = cfg.max_len * cfg.code_dim
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.trainer.seed),
                        jnp.zeros((1, seq_tokens), jnp.int32),
                        jnp.ones((1, seq_tokens), jnp.int32),
                        jnp.ones((1, cfg.code_dim), jnp.int32))
    loss_fn, val_fn = _loss_fn(model)

    tcfg = cfg.trainer
    steps = datasets.num_batches(len(train_arrays.input_ids), tcfg.batch_size)
    _mesh, _bs, _rs = dp_shardings(cfg.mesh)
    # device-resident on ANY device count: datasets upload once (replicated
    # on a mesh) and each epoch is one lax.scan with batches gathered and
    # sharded on device — no per-batch host dispatch even under DP.
    # With mesh.model_axis > 1 params additionally get the TP layout
    # (d_ff/attention splits per parallel/sharding.DEFAULT_RULES).
    train_kw = {"train_data": train_arrays.arrays}
    if cfg.target_len_buckets > 1:
        train_kw = {"train_data_buckets": datasets.bucket_by_target_len(
            train_arrays.arrays, cfg.target_len_buckets, cfg.code_dim)}
    elif cfg.target_len_composite > 1:
        rw, ws = datasets.target_len_widths(
            train_arrays.arrays, cfg.target_len_composite, cfg.code_dim)
        train_kw.update(composite_widths=ws, row_widths=rw)
    trainer = Trainer(tcfg, init_params=params, loss_fn=loss_fn,
                      eval_loss_fn=val_fn, steps_per_epoch=steps,
                      logger_name="tiger",
                      batch_sharding=_bs, replicate_sharding=_rs,
                      param_shardings=param_shardings(_mesh, params),
                      val_data=test_arrays.arrays, **train_kw)
    result = trainer.fit()
    return TIGERArtifacts(params=result.best_params, result=result)


def _evaluate_device_resident(cfg: TIGERConfig, model: TIGER, params,
                              test_arrays: datasets.TigerArrays, constraint,
                              actual_beams: int) -> Dict[str, float]:
    """Fully on-device beam eval: the test split is uploaded once, each
    batch is an index gather, and generation + start-strip + pad/trim +
    first-match exact-match all run inside one jit. Only the final (N,
    beams) boolean hit matrix crosses back to the host."""
    from genrec_tpu.ops.metrics_ops import beam_metrics, pos_index_exact_match

    # pass the eval arrays as jit ARGUMENTS (device buffer handles), not
    # closures — closed-over arrays become constants that a remote-PJRT
    # client re-ships on every call
    ii_dev = jax.device_put(test_arrays.input_ids)
    am_dev = jax.device_put(test_arrays.attention_mask)
    lab_dev = jax.device_put(test_arrays.labels)
    n = len(test_arrays.input_ids)
    B = cfg.trainer.eval_batch_size
    lab_w = lab_dev.shape[1]

    @jax.jit
    def eval_batch(params, idx, ii_dev, am_dev, lab_dev):
        safe = jnp.maximum(idx, 0)
        ii = jnp.take(ii_dev, safe, axis=0)
        am = jnp.take(am_dev, safe, axis=0)
        lab = jnp.take(lab_dev, safe, axis=0)
        toks, _ = tiger_mod.generate(model, params, ii, am,
                                     num_beams=actual_beams,
                                     constraint=constraint)
        preds = toks[:, :, 1:]  # strip decoder-start (RQVAE-T5/utils.py:69)
        gen_w = preds.shape[-1]
        if gen_w < lab_w:
            preds = jnp.pad(preds, ((0, 0), (0, 0), (0, lab_w - gen_w)))
        else:
            preds = preds[:, :, :lab_w]
        return pos_index_exact_match(preds, lab), idx >= 0

    pos_parts, valid_parts = [], []
    idx_all = np.arange(n, dtype=np.int32)
    for s in range(0, n, B):
        sel = idx_all[s:s + B]
        if len(sel) < B:
            sel = np.concatenate([sel, np.full(B - len(sel), -1, np.int32)])
        pos, valid = eval_batch(params, sel, ii_dev, am_dev, lab_dev)
        pos_parts.append(pos)
        valid_parts.append(valid)
    pos = np.asarray(jnp.concatenate(pos_parts))
    valid = np.asarray(jnp.concatenate(valid_parts))
    # reference aggregation = mean of batch means over equal-size batches
    # (RQVAE-T5/utils.py:83-90); identical to the global mean here
    return beam_metrics(pos, cfg.topk_list, valid)


def evaluate(cfg: TIGERConfig, artifacts: TIGERArtifacts,
             test_arrays: Optional[datasets.TigerArrays] = None,
             codes: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Beam-search eval (`RQVAE-T5/utils.py:44-91` semantics)."""
    if test_arrays is None:
        test_arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.test_dataset_path), cfg.max_len, cfg.code_dim,
            max_target_items=1)
    if codes is None and cfg.constrained_decoding == "trie":
        codes = read_codes(cfg.code_path)

    model = TIGER(cfg)
    constraint = tiger_mod.make_constraint(cfg, codes)
    actual_beams = max(max(cfg.topk_list), cfg.beam_size)

    if jax.device_count() == 1:
        metrics = _evaluate_device_resident(cfg, model, artifacts.params,
                                            test_arrays, constraint,
                                            actual_beams)
    else:
        gen = jax.jit(functools.partial(
            tiger_mod.generate, model, num_beams=actual_beams,
            constraint=constraint))

        def generate_fn(batch, num_beams):
            toks, _ = gen(artifacts.params, jnp.asarray(batch["input_ids"]),
                          jnp.asarray(batch["attention_mask"]))
            return toks

        metrics = beam_evaluate(
            generate_fn,
            datasets.iterate_batches(test_arrays.arrays,
                                     cfg.trainer.eval_batch_size,
                                     shuffle=False),
            cfg.topk_list, cfg.beam_size,
        )
    if cfg.trainer.results_csv_path:
        a = cfg.arch
        row = {"task_id": cfg.task_id, "num_layers": a.num_layers,
               "num_decoder_layers": a.num_decoder_layers, "d_model": a.d_model,
               "d_ff": a.d_ff, "num_heads": a.num_heads, "d_kv": a.d_kv,
               "dropout_rate": a.dropout_rate, "lr": cfg.trainer.lr,
               "batch_size": cfg.trainer.batch_size, "beam_size": cfg.beam_size,
               "constrained": cfg.constrained_decoding, **metrics}
        append_results_csv(cfg.trainer.results_csv_path, row)
    return metrics


def main(cfg: TIGERConfig = TIGERConfig()):
    artifacts = train(cfg)
    return evaluate(cfg, artifacts)
