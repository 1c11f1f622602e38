"""TIGER-prefix pipeline: prefix-conditioned train → beam eval.

Equivalent of `python RQVAE-T5-prefix/main.py` (train
`RQVAE-T5-prefix/train.py:87-187`, eval `RQVAE-T5-prefix/evaluate.py:12-95`):
TIGER plus per-sample joins of the three prof_lvl{1,2,3}.h5 embedding sets
threaded through forward and generate.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import TIGERPrefixConfig
from genrec_tpu.data import datasets
from genrec_tpu.data.contracts import read_codes, read_prof_lvl, read_tiger_split
from genrec_tpu.eval.evaluator import beam_evaluate
from genrec_tpu.models import tiger_prefix as tp_mod
from genrec_tpu.models.tiger import make_constraint as _tiger_make_constraint
from genrec_tpu.models.tiger_prefix import TIGERPrefix
from genrec_tpu.ops.beam_search import ConstraintSpec
from genrec_tpu.parallel.auto import dp_shardings
from genrec_tpu.train.trainer import Trainer, TrainLoopResult
from genrec_tpu.utils.csv_results import append_results_csv


@dataclasses.dataclass
class TIGERPrefixArtifacts:
    params: Dict
    result: TrainLoopResult


def make_constraint(cfg: TIGERPrefixConfig, codes=None) -> ConstraintSpec:
    # reuse the TIGER constraint builder (same token space)
    from genrec_tpu.configs import TIGERConfig
    proxy = TIGERConfig(arch=cfg.arch, codebook_size=cfg.codebook_size,
                        max_gen_len=cfg.max_gen_len,
                        constrained_decoding=cfg.constrained_decoding)
    return _tiger_make_constraint(proxy, codes)


def attach_prof(arrays: datasets.TigerArrays,
                prof_paths_or_data) -> Dict[str, np.ndarray]:
    """Join prof_lvl{1,2,3} embeddings by user id into the batch arrays."""
    out = dict(arrays.arrays)
    for i, src in enumerate(prof_paths_or_data):
        if isinstance(src, str):
            uids, embs = read_prof_lvl(src)
        else:
            uids, embs = src
        out[f"prof_lvl{i + 1}"] = datasets.join_prof_embs(
            arrays.user_ids, uids, embs)
    return out


def _loss_fns(model: TIGERPrefix):
    def _apply(params, batch, deterministic, rng=None):
        labels = jnp.where(batch["valid"][:, None], batch["labels"], -100)
        rngs = {"dropout": rng} if rng is not None else None
        loss, _ = model.apply(params, batch["input_ids"],
                              batch["attention_mask"], labels,
                              batch["prof_lvl1"], batch["prof_lvl2"],
                              batch["prof_lvl3"],
                              deterministic=deterministic, rngs=rngs)
        n_valid = jnp.sum((labels != -100).astype(jnp.float32))
        return loss, {"sum_loss": loss * n_valid, "valid": n_valid}

    return (lambda p, b, r: _apply(p, b, False, r),
            lambda p, b, r: _apply(p, b, True))


def train(cfg: TIGERPrefixConfig,
          train_data: Optional[Dict[str, np.ndarray]] = None,
          test_data: Optional[Dict[str, np.ndarray]] = None) -> TIGERPrefixArtifacts:
    if train_data is None:
        arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.train_dataset_path), cfg.max_len, cfg.code_dim)
        train_data = attach_prof(arrays, cfg.prof_lvl_paths)
    if test_data is None:
        arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.test_dataset_path), cfg.max_len, cfg.code_dim,
            max_target_items=1)
        test_data = attach_prof(arrays, cfg.prof_lvl_paths)

    model = TIGERPrefix(cfg)
    seq_tokens = cfg.max_len * cfg.code_dim
    prof0 = jnp.zeros((1, cfg.num_prof_vectors, cfg.bert_dim), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.trainer.seed),
                        jnp.zeros((1, seq_tokens), jnp.int32),
                        jnp.ones((1, seq_tokens), jnp.int32),
                        jnp.ones((1, cfg.code_dim), jnp.int32),
                        prof0, prof0, prof0)
    loss_fn, val_fn = _loss_fns(model)

    tcfg = cfg.trainer
    steps = datasets.num_batches(len(train_data["input_ids"]), tcfg.batch_size)
    _mesh, _bs, _rs = dp_shardings(cfg.mesh)
    trainer = Trainer(tcfg, init_params=params, loss_fn=loss_fn,
                      eval_loss_fn=val_fn, steps_per_epoch=steps,
                      logger_name="tiger_prefix",
                      batch_sharding=_bs, replicate_sharding=_rs)
    result = trainer.fit(
        lambda epoch: datasets.iterate_batches(train_data, tcfg.batch_size,
                                               shuffle=True, seed=tcfg.seed + epoch),
        lambda epoch: datasets.iterate_batches(test_data, tcfg.eval_batch_size,
                                               shuffle=False),
    )
    return TIGERPrefixArtifacts(params=result.best_params, result=result)


def evaluate(cfg: TIGERPrefixConfig, artifacts: TIGERPrefixArtifacts,
             test_data: Optional[Dict[str, np.ndarray]] = None,
             codes: Optional[np.ndarray] = None) -> Dict[str, float]:
    if test_data is None:
        arrays = datasets.build_tiger_arrays(
            read_tiger_split(cfg.test_dataset_path), cfg.max_len, cfg.code_dim,
            max_target_items=1)
        test_data = attach_prof(arrays, cfg.prof_lvl_paths)
    if codes is None and cfg.constrained_decoding == "trie":
        codes = read_codes(cfg.code_path)

    model = TIGERPrefix(cfg)
    constraint = make_constraint(cfg, codes)
    actual_beams = max(max(cfg.topk_list), cfg.beam_size)
    gen = jax.jit(functools.partial(tp_mod.generate, model,
                                    num_beams=actual_beams,
                                    constraint=constraint))

    def generate_fn(batch, num_beams):
        toks, _ = gen(artifacts.params, jnp.asarray(batch["input_ids"]),
                      jnp.asarray(batch["attention_mask"]),
                      jnp.asarray(batch["prof_lvl1"]),
                      jnp.asarray(batch["prof_lvl2"]),
                      jnp.asarray(batch["prof_lvl3"]))
        return toks

    metrics = beam_evaluate(
        generate_fn,
        datasets.iterate_batches(test_data, cfg.trainer.eval_batch_size,
                                 shuffle=False),
        cfg.topk_list, cfg.beam_size,
    )
    if cfg.trainer.results_csv_path:
        a = cfg.arch
        row = {"task_id": cfg.task_id, "d_model": a.d_model,
               "num_decoder_layers": a.num_decoder_layers,
               "num_heads": a.num_heads, "lr": cfg.trainer.lr,
               "batch_size": cfg.trainer.batch_size,
               "beam_size": cfg.beam_size,
               "constrained": cfg.constrained_decoding, **metrics}
        append_results_csv(cfg.trainer.results_csv_path, row)
    return metrics


def main(cfg: TIGERPrefixConfig = TIGERPrefixConfig()):
    artifacts = train(cfg)
    return evaluate(cfg, artifacts)
