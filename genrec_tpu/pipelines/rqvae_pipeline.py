"""RQ-VAE pipeline: train → semantic-ID assignment → codes.npy.

Equivalent of `python RQ-VAE/main.py`:
- training (`RQ-VAE/train.py:15-288`): AdamW + linear warmup, grad-clip 1.0,
  NaN check, collision-rate validation every ``eval_step`` epochs with
  dual best tracking (best loss / best collision),
- inference (`RQ-VAE/infer.py:44-184`): greedy code assignment, ≤30
  collision-repair iterations re-assigning colliding groups with Sinkhorn
  on the *last level only* (earlier sk_epsilons zeroed), then a 4th
  disambiguation digit per remaining duplicate; writes codes.npy +
  mapping.json byte-compatible with the reference contract.

TPU-first: k-means init and training/assignment run on device; only the
data-dependent collision bookkeeping stays in numpy (matching the
reference's own host-side structure).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import RQVAEConfig
from genrec_tpu.data import datasets
from genrec_tpu.data.contracts import read_item_embs, write_codes
from genrec_tpu.models.rqvae import RQVAE, collision_rate, kmeans_init_codebooks
from genrec_tpu.parallel.auto import dp_shardings
from genrec_tpu.train.trainer import Trainer, TrainLoopResult
from genrec_tpu.utils.misc import get_logger


@dataclasses.dataclass
class RQVAEArtifacts:
    params: Dict                 # best-collision params (assignment model)
    best_loss_params: Dict
    result: TrainLoopResult
    final_collision_rate: float


_INDICES_FN_CACHE: Dict = {}


def _indices_fn(model: RQVAE, use_sk: bool):
    """Jitted get_indices, cached by (config, use_sk) — a fresh jit per call
    would recompile every collision-repair iteration."""
    key = (model.cfg, use_sk)
    if key not in _INDICES_FN_CACHE:
        _INDICES_FN_CACHE[key] = jax.jit(
            lambda p, x: model.apply(p, x, use_sk=use_sk,
                                     method=RQVAE.get_indices))
    return _INDICES_FN_CACHE[key]


def _grouped_sk_indices_fn(model: RQVAE):
    """vmapped Sinkhorn get_indices over a (G, s, D) stack of same-size
    collision groups: the balanced transport runs WITHIN each group, which
    is what actually forces tied items apart (the reference re-assigns one
    group per call, `RQ-VAE/infer.py:120-124`; a single global batch lets
    Sinkhorn satisfy its column constraint with other groups' items and
    barely splits anything). Cached per (config, group size) — one compile
    per distinct size."""
    key = (model.cfg, "grouped_sk")
    if key not in _INDICES_FN_CACHE:
        _INDICES_FN_CACHE[key] = jax.jit(jax.vmap(
            lambda p, x: model.apply(p, x, use_sk=True,
                                     method=RQVAE.get_indices),
            in_axes=(None, 0)))
    return _INDICES_FN_CACHE[key]


def _batched_indices(model: RQVAE, params, embs: np.ndarray, batch: int = 1024,
                     use_sk: bool = False) -> np.ndarray:
    fn = _indices_fn(model, use_sk)
    out = []
    n = len(embs)
    pad_to = -(-n // batch) * batch
    padded = np.zeros((pad_to, embs.shape[1]), embs.dtype)
    padded[:n] = embs
    for s in range(0, pad_to, batch):
        out.append(np.asarray(fn(params, jnp.asarray(padded[s:s + batch]))))
    return np.concatenate(out)[:n]


def train(cfg: RQVAEConfig,
          item_embs: Optional[np.ndarray] = None) -> RQVAEArtifacts:
    logger = get_logger("rqvae", cfg.trainer.log_path)
    if item_embs is None:
        item_embs, _ = read_item_embs(cfg.data_path)
    embs = np.asarray(item_embs, dtype=np.float32)

    model = RQVAE(cfg)
    key = jax.random.PRNGKey(cfg.trainer.seed)
    params = model.init(key, jnp.zeros((1, cfg.in_dim), jnp.float32))
    if cfg.kmeans_init:
        # on-device k-means over (up to) the full table — the reference
        # fits on the first training batch; using more data only helps.
        sample = embs[:min(len(embs), 8192)]
        params = kmeans_init_codebooks(params, model, jnp.asarray(sample), key)

    def loss_fn(p, batch, rng):
        x = batch["x"]
        # the scan-epoch path pads the final partial batch with duplicated
        # row 0 — mask those rows out of every loss term (the reference's
        # drop_last=False loader sees exact partial batches)
        row_mask = batch["valid"] if "valid" in batch else None
        out, rq_loss, _ = model.apply(p, x, use_sk=True, deterministic=False,
                                      row_mask=row_mask, rngs={"dropout": rng})
        total, recon = model.apply(p, out, rq_loss, x, row_mask,
                                   method=RQVAE.compute_loss)
        valid = batch["valid"].astype(jnp.float32).sum() if "valid" in batch \
            else jnp.asarray(float(x.shape[0]))
        return total, {"sum_loss": total * valid, "valid": valid,
                       "recon": recon}

    tcfg = cfg.trainer
    arrays = {"x": embs}
    steps = datasets.num_batches(len(embs), tcfg.batch_size)
    _mesh, _bs, _rs = dp_shardings(cfg.mesh)
    trainer = Trainer(tcfg, init_params=params, loss_fn=loss_fn,
                      steps_per_epoch=steps, logger_name="rqvae",
                      batch_sharding=_bs, replicate_sharding=_rs,
                      train_data=arrays)

    best_collision = {"rate": float("inf"), "params": params}

    def on_epoch_end(epoch, tr: Trainer):
        if epoch % max(cfg.trainer.epochs // 10, 1) != 0 and epoch != cfg.trainer.epochs:
            return
        idx = _batched_indices(model, tr.params, embs)
        rate = collision_rate(idx)
        logger.info(f"Epoch {epoch} | collision rate {rate:.4f}")
        if rate < best_collision["rate"]:
            best_collision["rate"] = rate
            best_collision["params"] = tr.snapshot_params()
            tr.store.save_best({"params": best_collision["params"]},
                               tag="best_collision")

    result = trainer.fit(epoch_end_callback=on_epoch_end)
    if not np.isfinite(best_collision["rate"]):
        idx = _batched_indices(model, result.best_params, embs)
        best_collision = {"rate": collision_rate(idx),
                          "params": result.best_params}
    return RQVAEArtifacts(params=best_collision["params"],
                          best_loss_params=result.best_params,
                          result=result,
                          final_collision_rate=best_collision["rate"])


def infer(cfg: RQVAEConfig, artifacts: RQVAEArtifacts,
          item_embs: Optional[np.ndarray] = None,
          write: bool = True) -> np.ndarray:
    """Greedy assignment + collision repair + 4th-digit dedup
    (`RQ-VAE/infer.py:44-184`). Returns the (N, L+1) code table."""
    logger = get_logger("rqvae")
    if item_embs is None:
        item_embs, _ = read_item_embs(cfg.data_path)
    embs = np.asarray(item_embs, dtype=np.float32)
    model = RQVAE(cfg)
    params = artifacts.params

    codes = _batched_indices(model, params, embs, use_sk=False)  # (N, L)

    # collision repair: Sinkhorn on the last level only (infer.py:108-130)
    repair_cfg = dataclasses.replace(
        cfg, sk_epsilons=tuple([0.0] * (len(cfg.sk_epsilons) - 1)
                               + [cfg.sk_epsilons[-1]]))
    repair_model = RQVAE(repair_cfg)

    def collision_groups(c):
        _, inv, counts = np.unique(c, axis=0, return_inverse=True,
                                   return_counts=True)
        return [np.where(inv == g)[0] for g in np.where(counts > 1)[0]]

    grouped_fn = _grouped_sk_indices_fn(repair_model)
    for it in range(cfg.collision_repair_iters):
        groups = collision_groups(codes)
        if not groups:
            break
        logger.info(f"Collision-repair iter {it}: {len(groups)} groups")
        # per-group Sinkhorn (reference semantics), bucketed by group size
        # and vmapped so each distinct size is ONE device call
        by_size: Dict[int, list] = {}
        for g in groups:
            by_size.setdefault(len(g), []).append(g)
        for size, gs in sorted(by_size.items()):
            idx = np.stack(gs)                                   # (G, s)
            new = np.asarray(grouped_fn(params, jnp.asarray(embs[idx])))
            codes[idx.reshape(-1)] = new.reshape(-1, new.shape[-1])

    # 4th-digit dedup (infer.py:150-171)
    full = np.concatenate([codes.astype(np.int64),
                           np.zeros((len(codes), 1), np.int64)], axis=1)
    uniq, counts = np.unique(full, axis=0, return_counts=True)
    for dup in uniq[counts > 1]:
        idx = np.where((full == dup).all(axis=1))[0]
        for i, j in enumerate(idx):
            full[j, -1] = i

    rate = collision_rate(codes)
    logger.info(f"Final collision rate before dedup digit: {rate:.4f}")
    if write:
        write_codes(cfg.semantic_id_file, full)
    return full


def main(cfg: RQVAEConfig = RQVAEConfig()):
    artifacts = train(cfg)
    return infer(cfg, artifacts)
