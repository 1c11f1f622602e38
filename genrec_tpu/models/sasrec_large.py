"""SASRec at catalog scale: row-sharded item table + sampled-negative loss.

North-star config 5 (BASELINE.json): item/codebook tables up to 10M rows,
row-sharded over the mesh 'model' axis with collective lookups. The
reference keeps a full ``nn.Embedding`` per device (`SASRec/model.py:18`) —
at 10M×64 that is 2.5 GB of fp32 *per device* before activations, and its
full-vocab score matrix (`SASRec/train.py:131-137`) would be a
(B, n, 10M) tensor. Neither survives at scale, so this model departs from
the parity SASRec (`genrec_tpu/models/sasrec.py`) in exactly two ways:

1. the item table is a single (V+1, D) param sharded ``P('model', None)``;
   every embedding read goes through
   :func:`genrec_tpu.ops.embedding.sharded_embedding_lookup`
   (masked local gather + psum over ICI; autodiff gives the deterministic
   scatter-add on each shard),
2. training scores only the positive row and ``num_neg_samples`` sampled
   negative rows per position (sampled BCE). This is the same estimator the
   reference optimizes — its loss (`SASRec/train.py:140-168`) reads only
   the positive and negative columns out of the full score matrix it
   materializes; here those rows are gathered directly so the (B, n, V)
   intermediate never exists.

Eval keeps exact full-vocab ranking: per-shard logits + hierarchical top-k
(:func:`sharded_topk_scores`), so HBO is O(V/M · D) per device and the
cross-device traffic is just (B, M·k) score/index pairs.

The tower (positional embedding, pre-norm causal blocks, final LayerNorm)
reuses :class:`genrec_tpu.models.sasrec.SASRecBlock` unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from genrec_tpu.configs import SASRecLargeConfig
from genrec_tpu.models.sasrec import SASRecBlock, _bce
from genrec_tpu.ops.embedding import (alltoall_embedding_lookup,
                                      sharded_embedding_lookup)
from genrec_tpu.ops.negative_sampling import sample_negatives


def sharded_topk_scores(table: jnp.ndarray, h: jnp.ndarray, k: int,
                        mesh: Mesh, *, axis_name: str = "model",
                        data_axis: str = "data"):
    """Exact top-k of ``h @ table.T`` without materializing (B, V) logits.

    Each 'model' shard scores its rows, takes a local top-k, and the
    (B, M·k) candidates are merged with one ``all_gather`` + final top-k.
    Returns ``(values, indices)`` of shape (B, k) with global row indices.
    """

    def body(table_shard, h_loc):
        rows = table_shard.shape[0]
        logits = jnp.dot(h_loc, table_shard.T,
                         preferred_element_type=jnp.float32)
        kk = min(k, rows)
        v, i = jax.lax.top_k(logits, kk)
        i = i + jax.lax.axis_index(axis_name) * rows
        v_all = jax.lax.all_gather(v, axis_name, axis=1)  # (b, M, kk)
        i_all = jax.lax.all_gather(i, axis_name, axis=1)
        v_all = v_all.reshape(h_loc.shape[0], -1)
        i_all = i_all.reshape(h_loc.shape[0], -1)
        vv, jj = jax.lax.top_k(v_all, k)
        return vv, jnp.take_along_axis(i_all, jj, axis=1)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis_name, None), P(data_axis, None)),
                   out_specs=(P(data_axis, None), P(data_axis, None)),
                   check_vma=False)
    return fn(table, h)


class SASRecLarge(nn.Module):
    """SASRec tower over a row-sharded item table.

    ``mesh`` is static module state (the sharded-lookup shard_map closes
    over it); set ``use_sharded=False`` to run the identical parameterization
    through a plain ``jnp.take`` — the replicated reference used by the
    grads-equality test and by single-device serving.

    ``lookup_impl`` selects the collective for sharded reads:
    - ``"psum"``: masked local gather + psum; per-device ICI traffic
      ≈ 2·(M−1)/M·B·D floats.
    - ``"alltoall"``: ID-partition exchange
      (:func:`genrec_tpu.ops.embedding.alltoall_embedding_lookup`);
      traffic ≈ (M−1)/M·c·B·(D+1) floats per device (c = capacity
      factor). Differentiable — the shard_map transpose routes row
      cotangents back through the reverse all_to_all (grad-equality
      tested vs psum), so it trains too; ids overflowing a c·B/M bucket
      read zero rows AND receive zero grads, so size c for the id
      distribution (or keep psum under heavy skew).
    - ``"auto"`` (default): the measured byte-crossover rule
      (`ShardedEmbeddingConfig.preferred_lookup`): a2a iff
      c < 2·D/(D+1), else psum.
    """

    item_num: int
    cfg: SASRecLargeConfig
    mesh: Mesh
    use_sharded: bool = True
    lookup_impl: str = "auto"  # "auto" | "psum" | "alltoall"
    alltoall_capacity: float = 2.0

    def _resolved_lookup(self) -> str:
        if self.lookup_impl != "auto":
            return self.lookup_impl
        return self.cfg.embedding.preferred_lookup(self.alltoall_capacity)
    # context parallelism: name of the mesh axis the SEQUENCE dimension is
    # sharded over. When set, every block's attention runs as an exact
    # ppermute ring (ops/ring_attention.py) — L/M tokens of K/V per device
    # per hop — so histories longer than one chip's HBM train across the
    # mesh. ``ctx_batch_axis`` names the DP axis the batch stays sharded on.
    ctx_axis: Optional[str] = None
    ctx_batch_axis: Optional[str] = "data"

    def setup(self):
        c = self.cfg
        V = self.item_num + 1
        model_dim = dict(self.mesh.shape).get("model", 1)
        assert V % model_dim == 0, (
            f"padded vocab {V} must divide the model axis "
            f"{model_dim}; round item_num up")
        # cfg.embedding.dtype="bfloat16" halves table HBM — doubly
        # effective on TPU because XLA lane-pads (V, 64) f32 tables 2×
        # (64 < the 128-lane tile), so a 10M×64 f32 table costs 4.77 GB
        # padded per buffer; bf16 brings params+grad+optimizer temps of
        # the single-chip 10M config back under one v5e's HBM
        # (scripts/r5_sasrec_large_10m.py). Scores/losses still
        # accumulate in f32 (preferred_element_type below).
        self.item_table = self.param(
            "item_table",
            nn.initializers.normal(stddev=1.0 / c.embedding.dim ** 0.5),
            (V, c.embedding.dim), jnp.dtype(c.embedding.dtype))
        self.pos_emb = nn.Embed(c.max_len, c.embedding.dim)
        attn_fn = None
        if self.ctx_axis is not None:
            from genrec_tpu.ops.ring_attention import ring_multi_head_attention
            mesh, axis, baxis = self.mesh, self.ctx_axis, self.ctx_batch_axis

            def attn_fn(q, k, v, *, num_heads, causal=True,
                        dropout_rate=0.0, dropout_rng=None):
                # ring attention has no attention-weight dropout path;
                # accept (and ignore) the kwargs so the shared SASRecBlock
                # can pass them uniformly.
                del dropout_rate, dropout_rng
                return ring_multi_head_attention(
                    q, k, v, mesh, num_heads=num_heads, axis_name=axis,
                    causal=causal, batch_axis=baxis)
        self.blocks = [
            SASRecBlock(c.embedding.dim, c.num_heads, c.mlp_layer,
                        c.dropout, c.layernorm_eps, attn_fn=attn_fn)
            for _ in range(c.num_blocks)
        ]
        self.last_norm = nn.LayerNorm(epsilon=c.layernorm_eps)

    def embed(self, ids):
        """Pad-masked row gather (torch padding_idx=0 semantics,
        `SASRec/model.py:18`) through the sharded or replicated path."""
        if self.use_sharded and self._resolved_lookup() == "alltoall":
            e, _ok = alltoall_embedding_lookup(
                self.item_table, ids, self.mesh,
                capacity_factor=self.alltoall_capacity)
        elif self.use_sharded:
            e = sharded_embedding_lookup(self.item_table, ids, self.mesh)
        else:
            e = jnp.take(self.item_table, ids, axis=0)
        return e * (ids != 0)[..., None].astype(e.dtype)

    def __call__(self, log_seqs, *, deterministic: bool = True):
        x = self.embed(log_seqs)
        positions = jnp.arange(log_seqs.shape[1])[None, :]
        x = x + self.pos_emb(positions)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.last_norm(x)

    def sampled_scores(self, inputs, targets, neg_ids, *,
                       deterministic: bool = True):
        """(pos_scores (B,n), neg_scores (B,n,K)) — only 1+K rows of the
        table are read per position, never the (B,n,V) matrix."""
        feats = self(inputs, deterministic=deterministic)
        pos_emb = self.embed(targets)                    # (B, n, D)
        neg_emb = self.embed(neg_ids)                    # (B, K, D)
        pos_scores = jnp.sum(feats * pos_emb, axis=-1)
        neg_scores = jnp.einsum("bnd,bkd->bnk", feats, neg_emb,
                                preferred_element_type=jnp.float32)
        return pos_scores, neg_scores

    def predict_topk(self, log_seqs, k: int, *, deterministic: bool = True):
        """Exact top-k items for the last position, via per-shard scoring."""
        feats = self(log_seqs, deterministic=deterministic)
        h_t = feats[:, -1, :]
        if self.use_sharded:
            return sharded_topk_scores(self.item_table, h_t, k, self.mesh)
        logits = jnp.dot(h_t, self.item_table.T,
                         preferred_element_type=jnp.float32)
        return jax.lax.top_k(logits, k)


def train_loss_sampled(model: SASRecLarge, params, inputs, targets, rng,
                       cfg: SASRecLargeConfig,
                       item_num: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sampled-BCE training loss — same masking/normalization as the parity
    loss (`SASRec/train.py:140-168`), positives + K shared negatives only.

    Returns (normalized loss, valid-timestep count).
    """
    # both lookup impls are differentiable (alltoall's shard_map transpose
    # is exact — ops/embedding.py docstring + the grad-equality test);
    # under heavy id skew prefer psum, whose lookups never drop rows.
    drop_rng, neg_rng = jax.random.split(rng)
    # exclude the full rated set — history AND the shifted targets (the last
    # positive is absent from `inputs`), matching the reference's
    # setdiff1d-vs-rated semantics (`SASRec/train.py:15-30`)
    rated = jnp.concatenate([inputs, targets], axis=1)
    neg = sample_negatives(neg_rng, rated, item_num, cfg.num_neg_samples)
    pos_scores, neg_scores = model.apply(
        params, inputs, targets, neg, deterministic=False,
        method=SASRecLarge.sampled_scores, rngs={"dropout": drop_rng})
    mask = (targets != 0).astype(jnp.float32)
    eps = cfg.loss_eps
    pos_loss = _bce(pos_scores, True, eps) * mask
    neg_loss = jnp.sum(_bce(neg_scores, False, eps), axis=-1) * mask
    valid = jnp.sum(mask)
    return jnp.sum(pos_loss + neg_loss) / jnp.maximum(valid, 1.0), valid


def make_train_step(model: SASRecLarge, tx, cfg: SASRecLargeConfig,
                    item_num: int, jit: bool = True):
    """(params, opt_state, inputs, targets, rng) → (params, opt_state,
    loss) with the table grads flowing through the sharded lookup; jit'd
    unless ``jit=False`` (callers that lower/compile it themselves, e.g.
    the collective-bytes accounting of scripts/r5_dryrun_comms.py)."""

    def step(params, opt_state, inputs, targets, rng):
        def loss_fn(p):
            loss, _ = train_loss_sampled(model, p, inputs, targets, rng,
                                         cfg, item_num)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step) if jit else step
