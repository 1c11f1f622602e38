"""SASRec: self-attentive sequential ranker (Flax).

Semantics match `SASRec/model.py:5-108`:
- item embedding (padding row 0) + learned positional embedding,
- N pre-norm blocks: LayerNorm → causal multi-head self-attention →
  residual; LayerNorm → ReLU FFN (d → mlp → d, dropout) → residual,
- final LayerNorm; ``predict`` scores every item via hₜ·Mᵀ (weight tying).
- No key_padding_mask, matching the reference design choice documented at
  `check_data_alignment.py:204-212` (padding positions attend causally).

Note: the reference defines standalone W_Q/W_K/W_V Linears but never feeds
their outputs into `nn.MultiheadAttention` (which applies its own internal
projections — `SASRec/model.py:62-80`); the effective computation is MHA on
the layer-normed input, which is what this module implements.

Loss functions reproduce `SASRec/train.py:140-168` (full-vocab scoring, BCE
on positive + shared sampled negatives, padding-masked, per-valid-timestep
normalized) and `SASRec/train.py:59-81` (1-negative validation loss).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genrec_tpu.configs import SASRecConfig
from genrec_tpu.models.layers import PaddedEmbed
from genrec_tpu.ops.attention import multi_head_attention
from genrec_tpu.ops.negative_sampling import sample_negatives


class SASRecBlock(nn.Module):
    d: int
    num_heads: int
    mlp_layer: int
    dropout: float
    layernorm_eps: float
    # optional attention override: (q, k, v, *, num_heads, causal) → out.
    # Lets SASRecLarge swap in ring attention for context-parallel training
    # without duplicating the block (ops/ring_attention.py).
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=self.layernorm_eps)(x)
        q = nn.Dense(self.d)(h)
        k = nn.Dense(self.d)(h)
        v = nn.Dense(self.d)(h)
        # attention-WEIGHT dropout reproduces the reference's
        # `nn.MultiheadAttention(self.d, num_heads, dropout)` semantics
        # (`SASRec/model.py:31-32`) — same fix as the TIGER-prefix adapters.
        drop = not deterministic and self.dropout > 0.0
        attn = (self.attn_fn or multi_head_attention)(
            q, k, v, num_heads=self.num_heads, causal=True,
            dropout_rate=self.dropout if drop else 0.0,
            dropout_rng=self.make_rng("dropout") if drop else None)
        attn = nn.Dense(self.d)(attn)  # output projection (torch MHA out_proj)
        x = x + attn

        h = nn.LayerNorm(epsilon=self.layernorm_eps)(x)
        h = nn.Dense(self.mlp_layer)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class SASRec(nn.Module):
    item_num: int
    cfg: SASRecConfig

    def setup(self):
        c = self.cfg
        self.item_emb = PaddedEmbed(self.item_num + 1, c.d,
                                    init_stddev=c.emb_init_stddev)
        pos_init = (nn.initializers.normal(stddev=c.emb_init_stddev)
                    if c.emb_init_stddev is not None else nn.linear.default_embed_init)
        self.pos_emb = nn.Embed(c.max_len, c.d, embedding_init=pos_init)
        self.blocks = [
            SASRecBlock(c.d, c.num_heads, c.mlp_layer, c.dropout, c.layernorm_eps)
            for _ in range(c.num_blocks)
        ]
        self.last_norm = nn.LayerNorm(epsilon=self.cfg.layernorm_eps)

    def __call__(self, log_seqs, *, deterministic: bool = True):
        """(B, n) item ids → (B, n, d) sequence features."""
        x = self.item_emb(log_seqs)
        positions = jnp.arange(log_seqs.shape[1])[None, :]
        x = x + self.pos_emb(positions)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.last_norm(x)

    def predict(self, log_seqs, *, deterministic: bool = True):
        """Last-step features against all item embeddings: (B, I+1) logits."""
        feats = self(log_seqs, deterministic=deterministic)
        h_t = feats[:, -1, :]
        table = self.item_emb.variables["params"]["embedding"]
        return jnp.dot(h_t, table.T, preferred_element_type=jnp.float32)

    def score_all(self, log_seqs, *, deterministic: bool = True):
        """All-timestep full-vocab score matrix (B, n, I+1)
        (`SASRec/train.py:131-137`)."""
        feats = self(log_seqs, deterministic=deterministic)
        table = self.item_emb.variables["params"]["embedding"]
        return jnp.einsum("bnd,vd->bnv", feats, table,
                          preferred_element_type=jnp.float32)


def _bce(scores, positive: bool, eps: float):
    """Reference BCE term `-log(sigmoid(s) + eps)` / `-log(1 - sigmoid(s) + eps)`
    (`SASRec/train.py:150-160`) in logit space: softplus(∓s) capped at
    -log(eps). The literal form is jit-unsafe — XLA's fusion rewrites
    `1 - sigmoid(s) + eps` such that at s ≳ 17 (where sigmoid(s) rounds to
    exactly 1.0 in f32) the log yields -inf; softplus is exact within f32
    rounding wherever the cap doesn't bind."""
    x = -scores if positive else scores
    return jnp.minimum(jax.nn.softplus(x), -jnp.log(jnp.asarray(eps)))


def train_loss(model: SASRec, params, inputs, targets, rng,
               cfg: SASRecConfig, item_num: int,
               batch_valid=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-sequence teacher-forcing BCE loss (`SASRec/train.py:140-168`).

    Returns (normalized loss, valid-timestep count). Negatives are sampled
    on device (num_neg shared across the sequence positions of a sample).
    """
    drop_rng, neg_rng = jax.random.split(rng)
    scores = model.apply(params, inputs, deterministic=False,
                         method=SASRec.score_all, rngs={"dropout": drop_rng})
    neg = sample_negatives(neg_rng, inputs, item_num, cfg.num_neg_samples)

    mask = (targets != 0).astype(jnp.float32)
    if batch_valid is not None:
        mask = mask * batch_valid[:, None].astype(jnp.float32)
    pos_scores = jnp.take_along_axis(scores, targets[..., None].astype(jnp.int32),
                                     axis=2)[..., 0]
    seq_len = scores.shape[1]
    neg_exp = jnp.broadcast_to(neg[:, None, :], (neg.shape[0], seq_len, neg.shape[1]))
    neg_scores = jnp.take_along_axis(scores, neg_exp.astype(jnp.int32), axis=2)

    pos_loss = _bce(pos_scores, True, cfg.loss_eps) * mask
    neg_loss = jnp.sum(_bce(neg_scores, False, cfg.loss_eps), axis=-1) * mask
    batch_loss = jnp.sum(pos_loss + neg_loss)
    valid = jnp.sum(mask)
    return batch_loss / jnp.maximum(valid, 1.0), valid


def eval_loss(model: SASRec, params, inputs, targets, rng,
              cfg: SASRecConfig, item_num: int,
              batch_valid=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Validation loss: last-position BCE with one sampled negative
    (`SASRec/train.py:59-81`). Returns (sum loss, valid count)."""
    feats = model.apply(params, inputs, deterministic=True)
    h = feats[:, -1, :]
    table = params["params"]["item_emb"]["embedding"]
    pos_emb = jnp.take(table, targets, axis=0)
    neg = sample_negatives(rng, inputs, item_num, 1)[:, 0]
    neg_emb = jnp.take(table, neg, axis=0)
    pos_score = jnp.sum(h * pos_emb, axis=-1)
    neg_score = jnp.sum(h * neg_emb, axis=-1)
    per = _bce(pos_score, True, cfg.loss_eps) + _bce(neg_score, False, cfg.loss_eps)
    valid_mask = (targets != 0)
    if batch_valid is not None:
        valid_mask = valid_mask & batch_valid
    per = per * valid_mask.astype(jnp.float32)
    return jnp.sum(per), jnp.sum(valid_mask.astype(jnp.float32))
