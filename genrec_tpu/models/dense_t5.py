"""DenseT5: dense-retrieval T5 encoder over precomputed embedding sequences.

Equivalent of `T5/model.py:6-69`: input_proj 768→d_model, T5 encoder on
``inputs_embeds``, masked mean-pool, output_proj d_model→768, symmetric
in-batch InfoNCE (τ=0.07) against the target item embedding; ``generate``
returns the L2-normalized query vector; retrieval is cosine top-k against
the normalized item-embedding matrix (`T5/train.py:69-97`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genrec_tpu.configs import DenseT5Config
from genrec_tpu.models.t5 import T5Encoder

_EPS = 1e-8


def _l2norm(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), _EPS)


class DenseT5(nn.Module):
    cfg: DenseT5Config

    def setup(self):
        c = self.cfg
        self.encoder = T5Encoder(c.arch)
        self.input_proj = nn.Dense(c.arch.d_model)
        self.output_proj = nn.Dense(c.target_emb_dim)

    def __call__(self, seq_embs, attention_mask=None, target_emb=None, *,
                 deterministic: bool = True) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        """(loss | None, normalized pred embedding (B, 768))."""
        x = self.input_proj(seq_embs)
        hidden = self.encoder(inputs_embeds=x, attention_mask=attention_mask,
                              deterministic=deterministic)
        if attention_mask is not None:
            m = attention_mask[..., None].astype(jnp.float32)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1e-9)
        else:
            pooled = jnp.mean(hidden, axis=1)
        pred = self.output_proj(pooled)
        loss = None
        if target_emb is not None:
            loss = contrastive_loss(pred, target_emb, self.cfg.temperature)
        return loss, _l2norm(pred)

    def generate(self, seq_embs, attention_mask=None):
        _, pred = self(seq_embs, attention_mask, None, deterministic=True)
        return pred


def contrastive_loss(pred_emb, target_emb, temperature: float,
                     valid=None) -> jnp.ndarray:
    """Symmetric in-batch InfoNCE (`T5/model.py:33-44`). ``valid`` masks out
    padded rows of the fixed-shape batch on both sides."""
    pred = _l2norm(pred_emb)
    target = _l2norm(target_emb)
    logits = jnp.dot(pred, target.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    n = logits.shape[0]
    labels = jnp.arange(n)
    if valid is not None:
        v = valid.astype(bool)
        neg = (~v)[None, :] * -1e9
        logits = logits + neg  # padded columns can never be positives/negatives
        logp_i2t = jax.nn.log_softmax(logits, axis=1)
        logp_t2i = jax.nn.log_softmax(logits.T + (~v)[None, :] * -1e9, axis=1)
        li = -jnp.take_along_axis(logp_i2t, labels[:, None], 1)[:, 0]
        lt = -jnp.take_along_axis(logp_t2i, labels[:, None], 1)[:, 0]
        w = v.astype(jnp.float32)
        return (jnp.sum(li * w) + jnp.sum(lt * w)) / (2.0 * jnp.maximum(jnp.sum(w), 1))
    loss_i2t = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=1), labels[:, None], 1))
    loss_t2i = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits.T, axis=1), labels[:, None], 1))
    return (loss_i2t + loss_t2i) / 2.0
