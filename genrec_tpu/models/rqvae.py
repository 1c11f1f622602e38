"""RQ-VAE: MLP autoencoder + residual vector quantizer (Flax).

Semantics match `RQ-VAE/models/{rqvae,rq,vq}.py`:
- encoder [in_dim, *layers, e_dim] / mirrored decoder (xavier MLPs, relu,
  dropout before every Linear),
- chain of VQ levels over successive residuals; per level: L2
  nearest-code assignment, optionally Sinkhorn-balanced
  (center-scaled distances → Sinkhorn → argmax), straight-through
  estimator, loss = codebook + β·commitment; rq_loss = mean over levels,
- total loss = recon (mse/l1) + quant_loss_weight·rq_loss.

TPU-first deviations (documented, behavior-preserving):
- k-means codebook init runs as an explicit on-device pre-pass
  (:func:`kmeans_init_codebooks`) instead of the reference's first-batch
  sklearn CPU round-trip (`RQ-VAE/models/layers.py:69-82`) — same
  level-by-level residual semantics, no host sync.
- Sinkhorn runs fixed-iteration float32 `lax.fori_loop` (the reference uses
  float64 on GPU; f32 with clamped denominators is stable at these scales).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genrec_tpu.configs import RQVAEConfig
from genrec_tpu.models.layers import MLPStack
from genrec_tpu.ops.sinkhorn import center_distance, kmeans, sinkhorn


def _sq_distances(latent: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """(B, D) × (K, D) → (B, K) squared L2 (`RQ-VAE/models/vq.py:71-73`)."""
    return (jnp.sum(latent ** 2, axis=1, keepdims=True)
            + jnp.sum(codebook ** 2, axis=1)[None, :]
            - 2.0 * jnp.dot(latent, codebook.T, preferred_element_type=jnp.float32))


def _masked_mean(per_row: jnp.ndarray, row_mask) -> jnp.ndarray:
    """Mean of (B,) per-row losses; ``row_mask=None`` is a plain mean."""
    if row_mask is None:
        return jnp.mean(per_row)
    w = row_mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


class RQVAE(nn.Module):
    cfg: RQVAEConfig

    def setup(self):
        c = self.cfg
        self.encoder = MLPStack(tuple(c.layers) + (c.e_dim,), dropout=c.dropout)
        self.decoder = MLPStack(tuple(reversed(c.layers)) + (c.in_dim,),
                                dropout=c.dropout)
        self.codebooks = [
            self.param(f"codebook_{i}", nn.initializers.uniform(scale=2.0 / n_e),
                       (n_e, c.e_dim))
            for i, n_e in enumerate(c.num_emb_list)
        ]
        # uniform(-1/n_e, 1/n_e) init like vq.py:23 (flax uniform is [0, scale);
        # we shift below at first use — handled in _codebook()).

    def _codebook(self, i):
        n_e = self.cfg.num_emb_list[i]
        return self.codebooks[i] - 1.0 / n_e  # shift to (-1/n_e, 1/n_e)

    def _quantize_level(self, residual, level, use_sk: bool, row_mask):
        cb = self._codebook(level)
        d = _sq_distances(residual, cb)
        eps = self.cfg.sk_epsilons[level]
        if use_sk and eps > 0:
            q = sinkhorn(center_distance(d), eps, self.cfg.sk_iters)
            indices = jnp.argmax(q, axis=-1)
        else:
            indices = jnp.argmin(d, axis=-1)
        x_q = jnp.take(cb, indices, axis=0)
        codebook_sq = jnp.mean((x_q - jax.lax.stop_gradient(residual)) ** 2,
                               axis=-1)
        commit_sq = jnp.mean((jax.lax.stop_gradient(x_q) - residual) ** 2,
                             axis=-1)
        loss = _masked_mean(codebook_sq + self.cfg.beta * commit_sq, row_mask)
        # straight-through estimator (vq.py:95)
        x_q = residual + jax.lax.stop_gradient(x_q - residual)
        return x_q, loss, indices

    def rq(self, z, use_sk: bool = True, row_mask=None):
        """Residual quantization chain (`RQ-VAE/models/rq.py:43-55`)."""
        x_q = jnp.zeros_like(z)
        residual = z
        losses, indices = [], []
        for level in range(len(self.cfg.num_emb_list)):
            x_res, loss, idx = self._quantize_level(residual, level, use_sk,
                                                    row_mask)
            residual = residual - x_res
            x_q = x_q + x_res
            losses.append(loss)
            indices.append(idx)
        return x_q, jnp.mean(jnp.stack(losses)), jnp.stack(indices, axis=-1)

    def __call__(self, x, *, use_sk: bool = True, deterministic: bool = True,
                 row_mask=None):
        z = self.encoder(x, deterministic=deterministic)
        x_q, rq_loss, indices = self.rq(z, use_sk=use_sk, row_mask=row_mask)
        out = self.decoder(x_q, deterministic=deterministic)
        return out, rq_loss, indices

    def get_indices(self, x, *, use_sk: bool = False):
        """Greedy (or Sinkhorn) code assignment (`RQ-VAE/models/rqvae.py:67-71`)."""
        z = self.encoder(x, deterministic=True)
        _, _, indices = self.rq(z, use_sk=use_sk)
        return indices

    def encode(self, x):
        return self.encoder(x, deterministic=True)

    def compute_loss(self, out, rq_loss, x,
                     row_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """total = recon + quant_loss_weight·rq (`RQ-VAE/models/rqvae.py:73-83`).

        ``row_mask`` (B,) excludes device-resident pad rows (the scan-epoch
        path pads the final partial batch with duplicated row 0; an unmasked
        batch mean would let those rows pollute gradients every epoch).
        """
        if self.cfg.loss_type == "mse":
            recon = _masked_mean(jnp.mean((out - x) ** 2, axis=-1), row_mask)
        elif self.cfg.loss_type == "l1":
            recon = _masked_mean(jnp.mean(jnp.abs(out - x), axis=-1), row_mask)
        else:
            raise ValueError(self.cfg.loss_type)
        return recon + self.cfg.quant_loss_weight * rq_loss, recon


def kmeans_init_codebooks(params, model: RQVAE, data: jnp.ndarray,
                          key: jax.Array):
    """Level-by-level k-means init of all codebooks from a data batch.

    Mirrors the reference's first-training-batch init (`vq.py:40-49,66-68`):
    each level's centers are fit on the residual stream left by the previous
    (freshly initialized) levels. Runs entirely on device.
    """
    cfg = model.cfg
    z = model.apply(params, data, method=RQVAE.encode)
    residual = z
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    cbs = dict(new_params["params"])
    for level, n_e in enumerate(cfg.num_emb_list):
        key, sub = jax.random.split(key)
        centers = kmeans(sub, residual, n_e, cfg.kmeans_iters)
        # stored param = centers + 1/n_e so that _codebook() recovers centers
        cbs[f"codebook_{level}"] = centers + 1.0 / n_e
        d = _sq_distances(residual, centers)
        idx = jnp.argmin(d, axis=-1)
        residual = residual - jnp.take(centers, idx, axis=0)
    new_params = dict(new_params)
    new_params["params"] = cbs
    return new_params


def collision_rate(indices: jnp.ndarray) -> float:
    """Fraction of items sharing a full code string
    (`RQ-VAE/train.py:126-151` validation metric)."""
    import numpy as np
    arr = np.asarray(indices)
    n = len(arr)
    uniq = len(np.unique(arr, axis=0))
    return (n - uniq) / max(n, 1)
