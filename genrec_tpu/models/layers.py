"""Shared Flax building blocks (MLP stacks, padded embeddings)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

xavier_init = nn.initializers.xavier_normal()


class MLPStack(nn.Module):
    """Dropout→Linear(→activation) stack, equivalent of
    `RQ-VAE/models/layers.py:7-43` (xavier-normal init, zero bias, no
    activation after the final layer)."""

    dims: Sequence[int]
    dropout: float = 0.0
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.dims)
        for i, dim in enumerate(self.dims):
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.Dense(dim, kernel_init=xavier_init,
                         bias_init=nn.initializers.zeros)(x)
            if i != n - 1 and self.activation is not None:
                x = self.activation(x)
        return x


class PaddedEmbed(nn.Module):
    """Embedding table whose row 0 acts as `padding_idx=0` (torch semantics:
    zero vector, zero gradient), as used at `SASRec/model.py:18`."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32
    init_stddev: float | None = None  # None → 1/√features; 1.0 = torch nn.Embedding

    @nn.compact
    def __call__(self, ids):
        std = (1.0 / self.features ** 0.5 if self.init_stddev is None
               else self.init_stddev)
        table = self.param(
            "embedding", nn.initializers.normal(stddev=std),
            (self.num_embeddings, self.features))
        out = jnp.take(table, ids, axis=0).astype(self.dtype)
        return out * (ids != 0)[..., None].astype(self.dtype)

    def table(self):
        return self.variables["params"]["embedding"]
