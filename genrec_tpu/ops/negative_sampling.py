"""On-device vectorized negative sampling.

Replaces the reference's per-row CPU `np.setdiff1d` + `np.random.choice`
(`SASRec/train.py:15-30`), which forces a device→host→device round trip on
every training step. Here sampling happens inside the jit'd step:

1. draw uniform candidates in [1, item_num],
2. reject any candidate colliding with the user's history (or an earlier
   draw in the same row) and redraw, for a fixed number of rounds.

With num_items ≫ seq_len the collision probability per draw is ≤ L/I, so
``rounds`` redraw rounds leave at most (L/I)^rounds collision probability —
with the default 4 rounds and the reference scale (L=20, I≈700) that is
~7e-7 per sample, statistically indistinguishable from exact rejection
sampling while staying fully on the MXU/VPU with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _collides(cand, seq, prev):
    """cand: (B, N); seq: (B, L) history; prev: (B, N) earlier accepted draws
    (0 = none). True where cand appears in seq or duplicates prev."""
    hit_seq = jnp.any(cand[:, :, None] == seq[:, None, :], axis=-1)
    hit_prev = jnp.any(
        (cand[:, :, None] == prev[:, None, :]) &
        (jax.lax.broadcasted_iota(jnp.int32, (1, cand.shape[1], prev.shape[1]), 2)
         < jax.lax.broadcasted_iota(jnp.int32, (1, cand.shape[1], prev.shape[1]), 1)),
        axis=-1,
    )
    return hit_seq | hit_prev


def sample_negatives(key: jax.Array, seq: jax.Array, item_num: int,
                     num_neg: int, *, rounds: int = 4,
                     unique: bool = True) -> jax.Array:
    """Sample (B, num_neg) item ids in [1, item_num] avoiding ids in ``seq``.

    ``seq`` is (B, L) with 0 = padding (0 is never sampled). When ``unique``
    is set, draws within a row are also de-duplicated (matching
    ``np.random.choice(..., replace=False)`` in the reference up to the
    residual collision probability documented above).
    """
    b = seq.shape[0]
    keys = jax.random.split(key, rounds)
    cand = jax.random.randint(keys[0], (b, num_neg), 1, item_num + 1)
    for r in range(1, rounds):
        prev = cand if unique else jnp.zeros_like(cand)
        bad = _collides(cand, seq, prev)
        redraw = jax.random.randint(keys[r], (b, num_neg), 1, item_num + 1)
        cand = jnp.where(bad, redraw, cand)
    return cand
