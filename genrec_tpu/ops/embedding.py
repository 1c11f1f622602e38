"""Row-sharded embedding/codebook lookup over the mesh 'model' axis.

The north-star distributed path (BASELINE.json config 5): tables with up to
10M rows are partitioned row-wise across devices; lookups exchange IDs and
partial rows with XLA collectives over ICI inside `shard_map`. The
reference keeps a full `nn.Embedding` per device (`SASRec/model.py:18`,
`RQ-VAE/models/vq.py:21`) — impossible at 10M×d on one chip's HBM
alongside activations, and wasteful at any multi-chip scale.

Design (gather-by-psum):
1. every device holds its table shard (V/M, D) and the full id batch
   (ids are replicated over 'model'; batch-sharded over 'data'),
2. each device gathers the rows it owns (masked local gather — one
   HBM-friendly `take` on a contiguous shard) and contributes zeros
   elsewhere,
3. one `psum` over 'model' assembles full embeddings on every device.

Backward: left to autodiff — the transpose of the masked `take` is XLA's
deterministic scatter-add on the local shard, and shard_map transposes the
`psum` correctly (each device's partial receives the full cotangent). A
hand-written custom_vjp is *wrong* here: it would bypass shard_map's
replication bookkeeping for the collective.

Cost per step: psum of (B, D) over ICI — bandwidth-optimal up to the M×
compute redundancy of the masked gather, which is negligible (gather is
memory-bound on B·D bytes, tiny next to the matmuls). An all_to_all
ID-partition variant saves the redundancy at the price of capacity
buckets; it is provided as `alltoall_embedding_lookup` for the
load-balanced case.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_masked_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray,
                         axis_name: str) -> jnp.ndarray:
    """Inside shard_map: masked gather from the local shard + psum."""
    shard = jax.lax.axis_index(axis_name)
    rows = table_shard.shape[0]
    local = ids - shard * rows
    mine = (local >= 0) & (local < rows)
    safe = jnp.where(mine, local, 0)
    part = jnp.take(table_shard, safe, axis=0)
    part = part * mine[:, None].astype(part.dtype)
    return jax.lax.psum(part, axis_name)


def sharded_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                             mesh: Mesh, *, axis_name: str = "model",
                             data_axis: Optional[str] = "data") -> jnp.ndarray:
    """Lookup ``ids`` (any shape) in a row-sharded ``table`` (V, D).

    ``table`` is sharded P(axis_name, None); ``ids`` batch-sharded over
    ``data_axis`` (or replicated if None). Returns embeddings with the ids'
    sharding. Differentiable w.r.t. ``table``.
    """
    id_shape = ids.shape
    flat = ids.reshape(-1)
    data_spec = P(data_axis) if data_axis else P()

    fn = shard_map(
        functools.partial(_lookup_body, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name, None), data_spec),
        out_specs=data_spec,
        check_vma=False,
    )
    out = fn(table, flat)
    return out.reshape(*id_shape, table.shape[1])


def _lookup_body(table_shard, ids, *, axis_name):
    return _local_masked_lookup(table_shard, ids, axis_name)


def alltoall_embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                              mesh: Mesh, *, axis_name: str = "model",
                              data_axis: Optional[str] = "data",
                              capacity_factor: float = 2.0):
    """ID-partition all_to_all variant.

    Each device buckets its ids by owner shard into fixed-capacity
    (``capacity_factor × B/M``) buckets, exchanges ids via ``all_to_all``,
    gathers owned rows locally, and exchanges the rows back. Saves the M×
    masked-gather redundancy of the psum path when D is large.

    Returns ``(embs, ok)`` where ``ok`` (bool, per id) is False for ids
    dropped by bucket overflow (skewed traffic) — callers either size
    ``capacity_factor`` generously or combine with the psum path as a
    fallback for the ~0 overflow rows.

    DIFFERENTIABLE w.r.t. ``table``: every float-path op has an exact
    transpose that shard_map applies shard-locally — ``all_to_all``
    transposes to the reverse ``all_to_all`` (rows' cotangents return to
    their owner shard), the two ``take``s to deterministic scatter-adds,
    and the ``ok``/``valid`` mask multiplies zero the cotangents of
    overflow-dropped ids exactly as they zero the forward rows (a dropped
    id contributes no gradient, consistent with reading a zero row).
    Verified bit-exact against the psum path's grads in
    `tests/test_parallel.py::test_alltoall_lookup_grads_match_psum`.
    Backward traffic equals forward traffic (one reverse a2a of rows +
    one of ids' cotangent slots), so the capacity rule below governs
    training byte costs too.

    Selection rule (measured, artifacts/lookup_comms_r3.json): per
    device the psum path moves ≈2·(M−1)/M·n·D floats (ring all-reduce of
    the assembled rows) and the a2a path ≈(M−1)/M·c·n·(D+1) (c·n id
    slots out + c·n rows back) — a2a wins bytes iff c < 2D/(D+1) ≈ 2
    (capacity factor, not mesh size, decides); at c=2 it is a wash and
    psum's simplicity wins. `ShardedEmbeddingConfig.preferred_lookup`
    encodes this rule for callers.
    """
    id_shape = ids.shape
    flat = ids.reshape(-1)
    data_spec = P(data_axis) if data_axis else P()
    M = mesh.shape[axis_name]
    n = flat.shape[0] // (mesh.shape[data_axis] if data_axis else 1)
    cap = max(int(capacity_factor * n / M + 0.999), 1)

    def body(table_shard, ids_local):
        rows = table_shard.shape[0]
        nloc = ids_local.shape[0]
        owner = jnp.clip(ids_local // rows, 0, M - 1)
        # position of each id within its owner group (stable)
        order = jnp.argsort(owner, stable=True)
        sorted_owner = owner[order]
        group_start = jnp.searchsorted(sorted_owner, jnp.arange(M))
        pos_sorted = jnp.arange(nloc) - group_start[sorted_owner]
        pos = jnp.zeros(nloc, jnp.int32).at[order].set(pos_sorted.astype(jnp.int32))
        ok = pos < cap
        slot = owner * cap + jnp.where(ok, pos, 0)
        # scatter ids into (M*cap,) buckets; -1 marks empty slots; overflow
        # ids scatter out-of-bounds and are dropped
        buckets = jnp.full((M * cap,), -1, jnp.int32)
        buckets = buckets.at[jnp.where(ok, slot, M * cap)].set(
            ids_local, mode="drop")
        sent = jax.lax.all_to_all(buckets.reshape(M, cap), axis_name, 0, 0)
        sent = sent.reshape(M * cap)
        shard = jax.lax.axis_index(axis_name)
        valid = sent >= 0
        local = jnp.clip(sent - shard * rows, 0, rows - 1)
        gathered = jnp.take(table_shard, local, axis=0)
        gathered = gathered * valid[:, None].astype(gathered.dtype)
        back = jax.lax.all_to_all(gathered.reshape(M, cap, -1), axis_name, 0, 0)
        back = back.reshape(M * cap, -1)
        out = jnp.take(back, slot, axis=0)
        out = out * ok[:, None].astype(out.dtype)
        return out, ok

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis_name, None), data_spec),
                   out_specs=(data_spec, data_spec), check_vma=False)
    out, ok = fn(table, flat)
    return out.reshape(*id_shape, table.shape[1]), ok.reshape(id_shape)
