"""PartitionSpec rules and parameter/batch sharding helpers.

Pattern follows the public regex-rules approach (SNIPPETS.md §1): map each
parameter path to a PartitionSpec; batches shard over 'data'; the large
tables (item embeddings, codebooks, T5 d_ff) shard over 'model'.
"""

from __future__ import annotations

import re
from typing import Any, List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = Sequence[Tuple[str, P]]


# Default rules for the scaled configs: row-shard big embedding tables and
# split T5 d_ff over 'model'; everything else replicated.
DEFAULT_RULES: Rules = (
    (r"item_emb/embedding$", P("model", None)),
    (r"item_table$", P("model", None)),       # SASRecLarge row-sharded table
    (r"shared/embedding$", P(None, None)),   # tiny vocab (64) — replicate
    (r"codebook_\d+$", P(None, None)),       # small codebooks — replicate
    (r"ff/wi/kernel$", P(None, "model")),    # TP: d_model × d_ff
    (r"ff/wo/kernel$", P("model", None)),    # TP: d_ff × d_model
    (r"(self_attn|cross_attn)/(q|k|v)/kernel$", P(None, "model")),
    (r"(self_attn|cross_attn)/o/kernel$", P("model", None)),
    (r".*", P()),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def match_partition_rules(rules: Rules, params: Any) -> Any:
    """Pytree of PartitionSpec from regex rules over 'a/b/c' param paths."""
    def assign(path, leaf):
        name = _path_str(path)
        if not hasattr(leaf, "shape") or np.prod(leaf.shape) == 1 or leaf.ndim == 0:
            return P()
        for rule, spec in rules:
            if re.search(rule, name):
                # non-dividing axes are dropped later, in shard_params._divisible
                return spec
        raise ValueError(f"no partition rule for {name}")
    return jax.tree_util.tree_map_with_path(assign, params)


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(params: Any, mesh: Mesh, rules: Rules = DEFAULT_RULES) -> Any:
    """Device_put every param according to the matched rules (falls back to
    replication when a dim doesn't divide the mesh axis)."""
    specs = match_partition_rules(rules, params)

    def put(leaf, spec):
        if hasattr(leaf, "shape") and not _divisible(leaf.shape, spec, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, params, specs)


def batch_spec(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array of a batch dict with batch-dim sharding."""
    s = batch_spec(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}
