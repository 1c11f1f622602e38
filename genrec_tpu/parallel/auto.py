"""Automatic data-parallel wiring for pipelines.

On a single device this is a no-op; on N devices it returns the mesh and
the (batch, replicate) shardings the Trainer uses to place inputs/params,
so every pipeline scales data-parallel with zero code changes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from genrec_tpu.configs import MeshConfig
from genrec_tpu.parallel.mesh import make_mesh
from genrec_tpu.parallel.sharding import (
    DEFAULT_RULES, _divisible, batch_spec, match_partition_rules,
    replicate_spec)


def dp_shardings(mesh_cfg: Optional[MeshConfig] = None
                 ) -> Tuple[Optional[object], Optional[object], Optional[object]]:
    """Returns (mesh, batch_sharding, replicate_sharding); Nones on 1 device."""
    if jax.device_count() <= 1:
        return None, None, None
    mesh = make_mesh(mesh_cfg or MeshConfig())
    return mesh, batch_spec(mesh), replicate_spec(mesh)


def param_shardings(mesh, params, rules=DEFAULT_RULES):
    """Per-parameter NamedShardings from the regex partition rules — the
    tensor-parallel layout (d_ff/attention-head splits, row-sharded tables)
    over the mesh's 'model' axis. Returns None when there is no mesh or the
    model axis is 1 (pure DP: a single replicated sharding is cheaper to
    dispatch than a per-leaf tree). Non-dividing leaves fall back to
    replication, mirroring `shard_params`."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    if mesh is None or dict(mesh.shape).get("model", 1) <= 1:
        return None
    specs = match_partition_rules(rules, params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: NamedSharding(
            mesh, spec if _divisible(leaf.shape, spec, mesh) else P()),
        params, specs)
