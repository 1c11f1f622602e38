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
from genrec_tpu.parallel.sharding import batch_spec, replicate_spec


def dp_shardings(mesh_cfg: Optional[MeshConfig] = None
                 ) -> Tuple[Optional[object], Optional[object], Optional[object]]:
    """Returns (mesh, batch_sharding, replicate_sharding); Nones on 1 device."""
    if jax.device_count() <= 1:
        return None, None, None
    mesh = make_mesh(mesh_cfg or MeshConfig())
    return mesh, batch_spec(mesh), replicate_spec(mesh)
