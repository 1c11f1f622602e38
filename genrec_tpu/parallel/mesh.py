"""Device-mesh construction and multi-host initialization."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from genrec_tpu.configs import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data_axis == -1`` consumes all remaining devices. Axis sizes must
    divide the device count. On a pod slice the default device order keeps
    the 'model' axis on the innermost (fastest-ICI) dimension.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model_axis if cfg.model_axis > 0 else 1
    data = cfg.data_axis if cfg.data_axis > 0 else n // model
    assert data * model == n, (
        f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper for multi-host pods (DCN).

    No-op on a single process. The per-host data loader should then shard
    its input files by `jax.process_index()`.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
