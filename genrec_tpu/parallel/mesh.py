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

    No-op on a single process. Per-host data loading then goes through
    ``process_rows`` (which rows this host should read) +
    ``make_global_array(..., process_local=True)``; the Trainer's
    sharded-dataset mode wires this through every pipeline
    (`train/trainer.py`).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_global_array(x, sharding, *, process_local: bool = False):
    """Build a (possibly cross-process) global `jax.Array` from host data.

    ``process_local=False``: every process passes the same HOST-GLOBAL
    array and the runtime places each device's shard out of it (on one
    process this is a plain ``device_put``; across processes jax slices
    the local shards out of the host-global value).

    ``process_local=True``: each process passes only ITS rows — the
    `jax.process_index()` slice along the sharded leading axis, as
    returned by ``process_rows`` — the per-host data-loading path for
    datasets too large to materialize on every host.
    """
    if process_local and jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def process_rows(sharding, n_rows: int):
    """[start, stop) of the leading-axis rows THIS process's devices hold
    under ``sharding`` — i.e. which rows a per-host loader should read.
    Derived from the sharding's addressable index map (no layout guessing);
    requires the process's rows to be one contiguous range, which holds for
    the standard process-major 'data'-axis meshes `make_mesh` builds."""
    idx_map = sharding.addressable_devices_indices_map((n_rows,))
    ranges = sorted(set((s[0].start or 0,
                         n_rows if s[0].stop is None else s[0].stop)
                        for s in idx_map.values()))
    lo, hi = ranges[0][0], max(e for _, e in ranges)
    covered = lo
    for s, e in ranges:
        assert s <= covered, (
            f"process rows are not contiguous under {sharding}: {ranges}")
        covered = max(covered, e)
    return lo, hi
