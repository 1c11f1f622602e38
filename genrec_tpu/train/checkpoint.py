"""Orbax checkpointing with resume — the subsystem the reference lacks.

The reference only ever *saves* best weights (`SASRec/train.py:194`,
`RQVAE-T5/train.py:130`); RQ-VAE saves full state but never restores
(`RQ-VAE/train.py:153-171`). Here: full train-state (params + opt_state +
step/epoch + best-metric) checkpoints with bounded retention
(``keep_checkpoints``, like the reference's heap retention
`RQ-VAE/train.py:230-246`) and restart-from-latest resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, ckpt_dir: str, keep: int = 5):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )
        self._best = ocp.StandardCheckpointer()

    def save_latest(self, step: int, state: Dict[str, Any]) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, abstract_state: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def save_best(self, state: Dict[str, Any], tag: str = "best") -> None:
        path = os.path.join(self.dir, tag)
        self._best.save(path, state, force=True)

    def restore_best(self, abstract_state: Dict[str, Any], tag: str = "best"):
        path = os.path.join(self.dir, tag)
        if not os.path.exists(path):
            return None
        return self._best.restore(path, abstract_state)

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        self._best.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


def abstract_like(tree):
    """Abstract pytree for orbax restore from a concrete template.

    Carries each leaf's sharding when the template holds placed
    `jax.Array`s, so orbax restores straight into the live layout — on a
    multi-process mesh this is REQUIRED (each process must restore only
    its addressable shards), and on one process it silences orbax's
    "Sharding info not provided" topology warning."""
    def ab(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "shape"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x
    return jax.tree_util.tree_map(ab, tree)
