"""Readers/writers for the HDF5/NPY file contracts of the reference repo.

These schemas are the glue between pipelines (SURVEY.md §2.6). Files written
here are byte-layout compatible with what the reference reads/writes:

- ``user_item_interact.h5``: ``user_id`` int32 (1-based contiguous),
  ``user_profile`` vlen str, ``item_id_list`` vlen int32
  (built in `T5/data_process.ipynb`; read at `SASRec/data_vision.py:40-46`).
- ``course_item_embs.h5``: ``item_embs`` (max_item_id+1, 768) f32 with row 0
  as padding, ``meta`` JSON bytes (`T5/item_encode.py:113-122`).
- ``user_profile_embs.h5``: ``user_embs`` (N, 768) f32, row i = user i+1
  (`T5/item_encode.py:124-128`; indexed ``user_id-1`` at
  `T5/data_vision.py:137`).
- ``course_info.h5`` / ``course_id_map.h5`` / ``user_id_map.h5``: course
  text fields and original-id ↔ dense-id maps (`T5/data_vision.py:70-84`).
- ``course_rqvae_codes.npy``: (N_items, L+1) int codes — L RQ levels plus a
  collision-disambiguation digit (`RQ-VAE/infer.py:149-184`).
- ``tiger/{train,test}_dataset.h5``: ``user_id`` int32, ``history``/``target``
  vlen int32 of flattened offset tokens (`RQVAE-T5/data_read.ipynb`;
  read at `RQVAE-T5/data_vision.py:8-11`).
- ``prof_lvl{1,2,3}.h5``: ``user_id`` int32, ``user_major_embs`` (N,5,768)
  f32 (`major-encode/top5_major.py:54-63`).
- ``recommendation_data.h5``: groups ``classes/``, ``interactions/``,
  ``students/`` (`Baseline/data_process.py:39-105`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np

_VLEN_INT32 = h5py.special_dtype(vlen=np.dtype("int32"))
_VLEN_STR = h5py.special_dtype(vlen=str)


def _ensure_parent(path: str) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)


# ---------------------------------------------------------------------------
# user_item_interact.h5
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class InteractionData:
    """In-memory form of user_item_interact.h5."""

    user_ids: np.ndarray            # (U,) int32, 1-based
    user_profiles: List[str]        # (U,) strings
    item_id_lists: List[np.ndarray]  # per-user int32 sequences (time ordered)

    @property
    def num_users(self) -> int:
        return len(self.user_ids)

    @property
    def max_item_id(self) -> int:
        mx = 0
        for seq in self.item_id_lists:
            if len(seq):
                mx = max(mx, int(np.max(seq)))
        return mx


def write_interactions(path: str, data: InteractionData) -> None:
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("user_id", data=np.asarray(data.user_ids, dtype=np.int32))
        f.create_dataset("user_profile", data=np.array(data.user_profiles, dtype=object),
                         dtype=_VLEN_STR)
        ds = f.create_dataset("item_id_list", (len(data.item_id_lists),), dtype=_VLEN_INT32)
        for i, seq in enumerate(data.item_id_lists):
            ds[i] = np.asarray(seq, dtype=np.int32)


def read_interactions(path: str) -> InteractionData:
    with h5py.File(path, "r") as f:
        user_ids = f["user_id"][:].astype(np.int32)
        user_profiles = [s.decode("utf-8") if isinstance(s, bytes) else str(s)
                         for s in f["user_profile"][:]]
        item_lists = [np.asarray(x, dtype=np.int32) for x in f["item_id_list"][:]]
    return InteractionData(user_ids, user_profiles, item_lists)


# ---------------------------------------------------------------------------
# item / user embedding tables
# ---------------------------------------------------------------------------

def write_item_embs(path: str, item_embs: np.ndarray,
                    meta: Optional[Dict] = None) -> None:
    """Row 0 is the padding row (empty-text embedding in the reference)."""
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("item_embs", data=np.asarray(item_embs, dtype=np.float32),
                         compression="gzip")
        meta = dict(meta or {})
        meta.setdefault("dim", int(item_embs.shape[1]))
        f.create_dataset("meta", data=np.bytes_(json.dumps(meta, ensure_ascii=False)))


def read_item_embs(path: str):
    with h5py.File(path, "r") as f:
        embs = f["item_embs"][:].astype(np.float32)
        meta = {}
        if "meta" in f:
            raw = f["meta"][()]
            if isinstance(raw, bytes):
                meta = json.loads(raw.decode("utf-8"))
    return embs, meta


def write_user_embs(path: str, user_embs: np.ndarray) -> None:
    """Row i corresponds to user_id i+1 (contiguous 1-based users)."""
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("user_embs", data=np.asarray(user_embs, dtype=np.float32),
                         compression="gzip")


def read_user_embs(path: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        return f["user_embs"][:].astype(np.float32)


# ---------------------------------------------------------------------------
# course info + id maps
# ---------------------------------------------------------------------------

def write_course_info(path: str, item_ids: Sequence[str], item_names: Sequence[str],
                      item_infos: Sequence[str]) -> None:
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("item_id", data=np.array(item_ids, dtype=object), dtype=_VLEN_STR)
        f.create_dataset("item_name", data=np.array(item_names, dtype=object), dtype=_VLEN_STR)
        f.create_dataset("item_info", data=np.array(item_infos, dtype=object), dtype=_VLEN_STR)


def read_course_info(path: str):
    with h5py.File(path, "r") as f:
        dec = lambda a: [s.decode("utf-8") if isinstance(s, bytes) else str(s) for s in a[:]]
        return dec(f["item_id"]), dec(f["item_name"]), dec(f["item_info"])


def write_id_map(path: str, orig_ids: Sequence[str], num_ids: Sequence[int],
                 key_prefix: str = "item") -> None:
    """``course_id_map.h5`` / ``user_id_map.h5``: original → dense 1-based id."""
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset(f"{key_prefix}_id", data=np.array(orig_ids, dtype=object),
                         dtype=_VLEN_STR)
        f.create_dataset(f"{key_prefix}_num_id", data=np.asarray(num_ids, dtype=np.int64))


def read_id_map(path: str, key_prefix: str = "item") -> Dict[str, int]:
    with h5py.File(path, "r") as f:
        ids = [s.decode("utf-8") if isinstance(s, bytes) else str(s)
               for s in f[f"{key_prefix}_id"][:]]
        nums = f[f"{key_prefix}_num_id"][:]
    return {i: int(n) for i, n in zip(ids, nums)}


# ---------------------------------------------------------------------------
# semantic-ID codes
# ---------------------------------------------------------------------------

def write_codes(path: str, codes: np.ndarray, write_mapping_json: bool = True) -> None:
    """``course_rqvae_codes.npy`` + ``*_mapping.json`` (RQ-VAE/infer.py:173-184)."""
    _ensure_parent(path)
    codes = np.asarray(codes)
    np.save(path, codes)
    if write_mapping_json:
        mapping_file = path.replace(".npy", "_mapping.json")
        index_to_code = {i: c.tolist() for i, c in enumerate(codes)}
        with open(mapping_file, "w") as f:
            json.dump(index_to_code, f, indent=2)


def read_codes(path: str) -> np.ndarray:
    return np.load(path)


# ---------------------------------------------------------------------------
# TIGER datasets
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TigerSplit:
    """One split of tiger/{train,test}_dataset.h5 (flattened offset tokens)."""

    user_ids: np.ndarray              # (N,) int32
    histories: List[np.ndarray]       # per-sample flattened int32 token seqs
    targets: List[np.ndarray]         # per-sample flattened int32 token seqs


def write_tiger_split(path: str, split: TigerSplit) -> None:
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("user_id", data=np.asarray(split.user_ids, dtype=np.int32))
        h = f.create_dataset("history", (len(split.histories),), dtype=_VLEN_INT32)
        t = f.create_dataset("target", (len(split.targets),), dtype=_VLEN_INT32)
        for i, (hist, tgt) in enumerate(zip(split.histories, split.targets)):
            h[i] = np.asarray(hist, dtype=np.int32)
            t[i] = np.asarray(tgt, dtype=np.int32)


def read_tiger_split(path: str) -> TigerSplit:
    with h5py.File(path, "r") as f:
        user_ids = (f["user_id"][:].astype(np.int32) if "user_id" in f
                    else np.arange(len(f["history"]), dtype=np.int32))
        histories = [np.asarray(x, dtype=np.int32) for x in f["history"][:]]
        targets = [np.asarray(x, dtype=np.int32) for x in f["target"][:]]
    return TigerSplit(user_ids, histories, targets)


# ---------------------------------------------------------------------------
# professional-hierarchy (major) embeddings
# ---------------------------------------------------------------------------

def write_prof_lvl(path: str, user_ids: np.ndarray, user_major_embs: np.ndarray) -> None:
    """``prof_lvl{1,2,3}.h5``: (N,) ids + (N, 5, 768) top-5 major vectors."""
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        f.create_dataset("user_id", data=np.asarray(user_ids, dtype=np.int32))
        f.create_dataset("user_major_embs",
                         data=np.asarray(user_major_embs, dtype=np.float32),
                         compression="gzip")


def read_prof_lvl(path: str):
    with h5py.File(path, "r") as f:
        return f["user_id"][:].astype(np.int32), f["user_major_embs"][:].astype(np.float32)


# ---------------------------------------------------------------------------
# app-dataset recommendation_data.h5 (Baseline/data_process.py:39-105)
# ---------------------------------------------------------------------------

def write_recommendation_data(path: str, classes: Dict[str, np.ndarray],
                              interactions: Dict[str, np.ndarray],
                              students: Dict[str, np.ndarray]) -> None:
    _ensure_parent(path)
    with h5py.File(path, "w") as f:
        for group_name, table in (("classes", classes), ("interactions", interactions),
                                  ("students", students)):
            g = f.create_group(group_name)
            for key, arr in table.items():
                arr = np.asarray(arr)
                if arr.dtype.kind in ("U", "O"):
                    g.create_dataset(key, data=arr.astype(object), dtype=_VLEN_STR)
                else:
                    g.create_dataset(key, data=arr)


def read_recommendation_data(path: str):
    out = {}
    with h5py.File(path, "r") as f:
        for group_name in ("classes", "interactions", "students"):
            g = f[group_name]
            table = {}
            for key in g:
                arr = g[key][:]
                if arr.dtype.kind in ("S", "O"):
                    arr = np.array([s.decode("utf-8") if isinstance(s, bytes) else str(s)
                                    for s in arr], dtype=object)
                table[key] = arr
            out[group_name] = table
    return out["classes"], out["interactions"], out["students"]
