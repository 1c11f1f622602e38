"""ctypes bindings for the native C++ batch packer (native/packer.cpp).

Loads ``native/libgenrec_native.so`` when present (``make -C native``);
every entry point has a numpy fallback in `genrec_tpu.data.datasets`, and
the two implementations are tested for bit-identical output
(tests/test_native.py). The native path parallelizes packing across a
thread pool, keeping the host input pipeline ahead of a TPU chip at
~10^5 consumed examples/s.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "native", "libgenrec_native.so")
    path = os.environ.get("GENREC_NATIVE_LIB", path)
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.genrec_native_abi_version.restype = ctypes.c_int32
    if lib.genrec_native_abi_version() != 1:
        return None
    lib.pack_sasrec_train.argtypes = [_I32P, _I64P, ctypes.c_int64,
                                      ctypes.c_int32, _I32P, _I32P]
    lib.pack_sasrec_test.argtypes = [_I32P, _I64P, ctypes.c_int64,
                                     ctypes.c_int32, _I32P, _I32P]
    lib.pack_tiger.argtypes = [_I32P, _I64P, _I32P, _I64P, ctypes.c_int64,
                               ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                               _I32P, _I32P, _I32P]
    lib.pack_dense_t5_train.argtypes = [_I32P, _I64P, _I32P, ctypes.c_int64,
                                        ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_void_p]
    lib.pack_dense_t5_train.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _flatten(seqs: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    flat = (np.concatenate(seqs).astype(np.int32) if seqs
            else np.zeros(0, np.int32))
    return np.ascontiguousarray(flat), offsets


def pack_sasrec(seqs: List[np.ndarray], max_len: int, mode: str
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Native SASRec split pack. Caller pre-filters by min_seq_len."""
    lib = _lib()
    assert lib is not None
    flat, offsets = _flatten(seqs)
    n = len(seqs)
    inputs = np.zeros((n, max_len), np.int32)
    if mode == "train":
        targets = np.zeros((n, max_len), np.int32)
        lib.pack_sasrec_train(flat, offsets, n, max_len, inputs, targets)
    else:
        targets = np.zeros(n, np.int32)
        lib.pack_sasrec_test(flat, offsets, n, max_len, inputs, targets)
    return inputs, targets


def pack_tiger(histories: List[np.ndarray], targets: List[np.ndarray],
               max_len: int, code_dim: int, tgt_tokens: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _lib()
    assert lib is not None
    hflat, hoff = _flatten(histories)
    tflat, toff = _flatten(targets)
    n = len(histories)
    input_ids = np.zeros((n, max_len * code_dim), np.int32)
    mask = np.zeros((n, max_len * code_dim), np.int32)
    labels = np.zeros((n, tgt_tokens), np.int32)
    lib.pack_tiger(hflat, hoff, tflat, toff, n, max_len, code_dim,
                   tgt_tokens, input_ids, mask, labels)
    return input_ids, mask, labels


def pack_dense_t5_train(seqs: List[np.ndarray], user_ids: np.ndarray,
                        max_seq_len: int, min_seq_len: int = 2):
    lib = _lib()
    assert lib is not None
    flat, offsets = _flatten(seqs)
    uids = np.ascontiguousarray(np.asarray(user_ids, np.int32))
    n_users = len(seqs)
    total = lib.pack_dense_t5_train(flat, offsets, uids, n_users, max_seq_len,
                                    min_seq_len, None, None, None, None)
    hist = np.zeros((total, max_seq_len), np.int32)
    lens = np.zeros(total, np.int32)
    tgt = np.zeros(total, np.int32)
    out_uid = np.zeros(total, np.int32)
    lib.pack_dense_t5_train(
        flat, offsets, uids, n_users, max_seq_len, min_seq_len,
        hist.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        tgt.ctypes.data_as(ctypes.c_void_p),
        out_uid.ctypes.data_as(ctypes.c_void_p))
    return hist, lens, tgt, out_uid
