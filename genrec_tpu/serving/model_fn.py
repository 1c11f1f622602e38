"""Trained-model recommend functions for the serving layer.

Bridges pipeline artifacts to the `/api/v1/recommend/model` route
(`backend/api.py` `recommend_model`; `serving/app.py`): load the best
checkpoint a pipeline saved and return a plain
``fn(history_ids, top_k) -> [item_id]`` the route table can call.
The reference never wired its trained models into the backend at all —
its recommendation routes are the keyword/LLM hybrid only
(`Baseline/direct_rec.py`); this closes that loop.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import numpy as np


def sasrec_model_fn(ckpt_dir: str, data_path: str,
                    cfg=None) -> Optional[Callable[[List[int], int], List[int]]]:
    """Serve the best SASRec checkpoint from ``ckpt_dir``.

    ``data_path`` (the training interactions H5) fixes the item-id space:
    the checkpoint's embedding table rows are dense 1-based ids from the
    same corpus, so the table size must be derived exactly as training
    derived it. ``cfg`` must match the training config (CLI default when
    omitted). Returns None when no best checkpoint exists.

    The returned fn left-pads/truncates the history to ``cfg.max_len``,
    scores the full vocabulary with the jitted ``SASRec.predict`` and
    returns the top-k item ids, excluding padding and the history itself
    (leave-one-out serving semantics, `SASRec/evaluate.py:27-37`).
    """
    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import SASRecConfig
    from genrec_tpu.data import datasets
    from genrec_tpu.data.contracts import read_interactions
    from genrec_tpu.models.sasrec import SASRec
    from genrec_tpu.train.checkpoint import CheckpointStore, abstract_like

    cfg = cfg or SASRecConfig(data_path=data_path)
    data = read_interactions(data_path)
    tr = datasets.build_sasrec_arrays(data, cfg.max_len, "train",
                                      cfg.min_seq_len)
    item_num = tr.item_num
    model = SASRec(item_num=item_num, cfg=cfg)
    init = jax.jit(model.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, cfg.max_len), jnp.int32))
    store = CheckpointStore(ckpt_dir)
    restored = store.restore_best(abstract_like({"params": init}))
    if restored is None:
        return None
    params = restored["params"]
    predict = jax.jit(functools.partial(model.apply, method=SASRec.predict))

    def fn(history: List[int], top_k: int) -> List[int]:
        ids = [int(i) for i in history if 0 < int(i) <= item_num]
        ids = ids[-cfg.max_len:]
        seq = np.zeros((1, cfg.max_len), np.int32)
        if ids:
            seq[0, cfg.max_len - len(ids):] = ids
        logits = np.asarray(predict(params, jnp.asarray(seq)))[0].copy()
        logits[0] = -np.inf                  # padding row
        logits[np.asarray(ids, np.int64)] = -np.inf  # rated exclusion
        k = min(int(top_k), item_num)
        return [int(t) for t in np.argsort(-logits)[:k]]

    return fn
