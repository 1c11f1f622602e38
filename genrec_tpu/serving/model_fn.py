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


def tiger_model_fn(ckpt_dir: str, codes_path: str,
                   cfg=None) -> Optional[Callable[[List[int], int], List[int]]]:
    """Serve the best TIGER checkpoint: GENERATIVE retrieval behind
    `/api/v1/recommend/model`.

    History item-ids map to their semantic-ID token sequence
    (`data/tiger_tokens`), the beam decodes with the TRIE constraint over
    the actual item-code table — every decoded tuple is a real item — and
    the code tuples map back to item ids. One fixed beam width keeps a
    single jit specialization across requests; the first call pays the
    compile. Returns None when no best checkpoint exists.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.data import tiger_tokens
    from genrec_tpu.data.contracts import read_codes
    from genrec_tpu.models.tiger import TIGER, generate, make_constraint
    from genrec_tpu.train.checkpoint import CheckpointStore, abstract_like

    cfg = cfg or TIGERConfig(code_path=codes_path)
    codes = read_codes(codes_path)                      # (N_items+1, 4)
    token_table = tiger_tokens.codes_to_token_table(codes, cfg.codebook_size)
    tup2item = {tuple(map(int, token_table[i])): i
                for i in range(1, len(token_table))}
    model = TIGER(cfg)
    seq = cfg.max_len * cfg.code_dim
    init = jax.jit(model.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, seq), jnp.int32),
                               jnp.ones((1, seq), jnp.int32),
                               jnp.ones((1, cfg.code_dim), jnp.int32))
    store = CheckpointStore(ckpt_dir)
    restored = store.restore_best(abstract_like({"params": init}))
    if restored is None:
        return None
    params = restored["params"]
    constraint = make_constraint(
        dataclasses.replace(cfg, constrained_decoding="trie"), codes)
    beams = max(cfg.beam_size, 20, cfg.max_len)  # headroom over history dedup

    @jax.jit
    def gen(p, ii, am):
        return generate(model, p, ii, am, num_beams=beams,
                        constraint=constraint)

    def fn(history: List[int], top_k: int) -> List[int]:
        ids = [int(i) for i in history
               if 0 < int(i) < len(token_table)][-cfg.max_len:]
        ii = np.zeros((1, seq), np.int32)
        if ids:
            toks = token_table[np.asarray(ids, np.int64)].reshape(-1)
            ii[0, seq - len(toks):] = toks
        am = (ii != 0).astype(np.int32)
        tokens, _scores = gen(params, jnp.asarray(ii), jnp.asarray(am))
        out: List[int] = []
        hist = set(ids)
        for beam in np.asarray(tokens)[0]:          # best-first
            item = tup2item.get(tuple(map(int, beam[1:1 + cfg.code_dim])))
            if item is not None and item not in hist and item not in out:
                out.append(int(item))
            if len(out) >= int(top_k):
                break
        return out

    return fn


def dense_t5_model_fn(ckpt_dir: str, item_emb_h5: str, cfg=None,
                      user_emb: Optional[np.ndarray] = None
                      ) -> Optional[Callable[[List[int], int], List[int]]]:
    """Serve the best DenseT5 checkpoint: encoder-retrieval behind
    `/api/v1/recommend/model`.

    History item-ids gather their BERT embeddings (right-padded to
    ``cfg.max_seq_len``, `T5/data_vision.py:131-154` layout), the encoder
    produces one query vector, and cosine top-k against the normalized
    item table returns the items. ``user_emb`` optionally supplies the
    position-0 profile embedding (zeros = cold profile — the route
    carries history only). Returns None when no best checkpoint exists.
    """
    import jax
    import jax.numpy as jnp

    from genrec_tpu.configs import DenseT5Config
    from genrec_tpu.data.contracts import read_item_embs
    from genrec_tpu.models.dense_t5 import DenseT5
    from genrec_tpu.train.checkpoint import CheckpointStore, abstract_like

    cfg = cfg or DenseT5Config(item_emb_h5_path=item_emb_h5)
    item_embs, _ = read_item_embs(item_emb_h5)
    item_embs = np.asarray(item_embs, np.float32)
    n_items = len(item_embs) - 1                     # row 0 = padding
    norms = np.linalg.norm(item_embs, axis=1, keepdims=True)
    item_norm = jnp.asarray(item_embs / np.maximum(norms, 1e-8))
    L = cfg.max_seq_len
    model = DenseT5(cfg)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L + 1, cfg.input_emb_dim), jnp.float32),
        jnp.ones((1, L + 1), jnp.int32))
    store = CheckpointStore(ckpt_dir)
    restored = store.restore_best(abstract_like({"params": init}))
    if restored is None:
        return None
    params = restored["params"]
    prof = (np.zeros((cfg.input_emb_dim,), np.float32)
            if user_emb is None else np.asarray(user_emb, np.float32))

    @jax.jit
    def rank(params, seq, mask):
        _, pred = model.apply(params, seq, mask, None, deterministic=True)
        scores = jnp.dot(pred, item_norm.T,
                         preferred_element_type=jnp.float32)
        return scores.at[:, 0].set(-1e9)

    def fn(history: List[int], top_k: int) -> List[int]:
        ids = [int(i) for i in history if 0 < int(i) <= n_items][-L:]
        seq = np.zeros((1, L + 1, cfg.input_emb_dim), np.float32)
        seq[0, 0] = prof
        if ids:
            seq[0, 1:1 + len(ids)] = item_embs[np.asarray(ids, np.int64)]
        mask = (np.arange(L + 1)[None, :] <= len(ids)).astype(np.int32)
        scores = np.asarray(rank(params, jnp.asarray(seq),
                                 jnp.asarray(mask)))[0].copy()
        scores[np.asarray(ids, np.int64)] = -np.inf  # rated exclusion
        k = min(int(top_k), n_items)
        return [int(t) for t in np.argsort(-scores)[:k]]

    return fn
