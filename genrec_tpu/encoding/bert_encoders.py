"""BERT text-embedding toolchain (HF transformers; CPU/accelerator-agnostic).

Equivalents of the reference's L2 encoders:
- :func:`encode_item_texts` / :func:`encode_user_profiles` —
  `T5/item_encode.py:59-128`: mean-pool over tokens *excluding [CLS]* with
  attention-mask weighting for items; [CLS] vector for user names; item
  row 0 is the empty padding text.
- :func:`encode_major_hierarchy` — `major-encode/bert_emb.py:131-168`:
  per-level major-name embeddings (mean-pool, no CLS).
- :func:`user_embedding_from_items` — `major-encode/make_user_embs.py:46-70`:
  mean of item embeddings over the user's history, excluding the last item
  when the history has ≥2 items.
- :func:`top5_major_retrieval` — `major-encode/top5_major.py:17-51`:
  cosine top-5 majors per user per level → the prof_lvl{1,2,3}.h5 payload.

HF models are optional: pass ``encoder=None`` to use a deterministic
hash-based fallback embedding (keeps offline tests running); the math
downstream is identical.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _hash_embed(texts: Sequence[str], dim: int = 768) -> np.ndarray:
    """Deterministic fallback embedding for offline environments."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        h = hashlib.sha256(t.encode("utf-8")).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        out[i] = rng.normal(0, 1, dim).astype(np.float32)
    return out


class BertEncoder:
    """Thin wrapper over an HF AutoModel with the reference's pooling."""

    def __init__(self, model_name: str = "bert-base-uncased",
                 max_length: int = 512, batch_size: int = 20,
                 device: str = "cpu"):
        from transformers import AutoModel, AutoTokenizer  # lazy
        import torch
        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(device).eval()
        self.max_length = max_length
        self.batch_size = batch_size
        self.device = device

    def encode(self, texts: Sequence[str], pooling: str = "mean_no_cls"
               ) -> np.ndarray:
        torch = self.torch
        outs = []
        with torch.no_grad():
            for s in range(0, len(texts), self.batch_size):
                chunk = [t if t else " " for t in texts[s:s + self.batch_size]]
                enc = self.tokenizer(chunk, padding=True, truncation=True,
                                     max_length=self.max_length,
                                     return_tensors="pt").to(self.device)
                hidden = self.model(**enc).last_hidden_state  # (B, L, D)
                if pooling == "cls":
                    vec = hidden[:, 0]
                else:  # mean over tokens excluding [CLS], mask-weighted
                    mask = enc["attention_mask"].clone()
                    mask[:, 0] = 0
                    m = mask.unsqueeze(-1).float()
                    vec = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
                outs.append(vec.cpu().numpy())
        return np.concatenate(outs).astype(np.float32)


def encode_item_texts(item_info: Dict[int, str],
                      encoder: Optional[BertEncoder] = None,
                      dim: int = 768) -> np.ndarray:
    """(max_item_id+1, D) table; row 0 = empty padding text
    (`T5/item_encode.py:96-101`)."""
    max_id = max(item_info) if item_info else 0
    order_texts = ["" if k == 0 else item_info.get(k, "")
                   for k in range(max_id + 1)]
    if encoder is None:
        return _hash_embed(order_texts, dim)
    return encoder.encode(order_texts, pooling="mean_no_cls")


def encode_user_profiles(user_profile_map: Dict[int, str],
                         encoder: Optional[BertEncoder] = None,
                         dim: int = 768) -> np.ndarray:
    """(N, D) in user_id order — [CLS] embedding of the profile text
    (`T5/item_encode.py:11-34`)."""
    uids = sorted(user_profile_map)
    texts = [user_profile_map[u] for u in uids]
    if encoder is None:
        return _hash_embed(texts, dim)
    return encoder.encode(texts, pooling="cls")


def encode_major_hierarchy(levels: Sequence[Sequence[Tuple[str, str]]],
                           encoder: Optional[BertEncoder] = None,
                           dim: int = 768) -> List[Dict[str, np.ndarray]]:
    """[(code, name)...] per level → per-level {codes, names, embs}
    (`major-encode/bert_emb.py:131-168`)."""
    out = []
    for level in levels:
        codes = [c for c, _ in level]
        names = [n for _, n in level]
        embs = (_hash_embed(names, dim) if encoder is None
                else encoder.encode(names, pooling="mean_no_cls"))
        out.append({"codes": np.array(codes, dtype=object),
                    "names": np.array(names, dtype=object),
                    "embs": embs})
    return out


def user_embedding_from_items(item_embs: np.ndarray,
                              history: Sequence[int]) -> np.ndarray:
    """Mean of item embeddings, excluding the last item when ≥2
    (`major-encode/make_user_embs.py:46-70`)."""
    hist = list(history)
    if len(hist) >= 2:
        hist = hist[:-1]
    if not hist:
        return np.zeros(item_embs.shape[1], np.float32)
    return item_embs[hist].mean(axis=0).astype(np.float32)


def top5_major_retrieval(user_vecs: np.ndarray, major_embs: np.ndarray,
                         top_k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine top-k majors per user → (indices (N,k), embs (N,k,D))
    (`major-encode/top5_major.py:17-51`)."""
    def _norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    sims = _norm(user_vecs) @ _norm(major_embs).T  # (N, M)
    k = min(top_k, sims.shape[1])
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    # sort the top-k by similarity descending (top5_major.py argpartition+sort)
    row_sims = np.take_along_axis(sims, part, axis=1)
    order = np.argsort(-row_sims, axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    embs = major_embs[idx]
    if k < top_k:  # pad to the contract's fixed width
        pad = top_k - k
        idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        embs = np.pad(embs, ((0, 0), (0, pad), (0, 0)))
    return idx, embs.astype(np.float32)


def build_prof_lvl_files(user_ids: np.ndarray, user_vecs: np.ndarray,
                         level_embs: Sequence[np.ndarray],
                         paths: Sequence[str]) -> None:
    """Write prof_lvl{1,2,3}.h5 (`major-encode/top5_major.py:54-63`)."""
    from genrec_tpu.data.contracts import write_prof_lvl
    for embs, path in zip(level_embs, paths):
        _, top = top5_major_retrieval(user_vecs, embs)
        write_prof_lvl(path, user_ids, top)
