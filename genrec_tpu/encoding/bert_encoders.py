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


def word_drop(texts: Sequence[str], ratio: float,
              rng: Optional[np.random.Generator] = None) -> List[str]:
    """Random word-drop augmentation (`Baseline/Rec.py:26-37`): each
    whitespace token is kept with probability ``1 - ratio``."""
    rng = rng or np.random.default_rng(0)
    out = []
    for t in texts:
        words = t.split(" ")
        keep = rng.random(len(words)) > ratio
        out.append(" ".join(w for w, k in zip(words, keep) if k))
    return out


def encode_item_texts(item_info: Dict[int, str],
                      encoder: Optional[BertEncoder] = None,
                      dim: int = 768,
                      word_drop_ratio: float = -1.0,
                      seed: int = 0) -> np.ndarray:
    """(max_item_id+1, D) table; row 0 = empty padding text
    (`T5/item_encode.py:96-101`). ``word_drop_ratio > 0`` applies the
    Baseline's augmentation (`Baseline/Rec.py:9-52`) before encoding."""
    max_id = max(item_info) if item_info else 0
    order_texts = ["" if k == 0 else item_info.get(k, "")
                   for k in range(max_id + 1)]
    if word_drop_ratio > 0:
        order_texts = word_drop(order_texts, word_drop_ratio,
                                np.random.default_rng(seed))
    if encoder is None:
        return _hash_embed(order_texts, dim)
    return encoder.encode(order_texts, pooling="mean_no_cls")


def load_quantized_encoder(model_name: str = "bert-base-uncased",
                           device: str = "cpu", **kw) -> BertEncoder:
    """Memory-reduced encoder load (`Baseline/Rec.py:54-97`'s 4-bit path).

    Tries bitsandbytes nf4 (the reference's CUDA path), falls back to a
    bfloat16 load, then to the plain fp32 encoder — mirroring the
    reference's Windows/no-bnb degradation chain. On TPU hosts the
    encoder runs on CPU anyway (text encoding is an offline ETL step);
    bf16 halves host memory with the same downstream contract.
    """
    enc = BertEncoder.__new__(BertEncoder)
    from transformers import AutoModel, AutoTokenizer
    import torch
    enc.torch = torch
    enc.tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = None
    try:
        from transformers import BitsAndBytesConfig
        bnb = BitsAndBytesConfig(load_in_4bit=True,
                                 bnb_4bit_use_double_quant=True,
                                 bnb_4bit_quant_type="nf4",
                                 bnb_4bit_compute_dtype=torch.bfloat16)
        model = AutoModel.from_pretrained(model_name, quantization_config=bnb)
    except Exception:
        try:
            model = AutoModel.from_pretrained(model_name,
                                              torch_dtype=torch.bfloat16)
        except Exception:
            model = AutoModel.from_pretrained(model_name)
    enc.model = model.to(device).eval()
    enc.max_length = kw.get("max_length", 512)
    enc.batch_size = kw.get("batch_size", 20)
    enc.device = device
    return enc


def fetch_pretrained(model_name: str = "t5-small",
                     out_dir: str = "pretrained") -> Optional[str]:
    """Download + cache a pretrained checkpoint (`download_pretrained.py:
    10-12`). Returns the save path, or None when offline (zero-egress
    environments keep working — the built models use scratch configs,
    matching the reference, which references but never loads t5-small)."""
    import os
    if os.environ.get("HF_HUB_OFFLINE") or os.environ.get("TRANSFORMERS_OFFLINE"):
        return None
    try:
        from transformers import AutoModel, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name)
        import os
        path = os.path.join(out_dir, model_name.replace("/", "__"))
        tok.save_pretrained(path)
        model.save_pretrained(path)
        return path
    except Exception:
        return None


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


def encode_major_hierarchy(levels: Sequence[Sequence[Tuple[str, ...]]],
                           encoder: Optional[BertEncoder] = None,
                           dim: int = 768) -> List[Dict[str, np.ndarray]]:
    """[(code, name[, text])...] per level → per-level {codes, names, embs}
    (`major-encode/bert_emb.py:131-168`). When a row carries an assembled
    description text (third element — the Excel ingestion path,
    :func:`load_major_hierarchy_xlsx`), that text is encoded; otherwise the
    name is."""
    out = []
    for level in levels:
        codes = [row[0] for row in level]
        names = [row[1] for row in level]
        texts = [row[2] if len(row) > 2 and row[2] else row[1]
                 for row in level]
        embs = (_hash_embed(texts, dim) if encoder is None
                else encoder.encode(texts, pooling="mean_no_cls"))
        out.append({"codes": np.array(codes, dtype=object),
                    "names": np.array(names, dtype=object),
                    "embs": embs})
    return out


def load_major_hierarchy_xlsx(path: str) -> List[List[Tuple[str, str, str]]]:
    """3-sheet major-hierarchy workbook → [(code, name, text)...] ×3.

    Semantics of `major-encode/bert_emb.py:50-124` on sheets
    Level1/Level2/Level3 (header row skipped, rows with empty code
    dropped):
    - Level1: text = intro + "大类通识课程：" + general courses,
    - Level2: text = intro + "专业核心课程：" + core courses (one row per
      分流专业 — duplicate codes are kept),
    - Level3: text = the intro column, falling back to the name when empty.

    Implemented on the stdlib xlsx reader (`genrec_tpu.utils.xlsx`) —
    openpyxl is not required.
    """
    from genrec_tpu.utils.xlsx import Workbook

    wb = Workbook(path)
    try:
        out: List[List[Tuple[str, str, str]]] = []
        for sheet, course_label in (("Level1", "大类通识课程："),
                                    ("Level2", "专业核心课程："),
                                    ("Level3", None)):
            rows: List[Tuple[str, str, str]] = []
            for row in wb.rows(sheet)[1:]:  # skip header
                row = list(row) + [None] * (4 - len(row))
                code, name, intro, courses = row[:4]
                if code is None:
                    continue
                if course_label is None:  # Level3
                    text = str(intro).strip() if intro else str(name)
                else:
                    parts = []
                    if intro:
                        parts.append(str(intro))
                    if courses:
                        parts.append(course_label + str(courses))
                    text = " ".join(parts)
                rows.append((str(code), str(name), text))
            out.append(rows)
        return out
    finally:
        wb.close()


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
