"""LLM-hybrid recommender (the `Baseline/direct_rec.py` capability).

Score(candidate) = α·keyword-match + β·embedding-similarity + γ·LLM-match,
each min-max normalized over the candidate set
(`Baseline/direct_rec.py:417-477`):

- keyword match `f_mat` (`:195-203`): Σ |pos-keywords ∩ pos-history-keywords|
  − Σ |neg-keywords ∩ neg-history-keywords| over labeled history,
- embedding similarity `f_sim` (`:206-219`): max cosine to positive history
  minus max cosine to negative history — vectorized here over the whole
  candidate set as two matmuls (the reference loops per candidate),
- LLM score (`:240-269`): generated recommendation text matched to
  candidate names by embedding cosine. The LLM client is injected and
  env-configured (GENREC_LLM_API_KEY / GENREC_LLM_BASE_URL) — the
  reference hard-codes an API key at `Baseline/Rec.py:6-7`, which we
  deliberately do not reproduce.

Cold-start (`:155-192`): no history → LLM generation from profile, or the
head of the item pool without an LLM.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

LLMClient = Callable[[str, str], str]  # (user_prompt, system_prompt) -> text


@dataclasses.dataclass
class ItemCatalog:
    item_pool: List[int]
    item_names: Dict[int, str]
    item_keywords_pos: Dict[int, Set[str]]
    item_keywords_neg: Dict[int, Set[str]]
    item_content: Dict[int, str]
    item_url: Dict[int, str]
    item_embeddings: np.ndarray  # (max_id+1, D); row 0 = padding

    @classmethod
    def from_recommendation_data(cls, classes: Dict[str, np.ndarray],
                                 item_embeddings: np.ndarray) -> "ItemCatalog":
        ids = [int(i) for i in classes["class_ids"]]
        split = lambda s: {w.strip() for w in str(s).replace("，", ",").split(",")
                           if w.strip()}
        return cls(
            item_pool=ids,
            item_names={i: str(n) for i, n in zip(ids, classes["class_names"])},
            item_keywords_pos={i: split(k) for i, k in zip(ids, classes["keywords_pos"])},
            item_keywords_neg={i: split(k) for i, k in zip(ids, classes["keywords_neg"])},
            item_content={i: str(c) for i, c in zip(ids, classes.get("content", [""] * len(ids)))},
            item_url={i: str(u) for i, u in zip(ids, classes.get("url", [""] * len(ids)))},
            item_embeddings=np.asarray(item_embeddings, dtype=np.float32),
        )


def f_mat(history: Sequence[Tuple[int, int]], candidate: int,
          kw_pos: Dict[int, Set[str]], kw_neg: Dict[int, Set[str]]) -> float:
    """Keyword-match score (`Baseline/direct_rec.py:195-203`)."""
    pos_hist = [i for i, fb in history if fb == 1]
    neg_hist = [i for i, fb in history if fb == 0]
    dpos = kw_pos.get(candidate, set())
    dneg = kw_neg.get(candidate, set())
    a_pos = sum(len(dpos & kw_pos.get(i, set())) for i in pos_hist)
    a_neg = sum(len(dneg & kw_neg.get(i, set())) for i in neg_hist)
    return float(a_pos - a_neg)


def f_sim_batch(history: Sequence[Tuple[int, int]], candidates: Sequence[int],
                item_embeddings: np.ndarray) -> np.ndarray:
    """Vectorized embedding-similarity scores for all candidates at once
    (semantics of `Baseline/direct_rec.py:206-219`, two matmuls instead of
    a per-candidate Python loop)."""
    def _norm(m):
        n = np.linalg.norm(m, axis=-1, keepdims=True)
        return m / np.maximum(n, 1e-12)

    cand = _norm(item_embeddings[list(candidates)])
    pos_hist = [i for i, fb in history if fb == 1]
    neg_hist = [i for i, fb in history if fb == 0]
    beta_pos = np.zeros(len(candidates))
    beta_neg = np.zeros(len(candidates))
    if pos_hist:
        beta_pos = (cand @ _norm(item_embeddings[pos_hist]).T).max(axis=1)
    if neg_hist:
        beta_neg = (cand @ _norm(item_embeddings[neg_hist]).T).max(axis=1)
    return beta_pos - beta_neg


def normalize_scores(scores: Sequence[float]) -> List[float]:
    """Min-max normalize (`Baseline/direct_rec.py:451-459`)."""
    scores = list(scores)
    if not scores:
        return scores
    lo, hi = min(scores), max(scores)
    if hi > lo:
        return [(s - lo) / (hi - lo) for s in scores]
    return [0.0] * len(scores)


def get_user_history_labels(user_history: Sequence[int],
                            candidate_items: Sequence[int],
                            rng: Optional[random.Random] = None
                            ) -> List[Tuple[int, int]]:
    """Positive history + equally many sampled negatives
    (`Baseline/direct_rec.py:400-415`)."""
    rng = rng or random
    positives = [(i, 1) for i in user_history]
    n = len(user_history)
    negs = list(candidate_items) if len(candidate_items) < n else \
        rng.sample(list(candidate_items), n)
    return positives + [(i, 0) for i in negs]


def match_text_to_items(text: str, candidates: Sequence[int],
                        item_names: Dict[int, str],
                        text_encoder: Optional[Callable[[List[str]], np.ndarray]]
                        ) -> List[Tuple[int, float]]:
    """Cosine-match generated text to candidate names
    (`Baseline/direct_rec.py:370-398`). Without an encoder, fall back to
    token-overlap Jaccard (keeps the path dependency-free)."""
    names = [item_names.get(c, "") for c in candidates]
    if text_encoder is not None:
        vecs = text_encoder([text] + names)
        q, m = vecs[0:1], vecs[1:]
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = (m @ q.T)[:, 0]
        return list(zip(candidates, sims.tolist()))
    t = set(text.lower().split())
    out = []
    for c, name in zip(candidates, names):
        w = set(str(name).lower().split())
        out.append((c, len(t & w) / max(len(t | w), 1)))
    return out


def make_env_llm_client() -> Optional[LLMClient]:
    """LLM chat client from env config; None when unset.

    Supports the reference's dual endpoint formats
    (`Baseline/direct_rec.py:271-368`): OpenAI-compatible
    ``/chat/completions`` (default) and DashScope-native generation
    (``GENREC_LLM_API_FORMAT=dashscope`` or a dashscope base URL),
    whose response carries ``output.text`` / ``output.choices``.
    """
    api_key = os.environ.get("GENREC_LLM_API_KEY")
    base_url = os.environ.get("GENREC_LLM_BASE_URL")
    model = os.environ.get("GENREC_LLM_MODEL", "qwen-plus")
    fmt = os.environ.get("GENREC_LLM_API_FORMAT",
                         "dashscope" if base_url and "dashscope" in base_url
                         else "openai")
    if not api_key or not base_url:
        return None

    def client(user_prompt: str, system_prompt: str) -> str:
        import json
        import urllib.request
        messages = [{"role": "system", "content": system_prompt},
                    {"role": "user", "content": user_prompt}]
        if fmt == "dashscope":
            url = (base_url.rstrip("/") +
                   "/services/aigc/text-generation/generation")
            payload = {"model": model, "input": {"messages": messages},
                       "parameters": {"result_format": "message"}}
        else:
            url = base_url.rstrip("/") + "/chat/completions"
            payload = {"model": model, "messages": messages}
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Authorization": f"Bearer {api_key}",
                     "Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        if fmt == "dashscope":
            out = body.get("output", {})
            if out.get("choices"):
                return out["choices"][0]["message"]["content"]
            return out.get("text", "")
        return body["choices"][0]["message"]["content"]

    return client


@dataclasses.dataclass
class HybridRecommender:
    """The `recommender(userid, topk)` capability
    (`Baseline/direct_rec.py:108-192`)."""

    catalog: ItemCatalog
    llm_client: Optional[LLMClient] = None
    text_encoder: Optional[Callable[[List[str]], np.ndarray]] = None
    alpha: float = 0.1
    beta: float = 0.2
    gamma: float = 0.7
    seed: Optional[int] = None

    def recommend_top_k(self, user_history: Sequence[int], user_profile: str,
                        k: int = 10) -> List[Dict[str, str]]:
        cat = self.catalog
        candidates = [i for i in cat.item_pool if i not in set(user_history)]
        if not candidates:
            return []
        rng = random.Random(self.seed) if self.seed is not None else random
        labels = get_user_history_labels(user_history, candidates, rng)

        mat = [f_mat(labels, c, cat.item_keywords_pos, cat.item_keywords_neg)
               for c in candidates]
        sim = f_sim_batch(labels, candidates, cat.item_embeddings).tolist()

        alpha, beta, gamma = self.alpha, self.beta, self.gamma
        if self.llm_client is not None:
            text = self._llm_generate(user_history, user_profile, k)
            llm = [s for _, s in match_text_to_items(
                text, candidates, cat.item_names, self.text_encoder)]
        else:
            # no LLM configured: reweight to keyword+embedding only, the
            # `use_llm=False` mode of `Baseline/evaluation.py:54-62`
            llm = [0.0] * len(candidates)
            alpha, beta, gamma = 0.5, 0.5, 0.0

        total = [alpha * m + beta * s + gamma * l for m, s, l in
                 zip(normalize_scores(mat), normalize_scores(sim),
                     normalize_scores(llm))]
        order = sorted(zip(candidates, total), key=lambda x: x[1], reverse=True)
        return [{"item_id": c, "name": cat.item_names.get(c, f"course_{c}"),
                 "url": cat.item_url.get(c, ""), "score": float(s)}
                for c, s in order[:k]]

    def recommend(self, user_history: Sequence[int], user_profile: str,
                  k: int = 10) -> List[Dict[str, str]]:
        """History → hybrid path; empty history → cold start
        (`Baseline/direct_rec.py:143-192`)."""
        if user_history:
            return self.recommend_top_k(user_history, user_profile, k)
        cat = self.catalog
        if self.llm_client is not None and user_profile:
            text = self.llm_client(
                f"## 新用户信息\n专业/兴趣: {user_profile}\n请生成推荐内容：",
                SYSTEM_PROMPT_COLD_START)
            sims = match_text_to_items(text, cat.item_pool, cat.item_names,
                                       self.text_encoder)
            sims.sort(key=lambda x: x[1], reverse=True)
            picks = [c for c, _ in sims[:k]]
        else:
            picks = cat.item_pool[:k]
        return [{"item_id": c, "name": cat.item_names.get(c, f"course_{c}"),
                 "url": cat.item_url.get(c, ""), "score": 0.0} for c in picks]

    def _llm_generate(self, user_history, user_profile, k) -> str:
        names = [self.catalog.item_names.get(i, "") for i in user_history]
        pos = "\n".join(f"  - {n}" for n in names) or "  - 无相关历史记录"
        prompt = (f"## 学生信息\n### 用户画像\n{user_profile or '暂无'}\n"
                  f"### 历史学习偏好\n{pos}\n请推荐 {k} 个合适的学习资源。")
        return self.llm_client(prompt, SYSTEM_PROMPT_REGULAR.format(k=k))


SYSTEM_PROMPT_REGULAR = (
    "You are an education-course recommendation assistant. Given a "
    "student's profile and liked resources, recommend {k} suitable "
    "learning resources by name, one per line."
)
SYSTEM_PROMPT_COLD_START = (
    "You are an education-course recommendation assistant. The student has "
    "no interaction history; recommend suitable starter courses from their "
    "major and interests, one per line."
)
