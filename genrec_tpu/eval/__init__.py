"""Evaluators: rank-based (SASRec/DenseT5) and beam-based (TIGER)."""

from genrec_tpu.eval.evaluator import rank_evaluate, beam_evaluate  # noqa: F401
