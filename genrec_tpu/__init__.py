"""genrec_tpu — TPU-native generative-recommendation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo `CatchMan1/AI-education-generative-recommendation` (single-GPU PyTorch
research scripts), re-designed TPU-first as one engine:

- ``genrec_tpu.models``   — Flax model zoo: SASRec, RQ-VAE (+residual VQ),
  TIGER (scratch T5 enc-dec), TIGER-prefix, DenseT5 retriever.
- ``genrec_tpu.ops``      — Pallas TPU kernels + jittable compute ops:
  causal flash attention, fused/sharded embedding lookup, fixed-shape
  trie-constrained beam search, on-device negative sampling, Sinkhorn.
- ``genrec_tpu.data``     — the HDF5/NPY data contracts of the reference
  (SURVEY.md §2.6), ETL builders, synthetic generators, fixed-shape batching.
- ``genrec_tpu.parallel`` — mesh / PartitionSpec rules / row-sharded tables
  with all_to_all ID exchange (the distributed layer the reference lacks).
- ``genrec_tpu.train``    — one Trainer (jit step, optax, orbax checkpoint
  with resume, early stopping, metrics).
- ``genrec_tpu.eval``     — rank-based and beam-based evaluators with the
  reference's strict metric semantics.
- ``genrec_tpu.pipelines``— end-to-end train→eval entry points per model
  family (the equivalent of each reference ``main.py``).
- ``genrec_tpu.serving``  — FastAPI serving surface + LLM-hybrid recommender.
"""

__version__ = "0.1.0"

from genrec_tpu import configs  # noqa: F401
