"""Typed configuration dataclasses for every pipeline.

Replaces the literal Python param dicts of the reference
(`SASRec/main.py:6-42`, `RQ-VAE/main.py:6-36`, `RQVAE-T5/main.py:4-35`,
`RQVAE-T5-prefix/main.py:4-43`, `T5/main.py:5-38`) with frozen dataclasses.
Defaults reproduce the reference configurations exactly so that quality
parity runs need no overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map.

    The reference has no parallelism at all (SURVEY.md §2.5); this is the
    added TPU-native distributed layer. ``data`` × ``model`` must divide the
    device count; axes of size 1 are allowed.
    """

    data_axis: int = -1  # -1 → all devices on the data axis
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Shared trainer knobs (one Trainer serves every pipeline)."""

    batch_size: int = 128
    eval_batch_size: int = 128
    epochs: int = 100
    lr: float = 1e-3
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 0.0
    optimizer: str = "adam"  # adam | adamw | sgd | adagrad | rmsprop
    lr_scheduler: str = "constant"  # constant | linear
    warmup_epochs: int = 0
    grad_clip_norm: Optional[float] = None
    early_stop_patience: int = 10
    seed: int = 42
    ckpt_dir: str = "./ckpt"
    log_path: Optional[str] = None
    loss_plot_path: Optional[str] = None
    results_csv_path: Optional[str] = None
    resume: bool = False  # restore params+opt+step from latest checkpoint
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 on TPU for the large configs
    keep_checkpoints: int = 5  # bounded retention (RQ-VAE/train.py:230-246)
    # save the resumable latest-state checkpoint every N epochs (best-val
    # checkpoints are unaffected — still saved on every improvement). The
    # full-state save ships params+opt over the tunneled device link; at
    # 19.6M params it costs ~3 s/epoch, which dominated short DenseT5 runs
    # (ckpt 112 s vs train 42 s in the r4 e30 grid logs). Raising this
    # trades resume granularity for wall clock.
    ckpt_every_epochs: int = 1
    # length-bucketed epochs: split each bucket's step sequence into up to
    # this many chunks and shuffle the chunks across buckets per epoch —
    # contiguous whole-bucket visits are a length-correlated ordering that
    # measurably costs quality (artifacts/bucket_quality_r4.json)
    bucket_interleave_chunks: int = 4
    # when set, Trainer.fit captures ONE jax.profiler trace of the second
    # (post-compile) training epoch into this directory
    profile_dir: Optional[str] = None
    # Dataset placement mode. None = auto: shard the device-resident
    # datasets along the mesh 'data' axis whenever jax.process_count() > 1
    # (each host then holds only its slice; batches gather device-locally
    # via shard_map — no cross-device traffic). True forces the sharded
    # path on one process (used to prove 1-process == 2-process bitwise);
    # False forces the replicated path (every device holds the full
    # dataset, single-process default).
    shard_dataset: Optional[bool] = None
    # COMPOSITE width mode (Trainer composite_widths): fraction of each
    # width group's batch slots filled with RANDOM shorter rows. 0.5 =
    # half native-width rows, half shorter filler — restores the
    # mixed-length batch composition whose absence cost per-bucket
    # epochs 1.2–2.4% Recall@10 (bucket_quality_r4_interleaved.json),
    # at a bounded padding cost (filler pads up to the group width, not
    # the corpus max). Measured result: see
    # TIGERConfig.target_len_composite (negative at parity scale).
    composite_mix: float = 0.5


@dataclasses.dataclass(frozen=True)
class SASRecConfig:
    """SASRec self-attentive ranker. Mirrors `SASRec/main.py:6-42`."""

    task_id: str = "task1"
    data_path: str = "data/user_item_interact.h5"
    max_len: int = 20
    d: int = 16
    num_blocks: int = 2
    num_heads: int = 1
    mlp_layer: int = 64
    dropout: float = 0.2
    layernorm_eps: float = 1e-8
    num_neg_samples: int = 10
    loss_eps: float = 1e-24
    min_seq_len: int = 3
    topk_list: Tuple[int, ...] = (2, 5, 10, 20)
    top_k: int = 10  # reference reads params['top_k'] in evaluate.py:45 (absent
    # from its main.py — a latent KeyError); we give it the intended default.
    emb_init_stddev: Optional[float] = None  # None → 1/√d (flax-idiomatic);
    # 1.0 reproduces torch nn.Embedding N(0,1) (`SASRec/model.py:18-19`) —
    # at d=16 the init scale decides where the val-BCE hump bottoms out and
    # therefore what the reference's early-stop protocol selects, so the
    # parity harness sets 1.0 to follow the reference's trajectory.
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(batch_size=128, eval_batch_size=128,
                                              epochs=100, lr=1e-3)
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


@dataclasses.dataclass(frozen=True)
class RQVAEConfig:
    """RQ-VAE residual-quantization tokenizer. Mirrors `RQ-VAE/main.py:6-36`."""

    data_path: str = "data/course_item_embs.h5"
    ckpt_dir: str = "./ckpt/course"
    semantic_id_file: str = "data/course/course_rqvae_codes.npy"
    in_dim: int = 768
    num_emb_list: Tuple[int, ...] = (8, 8, 8)
    e_dim: int = 32
    layers: Tuple[int, ...] = (256, 128)
    dropout: float = 0.1
    loss_type: str = "mse"  # mse | l1
    quant_loss_weight: float = 0.1
    beta: float = 0.25
    kmeans_init: bool = True
    kmeans_iters: int = 50
    sk_epsilons: Tuple[float, ...] = (0.01, 0.01, 0.01)
    sk_iters: int = 50
    collision_repair_iters: int = 30  # RQ-VAE/infer.py:108-130
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(
            batch_size=64, epochs=100, lr=1e-3, optimizer="adamw",
            weight_decay=1e-4, lr_scheduler="linear", warmup_epochs=5,
            grad_clip_norm=1.0, seed=2024,
        )
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


@dataclasses.dataclass(frozen=True)
class T5ArchConfig:
    """Scratch T5 architecture knobs shared by TIGER / TIGER-prefix / DenseT5.

    Semantics follow HF `T5Config` as instantiated at `RQVAE-T5/model.py:9-23`:
    relative position biases, RMS layer norm, relu feed-forward, tied
    embeddings with d_model**-0.5 logit scaling.
    """

    vocab_size: int = 64
    num_layers: int = 2          # encoder layers
    num_decoder_layers: int = 2
    d_model: int = 64
    d_ff: int = 256
    num_heads: int = 4
    d_kv: int = 16
    dropout_rate: float = 0.1
    feed_forward_proj: str = "relu"
    layer_norm_epsilon: float = 1e-6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    pad_token_id: int = 0
    eos_token_id: int = 31  # reference wart: overlaps level-3 code range
    # (check_data_alignment.py:103-135); kept for parity, overridable.
    decoder_start_token_id: int = 0  # = pad (RQVAE-T5/model.py:22)
    tie_word_embeddings: bool = True
    # fused Pallas training attention (ops/t5_attention.py): "auto" uses it
    # for DROPOUT-FREE training steps on TPU backends (the gate in
    # models/t5.py `_fused` enforces dropout_rate == 0), "on" forces it
    # everywhere incl. CPU interpret mode (tests), "off" keeps the explicit
    # XLA composition. Default off: compiled-on-chip exact everywhere, but
    # the perf story is shape-dependent
    # (artifacts/t5_attention_validate.json): at the parity shape (d64/H4)
    # it is NEUTRAL without dropout (11.59 vs 11.55 ms/step); at d256/H8 it
    # WINS 8% without dropout (6.52 vs 7.07). RETIRED for dropout configs
    # (2026-08-21): every measured mask-generation variant loses to XLA's
    # inline dropout — bernoulli-on-given-key 15.87, u8-compare 16.01,
    # threefry-converted 17.63 vs XLA 12.86 ms/step at parity
    # (artifacts/dropout_mask_exp_r4.json) — because this toolchain's
    # Mosaic has no in-kernel PRNG lowering, the mask must be materialized
    # in HBM, and even a zero-cost mask would only tie XLA. Rule: enable
    # for dropout-free TPU training; "auto" (the default since r5)
    # implements exactly that — neutral at d64 (11.59 vs 11.55 ms/step),
    # +8% at d256+, and it never engages for dropout configs, eval, or
    # CPU backends, so parity paths are unchanged.
    fused_attention: str = "auto"
    dtype: str = "float32"  # computation dtype: float32 | bfloat16 (params
    # stay float32; norms/softmax/logits accumulate in float32 either way)
    remat: bool = False  # rematerialize each block's activations in the
    # backward pass (jax.checkpoint) — trades ~1/3 more FLOPs for O(layers)
    # less activation HBM; for the scaled/long-context configs, not parity
    # NARROW remat of just the dropout-attention core (logits→softmax→
    # mask→·V): backward recomputes the score-shaped tensors and
    # REGENERATES the dropout mask from its key instead of storing
    # probs + mask residuals in HBM. MEASURED NEGATIVE at parity d64
    # (artifacts/step_opt_r5.json, 2026-08-21): the recomputed logits/
    # probs rematerialize in HBM during backward, so bytes RISE
    # 4.8→6.0 GB/step and the step slows 13.5→16.7 ms — same failure
    # mode as whole-block remat (remat_exp_r4.json). Kept as a flag
    # because the trade flips when scores stop fitting alongside
    # activations (long-context / larger L), with the measurement to
    # re-run first.
    attn_remat_dropout: bool = False
    # same trade for the FFN relu→dropout core: bytes −3.5% but
    # ms +2% at parity (step_opt_r5.json) — also off by default
    ffn_remat_dropout: bool = False


@dataclasses.dataclass(frozen=True)
class TIGERConfig:
    """TIGER generative retriever. Mirrors `RQVAE-T5/main.py:4-35`."""

    task_id: str = "task1"
    code_path: str = "data/course/course_rqvae_codes.npy"
    train_dataset_path: str = "data/tiger/train_dataset.h5"
    test_dataset_path: str = "data/tiger/test_dataset.h5"
    arch: T5ArchConfig = dataclasses.field(default_factory=T5ArchConfig)
    codebook_size: int = 8
    code_dim: int = 4  # 3 RQ levels + 1 collision-disambiguation digit
    max_len: int = 20  # history length in items → 80 input tokens
    max_gen_len: int = 5  # decoder_start + 4 code tokens (RQVAE-T5/model.py:76)
    beam_size: int = 5
    topk_list: Tuple[int, ...] = (2, 5, 10, 20)
    # >1 partitions the train split into target-length buckets (quantile
    # boundaries) so short-target batches skip the corpus-max decoder
    # padding — the static-shape equivalent of the reference collate's
    # pad-to-batch-max (`RQVAE-T5/data_vision.py`). 1 = single shape.
    target_len_buckets: int = 1
    constrained_decoding: str = "level"  # none | level | trie
    # "none"  = reference parity (unconstrained beam, RQVAE-T5/model.py:62-81)
    # "level" = per-step level-range token masks
    # "trie"  = full prefix-trie over the actual item codes (improvement)
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(batch_size=256, eval_batch_size=256,
                                              epochs=500, lr=1e-3)
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # >1 enables COMPOSITE width mode instead of buckets: the train split
    # stays one flat array; each epoch assigns rows to N static batch
    # widths with `trainer.composite_mix` of every width group drawn from
    # shorter rows — mixed-length batches (the per-bucket quality gap) at
    # a bounded padding cost. Mutually exclusive with target_len_buckets.
    # MEASURED at parity scale (artifacts/composite_quality_r5.json,
    # n=3 × 2 corpora): quality-inconsistent (+0.7% / −6.4% R@10 vs
    # same-session flat controls) and SLOWER than flat (10.9K vs
    # 12.7–13.3K ex/s — filler tokens + per-width tails outweigh the
    # width savings at ~2K-row corpora). Flat stays the default.
    target_len_composite: int = 0


@dataclasses.dataclass(frozen=True)
class TIGERPrefixConfig:
    """Prefix-conditioned TIGER. Mirrors `RQVAE-T5-prefix/main.py:4-43`."""

    task_id: str = "task1"
    code_path: str = "data/course/course_rqvae_codes.npy"
    train_dataset_path: str = "data/tiger/train_dataset.h5"
    test_dataset_path: str = "data/tiger/test_dataset.h5"
    prof_lvl_paths: Tuple[str, str, str] = (
        "data/prof_lvl1.h5", "data/prof_lvl2.h5", "data/prof_lvl3.h5",
    )
    arch: T5ArchConfig = dataclasses.field(
        default_factory=lambda: T5ArchConfig(
            d_model=128, num_decoder_layers=4, num_heads=8, d_kv=16, d_ff=256,
        )
    )
    bert_dim: int = 768
    num_prof_vectors: int = 5  # top-5 majors per level (prof_lvl*.h5 contract)
    codebook_size: int = 8
    code_dim: int = 4
    max_len: int = 20
    max_gen_len: int = 5
    beam_size: int = 5
    topk_list: Tuple[int, ...] = (2, 5, 10, 20)
    constrained_decoding: str = "level"
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(batch_size=256, eval_batch_size=256,
                                              epochs=500, lr=1e-3)
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


@dataclasses.dataclass(frozen=True)
class DenseT5Config:
    """Dense-retrieval T5 encoder. Mirrors `T5/main.py:5-38`.

    num_layers=6, NOT the param dict's 2: the reference's model builder
    (`T5/model.py:9-16`) constructs ``T5Config(d_model, d_ff, num_heads,
    d_kv, dropout_rate)`` and never forwards ``params['num_layers']``, so
    the HF default ``num_layers=6`` silently applies — the model the
    reference actually trains is 6-layer (its own log reports 19,603,328
    params = 16,449,536 dead default 32128-vocab embedding + 3,153,792
    non-embedding; 6 blocks at d512/d_ff256/H4/d_kv16 = 2.37M plus the
    768↔512 in/out projections 0.79M reproduces that exactly, while 2
    blocks would give ~1.58M + 0.79M). We default to the
    reference's *effective* architecture so head-to-heads are
    like-for-like; the param dict's stated intent (2 layers) is available
    by overriding ``arch``.
    """

    task_id: str = "task1"
    rec_path: str = "data/user_item_interact.h5"
    item_emb_h5_path: str = "data/course_item_embs.h5"
    user_emb_h5_path: str = "data/user_profile_embs.h5"
    arch: T5ArchConfig = dataclasses.field(
        default_factory=lambda: T5ArchConfig(
            d_model=512, num_layers=6, num_heads=4, d_kv=16, d_ff=256,
            dropout_rate=0.3,
        )
    )
    input_emb_dim: int = 768
    target_emb_dim: int = 768
    temperature: float = 0.07
    max_seq_len: int = 20
    topk_list: Tuple[int, ...] = (2, 5, 10, 20)
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(batch_size=256, eval_batch_size=256,
                                              epochs=100, lr=1e-3)
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


@dataclasses.dataclass(frozen=True)
class ShardedEmbeddingConfig:
    """Row-sharded embedding/codebook tables over the mesh 'model' axis.

    The scaled-synthetic north-star path (BASELINE.json config 5): 10M-item
    tables with all_to_all ID-partition exchange. Not present in the
    reference (it keeps full nn.Embedding per device, SASRec/model.py:18).
    """

    vocab_size: int = 10_000_000
    dim: int = 64
    ids_per_device_capacity: int = 8192  # fixed all_to_all bucket capacity
    dtype: str = "float32"

    def preferred_lookup(self, capacity_factor: float = 2.0) -> str:
        """Measured byte-crossover rule (artifacts/lookup_comms_r3.json):
        per device, psum moves ≈2·(M−1)/M·n·D floats (ring all-reduce of
        the assembled rows), a2a ≈(M−1)/M·c·n·(D+1) (c·n id slots out +
        c·n rows back) — a2a wins bytes iff the capacity factor
        c < 2·D/(D+1); at the default c=2 it is a wash and psum's
        simplicity wins."""
        return ("alltoall"
                if capacity_factor < 2.0 * self.dim / (self.dim + 1.0)
                else "psum")


@dataclasses.dataclass(frozen=True)
class SASRecLargeConfig:
    """SASRec tower over a row-sharded item table (north-star config 5).

    Departures from :class:`SASRecConfig` (see
    `genrec_tpu/models/sasrec_large.py` module docstring): the (V+1, dim)
    item table is sharded ``P('model', None)`` and training uses sampled
    BCE instead of the (B, n, V) full-vocab score matrix of
    `SASRec/train.py:131-137`, which does not exist at 10M items.
    """

    max_len: int = 20
    num_blocks: int = 2
    num_heads: int = 2
    mlp_layer: int = 256
    dropout: float = 0.2
    layernorm_eps: float = 1e-8
    num_neg_samples: int = 64
    loss_eps: float = 1e-24
    topk_list: Tuple[int, ...] = (10, 100)
    # long-context: name of the mesh axis the sequence dimension is sharded
    # over; attention then runs as an exact ppermute ring
    # (`models/sasrec_large.py` ``ctx_axis`` / `ops/ring_attention.py`).
    # None = single-chip attention (the flash kernel takes over at L≥512
    # via the `ops/attention._use_pallas` gate).
    context_parallel_axis: Optional[str] = None
    embedding: ShardedEmbeddingConfig = dataclasses.field(
        default_factory=ShardedEmbeddingConfig)
    trainer: TrainerConfig = dataclasses.field(
        default_factory=lambda: TrainerConfig(batch_size=4096, lr=1e-3))
    mesh: MeshConfig = dataclasses.field(
        default_factory=lambda: MeshConfig(data_axis=-1, model_axis=2))


def long_context_sasrec_config(max_len: int = 2048,
                               dim: int = 64) -> SASRecLargeConfig:
    """The runnable context-parallel configuration (SURVEY §2.5 SP/CP row):
    2048-item histories train with the sequence axis sharded over a 'ctx'
    mesh axis (ring attention across devices) or, single-chip, through the
    blockwise flash kernel. Exercised by `tests/test_long_context.py` and
    `scripts/r4_ring_config.py` (artifacts/ring_cp_r4.json)."""
    return SASRecLargeConfig(
        max_len=max_len, num_blocks=2, num_heads=4, mlp_layer=4 * dim,
        dropout=0.2, num_neg_samples=64, context_parallel_axis="ctx",
        embedding=ShardedEmbeddingConfig(vocab_size=65536, dim=dim),
        trainer=TrainerConfig(batch_size=32, lr=1e-3))


def replace(cfg, **kw):
    """Functional config override: `replace(SASRecConfig(), d=64)`."""
    return dataclasses.replace(cfg, **kw)
