"""Fused short-sequence T5 training attention (Pallas TPU kernel, fwd+bwd).

Why this kernel exists: the T5 towers train at Lq/Lk ≤ a few hundred
tokens, where XLA's autodiff materializes every (B, H, Lq, Lk) tensor in
HBM — logits, probs, the attention-dropout mask (plus a layout-fixing
copy of its 62 MB of u32 random bits), dprobs and dlogits. A device-level
xprof breakdown of the TIGER parity train step (B=256, Lt=156; see
`scripts/profile_tiger_step.py`) shows those HBM-bound score-shaped ops
owning the majority of the 12.5 ms step. At these lengths the whole
(Lq, Lk) score tile for a block of batch rows fits VMEM, so instead of
the long-sequence blockwise/online-softmax design (`ops/attention.py`,
which stays the right shape for L ≥ 512) this kernel:

- computes logits = q·kᵀ (unscaled — T5 convention, `RQVAE-T5/model.py`
  via HF T5Attention), adds the learned relative-position bias (with the
  causal mask pre-folded into it XLA-side — in-kernel causal `where`
  hangs this toolchain's Mosaic), softmaxes, applies attention dropout,
  and hits v — all in VMEM; only q, k, v, out and (when training) a
  bf16 dropout mask ever touch HBM;
- folds the key-padding mask into the score matmul itself: q and k are
  augmented with one extra feature column (q_aug[..., D] = 1,
  k_aug[..., D] = (1 − mask)·(−1e9)), so q_aug·k_augᵀ = q·kᵀ + additive
  mask EXACTLY, with zero extra kernel cost (D pads to the 128-lane tile
  either way) and no batch-row broadcast inside the kernel — the
  middle-dim (bb, 1, Lk) → (bb, Lq, Lk) broadcast SIGABRTs this
  toolchain's Mosaic lowering;
- recomputes the probabilities in the backward kernel (scores are cheap,
  the MXU is idle at these sizes) and re-reads the same bf16
  multiplicative dropout mask, so no probability tensor is ever stored.
  (In-kernel Mosaic PRNG would avoid storing even the mask, but
  `prng_seed`/`prng_random_bits` have no lowering in this toolchain's
  remote compile helper, and u8 compares don't lower either — hence a
  {0, 1/keep} bf16 mask the kernel just multiplies, half the size of the
  XLA path's u32 bits with none of its layout-fixing copies.);
- accumulates dbias (the learned rel-pos table's gradient) across the
  batch grid in VMEM, emitting one (H, Lq, Lk) tensor.

Grid layout: (H, B/bb) with the batch dimension innermost and all arrays
flattened to (H·B, L, D) — clean 3D blocks (interior singleton dims also
trip the lowering), and the per-head (Lq, Lk) bias block keeps a constant
index across the inner loop, so it is fetched from HBM once per head.

Numerical semantics match `genrec_tpu/models/t5.py` T5Attention's
explicit-probs training path exactly (f32 logits/softmax, ADDITIVE −1e9
masks, probs cast to v.dtype for the value matmul) except dropout's bit
stream: flax `nn.Dropout` draws threefry bits, :func:`make_dropout_mask`
draws its own — same Bernoulli(1-rate) family, different stream, the
usual freedom taken by fused-dropout kernels. Perf status and the
shape-dependent enablement rule live on `T5ArchConfig.fused_attention`
(measured: artifacts/t5_attention_validate.json).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches models/t5.py masking constant


def make_dropout_mask(rng_key, hb, lq, lk, rate, dtype=jnp.bfloat16):
    """Multiplicative inverted-dropout mask for the flat (H·B, Lq, Lk)
    layout: values ∈ {0, 1/(1−rate)} — the kernel just multiplies, which
    keeps the in-kernel op set to what Mosaic certainly lowers (the u8
    compare variant does not compile on this toolchain). bf16 halves the
    HBM traffic; the {0, scale} values are exactly representable.

    Generation-variant results (2026-08-21,
    artifacts/dropout_mask_exp_r4.json; TIGER parity step, all three mask
    shapes): in ISOLATION threefry-keyed u8-compare generation is ~5×
    faster than bernoulli on the trainer's rbg keys (0.61 vs 2.92 ms), but
    IN the compiled train step the ordering inverts — fused step with
    bernoulli-on-given-(rbg)-key 15.87 ms vs u8-compare-on-given-key
    16.01 vs threefry-converted-u8 17.63, all against XLA's
    inline-dropout 12.86 — XLA overlaps the rbg generation with
    surrounding compute, and the key-impl conversion defeats that. So
    this stays the simple bernoulli form, and since even a ZERO-cost mask
    would leave the fused+dropout step ≈ tied with XLA's inline-dropout
    path (fused nodrop 11.6 ms + ~0.9 ms unavoidable mask write+2×read vs
    XLA 12.9 ms), the fused kernel is RETIRED for dropout configs
    instead: `fused_attention="auto"` gates on dropout_rate == 0
    (models/t5.py `_fused`).
    """
    keep = jax.random.bernoulli(rng_key, 1.0 - rate, (hb, lq, lk))
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(dtype)


def _scores(q, k, pos_bias_ref, causal):
    """(bb, Lq, Lk) f32 logits; bias/causal are ADDITIVE −1e9 terms to
    match the model's `_causal_bias + _extend_mask` sum bit-for-bit (the
    key-padding mask rides in the augmented feature column of q/k)."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if pos_bias_ref is not None:
        s = s + pos_bias_ref[0].astype(jnp.float32)[None]
    lq, lk = s.shape[1], s.shape[2]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        s = s + jnp.where((col > row + (lk - lq))[None], _NEG_INF, 0.0)
    return s


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)


def _fwd_kernel(q_ref, k_ref, v_ref, pos_bias_ref, dmask_ref, o_ref, *,
                causal: bool, rate: float):
    q = q_ref[...].astype(jnp.float32)             # (bb, Lq, Dqk)
    k = k_ref[...].astype(jnp.float32)             # (bb, Lk, Dqk)
    p = _softmax(_scores(q, k, pos_bias_ref, causal))
    if rate > 0.0:
        p = p * dmask_ref[...].astype(jnp.float32)
    v = v_ref[...]                                  # (bb, Lk, D)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, pos_bias_ref, dmask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, causal: bool,
                rate: float):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    p = _softmax(_scores(q, k, pos_bias_ref, causal))
    dpd = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        # the forward's exact multiplicative mask, re-read from HBM
        dm = dmask_ref[...].astype(jnp.float32)
        dp = dpd * dm
        pd = p * dm
    else:
        dp, pd = dpd, p
    # softmax jacobian (w.r.t. pre-dropout probs p)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(pd, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)
    if dbias_ref is not None:
        @pl.when(pl.program_id(1) == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        dbias_ref[...] += jnp.sum(ds, axis=0)[None]


def _hbld(x):
    """(B, H, L, D) → (H*B, L, D), head dim slowest."""
    b, h, l, d = x.shape
    return x.transpose(1, 0, 2, 3).reshape(h * b, l, d)


def _hbld_inv(x, b, h):
    hb, l, d = x.shape
    return x.reshape(h, b, l, d).transpose(1, 0, 2, 3)


def _augment_flat(qf, kf, kv_mask, h):
    """Fold the (B, Lk) key-padding mask into an extra feature column so
    the score matmul itself applies the additive mask (see module doc).
    Operates on the flat (H·B, L, D) layout."""
    if kv_mask is None:
        return qf, kf
    hb, lq, d = qf.shape
    lk = kf.shape[1]
    b = hb // h
    mcol = ((1.0 - kv_mask.astype(jnp.float32)) * _NEG_INF).astype(kf.dtype)
    mcol = jnp.broadcast_to(mcol[None], (h, b, lk)).reshape(hb, lk, 1)
    k_aug = jnp.concatenate([kf, mcol], axis=-1)
    q_aug = jnp.concatenate([qf, jnp.ones((hb, lq, 1), qf.dtype)], axis=-1)
    return q_aug, k_aug


def _blk(bb, l, d, nb):
    return pl.BlockSpec((bb, l, d), lambda hh, i: (hh * nb + i, 0, 0),
                        memory_space=pltpu.VMEM)


def _aux_specs(with_bias, with_drop, lq, lk, bb, nb):
    specs = []
    if with_bias:
        specs.append(pl.BlockSpec((1, lq, lk), lambda hh, i: (hh, 0, 0),
                                  memory_space=pltpu.VMEM))
    if with_drop:
        specs.append(_blk(bb, lq, lk, nb))
    return specs


def _wrap_fwd(kernel, with_bias, with_drop):
    def wrapped(*refs):
        it = iter(refs)
        q, k, v = next(it), next(it), next(it)
        bias = next(it) if with_bias else None
        dmask = next(it) if with_drop else None
        o = next(it)
        kernel(q, k, v, bias, dmask, o)
    return wrapped


def _wrap_bwd(kernel, with_bias, with_drop):
    def wrapped(*refs):
        it = iter(refs)
        q, k, v = next(it), next(it), next(it)
        bias = next(it) if with_bias else None
        dmask = next(it) if with_drop else None
        do = next(it)
        dq, dk, dv = next(it), next(it), next(it)
        dbias = next(it) if with_bias else None
        kernel(q, k, v, bias, dmask, do, dq, dk, dv, dbias)
    return wrapped


def _fwd_call(qf, kf, vf, pos_bias, kv_mask, dmask, h, causal, rate, bb,
              interpret):
    """All tensor args in the flat (H·B, L, D) layout (dmask: (H·B, Lq,
    Lk) bf16) — the module produces projections directly in this layout,
    so the kernel adds ZERO transposes over the baseline path."""
    hb, lq, d = qf.shape
    lk = kf.shape[1]
    b = hb // h
    with_bias = pos_bias is not None
    with_drop = rate > 0.0
    qa, ka = _augment_flat(qf, kf, kv_mask, h)
    dqk = qa.shape[-1]
    nb = b // bb
    in_specs = [_blk(bb, lq, dqk, nb), _blk(bb, lk, dqk, nb),
                _blk(bb, lk, d, nb)] + _aux_specs(with_bias, with_drop,
                                                  lq, lk, bb, nb)
    args = [qa, ka, vf]
    if with_bias:
        args.append(pos_bias.astype(jnp.float32))
    if with_drop:
        args.append(dmask)
    return pl.pallas_call(
        _wrap_fwd(functools.partial(_fwd_kernel, causal=causal, rate=rate),
                  with_bias, with_drop),
        grid=(h, nb),
        in_specs=in_specs,
        out_specs=_blk(bb, lq, d, nb),
        out_shape=jax.ShapeDtypeStruct((hb, lq, d), qf.dtype),
        interpret=interpret,
    )(*args)


def _bwd_call(qf, kf, vf, pos_bias, kv_mask, dmask, do, h, causal, rate,
              bb, interpret):
    hb, lq, d = qf.shape
    lk = kf.shape[1]
    b = hb // h
    with_bias = pos_bias is not None
    with_drop = rate > 0.0
    qa, ka = _augment_flat(qf, kf, kv_mask, h)
    dqk = qa.shape[-1]
    nb = b // bb
    in_specs = [_blk(bb, lq, dqk, nb), _blk(bb, lk, dqk, nb),
                _blk(bb, lk, d, nb)] + _aux_specs(with_bias, with_drop,
                                                  lq, lk, bb, nb)
    in_specs.append(_blk(bb, lq, d, nb))  # do
    out_specs = [_blk(bb, lq, dqk, nb), _blk(bb, lk, dqk, nb),
                 _blk(bb, lk, d, nb)]
    out_shape = [jax.ShapeDtypeStruct((hb, lq, dqk), qf.dtype),
                 jax.ShapeDtypeStruct((hb, lk, dqk), kf.dtype),
                 jax.ShapeDtypeStruct((hb, lk, d), vf.dtype)]
    if with_bias:
        out_specs.append(pl.BlockSpec((1, lq, lk), lambda hh, i: (hh, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((h, lq, lk), jnp.float32))
    args = [qa, ka, vf]
    if with_bias:
        args.append(pos_bias.astype(jnp.float32))
    if with_drop:
        args.append(dmask)
    args.append(do)
    outs = pl.pallas_call(
        _wrap_bwd(functools.partial(_bwd_kernel, causal=causal, rate=rate),
                  with_bias, with_drop),
        grid=(h, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if with_bias:
        dq, dk, dv, dbias = outs
    else:
        dq, dk, dv = outs
        dbias = None
    # drop the augmented mask column's cotangent (the mask has no grad;
    # q_aug's constant-1 column likewise)
    return dq[..., :d], dk[..., :d], dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused(qf, kf, vf, pos_bias, kv_mask, dmask, h, causal, rate, bb,
           interpret):
    return _fwd_call(qf, kf, vf, pos_bias, kv_mask, dmask, h, causal, rate,
                     bb, interpret)


def _fused_fwd(qf, kf, vf, pos_bias, kv_mask, dmask, h, causal, rate, bb,
               interpret):
    out = _fwd_call(qf, kf, vf, pos_bias, kv_mask, dmask, h, causal, rate,
                    bb, interpret)
    return out, (qf, kf, vf, pos_bias, kv_mask, dmask)


def _fused_bwd(h, causal, rate, bb, interpret, res, do):
    qf, kf, vf, pos_bias, kv_mask, dmask = res
    dq, dk, dv, dbias = _bwd_call(qf, kf, vf, pos_bias, kv_mask, dmask, do,
                                  h, causal, rate, bb, interpret)
    return dq, dk, dv, dbias, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def pick_batch_block(b: int, max_bb: int = 8) -> Optional[int]:
    for bb in range(min(max_bb, b), 0, -1):
        if b % bb == 0:
            return bb
    return None


def fused_t5_attention_flat(qf, kf, vf, h, pos_bias=None, kv_mask=None, *,
                            causal: bool = False, dropout_rate: float = 0.0,
                            dropout_mask=None,
                            batch_block: Optional[int] = None,
                            interpret: bool = False):
    """Flat-layout entry: qf/kf/vf (H·B, L, D) with the head dim slowest
    (produce projections directly in this layout — it costs the same one
    transpose as the classic split-heads, so the kernel adds none).
    dropout_mask: (H·B, Lq, Lk) bf16 from :func:`make_dropout_mask`."""
    b = qf.shape[0] // h
    bb = batch_block or pick_batch_block(b)
    assert bb is not None and b % bb == 0, (b, batch_block)
    if dropout_rate > 0.0 and dropout_mask is None:
        raise ValueError("dropout_rate > 0 requires dropout_mask")
    return _fused(qf, kf, vf, pos_bias, kv_mask,
                  dropout_mask if dropout_rate > 0.0 else None,
                  h, causal, float(dropout_rate), bb, interpret)


def fused_t5_attention(q, k, v, pos_bias=None, kv_mask=None, *,
                       causal: bool = False, dropout_rate: float = 0.0,
                       dropout_mask=None, batch_block: Optional[int] = None,
                       interpret: bool = False):
    """(B, H, L, D)-layout convenience wrapper over
    :func:`fused_t5_attention_flat` (adds a transpose each way; the model
    integration uses the flat entry). pos_bias: (H, Lq, Lk) learned
    additive bias (differentiated); kv_mask: (B, Lk) 1=attend (no grad);
    dropout applied to the softmax probabilities (HF T5Attention
    placement) via a (H·B, Lq, Lk) bf16 multiplicative ``dropout_mask``
    from :func:`make_dropout_mask`. Unscaled dot product (T5 convention).
    """
    b, h = q.shape[0], q.shape[1]
    out = fused_t5_attention_flat(
        _hbld(q), _hbld(k), _hbld(v), h, pos_bias, kv_mask, causal=causal,
        dropout_rate=dropout_rate, dropout_mask=dropout_mask,
        batch_block=batch_block, interpret=interpret)
    return _hbld_inv(out, b, h)
