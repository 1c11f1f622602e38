"""Attention ops: a blockwise Pallas flash-attention TPU kernel (forward AND
backward) with an XLA fallback, plus the plain multi-head wrapper used by
every model tower.

Design notes (TPU-first):
- The kernel is *blockwise* over the query/key sequence (online softmax),
  so context-parallel extensions (ring attention) can slot in later without
  changing the math — SURVEY.md §5 "long-context" note.
- The backward pass is the standard recompute-based flash backward: the
  forward saves only (out, logsumexp); dq / (dk, dv) are produced by two
  Pallas kernels that re-materialize the (block_q, block_k) score tiles —
  O(L·D) residual memory instead of XLA's O(L²) saved probability matrix.
- With an additive ``bias`` the backward falls back to recomputing through
  :func:`_xla_attention` under ``jax.vjp`` — the only biased caller is the
  T5 relative-position path (`genrec_tpu/models/t5.py:149`), which at the
  80-token parity scale never crosses the Pallas gate anyway; the fallback
  keeps gradients correct (incl. the learned bias) if it ever does.
- At the reference parity scale (seq ≤ 80, d ≤ 128) XLA's fused attention is
  already near speed-of-light, so the wrapper picks the kernel only when
  shapes are large enough to amortize it; both paths are numerically
  equivalent (tested against each other, values and grads).
- Replaces `torch.nn.MultiheadAttention` usage of the reference
  (`SASRec/model.py:28-30`, `RQVAE-T5-prefix/model.py:21-23`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _xla_attention(q, k, v, bias, causal, dropout_rate: float = 0.0,
                   dropout_rng=None):
    """Reference XLA path. q,k,v: (B, H, L, D); bias: (B|1, H|1, Lq, Lk).
    ``dropout_rate``/``dropout_rng`` apply inverted dropout to the
    ATTENTION WEIGHTS (torch `nn.MultiheadAttention(..., dropout=)`
    semantics — used by the TIGER-prefix adapters)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
    if bias is not None:
        logits = logits + bias
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        logits = jnp.where(col > row + (lk - lq), _NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention — forward
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                  causal: bool, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: online-softmax over k blocks.
    Emits the output block and the per-row logsumexp (backward residual)."""
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (block_q, d)
    block_q = q.shape[0]
    lk = k_ref.shape[1]
    num_kb = lk // block_k
    qi = pl.program_id(1)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            abs_row = row + qi * block_q
            abs_col = col + kb * block_k
            s = jnp.where(abs_col > abs_row, _NEG_INF, s)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    init = (jnp.zeros((block_q, d), jnp.float32),
            jnp.full((block_q, 1), _NEG_INF, jnp.float32),
            jnp.zeros((block_q, 1), jnp.float32))
    if causal:
        # skip fully-masked k blocks beyond the diagonal
        last_kb = jnp.minimum(num_kb, (qi + 1) * block_q // block_k + 1)
    else:
        last_kb = num_kb
    acc, m, l = jax.lax.fori_loop(0, last_kb, body, init)
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)                           # (block_q, 1)


def _flash_fwd_kernel_blocked(q_ref, k_ref, v_ref, acc_ref, m_ref, l_ref, *,
                              causal: bool, sm_scale: float):
    """One (batch*head, q-block, k-block) program of the LONG-SEQUENCE
    forward: the online-softmax state (acc, m, l) lives in the f32 output
    refs, revisited across the innermost k-grid axis, so VMEM never holds
    a full-length K/V ref (which lane-pads 8× at d_head 16 and overflows
    the 16 MB scoped limit at L=8192). The caller finishes with
    out = acc / l and lse = m + log l XLA-side."""
    qi, ki = pl.program_id(1), pl.program_id(2)
    block_q, block_k = q_ref.shape[1], k_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + ki * block_k > row + qi * block_q,
                          _NEG_INF, s)
        m_prev = m_ref[0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[0] = alpha * l_ref[0] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[0] = acc_ref[0] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[0] = m_new

    if causal:
        pl.when(ki * block_k <= (qi + 1) * block_q - 1)(compute)
    else:
        compute()


def _flash_forward_blocked(qr, kr, vr, causal, block_q, block_k, sm_scale,
                           interpret):
    bh, lq, d = qr.shape
    lk = kr.shape[1]

    def qb(i, qi, ki):
        return (i, qi, 0)

    def kb(i, qi, ki):
        return (i, ki, 0)

    qspec = pl.BlockSpec((1, block_q, d), qb, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, d), kb, memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, block_q, 1), qb, memory_space=pltpu.VMEM)
    acc, m, l = pl.pallas_call(
        functools.partial(_flash_fwd_kernel_blocked, causal=causal,
                          sm_scale=sm_scale),
        grid=(bh, lq // block_q, lk // block_k),
        in_specs=[qspec, kspec, kspec],
        out_specs=[qspec, rowq, rowq],
        out_shape=[jax.ShapeDtypeStruct((bh, lq, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32)],
        interpret=interpret,
    )(qr, kr, vr)
    l = jnp.maximum(l, 1e-30)
    return acc / l, m + jnp.log(l)


def _flash_forward(q, k, v, bias, causal, block_q, block_k, interpret):
    """pallas_call wrapper; returns (out (B,H,Lq,D), lse (B*H, Lq, 1) f32).
    The trailing singleton keeps the Mosaic block-shape rule satisfied
    (last two block dims must be (8k, 128k) or equal to the array's) while
    storing one f32 per query row."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / (d ** 0.5)
    bh = b * h
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    if bias is None and _use_blocked_bwd(lq, lk, d):
        # long-sequence path: no full-length refs anywhere (the biased
        # caller — T5 rel-pos — lives at ≤few-hundred-token scale and
        # never reaches these lengths)
        out, lse = _flash_forward_blocked(qr, kr, vr, causal, block_q,
                                          block_k, sm_scale, interpret)
        return out.astype(q.dtype).reshape(b, h, lq, d), lse
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qr, kr, vr]
    if bias is not None:
        bias_b = jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(bh, lq, lk)
        in_specs.append(pl.BlockSpec((1, block_q, lk), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_b)
        kernel = functools.partial(_flash_kernel, causal=causal,
                                   block_k=block_k, sm_scale=sm_scale)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
            _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                          causal=causal, block_k=block_k, sm_scale=sm_scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, lq // block_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, lq, d), lse


# ---------------------------------------------------------------------------
# Pallas flash attention — backward (recompute-based)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, causal: bool, block_k: int,
                         sm_scale: float):
    """One (batch*head, q-block) program: dq = Σ_kb ds @ k · sm_scale,
    ds = p ⊙ (do @ vᵀ − delta), p re-materialized from (q, k, lse)."""
    q = q_ref[0].astype(jnp.float32)                     # (block_q, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0].astype(jnp.float32)                 # (block_q, 1)
    delta = delta_ref[0].astype(jnp.float32)
    block_q = q.shape[0]
    lk = k_ref.shape[1]
    num_kb = lk // block_k
    qi = pl.program_id(1)

    def body(kb, acc):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + kb * block_k > row + qi * block_q, _NEG_INF, s)
        p = jnp.exp(s - lse)                              # masked → exactly 0
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    d = q_ref.shape[-1]
    if causal:
        last_kb = jnp.minimum(num_kb, (qi + 1) * block_q // block_k + 1)
    else:
        last_kb = num_kb
    acc = jax.lax.fori_loop(0, last_kb, body,
                            jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (acc * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, causal: bool, block_q: int,
                          sm_scale: float):
    """One (batch*head, k-block) program: dv = Σ_qb pᵀ @ do,
    dk = Σ_qb dsᵀ @ q · sm_scale."""
    k = k_ref[0].astype(jnp.float32)                     # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    block_k = k.shape[0]
    lq = q_ref.shape[1]
    num_qb = lq // block_q
    ki = pl.program_id(1)

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + ki * block_k > row + qb * block_q, _NEG_INF, s)
        p = jnp.exp(s - lse)                              # (block_q, block_k)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    d = q_ref.shape[-1]
    # causal: q blocks strictly above the diagonal contribute nothing
    start_qb = (ki * block_k) // block_q if causal else 0
    dk, dv = jax.lax.fori_loop(
        start_qb, num_qb, body,
        (jnp.zeros((block_k, d), jnp.float32),
         jnp.zeros((block_k, d), jnp.float32)))
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dsoftmax_block(q, k, v, do, lse, delta, causal, sm_scale, q_off, k_off):
    """Shared per-(q-block, k-block) recompute: returns (p, ds) with the
    causal mask applied via absolute token offsets."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if causal:
        bq, bk = s.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col + k_off > row + q_off, _NEG_INF, s)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    return p, ds


def _flash_bwd_dq_kernel_blocked(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                 delta_ref, dq_ref, *, causal: bool,
                                 sm_scale: float):
    """One (batch*head, q-block, k-block) program accumulating into an f32
    dq output block that is revisited across the innermost k-grid axis —
    the long-sequence variant: VMEM holds only O(block) tensors, never a
    full-length ref (the fori-loop kernels keep (1, L, d) refs resident,
    which lane-pads 8× at d_head 16 and overflows the 16 MB scoped limit
    at L=4096 — artifacts/ring_cp_r4.json chip_L4096_note). Same
    accumulate-into-output pattern as `t5_attention._bwd_kernel` dbias,
    known to lower on this toolchain."""
    qi, ki = pl.program_id(1), pl.program_id(2)
    block_q, block_k = q_ref.shape[1], k_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)
        delta = delta_ref[0].astype(jnp.float32)
        _, ds = _dsoftmax_block(q, k, v, do, lse, delta, causal, sm_scale,
                                qi * block_q, ki * block_k)
        dq_ref[0] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

    if causal:  # k-blocks fully above the diagonal contribute zero
        pl.when(ki * block_k <= (qi + 1) * block_q - 1)(compute)
    else:
        compute()


def _flash_bwd_dkv_kernel_blocked(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                  delta_ref, dk_ref, dv_ref, *,
                                  causal: bool, sm_scale: float):
    """One (batch*head, k-block, q-block) program accumulating dk/dv f32
    output blocks across the innermost q-grid axis (see
    `_flash_bwd_dq_kernel_blocked`)."""
    ki, qi = pl.program_id(1), pl.program_id(2)
    block_q, block_k = q_ref.shape[1], k_ref.shape[1]

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)
        delta = delta_ref[0].astype(jnp.float32)
        p, ds = _dsoftmax_block(q, k, v, do, lse, delta, causal, sm_scale,
                                qi * block_q, ki * block_k)
        dv_ref[0] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

    if causal:  # q-blocks strictly above the diagonal contribute zero
        pl.when((qi + 1) * block_q - 1 >= ki * block_k)(compute)
    else:
        compute()


# full-length backward refs beyond this many (lane-padded) bytes switch to
# the blocked-grid kernels; (1, L, d) lane-pads d up to 128 in VMEM
_BWD_FULL_REF_BYTES_LIMIT = 1_500_000


def _use_blocked_bwd(lq: int, lk: int, d: int) -> bool:
    padded_d = max(d, 128)
    return max(lq, lk) * padded_d * 4 > _BWD_FULL_REF_BYTES_LIMIT


def _flash_backward_blocked(qr, kr, vr, dor, lse, delta, causal, block_q,
                            block_k, sm_scale, interpret):
    bh, lq, d = qr.shape
    lk = kr.shape[1]
    nq, nk = lq // block_q, lk // block_k

    def qb(i, qi, ki):
        return (i, qi, 0)

    def kb(i, qi, ki):
        return (i, ki, 0)

    qspec = pl.BlockSpec((1, block_q, d), qb, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, d), kb, memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, block_q, 1), qb, memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel_blocked, causal=causal,
                          sm_scale=sm_scale),
        grid=(bh, nq, nk),
        in_specs=[qspec, kspec, kspec, qspec, rowq, rowq],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), jnp.float32),
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)

    def qb2(i, ki, qi):
        return (i, qi, 0)

    def kb2(i, ki, qi):
        return (i, ki, 0)

    qspec2 = pl.BlockSpec((1, block_q, d), qb2, memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, block_k, d), kb2, memory_space=pltpu.VMEM)
    rowq2 = pl.BlockSpec((1, block_q, 1), qb2, memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel_blocked, causal=causal,
                          sm_scale=sm_scale),
        grid=(bh, nk, nq),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowq2, rowq2],
        out_specs=[kspec2, kspec2],
        out_shape=[jax.ShapeDtypeStruct((bh, lk, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lk, d), jnp.float32)],
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)
    return dq, dk, dv


def _flash_backward(q, k, v, out, lse, do, causal, block_q, block_k,
                    interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / (d ** 0.5)
    bh = b * h
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    dor = do.reshape(bh, lq, d)
    # delta_i = Σ_d do_i · o_i — the softmax-jacobian row term; cheap in XLA
    delta = jnp.sum(dor.astype(jnp.float32)
                    * out.reshape(bh, lq, d).astype(jnp.float32),
                    axis=-1, keepdims=True)              # (bh, lq, 1)

    if _use_blocked_bwd(lq, lk, d):
        dq, dk, dv = _flash_backward_blocked(qr, kr, vr, dor, lse, delta,
                                             causal, block_q, block_k,
                                             sm_scale, interpret)
        return (dq.astype(q.dtype).reshape(b, h, lq, d),
                dk.astype(k.dtype).reshape(b, h, lk, d),
                dv.astype(v.dtype).reshape(b, h, lk, d))

    qb_spec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    q_full = pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    k_full = pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kb_spec = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, causal=causal,
                          block_k=block_k, sm_scale=sm_scale),
        grid=(bh, lq // block_q),
        in_specs=[qb_spec, k_full, k_full, qb_spec, row_blk, row_blk],
        out_specs=qb_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, causal=causal,
                          block_q=block_q, sm_scale=sm_scale),
        grid=(bh, lk // block_k),
        in_specs=[q_full, kb_spec, kb_spec, q_full, row_full, row_full],
        out_specs=[kb_spec, kb_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, lk, d), v.dtype)],
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)

    return (dq.reshape(b, h, lq, d), dk.reshape(b, h, lk, d),
            dv.reshape(b, h, lk, d))


# ---------------------------------------------------------------------------
# differentiable entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_nobias(q, k, v, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, None, causal, block_q, block_k, interpret)
    return out


def _flash_nobias_fwd(q, k, v, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, None, causal, block_q, block_k,
                              interpret)
    return out, (q, k, v, out, lse)


def _flash_nobias_bwd(causal, block_q, block_k, interpret, res, do):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, do, causal, block_q, block_k,
                           interpret)


_flash_nobias.defvjp(_flash_nobias_fwd, _flash_nobias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_bias(q, k, v, bias, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, bias, causal, block_q, block_k, interpret)
    return out


def _flash_bias_fwd(q, k, v, bias, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, bias, causal, block_q, block_k, interpret)
    return out, (q, k, v, bias)


def _flash_bias_bwd(causal, block_q, block_k, interpret, res, do):
    # biased backward: recompute through the XLA path (correct for all four
    # grads incl. the learned bias). The only biased caller — T5's
    # relative-position attention — lives at 80-token parity scale where
    # the Pallas gate never fires, so this path is a correctness net, not a
    # hot path; a blockwise dbias kernel can replace it if that changes.
    q, k, v, bias = res
    # LOUD GUARD: at blocked-backward lengths this XLA recompute
    # materializes the (B,H,Lq,Lk) score matrix — silently forfeiting the
    # flash memory advantage the caller asked for. No current config hits
    # this (t5_attention owns the fused biased path; long-context runs are
    # unbiased); fail fast rather than degrade if one ever does.
    lq, lk, dh = q.shape[2], k.shape[2], q.shape[3]
    if _use_blocked_bwd(lq, lk, dh):
        raise NotImplementedError(
            f"biased flash backward at blocked-kernel scale (Lq={lq}, "
            f"Lk={lk}, d={dh}): the fallback would rematerialize O(L²) "
            "scores in XLA. Drop the bias (fold it into the inputs), use "
            "ops/t5_attention.py for relative-position bias, or add a "
            "dbias-blocked kernel (accumulate-into-output-ref pattern, "
            "t5_attention.py) before enabling this configuration.")
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _xla_attention(q_, k_, v_, b_,
                                                           causal),
                     q, k, v, bias)
    return vjp(do)


_flash_bias.defvjp(_flash_bias_fwd, _flash_bias_bwd)


def _auto_blocks(lq: int, lk: int, d: int) -> tuple[int, int]:
    """Measured on TPU v5e (scripts/bench_attention.py sweep): block_q=256
    (512 when d≥128 — deeper rows amortize the softmax VPU work),
    block_k=512 wins across [256, 2048]² — 1.1–2.3× over both the naive
    (128,128) blocking and XLA's fused attention. The divisibility
    precondition (L % 128 == 0, asserted by flash_attention) guarantees a
    128-sized fallback always exists — block never silently degrades to L."""
    q_cands = (512, 256, 128) if d >= 128 else (256, 128)
    bq = next(b for b in q_cands if lq % b == 0)
    bk = next(b for b in (512, 256, 128) if lk % b == 0)
    return min(bq, lq), min(bk, lk)


def flash_attention(q, k, v, bias=None, *, causal: bool = False,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False):
    """Blockwise flash attention, differentiable. q,k,v: (B, H, L, D) with
    Lq, Lk multiples of 128 (callers pad; matches the `_use_pallas` gate).
    bias: optional (B|1, H|1, Lq, Lk) additive. Block sizes default to the
    measured-optimal sweep values (_auto_blocks)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    assert lq % 128 == 0 and lk % 128 == 0, (
        f"flash_attention needs Lq/Lk multiples of 128, got ({lq}, {lk}); "
        "pad the sequence — a full-length block would blow VMEM")
    # The Pallas kernels mask `col > row` with NO (lk - lq) offset, unlike
    # _xla_attention's `col > row + (lk - lq)` — for lq != lk the two paths
    # would silently disagree on which diagonal is causal. Guard it loudly.
    assert not causal or lq == lk, (
        f"causal flash_attention requires lq == lk (got {lq} vs {lk}); "
        "the kernel masks the main diagonal, not the lk-lq-offset one — "
        "use force_pallas=False for causal cross-length attention")
    abq, abk = _auto_blocks(lq, lk, d)
    block_q = abq if block_q is None else block_q
    block_k = abk if block_k is None else block_k
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk, block_q, block_k)
    if bias is None:
        return _flash_nobias(q, k, v, causal, block_q, block_k, interpret)
    return _flash_bias(q, k, v, bias, causal, block_q, block_k, interpret)


def is_tpu_backend() -> bool:
    """True on real TPU hardware, including tunneled PJRT platforms whose
    backend name isn't literally 'tpu' (this host reports 'axon' while the
    device kind is a TPU chip)."""
    if jax.default_backend() == "tpu":
        return True
    try:
        d = jax.devices()[0]
        return "tpu" in (d.device_kind or "").lower() or \
               "tpu" in (d.platform or "").lower()
    except Exception:
        return False


def _use_pallas(lq: int, lk: int, d: int) -> bool:
    """Heuristic from the measured microbench (artifacts/
    attention_microbench.json, TPU v5e): below L=512 both paths sit at the
    dispatch floor (speedup ~1.0×); from L=1024 the tuned kernel wins
    1.2–2.4×. Gate at ≥512 so the kernel only fires where it is at least
    break-even."""
    if not is_tpu_backend():
        return False
    return lq >= 512 and lk >= 512 and lq % 128 == 0 and lk % 128 == 0


def dot_product_attention(q, k, v, bias=None, *, causal: bool = False,
                          force_pallas: Optional[bool] = None,
                          interpret: bool = False,
                          dropout_rate: float = 0.0, dropout_rng=None):
    """(B, H, L, D) attention with optional additive bias and causal mask.
    Attention-weight dropout forces the XLA path (the flash kernel has no
    in-kernel PRNG on this toolchain — ops/t5_attention.py module doc)."""
    with_drop = dropout_rate > 0.0 and dropout_rng is not None
    use = (_use_pallas(q.shape[2], k.shape[2], q.shape[3])
           if force_pallas is None else force_pallas) and not with_drop
    if use:
        return flash_attention(q, k, v, bias, causal=causal, interpret=interpret)
    return _xla_attention(q, k, v, bias, causal, dropout_rate, dropout_rng)


def multi_head_attention(q, k, v, *, num_heads: int, bias=None,
                         causal: bool = False,
                         dropout_rate: float = 0.0, dropout_rng=None):
    """Split (B, L, H*D) projections into heads, attend, and merge back.
    ``dropout_rate``/``dropout_rng`` enable torch-MHA-style attention
    WEIGHT dropout (pass a key only when training)."""
    b, lq, dm = q.shape
    lk = k.shape[1]
    dh = dm // num_heads
    qh = q.reshape(b, lq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, dh).transpose(0, 2, 1, 3)
    out = dot_product_attention(qh, kh, vh, bias, causal=causal,
                                dropout_rate=dropout_rate,
                                dropout_rng=dropout_rng)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, dm)
