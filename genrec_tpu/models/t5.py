"""Scratch T5 encoder-decoder in Flax (no HF dependency).

Architecture semantics follow HF `T5ForConditionalGeneration` as configured
by the reference (`RQVAE-T5/model.py:9-23`): RMS layer norm (no bias/mean),
relative-position bucket biases (shared from block 0 of each stack,
bidirectional for the encoder only), bias-free Dense projections, no
1/sqrt(d) attention scaling, relu feed-forward, tied embeddings with
d_model**-0.5 logit rescaling, dropout on sublayer outputs and attention
weights, decoder_start = pad.

TPU-first notes:
- everything is static-shape and jit-friendly; the decoder is re-run over
  the fixed-width target buffer per generation step (max_gen_len is 5 at
  the reference scale, so KV caching is not the bottleneck — the beam
  search in `genrec_tpu.ops.beam_search` batches beams into the batch dim
  so the MXU sees one big matmul).
- the attention inner product runs through
  `genrec_tpu.ops.attention.dot_product_attention` (XLA fusion at parity
  scale, Pallas flash kernel at long-sequence scale) with the T5 no-scale
  convention restored by pre-scaling q.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from genrec_tpu.configs import T5ArchConfig
from genrec_tpu.ops.attention import dot_product_attention, is_tpu_backend
from genrec_tpu.ops.t5_attention import fused_t5_attention_flat

_NEG_INF = -1e9


class AttnSpec:
    """Structured attention inputs for the fused Pallas training kernel:
    the learned rel-pos bias (H, Lq, Lk), the key-padding mask (B, Lk)
    and the causal flag kept SEPARATE (instead of pre-summed into one
    dense (B, H, Lq, Lk) bias) so the kernel can stream the per-head bias
    once and never materialize the batch-broadcast sum. `causal` rides in
    the pytree aux data — it must stay a Python bool through nn.remat."""

    def __init__(self, pos_bias, kv_mask, causal: bool):
        self.pos_bias = pos_bias
        self.kv_mask = kv_mask
        self.causal = causal


jax.tree_util.register_pytree_node(
    AttnSpec,
    lambda s: ((s.pos_bias, s.kv_mask), s.causal),
    lambda causal, ch: AttnSpec(ch[0], ch[1], causal))


def _cdtype(cfg: T5ArchConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class RMSNorm(nn.Module):
    """T5LayerNorm: scale-only RMS normalization."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (weight * x).astype(x.dtype)


def relative_position_bucket(relative_position, *, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF T5 bucket function (memory_pos - query_pos → bucket id)."""
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret += (relative_position > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(relative_position)
    else:
        rel = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_if_large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, rel, rel_if_large)


class RelativePositionBias(nn.Module):
    cfg: T5ArchConfig
    bidirectional: bool

    @nn.compact
    def __call__(self, qlen: int, klen: int):
        table = self.param(
            "rel_embedding",
            nn.initializers.normal(stddev=(self.cfg.d_model // self.cfg.num_heads) ** -0.5),
            (self.cfg.relative_attention_num_buckets, self.cfg.num_heads))
        ctx = jnp.arange(qlen)[:, None]
        mem = jnp.arange(klen)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, bidirectional=self.bidirectional,
            num_buckets=self.cfg.relative_attention_num_buckets,
            max_distance=self.cfg.relative_attention_max_distance)
        bias = jnp.take(table, buckets, axis=0)  # (q, k, heads)
        return bias.transpose(2, 0, 1)[None]     # (1, heads, q, k)


class T5Attention(nn.Module):
    cfg: T5ArchConfig

    def setup(self):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        dt = _cdtype(c)
        self.q = nn.Dense(inner, use_bias=False, dtype=dt,
                          kernel_init=nn.initializers.normal(
                              stddev=(c.d_model * c.d_kv) ** -0.5))
        self.k = nn.Dense(inner, use_bias=False, dtype=dt,
                          kernel_init=nn.initializers.normal(stddev=c.d_model ** -0.5))
        self.v = nn.Dense(inner, use_bias=False, dtype=dt,
                          kernel_init=nn.initializers.normal(stddev=c.d_model ** -0.5))
        self.o = nn.Dense(c.d_model, use_bias=False, dtype=dt,
                          kernel_init=nn.initializers.normal(stddev=inner ** -0.5))
        self.attn_drop = nn.Dropout(c.dropout_rate)

    def _split_heads(self, t):
        c = self.cfg
        b, l, _ = t.shape
        return t.reshape(b, l, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

    def project_kv(self, kv):
        """(B, Lk, d_model) → per-head K/V (B, heads, Lk, d_kv).

        Generation hoists this out of the beam-step loop: cross-attention
        K/V of the (repeated) encoder output are identical at every decode
        step, so recomputing them per step per beam — as the reference's
        cache-less `model.generate` effectively does on re-encode-free HF
        beam search — wastes the dominant matmul of the step."""
        return self._split_heads(self.k(kv)), self._split_heads(self.v(kv))

    def _cross_attend_beams(self, qh, kh, vh, bias, num_beams):
        """Cross-attention with beams folded into the QUERY-LENGTH axis.

        qh: (B·m, h, s, dkv) queries of m beams per sample; kh/vh:
        (B, h, Le, dkv) UNREPEATED per-sample K/V. Instead of
        materializing `jnp.repeat(K, m)` — which writes m copies of the
        encoder K/V to HBM and re-reads them in every decode step (the
        measured byte bulk of beam eval, artifacts/beam_roofline_r5.json)
        — reshape q to (B, h, m·s, dkv) so one batched matmul against the
        per-sample K covers all beams. T5 semantics: unscaled dot product.
        ``bias`` broadcasts per sample ((B, 1, 1, Le) mask), identical
        across beams by construction.
        """
        bm, h, s, dkv = qh.shape
        b = bm // num_beams
        q2 = (qh.reshape(b, num_beams, h, s, dkv)
              .transpose(0, 2, 1, 3, 4).reshape(b, h, num_beams * s, dkv))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q2, kh,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        return (ctx.reshape(b, h, num_beams, s, dkv)
                .transpose(0, 2, 1, 3, 4).reshape(bm, h, s, dkv))

    def __call__(self, x, kv, bias, *, deterministic: bool = True,
                 kv_cache=None, kv_beams=None):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        if isinstance(bias, AttnSpec) and kv_cache is None:
            # fused Pallas path: bias/mask/causal stay separate; probs and
            # score-shaped grads never touch HBM (ops/t5_attention.py).
            # Projections go straight to the kernel's flat (H·B, L, D)
            # layout — the same single transpose as classic split-heads,
            # so the kernel costs no extra layout traffic.
            h, dkv = c.num_heads, c.d_kv
            b, lq = x.shape[0], x.shape[1]
            lk = kv.shape[1]

            def flat(t, ll):
                return (t.reshape(b, ll, h, dkv).transpose(2, 0, 1, 3)
                        .reshape(h * b, ll, dkv))

            qf = flat(self.q(x), lq)
            kf = flat(self.k(kv), lk)
            vf = flat(self.v(kv), lk)
            rate = c.dropout_rate if not deterministic else 0.0
            dmask = None
            if rate > 0.0:
                from genrec_tpu.ops.t5_attention import make_dropout_mask
                dmask = make_dropout_mask(self.make_rng("dropout"),
                                          h * b, lq, lk, rate)
            of = fused_t5_attention_flat(
                qf, kf, vf, h, bias.pos_bias, bias.kv_mask,
                causal=bias.causal, dropout_rate=rate, dropout_mask=dmask,
                interpret=not is_tpu_backend())
            out = (of.reshape(h, b, lq, dkv).transpose(1, 2, 0, 3)
                   .reshape(b, lq, inner))
            return self.o(out)
        qh = self._split_heads(self.q(x))
        kh, vh = kv_cache if kv_cache is not None else self.project_kv(kv)
        b, _, lq, _ = qh.shape
        if isinstance(bias, AttnSpec):  # unreachable: T5Stack only builds
            raise ValueError("AttnSpec with kv_cache is unsupported")
        if kv_cache is not None and kv_beams is not None and kv_beams > 1:
            out = self._cross_attend_beams(qh, kh, vh, bias, kv_beams)
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
            return self.o(out)
        if not deterministic and c.dropout_rate > 0.0:
            # attention-weight dropout (HF T5Attention): explicit-probs XLA
            # path so the dropout mask applies to the softmax weights.
            # T5 convention: unscaled dot product. The dropout math below
            # is flax nn.Dropout verbatim (bernoulli keep-mask on the
            # 'dropout' stream, x/keep_prob where kept) — written out so
            # the core can be jax.checkpoint'd: with attn_remat_dropout
            # the backward RECOMPUTES logits/probs and REGENERATES the
            # mask from `key` instead of storing the score-shaped
            # probs + mask residuals in HBM (see configs.T5ArchConfig).
            key = self.make_rng("dropout")
            keep_prob = 1.0 - c.dropout_rate

            def core(qh, kh, vh, bias, key):
                logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                if bias is not None:
                    logits = logits + bias
                probs = jax.nn.softmax(logits, axis=-1)
                keep = jax.random.bernoulli(key, keep_prob, probs.shape)
                probs = jax.lax.select(
                    keep, probs / keep_prob, jnp.zeros_like(probs))
                return jnp.einsum("bhqk,bhkd->bhqd",
                                  probs.astype(vh.dtype), vh)

            if c.attn_remat_dropout:
                core = jax.checkpoint(core)
            out = core(qh, kh, vh, bias, key)
        else:
            # T5 uses an unscaled dot product; dot_product_attention divides
            # by sqrt(d_kv), so pre-scale q to cancel it.
            out = dot_product_attention(qh * (c.d_kv ** 0.5), kh, vh, bias,
                                        causal=False)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return self.o(out)


class T5FeedForward(nn.Module):
    cfg: T5ArchConfig

    # `deterministic` is positional-friendly so nn.remat's static_argnums
    # can reach it (T5Block.setup wraps this module when
    # cfg.ffn_remat_dropout — backward then recomputes the d_ff-shaped
    # relu/dropout residuals instead of storing them)
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        h = nn.Dense(c.d_ff, use_bias=False, name="wi", dtype=_cdtype(c),
                     kernel_init=nn.initializers.normal(stddev=c.d_model ** -0.5))(x)
        if c.feed_forward_proj == "relu":
            h = nn.relu(h)
        elif c.feed_forward_proj in ("gelu", "gated-gelu"):
            h = nn.gelu(h)
        else:
            raise ValueError(c.feed_forward_proj)
        h = nn.Dropout(c.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(c.d_model, use_bias=False, name="wo", dtype=_cdtype(c),
                        kernel_init=nn.initializers.normal(stddev=c.d_ff ** -0.5))(h)


class T5Block(nn.Module):
    cfg: T5ArchConfig
    is_decoder: bool

    def setup(self):
        c = self.cfg
        self.self_norm = RMSNorm(c.layer_norm_epsilon)
        self.self_attn = T5Attention(c)
        if self.is_decoder:
            self.cross_norm = RMSNorm(c.layer_norm_epsilon)
            self.cross_attn = T5Attention(c)
        self.ff_norm = RMSNorm(c.layer_norm_epsilon)
        ff_cls = (nn.remat(T5FeedForward, static_argnums=(2,))
                  if c.ffn_remat_dropout else T5FeedForward)
        self.ff = ff_cls(c)
        self.drop = nn.Dropout(c.dropout_rate)

    def __call__(self, x, self_bias, enc_out=None, cross_mask=None,
                 deterministic: bool = True, cross_kv=None,
                 cross_kv_beams=None):
        # deterministic/cross_kv are positional-friendly so nn.remat's
        # static_argnums can reach `deterministic` (T5Stack.setup)
        drop = lambda t: self.drop(t, deterministic=deterministic)
        h = self.self_norm(x)
        x = x + drop(self.self_attn(h, h, self_bias,
                                    deterministic=deterministic))
        if self.is_decoder and (enc_out is not None or cross_kv is not None):
            h = self.cross_norm(x)
            x = x + drop(self.cross_attn(h, enc_out, cross_mask,
                                         deterministic=deterministic,
                                         kv_cache=cross_kv,
                                         kv_beams=cross_kv_beams))
        h = self.ff_norm(x)
        x = x + drop(self.ff(h, deterministic))
        return x


def _extend_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, Lk) 1/0 mask → additive (B, 1, 1, Lk) bias."""
    return (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * _NEG_INF


def _causal_bias(length: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    return jnp.where(col > row, _NEG_INF, 0.0)[None, None]


class T5Stack(nn.Module):
    cfg: T5ArchConfig
    num_layers: int
    is_decoder: bool

    def setup(self):
        c = self.cfg
        self.rel_bias = RelativePositionBias(
            c, bidirectional=not self.is_decoder)
        # remat: recompute each block in backward instead of saving its
        # activations — HBM is the usual TPU bottleneck, and at parity
        # d_model the MXU is underfed so the ~1/3 extra FLOPs are free.
        # static_argnums marks `deterministic` and `cross_kv_beams`
        # (arg 0 is the module) — both drive Python-level control flow.
        block_cls = (nn.remat(T5Block, static_argnums=(5, 7)) if c.remat
                     else T5Block)
        self.blocks = [block_cls(c, self.is_decoder, name=f"block_{i}")
                       for i in range(self.num_layers)]
        self.final_norm = RMSNorm(c.layer_norm_epsilon)
        self.drop = nn.Dropout(c.dropout_rate)

    def _fused(self, deterministic: bool) -> bool:
        mode = getattr(self.cfg, "fused_attention", "auto")
        if mode == "off":
            return False
        if mode == "on":
            return True
        # auto: training steps on a TPU backend (eval/generation keep the
        # XLA path — decode shapes grow per step and dropout is off anyway).
        # DROPOUT-FREE ONLY (2026-08-21): every measured dropout variant of
        # the fused kernel loses to XLA's inline-dropout attention (the
        # mask must be materialized XLA-side — mask-generation experiments
        # in artifacts/dropout_mask_exp_r4.json; retirement rationale in
        # ops/t5_attention.make_dropout_mask docstring), so auto engages
        # the kernel only where it wins: dropout-free training.
        return (not deterministic) and self.cfg.dropout_rate == 0.0 \
            and is_tpu_backend()

    def __call__(self, inputs_embeds, attention_mask=None, enc_out=None,
                 enc_mask=None, *, deterministic: bool = True,
                 cross_kvs=None, cross_kv_beams=None):
        lq = inputs_embeds.shape[1]
        if self._fused(deterministic) and cross_kvs is None:
            pos = self.rel_bias(lq, lq)[0]  # (H, Lq, Lq)
            if self.is_decoder:
                # fold the causal mask into the (H, Lq, Lq) bias here — an
                # XLA-side add of a tiny constant — so the kernel needs no
                # causal branch (its in-kernel causal lowering hangs this
                # toolchain's Mosaic; the additive sum is bit-identical)
                pos = pos + _causal_bias(lq)[0, 0]
            self_bias = AttnSpec(pos, attention_mask, False)
            cross_mask = (AttnSpec(None, enc_mask, False)
                          if enc_out is not None else None)
        else:
            self_bias = self.rel_bias(lq, lq)
            if self.is_decoder:
                self_bias = self_bias + _causal_bias(lq)
            if attention_mask is not None:
                self_bias = self_bias + _extend_mask(attention_mask)
            cross_mask = _extend_mask(enc_mask) if enc_mask is not None else None

        x = self.drop(inputs_embeds, deterministic=deterministic)
        for i, block in enumerate(self.blocks):
            x = block(x, self_bias, enc_out, cross_mask, deterministic,
                      None if cross_kvs is None else cross_kvs[i],
                      cross_kv_beams)
        x = self.final_norm(x)
        return self.drop(x, deterministic=deterministic)

    def precompute_cross_kv(self, enc_out):
        """Per-layer cross-attention K/V of a fixed encoder output — hoisted
        out of the generation step loop (decoder stacks only)."""
        return tuple(block.cross_attn.project_kv(enc_out)
                     for block in self.blocks)


def shift_right(labels: jnp.ndarray, decoder_start: int, pad_id: int) -> jnp.ndarray:
    """HF `_shift_right`: prepend decoder_start, drop last, -100 → pad."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), decoder_start, labels.dtype),
         labels[:, :-1]], axis=1)
    return jnp.where(shifted == -100, pad_id, shifted)


class T5EncoderDecoder(nn.Module):
    cfg: T5ArchConfig

    def setup(self):
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model, dtype=_cdtype(c),
                               embedding_init=nn.initializers.normal(1.0))
        self.encoder = T5Stack(c, c.num_layers, is_decoder=False)
        self.decoder = T5Stack(c, c.num_decoder_layers, is_decoder=True)

    def encode(self, input_ids=None, attention_mask=None, inputs_embeds=None,
               *, deterministic: bool = True):
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        return self.encoder(inputs_embeds, attention_mask,
                            deterministic=deterministic)

    def decode(self, decoder_input_ids, enc_out, enc_mask=None, *,
               deterministic: bool = True):
        x = self.shared(decoder_input_ids)
        x = self.decoder(x, None, enc_out, enc_mask, deterministic=deterministic)
        return self.lm_logits(x)

    def precompute_cross_kv(self, enc_out):
        """Hoist decoder cross-attention K/V projections of a fixed encoder
        output out of the generation loop (computed once per sample, reused
        at every beam step — see `genrec_tpu.ops.beam_search`)."""
        return self.decoder.precompute_cross_kv(enc_out)

    def decode_step(self, decoder_prefix_ids, cross_kvs, enc_mask=None,
                    num_beams=None):
        """Next-token logits (B, V) for a (B, steps_so_far) decoder prefix.

        Unlike :meth:`decode`, runs the stack only over the live prefix
        (position count grows with the step) and projects logits only at
        the final position; the encoder enters purely through the
        precomputed ``cross_kvs``.

        ``num_beams``: beam decoding passes the PER-SAMPLE ``cross_kvs``/
        ``enc_mask`` (batch B) with a (B·num_beams, s) prefix — cross
        attention folds the beams into its query-length axis instead of
        materializing beam-repeated K/V (T5Attention._cross_attend_beams;
        eliminates the dominant HBM traffic of beam eval,
        artifacts/beam_roofline_r5.json)."""
        x = self.shared(decoder_prefix_ids)
        x = self.decoder(x, None, None, enc_mask, deterministic=True,
                         cross_kvs=cross_kvs, cross_kv_beams=num_beams)
        return self.lm_logits(x[:, -1, :])

    def lm_logits(self, hidden):
        c = self.cfg
        if c.tie_word_embeddings:
            hidden = hidden * (c.d_model ** -0.5)
            return jnp.dot(hidden, self.shared.embedding.T,
                           preferred_element_type=jnp.float32)
        raise NotImplementedError("untied lm_head not needed at parity scale")

    def __call__(self, input_ids=None, attention_mask=None, labels=None,
                 inputs_embeds=None, *, deterministic: bool = True):
        """Returns (loss, logits) like `RQVAE-T5/model.py:42-60`."""
        c = self.cfg
        enc_out = self.encode(input_ids, attention_mask, inputs_embeds,
                              deterministic=deterministic)
        decoder_input_ids = shift_right(labels, c.decoder_start_token_id,
                                        c.pad_token_id)
        logits = self.decode(decoder_input_ids, enc_out, attention_mask,
                             deterministic=deterministic)
        loss = cross_entropy_with_ignore(logits, labels)
        return loss, logits


def cross_entropy_with_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                              ignore_index: int = -100) -> jnp.ndarray:
    """Mean CE over non-ignored targets (HF labels convention)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


class T5Encoder(nn.Module):
    """Encoder-only stack (HF `T5EncoderModel`, used by DenseT5)."""

    cfg: T5ArchConfig

    def setup(self):
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model, dtype=_cdtype(c),
                               embedding_init=nn.initializers.normal(1.0))
        self.encoder = T5Stack(c, c.num_layers, is_decoder=False)

    def __call__(self, input_ids=None, attention_mask=None, inputs_embeds=None,
                 *, deterministic: bool = True):
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        return self.encoder(inputs_embeds, attention_mask,
                            deterministic=deterministic)
