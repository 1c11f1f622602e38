"""TIGER: generative retrieval over semantic-ID sequences.

Equivalent of `RQVAE-T5/model.py:7-81`: a scratch-config T5 encoder-decoder
over the 64-token offset-code vocabulary, trained with HF-style label CE
(-100 padding), evaluated with beam search returning ``num_beams``
sequences per sample (max_length 5).

The generate path uses `genrec_tpu.ops.beam_search` — fixed-shape, jittable,
with optional level/trie constrained decoding (the reference decodes
unconstrained; ``constrained_decoding='none'`` reproduces that exactly).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from genrec_tpu.configs import TIGERConfig
from genrec_tpu.data import tiger_tokens
from genrec_tpu.models.t5 import T5EncoderDecoder
from genrec_tpu.ops.beam_search import ConstraintSpec, beam_search


class TIGER(nn.Module):
    cfg: TIGERConfig

    def setup(self):
        self.model = T5EncoderDecoder(self.cfg.arch)

    def __call__(self, input_ids, attention_mask=None, labels=None, *,
                 deterministic: bool = True):
        """(loss, logits) like `RQVAE-T5/model.py:42-60`."""
        return self.model(input_ids, attention_mask, labels,
                          deterministic=deterministic)

    def encode(self, input_ids, attention_mask=None):
        return self.model.encode(input_ids, attention_mask, deterministic=True)

    def decode(self, decoder_input_ids, enc_out, enc_mask=None):
        return self.model.decode(decoder_input_ids, enc_out, enc_mask,
                                 deterministic=True)

    def precompute_cross_kv(self, enc_out):
        return self.model.precompute_cross_kv(enc_out)

    def decode_step(self, decoder_prefix_ids, cross_kvs, enc_mask=None,
                    num_beams=None):
        return self.model.decode_step(decoder_prefix_ids, cross_kvs,
                                      enc_mask, num_beams)


def make_constraint(cfg: TIGERConfig,
                    codes: Optional[jnp.ndarray] = None) -> ConstraintSpec:
    """Build the static decode-constraint spec for a TIGER config."""
    a = cfg.arch
    steps = cfg.max_gen_len - 1
    if cfg.constrained_decoding == "none":
        return ConstraintSpec(mode="none")
    if cfg.constrained_decoding == "level":
        masks = tiger_tokens.build_level_masks(a.vocab_size, cfg.codebook_size,
                                               steps)
        return ConstraintSpec(mode="level", level_masks=jnp.asarray(masks))
    if cfg.constrained_decoding == "trie":
        assert codes is not None, "trie mode needs the item code table"
        trie = tiger_tokens.build_code_trie(codes, a.vocab_size,
                                            cfg.codebook_size)
        offsets = tiger_tokens.trie_prefix_offsets(cfg.codebook_size, steps)
        return ConstraintSpec(mode="trie", trie=jnp.asarray(trie),
                              trie_offsets=jnp.asarray(offsets),
                              codebook_size=cfg.codebook_size)
    raise ValueError(cfg.constrained_decoding)


def generate(model: TIGER, params, input_ids, attention_mask, *,
             num_beams: int, constraint: Optional[ConstraintSpec] = None):
    """Beam-search generation: (B, num_beams, max_gen_len) incl. start token.

    Matches `RQVAE-T5/model.py:62-81` semantics (num_return_sequences =
    num_beams, max_length = cfg.max_gen_len).
    """
    cfg = model.cfg
    B = input_ids.shape[0]
    enc_out = model.apply(params, input_ids, attention_mask,
                          method=TIGER.encode)
    # cross-attention K/V: project once per SAMPLE and keep them
    # per-sample — decode folds the beams into the cross-attention
    # query-length axis (T5Attention._cross_attend_beams), so the K/V are
    # never beam-repeated. The old `jnp.repeat(kv, num_beams)` was the
    # measured byte bulk of beam eval: every decode step re-read the
    # m-times-materialized encoder K/V from HBM
    # (artifacts/beam_roofline_r5.json).
    cross_kvs = model.apply(params, enc_out, method=TIGER.precompute_cross_kv)

    def decode_fn(tokens, step):
        return model.apply(params, tokens[:, :step + 1], cross_kvs,
                           attention_mask, num_beams,
                           method=TIGER.decode_step)

    tokens, scores = beam_search(
        decode_fn, B, num_beams, cfg.max_gen_len, cfg.arch.vocab_size,
        decoder_start=cfg.arch.decoder_start_token_id,
        pad_token=cfg.arch.pad_token_id,
        eos_token=cfg.arch.eos_token_id,
        constraint=constraint,
    )
    return tokens, scores
