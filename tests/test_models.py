"""Model-zoo unit tests (tiny configs to keep CPU compile fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.configs import (DenseT5Config, RQVAEConfig, SASRecConfig,
                                T5ArchConfig, TIGERConfig, TrainerConfig)
from genrec_tpu.models import SASRec, RQVAE, TIGER, DenseT5
from genrec_tpu.models import sasrec as sasrec_mod
from genrec_tpu.models.rqvae import collision_rate, kmeans_init_codebooks
from genrec_tpu.models.t5 import (T5EncoderDecoder, cross_entropy_with_ignore,
                                  relative_position_bucket, shift_right)

KEY = jax.random.PRNGKey(0)

TINY_ARCH = T5ArchConfig(vocab_size=64, num_layers=1, num_decoder_layers=1,
                         d_model=16, d_ff=32, num_heads=2, d_kv=8,
                         dropout_rate=0.0)


def test_sasrec_shapes_and_padding():
    cfg = SASRecConfig(d=8, num_blocks=2, num_heads=1, mlp_layer=16, max_len=10)
    m = SASRec(item_num=30, cfg=cfg)
    x = jnp.zeros((3, 10), jnp.int32).at[:, -2:].set(5)
    params = m.init(KEY, x)
    feats = m.apply(params, x)
    assert feats.shape == (3, 10, 8)
    logits = m.apply(params, x, method=SASRec.predict)
    assert logits.shape == (3, 31)
    # padding item embedding contributes zero before pos emb
    emb = params["params"]["item_emb"]["embedding"]
    out0 = m.apply(params, jnp.zeros((1, 10), jnp.int32))
    assert np.isfinite(np.asarray(out0)).all()


def test_sasrec_causality():
    """Changing a future input must not change earlier features."""
    cfg = SASRecConfig(d=8, num_blocks=2, num_heads=1, mlp_layer=16,
                       max_len=8, dropout=0.0)
    m = SASRec(item_num=30, cfg=cfg)
    x1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    x2 = x1.at[0, -1].set(9)
    params = m.init(KEY, x1)
    f1 = np.asarray(m.apply(params, x1))
    f2 = np.asarray(m.apply(params, x2))
    np.testing.assert_allclose(f1[0, :-1], f2[0, :-1], atol=1e-5)
    assert not np.allclose(f1[0, -1], f2[0, -1])


def test_sasrec_losses_finite_and_masked():
    cfg = SASRecConfig(d=8, num_blocks=1, num_heads=1, mlp_layer=16, max_len=6)
    m = SASRec(item_num=20, cfg=cfg)
    x = jnp.array([[0, 0, 1, 2, 3, 4]], jnp.int32)
    t = jnp.array([[0, 0, 2, 3, 4, 5]], jnp.int32)
    params = m.init(KEY, x)
    loss, valid = sasrec_mod.train_loss(m, params, x, t, KEY, cfg, 20)
    assert float(valid) == 4.0
    assert np.isfinite(float(loss))
    # fully padded batch → zero loss, no NaN
    z = jnp.zeros_like(x)
    loss0, valid0 = sasrec_mod.train_loss(m, params, z, z, KEY, cfg, 20)
    assert float(valid0) == 0.0 and float(loss0) == 0.0


def test_rqvae_roundtrip_and_ste():
    cfg = RQVAEConfig(in_dim=24, layers=(32, 16), e_dim=8,
                      num_emb_list=(8, 8, 8), dropout=0.0,
                      sk_epsilons=(0.01, 0.01, 0.01))
    m = RQVAE(cfg)
    x = jax.random.normal(KEY, (16, 24))
    params = m.init(KEY, x)
    out, rq_loss, indices = m.apply(params, x, use_sk=True)
    assert out.shape == x.shape and indices.shape == (16, 3)
    total, recon = m.apply(params, out, rq_loss, x, method=RQVAE.compute_loss)
    assert float(total) >= float(recon)
    # gradient flows through the STE to the encoder
    def loss(p):
        o, rq, _ = m.apply(p, x, use_sk=False)
        t, _ = m.apply(p, o, rq, x, method=RQVAE.compute_loss)
        return t
    g = jax.grad(loss)(params)
    enc_g = jax.tree_util.tree_leaves(g["params"]["encoder"])
    assert all(np.isfinite(np.asarray(x)).all() for x in enc_g)
    assert any(float(jnp.abs(x).sum()) > 0 for x in enc_g)
    # codebooks receive gradient via the codebook loss
    cb_g = g["params"]["codebook_0"]
    assert float(jnp.abs(cb_g).sum()) > 0


def test_rqvae_kmeans_init_reduces_quant_error():
    cfg = RQVAEConfig(in_dim=16, layers=(24,), e_dim=8, num_emb_list=(8, 8),
                      dropout=0.0, sk_epsilons=(0.0, 0.0), kmeans_iters=20)
    m = RQVAE(cfg)
    x = jax.random.normal(KEY, (64, 16))
    params = m.init(KEY, x)
    _, rq0, _ = m.apply(params, x, use_sk=False)
    params2 = kmeans_init_codebooks(params, m, x, KEY)
    _, rq1, _ = m.apply(params2, x, use_sk=False)
    assert float(rq1) < float(rq0)


def test_collision_rate():
    idx = np.array([[1, 2], [1, 2], [3, 4]])
    assert collision_rate(idx) == pytest.approx(1 / 3)


def test_relative_position_bucket_matches_hf_reference():
    """Spot-check bucket values against the published T5 bucketing rules."""
    rp = jnp.array([[-3, -1, 0, 1, 5, 100]])
    bi = relative_position_bucket(rp, bidirectional=True, num_buckets=32,
                                  max_distance=128)
    # bidirectional: positive side offset by 16
    assert int(bi[0, 2]) == 0
    assert int(bi[0, 1]) == 1 and int(bi[0, 0]) == 3
    assert int(bi[0, 3]) == 17 and int(bi[0, 4]) == 21
    uni = relative_position_bucket(rp, bidirectional=False, num_buckets=32,
                                   max_distance=128)
    assert int(uni[0, 2]) == 0 and int(uni[0, 3]) == 0  # future → bucket 0
    assert int(uni[0, 0]) == 3


def test_shift_right():
    labels = jnp.array([[5, 6, -100]], jnp.int32)
    out = shift_right(labels, decoder_start=0, pad_id=0)
    assert out.tolist() == [[0, 5, 6]]


def test_cross_entropy_ignore():
    logits = jnp.zeros((1, 3, 4))
    labels = jnp.array([[1, -100, 2]])
    ce = cross_entropy_with_ignore(logits, labels)
    assert float(ce) == pytest.approx(np.log(4.0), rel=1e-5)


def test_t5_encdec_decoder_causality():
    m = T5EncoderDecoder(TINY_ARCH)
    ii = jnp.arange(1, 7)[None].astype(jnp.int32)
    am = jnp.ones_like(ii)
    lab = jnp.array([[1, 9, 17, 25]], jnp.int32)
    params = m.init(KEY, ii, am, lab)
    _, logits1 = m.apply(params, ii, am, lab)
    lab2 = lab.at[0, -1].set(26)
    _, logits2 = m.apply(params, ii, am, lab2)
    # decoder is causal: token t logits depend only on labels < t
    np.testing.assert_allclose(np.asarray(logits1[:, :3]),
                               np.asarray(logits2[:, :3]), atol=1e-5)


def test_t5_encoder_mask_blocks_padding():
    m = T5EncoderDecoder(TINY_ARCH)
    ii = jnp.array([[3, 4, 5, 0, 0, 0]], jnp.int32)
    am = (ii != 0).astype(jnp.int32)
    lab = jnp.array([[1, 9, 17, 25]], jnp.int32)
    params = m.init(KEY, ii, am, lab)
    _, l1 = m.apply(params, ii, am, lab)
    ii2 = ii.at[0, -1].set(63)  # change a masked position
    _, l2 = m.apply(params, ii2, am, lab)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_dense_t5_contrastive_identity():
    from genrec_tpu.models.dense_t5 import contrastive_loss
    e = jax.random.normal(KEY, (8, 16))
    # identical pred/target → low loss; shuffled target → higher
    l_same = float(contrastive_loss(e, e, 0.07))
    perm = jnp.roll(e, 1, axis=0)
    l_diff = float(contrastive_loss(e, perm, 0.07))
    assert l_same < l_diff


def test_t5_remat_grads_match():
    """arch.remat=True (block-level jax.checkpoint) must change memory, not
    math: loss and grads equal the non-remat tower bit-for-bit (up to f32
    reassociation)."""
    import dataclasses

    from genrec_tpu.configs import TIGERConfig
    from genrec_tpu.models.tiger import TIGER

    cfg = TIGERConfig()
    cfg_r = dataclasses.replace(
        cfg, arch=dataclasses.replace(cfg.arch, remat=True))
    m, mr = TIGER(cfg), TIGER(cfg_r)
    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(1, 33, size=(4, 80)), jnp.int32)
    am = jnp.ones((4, 80), jnp.int32)
    lab = jnp.asarray(rng.integers(1, 33, size=(4, 4)), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), ii, am, lab)

    def loss(mod):
        def f(p):
            l, _ = mod.apply(p, ii, am, lab)
            return l
        return f

    l1, g1 = jax.value_and_grad(loss(m))(p)
    l2, g2 = jax.value_and_grad(loss(mr))(p)
    assert abs(float(l1) - float(l2)) < 1e-6
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in
              zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)))
    assert err < 1e-5
