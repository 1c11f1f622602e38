"""Distributed-layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from genrec_tpu.configs import MeshConfig
from genrec_tpu.ops.embedding import (alltoall_embedding_lookup,
                                      sharded_embedding_lookup)
from genrec_tpu.parallel.mesh import make_mesh
from genrec_tpu.parallel.sharding import (DEFAULT_RULES, batch_spec,
                                          match_partition_rules, shard_batch,
                                          shard_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh_dp():
    return make_mesh(MeshConfig(data_axis=-1, model_axis=1))


@pytest.fixture(scope="module")
def mesh_2x4():
    return make_mesh(MeshConfig(data_axis=2, model_axis=4))


def test_make_mesh_shapes(mesh_dp, mesh_2x4):
    assert mesh_dp.shape == {"data": 8, "model": 1}
    assert mesh_2x4.shape == {"data": 2, "model": 4}


def test_sharded_embedding_lookup_forward(mesh_2x4):
    V, D = 64, 16
    table = jnp.arange(V * D, dtype=jnp.float32).reshape(V, D)
    table = jax.device_put(table, NamedSharding(mesh_2x4, P("model", None)))
    ids = jnp.array(np.random.default_rng(0).integers(0, V, size=32),
                    jnp.int32)
    ids = jax.device_put(ids, NamedSharding(mesh_2x4, P("data")))
    out = sharded_embedding_lookup(table, ids, mesh_2x4)
    ref = np.asarray(jnp.take(jnp.arange(V * D, dtype=jnp.float32).reshape(V, D),
                              ids, axis=0))
    np.testing.assert_allclose(np.asarray(out), ref)


def test_sharded_embedding_lookup_grad(mesh_2x4):
    V, D = 32, 8
    table = jax.random.normal(jax.random.PRNGKey(0), (V, D))
    ids = jnp.array([1, 1, 5, 31, 0, 16, 16, 16], jnp.int32)

    def loss_sharded(t):
        ts = jax.device_put(t, NamedSharding(mesh_2x4, P("model", None)))
        e = sharded_embedding_lookup(ts, ids, mesh_2x4, data_axis=None)
        return jnp.sum(e * jnp.arange(len(ids))[:, None])

    def loss_ref(t):
        e = jnp.take(t, ids, axis=0)
        return jnp.sum(e * jnp.arange(len(ids))[:, None])

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_alltoall_lookup_grads_match_psum(mesh_2x4):
    """The a2a lookup is DIFFERENTIABLE: shard_map transposes the
    all_to_alls to their reverses and the takes to scatter-adds, so table
    grads equal the psum path's (which equal the dense jnp.take's —
    test_sharded_embedding_lookup_grad). Duplicated ids exercise the
    scatter-ADD; capacity is sized so no id drops."""
    V, D, B = 64, 8, 16
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=(B,)), jnp.int32)
    ids = ids.at[:4].set(ids[0])  # duplicates → scatter-add in the bwd
    ids = jax.device_put(ids, NamedSharding(mesh_2x4, P("data")))
    w = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def loss_psum(t):
        ts = jax.device_put(t, NamedSharding(mesh_2x4, P("model", None)))
        return jnp.sum(sharded_embedding_lookup(ts, ids, mesh_2x4) * w)

    def loss_a2a(t):
        ts = jax.device_put(t, NamedSharding(mesh_2x4, P("model", None)))
        e, ok = alltoall_embedding_lookup(ts, ids, mesh_2x4,
                                          capacity_factor=8.0)
        return jnp.sum(e * w), ok

    g1 = jax.jit(jax.grad(loss_psum))(table)
    (_, ok), g2 = jax.jit(jax.value_and_grad(loss_a2a, has_aux=True))(table)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_alltoall_overflow_grads_are_zero(mesh_2x4):
    """Overflow-dropped ids read zero rows AND contribute zero grads — the
    consistent pair (no silent gradient through a row that was never
    read)."""
    V, D = 32, 4
    table = jnp.ones((V, D), jnp.float32)
    # all ids in shard 0's range → guaranteed overflow at capacity 1
    ids = jnp.zeros((16,), jnp.int32)
    ids = jax.device_put(ids, NamedSharding(mesh_2x4, P("data")))

    def loss(t):
        ts = jax.device_put(t, NamedSharding(mesh_2x4, P("model", None)))
        e, ok = alltoall_embedding_lookup(ts, ids, mesh_2x4,
                                          capacity_factor=0.5)
        return jnp.sum(e), ok

    (val, ok), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(table)
    kept = int(jnp.sum(ok))
    assert 0 < kept < 16  # some dropped, some kept
    # grads land only on row 0, summing exactly one unit per KEPT id
    np.testing.assert_allclose(float(jnp.sum(g)), kept * D)
    np.testing.assert_allclose(np.asarray(g[1:]), 0.0)


def test_sharded_embedding_config_lookup_rule():
    from genrec_tpu.configs import ShardedEmbeddingConfig
    c = ShardedEmbeddingConfig(dim=64)
    assert c.preferred_lookup(2.0) == "psum"       # c=2 ≥ 2D/(D+1): wash
    assert c.preferred_lookup(1.5) == "alltoall"   # under-provisioned c wins
    assert ShardedEmbeddingConfig(dim=1).preferred_lookup(1.0) == "psum"


def test_sharded_embedding_lookup_2d_ids(mesh_2x4):
    V, D = 16, 4
    table = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (V, D)),
                           NamedSharding(mesh_2x4, P("model", None)))
    ids = jnp.arange(16, dtype=jnp.int32).reshape(4, 4) % V
    out = sharded_embedding_lookup(table, ids, mesh_2x4, data_axis=None)
    assert out.shape == (4, 4, D)


def test_alltoall_embedding_lookup(mesh_2x4):
    V, D = 64, 8
    table = jax.random.normal(jax.random.PRNGKey(2), (V, D))
    ts = jax.device_put(table, NamedSharding(mesh_2x4, P("model", None)))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.permutation(64)[:32].astype(np.int32))
    ids = jax.device_put(ids, NamedSharding(mesh_2x4, P("data")))
    out, ok = alltoall_embedding_lookup(ts, ids, mesh_2x4, capacity_factor=4.0)
    ok = np.asarray(ok)
    assert ok.all()  # generous capacity → nothing dropped
    ref = np.asarray(jnp.take(table, ids, axis=0))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_alltoall_overflow_flagged(mesh_2x4):
    V, D = 64, 8
    table = jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (V, D)),
                           NamedSharding(mesh_2x4, P("model", None)))
    # all ids hit shard 0 → guaranteed overflow at capacity_factor 1
    ids = jax.device_put(jnp.zeros(32, jnp.int32),
                         NamedSharding(mesh_2x4, P("data")))
    out, ok = alltoall_embedding_lookup(table, ids, mesh_2x4,
                                        capacity_factor=1.0)
    ok = np.asarray(ok)
    assert not ok.all()
    # surviving rows are correct, dropped rows are zero
    ref = np.asarray(table)[0]
    for row, flag in zip(np.asarray(out), ok):
        if flag:
            np.testing.assert_allclose(row, ref, atol=1e-6)
        else:
            assert np.all(row == 0)


def test_partition_rules_and_shard_params(mesh_2x4):
    params = {"params": {
        "item_emb": {"embedding": jnp.zeros((64, 16))},
        "blocks_0": {"ff": {"wi": {"kernel": jnp.zeros((16, 32))},
                            "wo": {"kernel": jnp.zeros((32, 16))}}},
        "norm": {"weight": jnp.zeros((16,))},
    }}
    specs = match_partition_rules(DEFAULT_RULES, params)
    assert specs["params"]["item_emb"]["embedding"] == P("model", None)
    assert specs["params"]["blocks_0"]["ff"]["wi"]["kernel"] == P(None, "model")
    assert specs["params"]["norm"]["weight"] == P()
    sharded = shard_params(params, mesh_2x4)
    emb = sharded["params"]["item_emb"]["embedding"]
    assert emb.sharding.spec == P("model", None)
    # 1D norm weight is replicated
    assert sharded["params"]["norm"]["weight"].sharding.spec == P()


def test_data_parallel_train_step_agrees_with_single(mesh_dp):
    """The same jit step on a DP mesh must produce identical numerics."""
    from genrec_tpu.configs import SASRecConfig
    from genrec_tpu.models import SASRec
    from genrec_tpu.models.sasrec import train_loss

    cfg = SASRecConfig(d=8, num_blocks=1, num_heads=1, mlp_layer=16,
                       max_len=8, dropout=0.0, num_neg_samples=2)
    m = SASRec(item_num=20, cfg=cfg)
    x = jnp.tile(jnp.array([[0, 0, 1, 2, 3, 4, 5, 6]], jnp.int32), (16, 1))
    t = jnp.tile(jnp.array([[0, 0, 2, 3, 4, 5, 6, 7]], jnp.int32), (16, 1))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, xx, tt):
        l, _ = train_loss(m, p, xx, tt, jax.random.PRNGKey(1), cfg, 20)
        return l

    l_single = jax.jit(loss)(params, x, t)
    xs = jax.device_put(x, batch_spec(mesh_dp))
    ts = jax.device_put(t, batch_spec(mesh_dp))
    ps = jax.device_put(params, NamedSharding(mesh_dp, P()))
    l_dp = jax.jit(loss)(ps, xs, ts)
    np.testing.assert_allclose(float(l_single), float(l_dp), rtol=1e-5)
    g = jax.jit(jax.grad(loss))(ps, xs, ts)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_sasrec_large_sharded_grads_match_replicated(mesh_2x4):
    """North-star config 5: a 1M-row table trains through
    sharded_embedding_lookup; grads + one optimizer step match the
    replicated (plain jnp.take) run on identical params."""
    import dataclasses

    import optax

    from genrec_tpu.configs import (SASRecLargeConfig, ShardedEmbeddingConfig,
                                    TrainerConfig)
    from genrec_tpu.models.sasrec_large import SASRecLarge, train_loss_sampled

    cfg = SASRecLargeConfig(
        max_len=8, num_blocks=1, num_heads=1, mlp_layer=16, dropout=0.0,
        num_neg_samples=4,
        embedding=ShardedEmbeddingConfig(vocab_size=1_000_000, dim=8),
        trainer=TrainerConfig(batch_size=16))
    item_num = cfg.embedding.vocab_size - 1  # table rows = item_num + 1
    m_sh = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4,
                       use_sharded=True)
    m_rep = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4,
                        use_sharded=False)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(1, item_num, size=(16, 8)), jnp.int32)
    t = jnp.asarray(rng.integers(1, item_num, size=(16, 8)), jnp.int32)
    x = x.at[:, :2].set(0)  # left padding
    t = t.at[:, :2].set(0)

    params = m_rep.init(jax.random.PRNGKey(0), x)
    params_sh = shard_params(params, mesh_2x4)
    assert (params_sh["params"]["item_table"].sharding.spec
            == P("model", None))
    xs = jax.device_put(x, batch_spec(mesh_2x4))
    ts = jax.device_put(t, batch_spec(mesh_2x4))
    key = jax.random.PRNGKey(7)

    def loss_sh(p):
        l, _ = train_loss_sampled(m_sh, p, xs, ts, key, cfg, item_num)
        return l

    def loss_rep(p):
        l, _ = train_loss_sampled(m_rep, p, x, t, key, cfg, item_num)
        return l

    (l1, g1) = jax.jit(jax.value_and_grad(loss_sh))(params_sh)
    (l2, g2) = jax.jit(jax.value_and_grad(loss_rep))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for path_g1, path_g2 in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(path_g1[1]),
                                   np.asarray(path_g2[1]), atol=1e-5,
                                   err_msg=str(path_g1[0]))

    # one full optimizer step through the sharded path stays sharded+finite
    tx = optax.adam(1e-3)
    opt_state = tx.init(params_sh)
    updates, opt_state = tx.update(g1, opt_state, params_sh)
    new_params = optax.apply_updates(params_sh, updates)
    assert (new_params["params"]["item_table"].sharding.spec
            == P("model", None))
    l3 = jax.jit(loss_sh)(new_params)
    assert np.isfinite(float(l3)) and float(l3) < float(l1)


def test_sasrec_large_sharded_topk_exact(mesh_2x4):
    """predict_topk via per-shard scoring equals the dense full-vocab topk."""
    from genrec_tpu.configs import SASRecLargeConfig, ShardedEmbeddingConfig
    from genrec_tpu.models.sasrec_large import SASRecLarge

    cfg = SASRecLargeConfig(
        max_len=8, num_blocks=1, num_heads=1, mlp_layer=16, dropout=0.0,
        embedding=ShardedEmbeddingConfig(vocab_size=256, dim=8))
    item_num = cfg.embedding.vocab_size - 1
    m_sh = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4)
    m_rep = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4,
                        use_sharded=False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(1, item_num, size=(8, 8)), jnp.int32)
    params = m_rep.init(jax.random.PRNGKey(2), x)
    params_sh = shard_params(params, mesh_2x4)
    xs = jax.device_put(x, batch_spec(mesh_2x4))

    v1, i1 = jax.jit(lambda p, xx: m_sh.apply(
        p, xx, 10, method=SASRecLarge.predict_topk))(params_sh, xs)
    v2, i2 = jax.jit(lambda p, xx: m_rep.apply(
        p, xx, 10, method=SASRecLarge.predict_topk))(params, x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_sasrec_large_alltoall_eval_matches_psum(mesh_2x4):
    """The selectable all_to_all eval lookup (lookup_impl='alltoall')
    produces the same forward/topk as the psum path — the VERDICT r2
    integration of `alltoall_embedding_lookup` into a real model surface."""
    from genrec_tpu.configs import SASRecLargeConfig, ShardedEmbeddingConfig
    from genrec_tpu.models.sasrec_large import SASRecLarge

    cfg = SASRecLargeConfig(
        max_len=8, num_blocks=1, num_heads=1, mlp_layer=16, dropout=0.0,
        embedding=ShardedEmbeddingConfig(vocab_size=256, dim=8))
    item_num = cfg.embedding.vocab_size - 1
    m_psum = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4)
    m_a2a = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4,
                        lookup_impl="alltoall", alltoall_capacity=4.0)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(1, item_num, size=(8, 8)), jnp.int32)
    params = SASRecLarge(item_num=item_num, cfg=cfg, mesh=mesh_2x4,
                         use_sharded=False).init(jax.random.PRNGKey(2), x)
    params_sh = shard_params(params, mesh_2x4)
    xs = jax.device_put(x, batch_spec(mesh_2x4))

    v1, i1 = jax.jit(lambda p, xx: m_psum.apply(
        p, xx, 10, method=SASRecLarge.predict_topk))(params_sh, xs)
    v2, i2 = jax.jit(lambda p, xx: m_a2a.apply(
        p, xx, 10, method=SASRecLarge.predict_topk))(params_sh, xs)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_tiger_pipeline_tensor_parallel_matches_dp(tmp_path):
    """TIGER pipeline trains with the TP param layout (mesh 4×2: d_ff and
    attention projections split over 'model') and its loss trajectory
    matches the pure-DP run — TP only changes layout, never math."""
    from genrec_tpu import configs
    from genrec_tpu.data import datasets, synthetic, tiger_tokens
    from genrec_tpu.pipelines import tiger_pipeline

    corpus = synthetic.make_interactions(num_users=200, num_items=60,
                                         min_len=4, max_len=12, num_topics=6,
                                         topic_stickiness=0.95, seed=7)
    codes = synthetic.make_codes(num_items=60, codebook_size=8, num_levels=3,
                                 seed=5)
    train_split, test_split = tiger_tokens.build_tiger_splits(
        corpus.item_id_lists, corpus.user_ids, codes)
    arch = configs.T5ArchConfig(vocab_size=64, num_layers=1,
                                num_decoder_layers=1, d_model=32, d_ff=64,
                                num_heads=2, d_kv=16, dropout_rate=0.0)

    def run(model_axis):
        cfg = configs.TIGERConfig(
            arch=arch, max_len=8, beam_size=5, topk_list=(1, 5),
            mesh=configs.MeshConfig(data_axis=8 // model_axis,
                                    model_axis=model_axis),
            trainer=configs.TrainerConfig(
                epochs=2, batch_size=64, eval_batch_size=64, lr=1e-2,
                ckpt_dir=str(tmp_path / f"ckpt_m{model_axis}"),
                early_stop_patience=10, seed=0))
        tr = datasets.build_tiger_arrays(train_split, cfg.max_len, cfg.code_dim)
        te = datasets.build_tiger_arrays(test_split, cfg.max_len, cfg.code_dim,
                                         max_target_items=1)
        return tiger_pipeline.train(cfg, tr, te)

    art_tp = run(model_axis=2)
    # the TP layout actually applied: a d_ff kernel is split over 'model'
    ff_sh = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, x: x.sharding
            if "wi" in "/".join(str(k) for k in p) else None,
            art_tp.params["params"]))
    assert any("model" in str(s.spec) for s in ff_sh if s is not None)
    art_dp = run(model_axis=1)
    np.testing.assert_allclose(art_tp.result.train_losses,
                               art_dp.result.train_losses, rtol=2e-4)


# ------------------------------------------------------------ ring attention
@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(mesh_dp, causal):
    """Context-parallel ring attention (sequence sharded over 8 devices)
    equals single-device attention, values AND grads — the SP/CP wiring on
    top of the blockwise kernel (SURVEY §5 long-context)."""
    from genrec_tpu.ops.attention import _xla_attention
    from genrec_tpu.ops.ring_attention import ring_attention

    b, h, L, d = 2, 2, 64, 16  # L shards to 8 tokens/device
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, L, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, L, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, L, d))
    seq_sh = NamedSharding(mesh_dp, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, seq_sh) for x in (q, k, v))

    out = ring_attention(qs, ks, vs, mesh_dp, causal=causal)
    ref = _xla_attention(q, k, v, None, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    w = jax.random.normal(jax.random.PRNGKey(3), (b, h, L, d))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh_dp, causal=causal) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, causal) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-5)


def test_ring_attention_dp_cp_mesh(mesh_2x4):
    """DP x CP: batch over 'data', sequence over 'model' — both at once."""
    from genrec_tpu.ops.attention import _xla_attention
    from genrec_tpu.ops.ring_attention import ring_attention

    b, h, L, d = 4, 2, 32, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, L, d))
    sh = NamedSharding(mesh_2x4, P("data", None, "model", None))
    qs = jax.device_put(q, sh)
    out = ring_attention(qs, qs, qs, mesh_2x4, axis_name="model",
                         causal=True, batch_axis="data")
    ref = _xla_attention(q, q, q, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_process_rows_and_make_global_array(mesh_2x4):
    """Single-process semantics of the per-host loader helpers: one
    process owns ALL rows; make_global_array round-trips both host-global
    and 'process-local' (here: full) data under either sharding."""
    from genrec_tpu.parallel.mesh import make_global_array, process_rows

    bs = batch_spec(mesh_2x4)
    lo, hi = process_rows(bs, 32)
    assert (lo, hi) == (0, 32)
    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4)
    g1 = make_global_array(x, bs)
    g2 = make_global_array(x[lo:hi], bs, process_local=True)
    np.testing.assert_array_equal(np.asarray(g1), x)
    np.testing.assert_array_equal(np.asarray(g2), x)
    assert g1.sharding.spec == bs.spec
