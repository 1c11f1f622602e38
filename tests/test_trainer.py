"""Trainer unit tests, including the device-resident dataset mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configs import TrainerConfig
from genrec_tpu.train.trainer import Trainer


def _linear_regression_setup(n=256, d=8, seed=0):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=(d,)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = x @ w_true + 0.01 * rng.normal(size=n).astype(np.float32)
    params = {"w": jnp.zeros(d)}

    def loss_fn(p, batch, rng_):
        pred = batch["x"] @ p["w"]
        valid = batch["valid"].astype(jnp.float32)
        se = (pred - batch["y"]) ** 2 * valid
        n_valid = jnp.maximum(valid.sum(), 1.0)
        return se.sum() / n_valid, {"sum_loss": se.sum(), "valid": valid.sum()}

    return {"x": x, "y": y}, params, loss_fn


def test_device_resident_training(tmp_path):
    data, params, loss_fn = _linear_regression_setup()
    cfg = TrainerConfig(epochs=20, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "c"), early_stop_patience=50)
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn, steps_per_epoch=4,
                 train_data=data, val_data=data)
    result = tr.fit()
    assert result.train_losses[-1] < 0.05
    assert result.val_losses[-1] < 0.05


def test_device_resident_matches_streaming(tmp_path):
    """Same data, same seeds → both modes must learn to the same ballpark."""
    from genrec_tpu.data import datasets
    data, params, loss_fn = _linear_regression_setup()
    cfg = TrainerConfig(epochs=10, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "a"), early_stop_patience=50)
    tr1 = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                  train_data=data, val_data=data)
    r1 = tr1.fit()
    cfg2 = dataclasses.replace(cfg, ckpt_dir=str(tmp_path / "b"))
    tr2 = Trainer(cfg2, init_params=params, loss_fn=loss_fn)
    r2 = tr2.fit(
        lambda e: datasets.iterate_batches(data, 64, shuffle=True, seed=e),
        lambda e: datasets.iterate_batches(data, 64, shuffle=False),
    )
    assert abs(r1.train_losses[-1] - r2.train_losses[-1]) < 0.05


def test_final_partial_batch_masked(tmp_path):
    """n not divisible by batch size: padded rows must not affect the loss."""
    data, params, loss_fn = _linear_regression_setup(n=100)
    cfg = TrainerConfig(epochs=1, batch_size=64, eval_batch_size=64, lr=0.0,
                        ckpt_dir=str(tmp_path / "c"))
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                 train_data=data, val_data=data)
    result = tr.fit()
    # with lr=0 the train loss equals the val loss exactly (same params)
    assert abs(result.train_losses[0] - result.val_losses[0]) < 1e-4


def test_nan_loss_aborts(tmp_path):
    import pytest
    data, params, _ = _linear_regression_setup()

    def nan_loss(p, batch, rng_):
        bad = jnp.sum(p["w"]) * jnp.nan
        return bad, {"sum_loss": bad, "valid": jnp.asarray(1.0)}

    cfg = TrainerConfig(epochs=5, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "c"))
    tr = Trainer(cfg, init_params=params, loss_fn=nan_loss, steps_per_epoch=2,
                 train_data=data, val_data=data)
    with pytest.raises(ValueError, match="diverged"):
        tr.fit()


def test_bucketed_training_matches_flat(tmp_path):
    """train_data_buckets: one scan per bucket per epoch; converges like
    the flat path and counts every example exactly once per epoch."""
    data, params, loss_fn = _linear_regression_setup()
    cfg = TrainerConfig(epochs=20, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "b"), early_stop_patience=50)
    buckets = [{k: v[:100] for k, v in data.items()},
               {k: v[100:] for k, v in data.items()}]
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn, steps_per_epoch=4,
                 train_data_buckets=buckets, val_data=data)
    result = tr.fit()
    assert result.train_losses[-1] < 0.05
    assert result.val_losses[-1] < 0.05


def test_sharded_dataset_mode(tmp_path):
    """cfg.shard_dataset=True: datasets split along the 8-device data axis,
    batches gather device-locally (shard_map), per-shard shuffled indices.
    Must converge like the replicated path, and the validation sum must
    equal the replicated run's (same row set; order-independent sum) —
    n=250 exercises the pad-to-multiple-of-8 tail and -1 index slots."""
    from genrec_tpu.parallel.auto import dp_shardings
    data, params, loss_fn = _linear_regression_setup(n=250)
    mesh, bs, rs = dp_shardings()
    assert mesh is not None  # conftest forces 8 CPU devices
    cfg = TrainerConfig(epochs=20, batch_size=64, lr=0.1, shard_dataset=True,
                        ckpt_dir=str(tmp_path / "s"), early_stop_patience=50)
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                 batch_sharding=bs, replicate_sharding=rs,
                 train_data=data, val_data=data)
    r = tr.fit()
    assert r.train_losses[-1] < 0.05

    # validation-loss equality vs the replicated path on identical params
    cfg2 = dataclasses.replace(cfg, shard_dataset=False,
                               ckpt_dir=str(tmp_path / "r"))
    t_sh = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                   batch_sharding=bs, replicate_sharding=rs,
                   train_data=data, val_data=data)
    t_re = Trainer(cfg2, init_params=params, loss_fn=loss_fn,
                   batch_sharding=bs, replicate_sharding=rs,
                   train_data=data, val_data=data)
    key = jax.random.PRNGKey(0)
    np.testing.assert_allclose(t_sh.evaluate_loss(None, key),
                               t_re.evaluate_loss(None, key), rtol=1e-5)


def test_sharded_dataset_buckets(tmp_path):
    """shard_dataset composes with length-bucketed epochs: each bucket is
    independently padded + row-sharded and indexed per shard."""
    from genrec_tpu.parallel.auto import dp_shardings
    data, params, loss_fn = _linear_regression_setup(n=230)
    mesh, bs, rs = dp_shardings()
    cfg = TrainerConfig(epochs=20, batch_size=64, lr=0.1, shard_dataset=True,
                        ckpt_dir=str(tmp_path / "sb"), early_stop_patience=50)
    buckets = [{k: v[:101] for k, v in data.items()},
               {k: v[101:] for k, v in data.items()}]
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                 batch_sharding=bs, replicate_sharding=rs,
                 train_data_buckets=buckets, val_data=data)
    r = tr.fit()
    assert r.train_losses[-1] < 0.05


def test_sharded_index_matrix_routing():
    """Every id the sharded index matrix assigns to batch block d must be
    resident on shard d, each real row appears exactly once, pads are -1."""
    n_real, n_loc, D, B = 250, 32, 8, 64
    mat = Trainer._index_matrix_sharded(n_real, n_loc, D, B,
                                        shuffle=True, seed=7)
    bloc = B // D
    seen = []
    for d in range(D):
        block = mat[:, d * bloc:(d + 1) * bloc].ravel()
        real = block[block >= 0]
        assert ((real >= d * n_loc) & (real < (d + 1) * n_loc)).all(), d
        seen.extend(real.tolist())
    assert sorted(seen) == list(range(n_real))


def test_bucket_by_target_len_partition():
    from genrec_tpu.data.datasets import bucket_by_target_len
    rng = np.random.default_rng(0)
    n, w, cd = 200, 40, 4
    labels = np.full((n, w), -100, np.int32)
    lens = rng.integers(1, w // cd + 1, size=n) * cd
    for i, L in enumerate(lens):
        labels[i, :L] = 7
    arrays = {"labels": labels, "x": np.arange(n, dtype=np.int32)}
    buckets = bucket_by_target_len(arrays, 4, cd)
    # every row lands in exactly one bucket, widths cover each row's length
    seen = np.concatenate([b["x"] for b in buckets])
    assert sorted(seen.tolist()) == list(range(n))
    for b in buckets:
        bl = (b["labels"] != -100).sum(1)
        assert b["labels"].shape[1] % cd == 0
        assert bl.max() <= b["labels"].shape[1]
        # no truncation: padded width of this bucket fits its longest row
        orig = (labels[np.isin(np.arange(n), b["x"])] != -100).sum(1)
        assert (np.sort(bl) == np.sort(orig)).all()
    # widths strictly increase and the last covers the global max
    widths = [b["labels"].shape[1] for b in buckets]
    assert widths == sorted(set(widths))
    assert widths[-1] >= lens.max()


def test_ckpt_every_epochs(tmp_path):
    """ckpt_every_epochs=3: latest-state saves land only on epochs 3 and 6
    (+ the final epoch), and resume restores from the most recent one.
    Best-val checkpoints are unaffected by the cadence."""
    data, params, loss_fn = _linear_regression_setup()
    cfg = TrainerConfig(epochs=7, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "c"), early_stop_patience=50,
                        ckpt_every_epochs=3)
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn, steps_per_epoch=4,
                 train_data=data, val_data=data)
    tr.fit()
    # resume: a fresh trainer restores the saved latest state
    cfg2 = dataclasses.replace(cfg, resume=True)
    tr2 = Trainer(cfg2, init_params=params, loss_fn=loss_fn,
                  steps_per_epoch=4, train_data=data, val_data=data)
    # the final epoch (7) always saves, so resume picks up from epoch 7
    assert tr2.start_epoch == 8
    np.testing.assert_allclose(np.asarray(tr2.params["w"]),
                               np.asarray(tr.params["w"]), atol=1e-6)


def test_composite_plan_covers_every_row_once():
    """Every row appears exactly once across the epoch; filler rows only
    ride in groups at least as wide as themselves; mix draws ~the
    requested fraction where donors suffice."""
    rng = np.random.default_rng(0)
    row_w = rng.choice([4, 8, 12, 16], size=500, p=[0.4, 0.3, 0.2, 0.1])
    widths = [4, 8, 12, 16]
    plan = Trainer._composite_plan(row_w, widths, batch_size=32, mix=0.5,
                                   seed=7)
    seen = []
    for w, mat in plan:
        ids = mat[mat >= 0]
        assert (row_w[ids] <= w).all()  # fits its group width
        seen.extend(ids.tolist())
    assert sorted(seen) == list(range(500))
    # the widest group should be ~half filler (natives: the 16s)
    w_top, mat_top = next((w, m) for w, m in plan if w == 16)
    ids = mat_top[mat_top >= 0]
    frac_filler = float((row_w[ids] < 16).mean())
    assert 0.3 < frac_filler < 0.7


def test_composite_width_training(tmp_path):
    """Composite mode trains through per-width jit specializations (labels
    sliced to the group width) and converges; -100-masked losses make the
    width slice semantics-preserving."""
    n, W = 256, 16
    rng = np.random.default_rng(0)
    w_true = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = x @ w_true
    # labels: y replicated across a per-row target length, -100 padded
    row_w = rng.choice([4, 8, 16], size=n)
    labels = np.full((n, W), -100.0, np.float32)
    for i, L in enumerate(row_w):
        labels[i, :L] = y[i]
    params = {"w": jnp.zeros(8)}

    def loss_fn(p, batch, rng_):
        pred = batch["x"] @ p["w"]
        lab = batch["labels"]
        m = (lab != -100.0) & batch["valid"][:, None]
        se = jnp.where(m, (pred[:, None] - lab) ** 2, 0.0)
        nv = jnp.maximum(m.sum(), 1)
        return se.sum() / nv, {"sum_loss": se.sum(), "valid": m.sum()}

    cfg = TrainerConfig(epochs=25, batch_size=64, lr=0.1,
                        ckpt_dir=str(tmp_path / "cw"), early_stop_patience=99)
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                 train_data={"x": x, "labels": labels},
                 composite_widths=[4, 8, 16], row_widths=row_w,
                 width_slice_keys=("labels",))
    r = tr.fit()
    assert r.train_losses[-1] < 0.05
    # only listed widths specialize; the shortest pool may fully drain
    # into wider groups as filler (mix=0.5), so 4 can legitimately be
    # absent
    ws = sorted(tr._composite_fns.keys())
    assert set(ws) <= {4, 8, 16} and len(ws) >= 2 and 16 in ws


def test_sharded_dataset_accepts_plain_device_arrays(tmp_path):
    """Regression: a dataset value that is a jax.Array WITHOUT a
    NamedSharding (plain device array → SingleDeviceSharding, which has
    no .mesh) must fall through to the pad-and-shard path instead of
    crashing the pre-placed-array probe."""
    from genrec_tpu.parallel.auto import dp_shardings
    data, params, loss_fn = _linear_regression_setup(n=64)
    data = {k: jnp.asarray(v) for k, v in data.items()}  # plain jax.Arrays
    mesh, bs, rs = dp_shardings()
    cfg = TrainerConfig(epochs=2, batch_size=32, lr=0.1, shard_dataset=True,
                        ckpt_dir=str(tmp_path / "pa"), early_stop_patience=9)
    tr = Trainer(cfg, init_params=params, loss_fn=loss_fn,
                 batch_sharding=bs, replicate_sharding=rs,
                 train_data=data, val_data=data)
    r = tr.fit()
    assert np.isfinite(r.train_losses[-1])


def test_composite_plan_property_fuzz():
    """Property fuzz across random length distributions, widths, batch
    sizes and mixes: exactly-once coverage and width-fit must hold
    everywhere."""
    rng = np.random.default_rng(123)
    for trial in range(12):
        n = int(rng.integers(5, 400))
        k = int(rng.integers(1, 5))
        widths = sorted(rng.choice(np.arange(1, 40) * 4, size=k,
                                   replace=False).tolist())
        row_w = rng.choice(widths, size=n,
                           p=rng.dirichlet(np.ones(k))).astype(np.int64)
        bs = int(rng.choice([8, 16, 64, 512]))
        mix = float(rng.choice([0.0, 0.25, 0.5, 0.9]))
        plan = Trainer._composite_plan(row_w, widths, bs, mix, seed=trial)
        seen = []
        for w, mat in plan:
            assert mat.shape[1] == bs
            ids = mat[mat >= 0]
            assert (row_w[ids] <= w).all(), (trial, w)
            seen.extend(ids.tolist())
        assert sorted(seen) == list(range(n)), trial
