"""The one Trainer shared by all pipelines.

Replaces each reference pipeline's hand-rolled epoch loop
(`SASRec/train.py:84-220`, `RQ-VAE/train.py:15-250`, `RQVAE-T5/train.py:62-151`,
`T5/train.py:134-207`) with a single jit-stepped engine:

- a donated, jitted train step (grads + optax update fully on device),
- per-epoch validation loss, early stopping on patience,
- best-checkpoint tracking + bounded latest-checkpoint retention + resume
  (orbax, full train state — see `genrec_tpu.train.checkpoint`),
- per-epoch wall-clock + examples/s metrics, loss curves, file logging,
- optional device-mesh data sharding: batches are placed with a
  ``NamedSharding(mesh, P('data', ...))`` so the same step function runs
  1-chip or N-chip data-parallel without code changes.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genrec_tpu.configs import TrainerConfig
from genrec_tpu.train.checkpoint import CheckpointStore, abstract_like
from genrec_tpu.train.optim import make_optimizer
from genrec_tpu.utils.misc import enable_compilation_cache, get_logger
from genrec_tpu.utils.plotting import plot_loss_curves

# loss_fn(params, batch, rng) -> (loss, aux_dict);  aux must contain
# "sum_loss" and "valid" when per-valid-normalized epoch means are wanted.
LossFn = Callable[[Any, Dict[str, jnp.ndarray], jax.Array], Tuple[jnp.ndarray, Dict]]
BatchIterFactory = Callable[[int], Iterator[Dict[str, np.ndarray]]]


@dataclasses.dataclass
class TrainLoopResult:
    best_params: Any
    final_params: Any
    train_losses: List[float]
    val_losses: List[float]
    best_val_loss: float
    epochs_run: int
    examples_per_sec: float
    # excludes the first epoch (jit compile) — the per-chip steady rate the
    # BASELINE.md ≥3× target is judged on; equals examples_per_sec for runs
    # that hit the persistent compilation cache
    steady_examples_per_sec: float = 0.0
    # wall-clock breakdown: train / val / ckpt / other seconds
    phase_seconds: Optional[Dict[str, float]] = None


class Trainer:
    def __init__(
        self,
        cfg: TrainerConfig,
        *,
        init_params: Any,
        loss_fn: LossFn,
        eval_loss_fn: Optional[LossFn] = None,
        steps_per_epoch: int = 1,
        logger_name: str = "genrec",
        batch_sharding=None,
        replicate_sharding=None,
        param_shardings=None,
        train_data: Optional[Dict[str, np.ndarray]] = None,
        train_data_buckets: Optional[List[Dict[str, np.ndarray]]] = None,
        val_data: Optional[Dict[str, np.ndarray]] = None,
        extra_data: Optional[Dict[str, np.ndarray]] = None,
        train_rows: Optional[int] = None,
        val_rows: Optional[int] = None,
        composite_widths: Optional[List[int]] = None,
        row_widths: Optional[np.ndarray] = None,
        width_slice_keys: Tuple[str, ...] = ("labels",),
    ):
        """``train_data``/``val_data`` enable *device-resident* datasets:
        the full arrays are uploaded once and each step gathers its batch
        on device from a tiny index vector — no per-step host→device
        payloads (the reference's DataLoader ships every batch over the
        bus; over a network-attached TPU that dominates step time). When
        set, `fit()`/`evaluate_loss()` may be called without batch
        factories. ``extra_data`` holds non-per-sample device tables
        (e.g. item embedding matrices) delivered to the loss under
        ``batch['_extra']`` — also passed as jit arguments rather than
        being baked in as constants.

        Dataset placement has two modes (``cfg.shard_dataset``; auto-on
        across processes): REPLICATED (every device holds the full arrays,
        batches gather by global index — single-process default) and
        ROW-SHARDED (arrays split along the mesh 'data' axis, each batch
        position gathering from ITS device's resident rows inside a
        shard_map — zero gather traffic, and each process materializes
        only its slice). In sharded mode ``train_data``/``val_data``
        values may also be pre-placed global ``jax.Array``s built by a
        per-host loader (`parallel.mesh.make_global_array(...,
        process_local=True)` over its `parallel.mesh.process_rows`
        slice); pass ``train_rows``/``val_rows`` = the REAL global row
        count when the placed arrays carry padding rows."""
        self.cfg = cfg
        self.loss_fn = loss_fn
        self.eval_loss_fn = eval_loss_fn or loss_fn
        # persistent XLA compile cache: the whole-epoch scan / beam programs
        # cost 100s+ to compile; repeat runs (parity sweeps, benches) hit it
        enable_compilation_cache()
        if train_data_buckets is not None:
            # schedules must count the real optimizer steps: a bucketed epoch
            # runs sum(ceil(n_b/B)) steps, which exceeds the flat ceil(N/B)
            # the caller would pass (each bucket pads its own tail batch)
            steps_per_epoch = sum(
                -(-len(next(iter(d.values()))) // cfg.batch_size)
                for d in train_data_buckets)
        self.tx = make_optimizer(cfg, steps_per_epoch)
        # defensive copy: the jitted step donates params, which would
        # otherwise consume the caller's arrays
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, init_params)
        self.opt_state = self.tx.init(init_params)
        self.step = 0
        self.start_epoch = 1
        self.best_val = float("inf")
        self.logger = get_logger(logger_name, cfg.log_path)
        self.store = CheckpointStore(cfg.ckpt_dir, keep=cfg.keep_checkpoints)
        self.batch_sharding = batch_sharding
        self.replicate_sharding = replicate_sharding
        _some_sh = (next(iter(batch_sharding.values()), None)
                    if isinstance(batch_sharding, dict) else batch_sharding)
        self._mesh = getattr(_some_sh, "mesh",
                             getattr(replicate_sharding, "mesh", None))
        self._data_axis = (dict(self._mesh.shape).get("data", 1)
                           if self._mesh is not None else 1)
        if batch_sharding is not None and self._mesh is not None:
            d = self._data_axis
            assert cfg.batch_size % d == 0 and cfg.eval_batch_size % d == 0, (
                f"batch sizes ({cfg.batch_size}/{cfg.eval_batch_size}) must "
                f"divide the data axis ({d}) — padded batches shard evenly")
        # sharded-dataset mode: auto on multi-process (a host-global
        # replicated dataset cannot scale past one host's memory, and
        # device_put of host-global arrays is exactly what multi-host
        # setups must avoid); force with cfg.shard_dataset for tests.
        self._shard_data = (cfg.shard_dataset if cfg.shard_dataset is not None
                            else jax.process_count() > 1)
        if self._shard_data:
            assert self._mesh is not None and self._data_axis >= 1, (
                "sharded-dataset mode needs a mesh: pass batch_sharding/"
                "replicate_sharding built over a ('data','model') mesh")
        if jax.process_count() > 1:
            assert self._mesh is not None, (
                "multi-process training requires a mesh (dp_shardings)")
        if param_shardings is not None:
            # tensor-parallel layout: place each param per its rule, then
            # re-init the optimizer from the placed tree so mu/nu inherit
            # the same shardings (eager zeros_like preserves placement).
            self.params = jax.device_put(self.params, param_shardings)
            self.opt_state = self.tx.init(self.params)
        elif replicate_sharding is not None:
            self.params = jax.device_put(self.params, replicate_sharding)
            self.opt_state = jax.device_put(self.opt_state, replicate_sharding)

        def train_step(params, opt_state, batch, rng):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        def eval_step(params, batch, rng):
            return self.eval_loss_fn(params, batch, rng)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

        # device-resident mode: upload datasets once; a whole epoch runs as
        # ONE jitted lax.scan over the shuffled index matrix — zero
        # per-step host dispatch (per-step RPC latency over a
        # network-attached TPU otherwise dominates small-model steps).
        # Under a multi-device mesh the datasets are REPLICATED (every
        # device gathers the full batch — trivially cheap next to the
        # matmuls) and the gathered batch is then constrained to the
        # 'data' sharding, so grads/optimizer run data-parallel without
        # falling back to per-batch host dispatch.
        self._train_data = self._val_data = None
        # (real_rows, rows_per_data_shard) per dataset — drives the index
        # matrices; None means the replicated path (real_rows == len(arr))
        self._train_meta = self._val_meta = None
        self._bucket_meta: Optional[List] = None
        self._composite = None

        def _put_replicated(data):
            return {k: jax.device_put(v, self.replicate_sharding)
                    if self.replicate_sharding is not None else jax.device_put(v)
                    for k, v in data.items()}

        def _put_dataset(data, rows: Optional[int] = None):
            """Place a dataset dict; returns (device_dict, meta).

            Replicated mode: full arrays on every device, meta=None.
            Sharded mode: rows padded to a multiple of the data axis and
            split across it; already-placed global jax.Arrays pass through
            (the per-host-loader path), with ``rows`` giving the real
            global count when the placed arrays carry padding."""
            if not self._shard_data:
                return _put_replicated(data), None
            from jax.sharding import NamedSharding, PartitionSpec as P
            D = self._data_axis
            row_sh = NamedSharding(self._mesh, P("data"))
            out = {}
            n_pad = None
            for k, v in data.items():
                if isinstance(v, jax.Array) and \
                        getattr(v.sharding, "mesh", None) == self._mesh:
                    out[k] = v  # pre-placed by a per-host loader
                    n_here = v.shape[0]
                else:
                    v = np.asarray(v)
                    pad = (-len(v)) % D
                    if pad:
                        v = np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                    out[k] = jax.device_put(v, row_sh)
                    n_here = len(v)
                assert n_pad is None or n_pad == n_here, (
                    f"dataset arrays disagree on padded rows: {n_pad} vs "
                    f"{n_here} ({k})")
                n_pad = n_here
            n_real = rows if rows is not None else len(
                next(iter(data.values())))
            assert n_real <= n_pad, (n_real, n_pad)
            return out, (n_real, n_pad // D)

        def _constrain(batch):
            if self.batch_sharding is None:
                return batch
            out = {}
            for k, v in batch.items():
                if k == "_extra":
                    out[k] = v
                    continue
                sh = (self.batch_sharding.get(k)
                      if isinstance(self.batch_sharding, dict)
                      else self.batch_sharding)
                out[k] = jax.lax.with_sharding_constraint(v, sh)
            return out

        self._extra_data = (_put_replicated(extra_data)
                            if extra_data is not None else None)
        self._train_buckets = None
        if train_data_buckets is not None:
            # length-bucketed device-resident training: each bucket is a
            # full data dict whose padded width matches ITS longest row, so
            # short-target batches don't pay the corpus-max decoder cost
            # (the reference collate pads per batch max; static XLA shapes
            # make per-bucket the TPU-idiomatic equivalent). One scan per
            # bucket per epoch; jit re-specializes per bucket shape.
            assert train_data is None, "pass buckets OR a flat dataset"
            placed = [_put_dataset(d) for d in train_data_buckets]
            self._train_buckets = [p[0] for p in placed]
            self._bucket_meta = [p[1] for p in placed]
            train_data = train_data_buckets[0]  # defines the epoch fn below
        def _take_rows(data, idx):
            """Batch-row gather. Replicated mode: global jnp.take.
            Sharded mode: each device's block of batch positions is
            filled from ITS resident rows inside a shard_map (the
            index matrices route shard-owned row ids to shard-owned
            batch slots, so the gather is device-local — no
            collectives)."""
            if not self._shard_data:
                return {k: jnp.take(v, jnp.maximum(idx, 0), axis=0)
                        for k, v in data.items()}
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            keys = sorted(data.keys())

            def local(idx_loc, *arrs):
                d = jax.lax.axis_index("data")
                nloc = arrs[0].shape[0]
                li = jnp.clip(idx_loc - d * nloc, 0, nloc - 1)
                return tuple(jnp.take(a, li, axis=0) for a in arrs)

            outs = shard_map(
                local, mesh=self._mesh,
                in_specs=(P("data"),) + (P("data"),) * len(keys),
                out_specs=(P("data"),) * len(keys),
            )(idx, *(data[k] for k in keys))
            return dict(zip(keys, outs))

        if train_data is not None:
            if self._train_buckets is None:
                self._train_data, self._train_meta = _put_dataset(
                    train_data, train_rows)

            def _gather(data, idx, extra):
                batch = _take_rows(data, idx)
                batch["valid"] = idx >= 0
                if extra is not None:
                    batch["_extra"] = extra
                return _constrain(batch)

            # the dataset is passed as an ARGUMENT pytree (device buffers are
            # handed over by reference) — closing over it would embed the
            # arrays as jit constants, which a remote-PJRT client re-ships
            # on every call.
            def make_train_epoch(post_gather=None):
                def train_epoch(params, opt_state, idx_mat, rng, data, extra):
                    def body(carry, idx):
                        params, opt_state, rng = carry
                        rng, sub = jax.random.split(rng)
                        batch = _gather(data, idx, extra)
                        if post_gather is not None:
                            batch = post_gather(batch)
                        (loss, aux), grads = jax.value_and_grad(
                            self.loss_fn, has_aux=True)(params, batch, sub)
                        updates, opt_state = self.tx.update(grads, opt_state,
                                                            params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_state, rng), (
                            aux.get("sum_loss", loss), aux.get("valid", 1.0))
                    (params, opt_state, _), (sl, vl) = jax.lax.scan(
                        body, (params, opt_state, rng), idx_mat)
                    return params, opt_state, jnp.sum(sl), jnp.sum(vl)
                return train_epoch

            self._train_epoch_fn = jax.jit(make_train_epoch(),
                                           donate_argnums=(0, 1))

            # COMPOSITE width mode: one flat full-width dataset; per epoch
            # each row is assigned to a STATIC batch width ≥ its own
            # length, with cfg.composite_mix of every width group's slots
            # filled by random shorter rows — mixed-length batch
            # composition (the quality gap of per-bucket epochs,
            # bucket_quality_r4_interleaved.json) at a bounded padding
            # cost. The gather reads full-width rows (cheap — bytes, not
            # compute); the model then runs at the group width via a
            # static slice of `width_slice_keys`. One jit specialization
            # per width, compiled lazily and cached.
            if composite_widths is not None:
                assert self._train_buckets is None, \
                    "composite widths replace buckets — pass flat data"
                assert not self._shard_data, \
                    "composite widths + sharded datasets: not yet composed"
                assert row_widths is not None
                full_w = None
                for k in width_slice_keys:
                    assert k in train_data, k
                    full_w = train_data[k].shape[1]
                self._composite = (sorted(composite_widths),
                                   np.asarray(row_widths))
                self._composite_fns: Dict[int, Any] = {}

                def _fn_for_width(w):
                    if w not in self._composite_fns:
                        if w == full_w:
                            post = None  # full width: no slice needed
                        else:
                            def post(batch, _w=w):
                                return {
                                    k: (v[:, :_w] if k in width_slice_keys
                                        else v)
                                    for k, v in batch.items()}
                        self._composite_fns[w] = jax.jit(
                            make_train_epoch(post), donate_argnums=(0, 1))
                    return self._composite_fns[w]

                self._composite_fn_for_width = _fn_for_width
        if val_data is not None:
            self._val_data, self._val_meta = _put_dataset(val_data, val_rows)

            def eval_epoch(params, idx_mat, rng, data, extra):
                def body(rng, idx):
                    rng, sub = jax.random.split(rng)
                    batch = _take_rows(data, idx)
                    batch["valid"] = idx >= 0
                    if extra is not None:
                        batch["_extra"] = extra
                    batch = _constrain(batch)
                    _, aux = self.eval_loss_fn(params, batch, sub)
                    return rng, (aux["sum_loss"], aux["valid"])
                _, (sl, vl) = jax.lax.scan(body, rng, idx_mat)
                return jnp.sum(sl), jnp.sum(vl)

            self._eval_epoch_fn = jax.jit(eval_epoch)

        if cfg.resume:
            self._try_resume()

    # ------------------------------------------------------------------
    def _state_dict(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "step": self.step, "epoch": self.start_epoch,
                "best_val": self.best_val}

    def _try_resume(self):
        restored = self.store.restore_latest(abstract_like(self._state_dict()))
        if restored is not None:
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
            self.step = int(restored["step"])
            self.start_epoch = int(restored["epoch"]) + 1
            self.best_val = float(restored["best_val"])
            self.logger.info(
                f"Resumed from step {self.step} (epoch {self.start_epoch - 1}), "
                f"best_val={self.best_val:.4f}")

    def snapshot_params(self):
        """Deep-copy params into fresh buffers. Required before stashing a
        reference across steps: the jitted train step donates its params
        argument, so aliased buffers would be deleted on the next step."""
        return jax.tree_util.tree_map(jnp.copy, self.params)

    def _put(self, batch: Dict[str, np.ndarray]):
        if self.batch_sharding is None:
            return batch

        def one(k, v):
            sh = (self.batch_sharding.get(k)
                  if isinstance(self.batch_sharding, dict)
                  else self.batch_sharding)
            if jax.process_count() > 1:
                # factory path across processes: each process's iterator
                # yields ITS local rows of the global batch
                from genrec_tpu.parallel.mesh import make_global_array
                return make_global_array(v, sh, process_local=True)
            return jax.device_put(v, sh)

        return {k: one(k, v) for k, v in batch.items()}

    # ------------------------------------------------------------------
    @staticmethod
    def _index_matrix(n: int, batch_size: int, *, shuffle: bool,
                      seed: int) -> np.ndarray:
        """(steps, batch_size) int32 index matrix; -1 pads the final batch."""
        idx = np.arange(n, dtype=np.int32)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        steps = -(-n // batch_size)
        out = np.full((steps * batch_size,), -1, np.int32)
        out[:n] = idx
        return out.reshape(steps, batch_size)

    @staticmethod
    def _index_matrix_sharded(n_real: int, n_loc: int, d_axis: int,
                              batch_size: int, *, shuffle: bool,
                              seed: int) -> np.ndarray:
        """Index matrix for the row-SHARDED dataset layout: batch columns
        [d·B/D, (d+1)·B/D) may only carry row ids resident on data-shard d
        (rows [d·n_loc, (d+1)·n_loc)), so the device-local shard_map gather
        is exact. Each shard shuffles ITS rows independently — the
        per-host-file shuffle every multi-host input pipeline has — and the
        construction depends only on (n_real, n_loc, D, B, seed), so a
        1-process and an N-process run produce IDENTICAL batches
        (tests/test_multihost.py asserts bitwise loss equality)."""
        bloc = batch_size // d_axis
        # shard d's real rows: the global pad-to-multiple-of-D tail lives
        # at the end, i.e. entirely in the trailing shards
        reals = [min(max(n_real - d * n_loc, 0), n_loc)
                 for d in range(d_axis)]
        steps = max(1, -(-max(reals) // bloc))
        out = np.full((steps, batch_size), -1, np.int32)
        for d in range(d_axis):
            ids = np.arange(reals[d], dtype=np.int32)
            if shuffle:
                np.random.default_rng(seed * 9973 + d).shuffle(ids)
            stream = np.full((steps * bloc,), -1, np.int32)
            stream[:reals[d]] = ids + d * n_loc
            out[:, d * bloc:(d + 1) * bloc] = stream.reshape(steps, bloc)
        return out

    @staticmethod
    def _composite_plan(row_widths: np.ndarray, widths: List[int],
                        batch_size: int, mix: float, seed: int):
        """Per-epoch width assignment for composite mode.

        Returns [(width, idx_matrix)] covering every row EXACTLY once.
        Rows native to width group k (their length fits w_k but not
        w_{k-1}) anchor group k; a ``mix`` fraction of each group's slots
        is filled by random rows drawn from the smaller groups' pools
        (largest width first, so every filler row still fits). Leftover
        short rows train in their own (smaller) groups."""
        rng = np.random.default_rng(seed)
        pools: List[List[int]] = []
        lower = -1
        for w in widths:
            ids = np.where((row_widths > lower) & (row_widths <= w))[0]
            ids = ids.astype(np.int32)
            rng.shuffle(ids)
            pools.append(list(ids))
            lower = w
        items = []
        for k in range(len(widths) - 1, -1, -1):
            nat = pools[k]
            pools[k] = []
            if mix > 0.0 and k > 0 and nat:
                want = int(round(len(nat) * mix / max(1.0 - mix, 1e-9)))
                donors = [i for i in range(k) if pools[i]]
                fill: List[int] = []
                while want > 0 and donors:
                    for i in list(donors):  # round-robin across donors
                        if want <= 0:
                            break
                        fill.append(pools[i].pop())
                        want -= 1
                        if not pools[i]:
                            donors.remove(i)
                nat = nat + fill
            if not nat:
                continue
            ids = np.asarray(nat, np.int32)
            rng.shuffle(ids)
            steps = -(-len(ids) // batch_size)
            mat = np.full((steps * batch_size,), -1, np.int32)
            mat[:len(ids)] = ids
            items.append((widths[k], mat.reshape(steps, batch_size)))
        return items

    def _epoch_indices(self, meta, n_fallback: int, batch_size: int, *,
                       shuffle: bool, seed: int) -> np.ndarray:
        """Dispatch flat vs sharded index construction for one dataset."""
        if meta is None:
            return self._index_matrix(n_fallback, batch_size,
                                      shuffle=shuffle, seed=seed)
        n_real, n_loc = meta
        return self._index_matrix_sharded(n_real, n_loc, self._data_axis,
                                          batch_size, shuffle=shuffle,
                                          seed=seed)

    def evaluate_loss(self, batches: Optional[Iterator[Dict[str, np.ndarray]]],
                      rng: jax.Array) -> float:
        """Per-valid-sample mean validation loss (SASRec/train.py:59-81 style)."""
        # accumulate device-side; sync once at the end (keeps the dispatch
        # pipeline full instead of blocking per batch)
        if self._val_data is not None:
            n = len(next(iter(self._val_data.values())))
            idx_mat = self._epoch_indices(self._val_meta, n,
                                          self.cfg.eval_batch_size,
                                          shuffle=False, seed=0)
            sl, vl = self._eval_epoch_fn(self.params, idx_mat, rng,
                                         self._val_data, self._extra_data)
            total, valid = float(sl), float(vl)
            return total / valid if valid > 0 else 0.0
        sums, valids = [], []
        for batch in batches:
            rng, sub = jax.random.split(rng)
            _, aux = self._eval_step(self.params, self._put(batch), sub)
            sums.append(aux["sum_loss"])
            valids.append(aux["valid"])
        total = float(jnp.sum(jnp.stack(sums))) if sums else 0.0
        valid = float(jnp.sum(jnp.stack(valids))) if valids else 0.0
        return total / valid if valid > 0 else 0.0

    def fit(self, train_batches: Optional[BatchIterFactory] = None,
            val_batches: Optional[BatchIterFactory] = None,
            *, examples_per_epoch: Optional[int] = None,
            epoch_end_callback: Optional[Callable[[int, "Trainer"], None]] = None
            ) -> TrainLoopResult:
        cfg = self.cfg
        # rbg keys: hardware-accelerated RNG — threefry dropout masks cost
        # as much as the whole fwd+bwd at these model sizes (measured:
        # 20.5 → ~13 ms/step on the TIGER parity config)
        try:
            rng = jax.random.key(cfg.seed, impl="rbg")
        except TypeError:  # older jax fallback
            rng = jax.random.PRNGKey(cfg.seed)
        train_losses: List[float] = []
        val_losses: List[float] = []
        best_params = self.snapshot_params()
        no_improve = 0
        total_examples = 0
        total_time = 0.0
        epochs_run = 0
        phase = {"train": 0.0, "val": 0.0, "ckpt": 0.0}
        first_epoch_s = 0.0  # jit-compile epoch, excluded from steady ex/s
        first_epoch_examples = 0

        initial_epoch = self.start_epoch
        for epoch in range(self.start_epoch, cfg.epochs + 1):
            epochs_run = epoch
            # profile the second (post-compile) epoch when asked — the first
            # is dominated by XLA compilation and would drown the steady-state
            # step breakdown the trace is for
            profiling_this = (cfg.profile_dir is not None
                              and epoch == min(initial_epoch + 1, cfg.epochs))
            if profiling_this:
                from genrec_tpu.utils.profiling import trace as _trace
                trace_cm = _trace(cfg.profile_dir)
                trace_cm.__enter__()
                self.logger.info(f"Profiling epoch {epoch} → {cfg.profile_dir}")
            t0 = time.perf_counter()
            losses, valids = [], []
            n_examples = 0
            if self._composite is not None:
                widths, row_w = self._composite
                plan = self._composite_plan(row_w, widths, cfg.batch_size,
                                            cfg.composite_mix,
                                            cfg.seed + epoch)
                # chunk-interleave width groups like the bucket path so
                # ordering isn't width-correlated across the epoch
                work = []
                for w, idx_mat in plan:
                    kk = max(1, min(cfg.bucket_interleave_chunks,
                                    idx_mat.shape[0]))
                    work.extend((w, chunk) for chunk
                                in np.array_split(idx_mat, kk)
                                if len(chunk))
                np.random.default_rng(cfg.seed * 7919 + epoch).shuffle(work)
                for w, idx_mat in work:
                    rng, sub = jax.random.split(rng)
                    n_examples += int((idx_mat >= 0).sum())
                    self.params, self.opt_state, sl, vl = \
                        self._composite_fn_for_width(w)(
                            self.params, self.opt_state, idx_mat, sub,
                            self._train_data, self._extra_data)
                    self.step += idx_mat.shape[0]
                    losses.append(sl)
                    valids.append(vl)
            elif self._train_data is not None or self._train_buckets:
                buckets = self._train_buckets or [self._train_data]
                # Interleave CHUNKS of each bucket's step sequence in a
                # per-epoch shuffled order. Visiting each bucket as one
                # contiguous block is a length-correlated batch ordering the
                # reference's global shuffle doesn't have, and it measurably
                # costs quality: −2.5 to −4.3% Recall@10 at n=3 seeds/corpus
                # even with whole-bucket order shuffling
                # (artifacts/bucket_quality_r4.json). Chunking each bucket
                # into ≤interleave pieces and shuffling the pieces restores
                # approximate global mixing while keeping per-bucket static
                # shapes (≤2 distinct scan lengths per bucket, so the jit
                # re-specialization stays bounded). Interleaving halves the
                # deficit (−2.4/−1.2% at 4 chunks); finer granularity does
                # NOT help further (16 chunks: −2.1/−1.2%, and ~25% slower
                # from extra dispatches/tails —
                # artifacts/bucket_quality_r4_i16.json): the residual is
                # the length-HOMOGENEOUS batch composition itself, which
                # static per-bucket shapes cannot avoid — hence buckets
                # stay opt-in rather than default.
                metas = (self._bucket_meta if self._train_buckets
                         else [self._train_meta])
                work = []  # (bucket_idx, idx_chunk)
                for bi, data in enumerate(buckets):
                    n = len(next(iter(data.values())))
                    # bi=0 single-bucket seed matches the pre-bucketing path
                    idx_mat = self._epoch_indices(
                        metas[bi], n, cfg.batch_size, shuffle=True,
                        seed=cfg.seed + epoch + bi * 1000003)
                    k = 1 if len(buckets) == 1 else max(1, min(
                        cfg.bucket_interleave_chunks, idx_mat.shape[0]))
                    work.extend((bi, chunk) for chunk
                                in np.array_split(idx_mat, k)
                                if len(chunk))
                if len(buckets) > 1:
                    np.random.default_rng(
                        cfg.seed * 7919 + epoch).shuffle(work)
                for bi, idx_mat in work:
                    rng, sub = jax.random.split(rng)
                    n_examples += int((idx_mat >= 0).sum())
                    self.params, self.opt_state, sl, vl = self._train_epoch_fn(
                        self.params, self.opt_state, idx_mat, sub,
                        buckets[bi], self._extra_data)
                    self.step += idx_mat.shape[0]
                    losses.append(sl)
                    valids.append(vl)
            else:
                for batch in train_batches(epoch):
                    rng, sub = jax.random.split(rng)
                    n_examples += int(batch["valid"].sum()) if "valid" in batch \
                        else len(next(iter(batch.values())))
                    self.params, self.opt_state, loss, aux = self._train_step(
                        self.params, self.opt_state, self._put(batch), sub)
                    self.step += 1
                    losses.append(aux.get("sum_loss", loss))
                    valids.append(aux.get("valid", 1.0))
            # the float() fetches synchronize (remote-PJRT-safe: a VALUE is
            # pulled, not just block_until_ready on a future)
            sum_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
            sum_valid = float(jnp.sum(jnp.stack(valids))) if valids else 0.0
            if profiling_this:
                trace_cm.__exit__(None, None, None)
            dt = time.perf_counter() - t0
            phase["train"] += dt
            total_time += dt
            total_examples += n_examples
            if epoch == self.start_epoch:
                first_epoch_s = dt
                first_epoch_examples = n_examples

            avg_loss = sum_loss / sum_valid if sum_valid > 0 else 0.0
            if not np.isfinite(avg_loss):
                # reference aborts on NaN loss (`RQ-VAE/train.py:92-94`)
                self.logger.error(f"Epoch {epoch}: non-finite train loss "
                                  f"({avg_loss}); aborting")
                self.store.wait()  # drain async ckpt saves before raising
                raise ValueError(f"training diverged: loss={avg_loss} "
                                 f"at epoch {epoch}")
            train_losses.append(avg_loss)

            if val_batches is not None or self._val_data is not None:
                rng, sub = jax.random.split(rng)
                tv = time.perf_counter()
                val_loss = self.evaluate_loss(
                    val_batches(epoch) if val_batches is not None else None, sub)
                phase["val"] += time.perf_counter() - tv
            else:
                val_loss = avg_loss
            val_losses.append(val_loss)

            self.logger.info(
                f"Epoch {epoch} | Train Loss: {avg_loss:.4f} | "
                f"Val Loss: {val_loss:.4f} | {dt:.2f}s | "
                f"{n_examples / max(dt, 1e-9):.0f} ex/s")

            self.start_epoch = epoch
            tc = time.perf_counter()
            if (epoch % cfg.ckpt_every_epochs == 0) or epoch == cfg.epochs:
                self.store.save_latest(self.step, self._state_dict())
            phase["ckpt"] += time.perf_counter() - tc

            if epoch_end_callback is not None:
                epoch_end_callback(epoch, self)

            if val_loss < self.best_val:
                self.best_val = val_loss
                no_improve = 0
                best_params = self.snapshot_params()
                tc = time.perf_counter()
                self.store.save_best({"params": best_params})
                phase["ckpt"] += time.perf_counter() - tc
                self.logger.info(f"Best model saved (val_loss={val_loss:.4f})")
            else:
                no_improve += 1
                if no_improve >= cfg.early_stop_patience:
                    self.logger.info(f"Early stopping at epoch {epoch}.")
                    if cfg.ckpt_every_epochs > 1 \
                            and epoch % cfg.ckpt_every_epochs != 0:
                        # the cadence skipped this epoch's latest-state
                        # save; persist it so resume starts from the
                        # stopping point, not up to N-1 epochs earlier
                        self.store.save_latest(self.step, self._state_dict())
                    break

        self.store.wait()
        if jax.process_index() == 0:  # one writer per shared filesystem
            plot_loss_curves(train_losses, val_losses, cfg.loss_plot_path)
        steady_examples = total_examples - first_epoch_examples
        steady_time = phase["train"] - first_epoch_s
        steady_eps = (steady_examples / steady_time if steady_time > 0
                      else total_examples / max(total_time, 1e-9))
        wall = total_time + phase["val"] + phase["ckpt"]
        self.logger.info(
            "Phase breakdown: train %.1fs (compile-epoch %.1fs) | val %.1fs "
            "| ckpt %.1fs | steady %.0f ex/s" % (
                phase["train"], first_epoch_s, phase["val"], phase["ckpt"],
                steady_eps))
        return TrainLoopResult(
            best_params=best_params,
            final_params=self.params,
            train_losses=train_losses,
            val_losses=val_losses,
            best_val_loss=self.best_val,
            epochs_run=epochs_run,
            examples_per_sec=total_examples / max(total_time, 1e-9),
            steady_examples_per_sec=steady_eps,
            phase_seconds=dict(phase, wall=wall, compile_epoch=first_epoch_s),
        )
