"""Optimizer/scheduler factory.

Equivalent of the reference's optimizer factory + HF scheduler wiring
(`RQ-VAE/train.py:40-95`): adam/sgd/adagrad/rmsprop/adamw with linear or
constant warmup schedules, optional global-norm gradient clipping.
"""

from __future__ import annotations

from typing import Optional

import optax

from genrec_tpu.configs import TrainerConfig


def make_schedule(cfg: TrainerConfig, steps_per_epoch: int):
    total_steps = max(cfg.epochs * steps_per_epoch, 1)
    warmup_steps = cfg.warmup_epochs * steps_per_epoch
    if cfg.lr_scheduler == "linear":
        # HF get_linear_schedule_with_warmup: 0→lr over warmup, lr→0 over rest
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, max(warmup_steps, 1)),
             optax.linear_schedule(cfg.lr, 0.0, max(total_steps - warmup_steps, 1))],
            [max(warmup_steps, 1)],
        ) if warmup_steps > 0 else optax.linear_schedule(cfg.lr, 0.0, total_steps)
    if cfg.lr_scheduler == "constant":
        if warmup_steps > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, cfg.lr, warmup_steps),
                 optax.constant_schedule(cfg.lr)],
                [warmup_steps],
            )
        return optax.constant_schedule(cfg.lr)
    raise ValueError(cfg.lr_scheduler)


def make_optimizer(cfg: TrainerConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sched = make_schedule(cfg, steps_per_epoch)
    name = cfg.optimizer.lower()
    if name == "adam":
        tx = optax.adam(sched, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1])
    elif name == "adamw":
        tx = optax.adamw(sched, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1],
                         weight_decay=cfg.weight_decay)
    elif name == "sgd":
        tx = optax.sgd(sched)
    elif name == "adagrad":
        tx = optax.adagrad(sched)
    elif name == "rmsprop":
        tx = optax.rmsprop(sched)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
