"""Train state: params + batch_stats + optimizer state, one pytree."""

from __future__ import annotations

from typing import Any

import flax
import optax
from flax.training import train_state as flax_train_state

from ..config import OptimConfig


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    lr: Any = cfg.learning_rate
    if cfg.warmup_steps or cfg.decay_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=max(cfg.decay_steps or cfg.warmup_steps + 1, 2),
            end_value=cfg.learning_rate * cfg.lr_min_ratio,
        )
    if cfg.optimizer == "adam":
        tx = optax.adam(lr, b1=cfg.b1, b2=cfg.b2)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(lr, momentum=cfg.momentum)
    elif cfg.optimizer == "adadelta":
        # FourierNet's optimizer (reference deepModels.py:62: Adadelta).
        tx = optax.adadelta(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(model, variables, optim_cfg: OptimConfig) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=make_optimizer(optim_cfg),
    )
