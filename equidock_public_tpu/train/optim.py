"""Optimizer and LR schedules via optax.

Matches the reference: Adam with L2 weight decay folded into the gradient
(torch Adam `weight_decay`, `train.py:302`) — i.e. `add_decayed_weights`
BEFORE the Adam moments, not decoupled AdamW — plus grad clipping at global
norm `clip` (`train.py:156`) and the cubic warmup LambdaLR
(`train_utils.py:134-136`: lr * min(1, ((step+1)/warmup)^3); warmup=1 by
default => constant).
"""

from __future__ import annotations

import optax

from ..config import TrainConfig


def warmup_schedule(base_lr: float, warmup: float):
    import jax.numpy as jnp

    def schedule(step):
        return base_lr * jnp.minimum(1.0, ((step + 1.0) / warmup) ** 3)

    return schedule


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.clip),
        optax.add_decayed_weights(tc.w_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(warmup_schedule(tc.lr, tc.warmup)),
    )
