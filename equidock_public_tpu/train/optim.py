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


def cyclic_schedule(base_lr: float, step_size_up: float):
    """Triangular cyclic LR between base_lr and 10x base_lr
    (`train_utils.py:129-132`: CyclicLR(base, max=10*base))."""
    import jax.numpy as jnp

    def schedule(step):
        cycle = jnp.floor(1.0 + step / (2.0 * step_size_up))
        x = jnp.abs(step / step_size_up - 2.0 * cycle + 1.0)
        return base_lr + (10.0 * base_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.scheduler == "cyclic":
        sched = cyclic_schedule(tc.lr, max(tc.warmup, 1.0))
    else:
        # 'warmup' (default) and 'ROP': base schedule is the cubic warmup;
        # ROP's plateau factor is applied on top by the training loop via
        # `scale_by_plateau` below.
        sched = warmup_schedule(tc.lr, tc.warmup)
    chain = [
        optax.clip_by_global_norm(tc.clip),
        optax.add_decayed_weights(tc.w_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    ]
    if tc.scheduler == "ROP":
        # ReduceLROnPlateau(factor=0.5, patience=100, min_lr~0)
        # (`train_utils.py:133-143`); driven by the loop passing the val loss
        # through extra_args.
        chain.append(optax.contrib.reduce_on_plateau(
            factor=0.5, patience=100, rtol=1e-8, atol=0.0))
    return optax.chain(*chain)
