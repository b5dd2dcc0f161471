"""Optimizer and LR schedules via optax.

Matches the reference: Adam with L2 weight decay folded into the gradient
(torch Adam `weight_decay`, `train.py:302`) — i.e. `add_decayed_weights`
BEFORE the Adam moments, not decoupled AdamW — plus grad clipping at global
norm `clip` (`train.py:156`).

Schedulers (`get_scheduler`, `train_utils.py:128-145`) are stepped per EPOCH
in the reference (`train.py:364-369`), so 'cyclic' and 'ROP' are driven here
by an epoch-level LR *factor* the training loop computes and passes into the
jitted step (`lr_scale`), keeping the optax chain static:

  * 'warmup' — cubic ramp lr * min(1, ((t+1)/warmup)^3)
    (`train_utils.py:134-136`); warmup=1 by default => constant. Applied
    per optimizer step (smoother than the reference's per-epoch LambdaLR;
    identical at the default warmup=1 the paper models use).
  * 'cyclic' — torch CyclicLR(base_lr=lr, max_lr=10*lr,
    step_size_up=warmup) stepped per epoch (`train_utils.py:131-134`):
    `cyclic_epoch_factor` returns the triangular factor in [1, 10].
  * 'ROP' — torch ReduceLROnPlateau(mode=min, factor=0.5, patience=100,
    rel threshold, min_lr=1e-12) stepped per epoch on the val loss
    (`train_utils.py:136-144`, `train.py:366-367`): `ReduceOnPlateau`
    mirrors that state machine on the host.
"""

from __future__ import annotations

import math

import optax

from ..config import TrainConfig


def warmup_schedule(base_lr: float, warmup: float):
    import jax.numpy as jnp

    def schedule(step):
        return base_lr * jnp.minimum(1.0, ((step + 1.0) / warmup) ** 3)

    return schedule


def cyclic_epoch_factor(epoch: int, step_size_up: float) -> float:
    """Triangular factor in [1, 10] with half-period `step_size_up` epochs
    (CyclicLR base->max ramp, `train_utils.py:131-134`)."""
    s = max(step_size_up, 1.0)
    cycle = math.floor(1.0 + epoch / (2.0 * s))
    x = abs(epoch / s - 2.0 * cycle + 1.0)
    return 1.0 + 9.0 * max(0.0, 1.0 - x)


class ReduceOnPlateau:
    """Epoch-driven ReduceLROnPlateau (mode=min, rel threshold), the
    reference's 'ROP' (`train_utils.py:136-144`). `step(val_loss)` returns
    the cumulative LR factor to apply next epoch."""

    def __init__(self, factor: float = 0.5, patience: int = 100,
                 threshold: float = 1e-4, min_scale: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, value: float) -> float:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.num_bad = 0
        return self.scale


def epoch_lr_factor(tc: TrainConfig, epoch: int,
                    plateau: "ReduceOnPlateau | None") -> float:
    """The LR factor the loop passes to the train step for this epoch."""
    if tc.scheduler == "cyclic":
        return cyclic_epoch_factor(epoch, tc.warmup)
    if tc.scheduler == "ROP" and plateau is not None:
        return plateau.scale
    return 1.0


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.scheduler == "cyclic":
        # constant base lr; the triangular epoch factor arrives via lr_scale
        sched = tc.lr
    else:
        sched = warmup_schedule(tc.lr, tc.warmup)
    return optax.chain(
        optax.clip_by_global_norm(tc.clip),
        optax.add_decayed_weights(tc.w_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )
