"""Pure jitted train/eval steps.

The reference's per-batch body (`src/train.py:84-169`: forward, per-complex
loss loop, backward, clip, Adam step) compiles here into a single XLA program:
one `value_and_grad` over the fused batched loss, optax update, all on device.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..graph import PairBatch
from ..models.iegmn import docking_forward, init_bn_state, uses_batch_norm
from .losses import total_loss
from .optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # BatchNorm running statistics ('BN' norm options) — non-gradient state
    # updated from the forward's aux output; empty dict otherwise.
    bn_state: Any = ()


def create_train_state(params, cfg: Config) -> TrainState:
    opt = make_optimizer(cfg.train)
    bn = init_bn_state(cfg.model) if uses_batch_norm(cfg.model) else ()
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32), bn_state=bn)


def loss_fn(params, cfg: Config, batch: PairBatch, rng, train: bool,
            bn_state=()):
    out = docking_forward(params, cfg.model, batch, rng=rng, train=train,
                          bn_state=bn_state if bn_state else None)
    loss, metrics = total_loss(out, batch, cfg.train)
    return loss, (metrics, out)


def step_body(
    state: TrainState, batch: PairBatch, rng, cfg: Config,
    lr_scale: jnp.ndarray | float = 1.0,
    loss_fn_=None, grad_reduce=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step (shared by the single-chip `train_step` jit and the
    multi-chip `parallel.train.make_parallel_train_step` /
    `parallel.halo.make_halo_train_step`, so the paths cannot drift).
    `lr_scale` is the epoch-level scheduler factor (cyclic triangle /
    ReduceLROnPlateau, stepped per epoch by the loop as in the reference,
    `train.py:364-369`); pass it as a jnp scalar so factor changes don't
    recompile. `loss_fn_` swaps the forward (halo path) while keeping the
    optimizer/telemetry identical. `grad_reduce` (manual-collective paths,
    e.g. the dp-resident shard_map scan) reduces the per-device gradients —
    psum over 'data' — BEFORE the norm/clip telemetry and the optimizer
    update, so clip counting and the update see the same global gradient the
    single-chip path sees."""
    opt = make_optimizer(cfg.train)
    fn = loss_fn_ if loss_fn_ is not None else loss_fn
    (loss, (metrics, out)), grads = jax.value_and_grad(fn, has_aux=True)(
        state.params, cfg, batch, rng, True, state.bn_state)
    if grad_reduce is not None:
        grads = grad_reduce(grads)
    gnorm = optax.global_norm(grads)
    if cfg.train.freeze_original and isinstance(grads, dict) \
            and "finetune" in grads:
        # two-stage fine-tuning with the stage-1 trunk frozen: zero the
        # original-branch gradient (keeps Adam moments clean) ...
        grads = dict(grads, original=jax.tree.map(
            jnp.zeros_like, grads["original"]))
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    if cfg.train.freeze_original and isinstance(updates, dict) \
            and "finetune" in updates:
        # ... and the update itself, because add_decayed_weights would
        # still decay frozen params through a zero gradient
        updates = dict(updates, original=jax.tree.map(
            jnp.zeros_like, updates["original"]))
    updates = jax.tree.map(lambda u: u * lr_scale, updates)
    params = optax.apply_updates(state.params, updates)
    bn_state = out.get("bn_updates", state.bn_state) \
        if isinstance(out, dict) else state.bn_state
    metrics = dict(metrics)
    metrics["grad_norm"] = gnorm
    metrics["clipped"] = (gnorm > cfg.train.clip).astype(jnp.float32)
    # Expose the training forward's predicted coords so the epoch loop can
    # meter train RMSD from THIS forward instead of re-running eval_step —
    # the reference meters from the same forward too (`train.py:133-137`).
    # Stays on device unless the host actually reads it.
    if isinstance(out, dict) and "ligand_coords" in out:
        metrics["ligand_coords"] = out["ligand_coords"]
    return TrainState(params, opt_state, state.step + 1, bn_state), metrics


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState, batch: PairBatch, rng, cfg: Config,
    lr_scale: jnp.ndarray | float = 1.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    return step_body(state, batch, rng, cfg, lr_scale)


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, batch: PairBatch, cfg: Config,
              bn_state=()) -> Dict[str, jnp.ndarray]:
    out = docking_forward(params, cfg.model, batch, rng=None, train=False,
                          bn_state=bn_state if bn_state else None)
    _, metrics = total_loss(out, batch, cfg.train)
    metrics = dict(metrics)
    metrics["ligand_coords"] = out["ligand_coords"]
    return metrics
