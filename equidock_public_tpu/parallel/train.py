"""Multi-chip training step: jit over a named mesh with explicit shardings.

Data parallelism shards the batch-of-complexes axis; graph parallelism shards
the padded node axis. Parameters and optimizer state are replicated; XLA SPMD
inserts the gradient psum over 'data' and the boundary all-gathers over
'graph' (neighbor gathers + cross-attention), all riding ICI.

Multi-host entry: call `jax.distributed.initialize()` before building the
mesh (the TPU-native replacement for the reference's absent NCCL story,
SURVEY §2.2).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..graph import PairBatch
from ..train.step import TrainState, loss_fn
from ..train.optim import make_optimizer
from .mesh import batch_pspec


def make_parallel_train_step(cfg: Config, mesh: Mesh, shard_nodes: bool = False):
    """Returns a jitted train step with explicit in/out shardings over `mesh`."""
    opt = make_optimizer(cfg.train)
    repl = NamedSharding(mesh, P())
    batch_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), batch_pspec(shard_nodes),
        is_leaf=lambda x: isinstance(x, P))

    def step(state: TrainState, batch: PairBatch, rng):
        (loss, (metrics, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, cfg, batch, rng, True)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),   # update params/opt state in place
    )


def distributed_initialize_if_needed() -> None:
    """Multi-host bring-up: `jax.distributed.initialize` reads the TPU pod
    environment (coordinator address / process id) automatically on Cloud TPU.
    No-op when already initialized or single-process."""
    try:
        if jax.process_count() > 1:
            return
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / already initialized
