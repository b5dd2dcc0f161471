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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import os

from ..config import Config
from ..graph import PairBatch
from ..train.step import TrainState, step_body
from .mesh import batch_pspec


def make_parallel_train_step(cfg: Config, mesh: Mesh,
                             shard_nodes: bool = False,
                             packed: bool = False, n_segs: int = 1):
    """Returns a jitted train step with explicit in/out shardings over `mesh`.

    The step math is `train.step.step_body` — the exact function the
    single-chip path jits — so lr_scale scheduling, clip telemetry and any
    future change apply to both paths identically. `packed` batches shard
    their slot dim over 'data' (slot-count buckets must be multiples of
    dp; `fit` rounds them up)."""
    repl = NamedSharding(mesh, P())
    batch_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        batch_pspec(shard_nodes, packed, n_segs),
        is_leaf=lambda x: isinstance(x, P))

    def step(state: TrainState, batch: PairBatch, rng, lr_scale):
        new_state, metrics = step_body(state, batch, rng, cfg, lr_scale)
        # Per-batch coords are dp-sharded; replicating them through the
        # out_shardings would force an all-gather every step. The parallel
        # loop doesn't meter train RMSD, so drop them here.
        metrics.pop("ligand_coords", None)
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),   # update params/opt state in place
    )


def distributed_initialize_if_needed() -> None:
    """Multi-host bring-up: `jax.distributed.initialize` reads the TPU pod
    environment (coordinator address / process id / num processes)
    automatically on Cloud TPU.

    MUST run before anything touches a JAX backend: the first backend-touching
    call (jax.devices(), jax.process_count(), any computation) initializes the
    LOCAL runtime, after which distributed initialization cannot take effect
    and a pod silently degrades to N independent single-host jobs. We therefore
    decide from the environment alone, never by querying JAX."""
    from jax._src import xla_bridge

    if xla_bridge._backends:  # a backend already exists: too late to
        return                # (re)initialize; assume caller did it
    # Cloud TPU pods / multi-host GPU launchers export one of these.
    multihost_env = ("MEGASCALE_COORDINATOR_ADDRESS",
                     "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                     "TPU_WORKER_HOSTNAMES")
    if not any(os.environ.get(v) for v in multihost_env):
        return  # single-process: nothing to do
    jax.distributed.initialize()
