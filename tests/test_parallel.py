"""Multi-device tests on the 8-device CPU mesh (the TPU-pod fake backend)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.models.iegmn import init_docking_model
from equidock_public_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from equidock_public_tpu.parallel.train import make_parallel_train_step
from equidock_public_tpu.train.step import create_train_state, train_step

from .utils import synth_batch, tiny_config

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(rng, B=8, N_l=16, N_r=16):
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=B, N_l=N_l, N_r=N_r, n_l=N_l - 2, n_r=N_r - 2)
    state = create_train_state(params, cfg)
    return cfg, state, batch


def test_data_parallel_matches_single_device(rng):
    """One dp=8 step must produce the same params update as the unsharded
    jitted step (bitwise-level tolerance: XLA reduction order may differ)."""
    cfg, state, batch = _setup(rng)
    key = jax.random.PRNGKey(1)

    # train_step donates its state: give it a copy, keep `state` for the mesh
    state1, m1 = train_step(jax.tree.map(jnp.copy, state), batch, key, cfg)

    mesh = make_mesh(dp=8, gp=1)
    with mesh:
        state_r = jax.tree.map(lambda x: replicate(x, mesh), state)
        sharded = shard_batch(batch, mesh, shard_nodes=False)
        step = make_parallel_train_step(cfg, mesh, shard_nodes=False)
        state2, m2 = step(state_r, sharded, key, jnp.asarray(1.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_graph_parallel_matches_single_device(rng):
    """dp=4 x gp=2 (node-sharded) step == unsharded step: the graph-parallel
    partition must be semantics-free."""
    cfg, state, batch = _setup(rng, B=4, N_l=16, N_r=16)
    key = jax.random.PRNGKey(2)

    # train_step donates its state: give it a copy, keep `state` for the mesh
    state1, m1 = train_step(jax.tree.map(jnp.copy, state), batch, key, cfg)

    mesh = make_mesh(dp=4, gp=2)
    with mesh:
        state_r = jax.tree.map(lambda x: replicate(x, mesh), state)
        sharded = shard_batch(batch, mesh, shard_nodes=True)
        step = make_parallel_train_step(cfg, mesh, shard_nodes=True)
        state2, m2 = step(state_r, sharded, key, jnp.asarray(1.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_input_pipeline_agrees_on_shapes():
    """Simulated 2-host input pipeline: identical schedules/shapes per host,
    disjoint complexes, union == one epoch."""
    import os
    import numpy as np
    from equidock_public_tpu.parallel.input_pipeline import (
        global_batch_schedule, host_sharded_batches)
    from equidock_public_tpu.data.dataset import DockingDataset
    from .utils import tiny_config

    cache = ("./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/"
             "cv_0/val.npz")
    if not os.path.exists(cache):
        pytest.skip("DB5 val cache not built")
    cfg = tiny_config()
    ds = DockingDataset(cfg, "val", swap=False)

    s0 = global_batch_schedule(ds, np.random.default_rng(7), bs=4)
    s1 = global_batch_schedule(ds, np.random.default_rng(7), bs=4)
    for (c0, sh0), (c1, sh1) in zip(s0, s1):
        np.testing.assert_array_equal(c0, c1)
        assert sh0 == sh1

    b0 = list(host_sharded_batches(ds, np.random.default_rng(7), 4,
                                   process_index=0, process_count=2))
    b1 = list(host_sharded_batches(ds, np.random.default_rng(7), 4,
                                   process_index=1, process_count=2))
    assert len(b0) == len(b1)
    for x, y in zip(b0, b1):
        assert x.lig.x.shape == y.lig.x.shape       # shapes agree
        assert x.rec.x.shape == y.rec.x.shape
        assert x.pocket_lig.shape == y.pocket_lig.shape
