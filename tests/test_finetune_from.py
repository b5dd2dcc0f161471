"""Two-stage fine-tuning from a stage-1 checkpoint (`-fine_tune_from`).

The reference ships `-fine_tune` (args.py:110) but always trains both stages
jointly from scratch; warm-starting the 'original' stage from a trained
checkpoint and optionally freezing it is the round-3 avenue (c) for the
single-checkpoint campaign (VERDICT r2 next item 1). These tests pin the
surgery + freeze semantics at the step level.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model
from equidock_public_tpu.train.step import create_train_state, train_step

from .utils import synth_batch, tiny_config


def _setup(freeze):
    cfg = tiny_config(iegmn_n_lays=2, fine_tune=True)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, freeze_original=freeze))
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, B=2, N_l=12, N_r=12, n_l=10, n_r=10,
                        coord_scale=30.0)
    # surgery as cli.train does it: trained stage-1 trunk + fresh finetune
    stage1 = init_docking_model(jax.random.PRNGKey(1),
                                dataclasses.replace(cfg.model,
                                                    fine_tune=False))
    fresh = init_docking_model(jax.random.PRNGKey(2), cfg.model)
    params = {"original": stage1["original"], "finetune": fresh["finetune"]}
    return cfg, batch, params


def test_frozen_original_is_bitwise_stable_under_training():
    cfg, batch, params = _setup(freeze=True)
    state = create_train_state(params, cfg)
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    for i in range(3):
        state, m = train_step(state, batch, jax.random.PRNGKey(i), cfg)
    assert np.isfinite(float(m["loss"]))
    for a, b in zip(jax.tree.leaves(snap["original"]),
                    jax.tree.leaves(state.params["original"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the finetune stage DID move
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(snap["finetune"]),
                        jax.tree.leaves(state.params["finetune"])))
    assert moved


def test_unfrozen_finetune_trains_both_stages():
    cfg, batch, params = _setup(freeze=False)
    state = create_train_state(params, cfg)
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          state.params["original"])
    state, m = train_step(state, batch, jax.random.PRNGKey(0), cfg)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(state.params["original"])))
    assert moved


def test_surgery_preserves_stage1_forward():
    """The composed (R, t) of the two-stage forward must map the ORIGINAL
    input ligand onto ligand_coords (the composition convention of
    models/iegmn.py's fine-tune branch), and the grafted stage-1 subtree
    must still run standalone."""
    cfg, batch, params = _setup(freeze=True)
    cfg1 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fine_tune=False))
    out1 = docking_forward({"original": params["original"]}, cfg1.model,
                           batch)
    out2 = docking_forward(params, cfg.model, batch)
    # the two-stage output starts from stage-1's pose: composing R2,t2 with
    # stage-1's (R0,t0) reproduces ligand_coords (self-consistency of the
    # composition convention, models/iegmn.py fine-tune branch)
    x = np.asarray(batch.lig.x)
    R, t = np.asarray(out2["R"]), np.asarray(out2["t"])
    lig = np.einsum("bij,bnj->bni", R, x) + t
    np.testing.assert_allclose(lig, np.asarray(out2["ligand_coords"]),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(out1["ligand_coords"])).all()
