"""Checkpoint round trip: params + opt state + self-describing config."""

import dataclasses
import os

import jax
import numpy as np

from equidock_public_tpu.models.iegmn import init_docking_model
from equidock_public_tpu.train.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
from equidock_public_tpu.train.step import TrainState, create_train_state, train_step

from .utils import synth_batch, tiny_config


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    batch = synth_batch(rng)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1), cfg)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, cfg, epoch=7)

    payload, cfg2, epoch = load_checkpoint(path, state)
    assert epoch == 7
    assert cfg2.model == cfg.model        # self-describing config restored
    assert cfg2.train == cfg.train
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(payload["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(payload["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state (resume semantics,
    # args.py:131-138 continue_train_model)
    restored = TrainState(payload["params"], payload["opt_state"],
                          payload["step"])
    restored2, m = train_step(restored, batch, jax.random.PRNGKey(2), cfg)
    assert np.isfinite(float(m["loss"]))
    assert int(restored2.step) == int(state.step) + 1


def test_load_committed_artifact_checkpoint():
    """The committed trained checkpoint restores WITHOUT a template (the
    device-agnostic metadata path) and reports its config."""
    import os
    import pytest

    from equidock_public_tpu.train.checkpoint import load_checkpoint

    path = "artifacts/db5_model_best"
    if not os.path.exists(path):
        pytest.skip("artifact checkpoint not present")
    payload, cfg2, epoch = load_checkpoint(path)
    assert cfg2.model.iegmn_n_lays == 5
    assert cfg2.model.shared_layers
    assert epoch >= 0
    n = sum(np.asarray(x).size for x in jax.tree.leaves(payload["params"]))
    assert n > 100_000
