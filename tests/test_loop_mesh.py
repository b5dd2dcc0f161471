"""Mesh training through the production loop (`fit` with cfg.parallel).

Round 3: the mesh paths existed (`parallel/train.py`, tests/test_parallel.py
proves dp step == single-device step) but `fit`/the train CLI never used
them. This pins the LOOP-level integration: a dp x gp `fit` run produces the
same training trajectory as the single-device run (same data order, same
rng, same step math — step_body is shared)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from equidock_public_tpu.config import (Config, DataConfig, ModelConfig,
                                        ParallelConfig, TrainConfig)
from equidock_public_tpu.train.loop import fit

from .test_curriculum import _synth_split

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


def _cfg(tmp_path, dp, gp, tag, pack=False):
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(sinkhorn_iters=20, bs=4, num_epochs=2,
                          val_repeats=1, lr=1e-3),
        data=DataConfig(cache_dir=str(tmp_path / "cache"),
                        node_buckets=(16, 32, 48, 64), pocket_buckets=(8,),
                        # already multiples of dp=2 so the mesh run's bucket
                        # rounding is a no-op and both runs share one plan
                        pack=pack, pack_max_per_slot=2,
                        slot_count_buckets=(2, 4)),
        parallel=ParallelConfig(dp=dp, gp=gp),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        log_dir=str(tmp_path / "logs"),
    )


def test_fit_mesh_matches_single_device(tmp_path):
    rng = np.random.default_rng(0)
    cfg1 = _cfg(tmp_path, 1, 1, "single")
    os.makedirs(cfg1.cache_path(), exist_ok=True)
    for split, n in (("train", 8), ("val", 4), ("test", 4)):
        np.savez(os.path.join(cfg1.cache_path(), f"{split}.npz"),
                 **_synth_split(rng, n))

    logs1, logs2 = [], []
    state1 = fit(cfg1, max_epochs=2,
                 log=lambda *a: logs1.append(" ".join(map(str, a))))
    cfg2 = _cfg(tmp_path, 2, 2, "mesh")
    state2 = fit(cfg2, max_epochs=2,
                 log=lambda *a: logs2.append(" ".join(map(str, a))))

    assert any("mesh training: dp=2 x gp=2" in l for l in logs2)
    # identical rng + shared step_body => identical parameters
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # and identical final-test lines up to float noise
    t1 = [l for l in logs1 if "[FINAL TEST" in l][0]
    t2 = [l for l in logs2 if "[FINAL TEST" in l][0]
    v1 = float(t1.split("crmsd med ")[1].split()[0])
    v2 = float(t2.split("crmsd med ")[1].split()[0])
    assert abs(v1 - v2) < 1e-2, (t1, t2)


def test_fit_mesh_packed_matches_single_device(tmp_path):
    """Packed batches compose with dp-sharded mesh training: the slot dim
    is sharded over 'data' (slot-count buckets rounded to multiples of dp)
    and the run reproduces the single-device packed run."""
    rng = np.random.default_rng(1)
    cfg1 = _cfg(tmp_path, 1, 1, "single_p", pack=True)
    os.makedirs(cfg1.cache_path(), exist_ok=True)
    for split, n in (("train", 10), ("val", 4), ("test", 4)):
        np.savez(os.path.join(cfg1.cache_path(), f"{split}.npz"),
                 **_synth_split(rng, n))

    logs1, logs2 = [], []
    state1 = fit(cfg1, max_epochs=2,
                 log=lambda *a: logs1.append(" ".join(map(str, a))))
    cfg2 = _cfg(tmp_path, 2, 1, "mesh_p", pack=True)
    state2 = fit(cfg2, max_epochs=2,
                 log=lambda *a: logs2.append(" ".join(map(str, a))))

    assert any("packed mesh training: slot-count buckets -> (2, 4)" in l
               for l in logs2), [l for l in logs2 if "mesh" in l]
    # rounding the slot-count buckets to multiples of dp changes shapes but
    # not semantics (padding slots are fully masked), so the parameter
    # trajectories agree
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
