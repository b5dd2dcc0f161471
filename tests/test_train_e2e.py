"""End-to-end training slice: overfit a handful of real DB5 complexes.

Requires the val cache (built by `build_cache(Config(), 'val')`); skipped when
absent. This is the M1 milestone check of SURVEY §7.2.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from equidock_public_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.train.step import create_train_state, eval_step, train_step
from equidock_public_tpu.models.iegmn import init_docking_model

CACHE = "./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/cv_0/val.npz"

pytestmark = pytest.mark.skipif(not os.path.exists(CACHE),
                                reason="DB5 val cache not built")


def small_cfg():
    return Config(
        model=ModelConfig(residue_emb_dim=16, iegmn_lay_hid_dim=16,
                          iegmn_n_lays=2, num_att_heads=8),
        train=TrainConfig(lr=2e-3, sinkhorn_iters=50, bs=4, w_decay=0.0),
        data=DataConfig(node_buckets=(128, 256, 512, 1024, 2048),
                        pocket_buckets=(64, 128, 256)),
    )


def test_overfit_small_subset():
    cfg = small_cfg()
    ds = DockingDataset(cfg, "val", swap=False)
    # pick the 4 smallest complexes for speed + one fixed batch
    sizes = [max(s.lig.num_nodes, s.rec.num_nodes) for s in ds.samples]
    keep = list(np.argsort(sizes)[:4])
    ds.samples = [ds.samples[i] for i in keep]
    ds.codes = [ds.codes[i] for i in keep]

    rng = np.random.default_rng(0)
    batch = next(ds.batches(rng, shuffle=False, batch_size=4))

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    key = jax.random.PRNGKey(1)

    first = None
    last = None
    for i in range(120):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub, cfg)
        lig = float(metrics["ligand_coors_loss"])
        if i == 0:
            first = lig
        last = lig
    assert np.isfinite(last)
    # ligand MSE must collapse when overfitting a fixed batch
    # (measured: 437 -> ~13 by step 120 on this seed)
    assert last < first * 0.2, (first, last)


def test_eval_step_reports_rmsd_inputs():
    cfg = small_cfg()
    ds = DockingDataset(cfg, "val", swap=False)
    ds.samples = ds.samples[:2]
    ds.codes = ds.codes[:2]
    rng = np.random.default_rng(0)
    batch = next(ds.batches(rng, shuffle=False, batch_size=2))
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    out = eval_step(params, batch, cfg)
    assert out["ligand_coords"].shape == batch.gt_lig.shape
    assert np.isfinite(float(out["loss"]))
