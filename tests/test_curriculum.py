"""DIPS -> DB5 curriculum end-to-end on synthetic caches.

The reference's `main()` trains DIPS first, then fine-tunes the same model on
DB5 (`src/train.py:263-285`). This test synthesizes tiny caches in both
on-disk layouts (sharded DIPS .npz, single-file DB5 .npz), runs the full
`curriculum()` driver (two `fit()` stages, checkpointing, best-reload, final
test eval) and checks the state flows from stage 1 into stage 2.
"""

import dataclasses
import os

import numpy as np
import pytest

from equidock_public_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.train.loop import curriculum


def _synth_graph(rng, n, k=4):
    out = {}
    out["res_id"] = rng.integers(0, 21, (n,)).astype(np.int32)
    out["x"] = (rng.standard_normal((n, 3)) * 8).astype(np.float32)
    out["mu_r_norm"] = (np.abs(rng.standard_normal((n, 5))) + 0.5).astype(np.float32)
    out["nbr"] = rng.integers(0, n, (n, k)).astype(np.int32)
    out["nbr_mask"] = np.ones((n, k), np.float32)
    out["edge_feat"] = rng.standard_normal((n, k, 27)).astype(np.float32)
    return out


def _synth_split(rng, n_complexes):
    """One split in the flat npz-cache key layout of data/dataset.py."""
    out = {}
    for i in range(n_complexes):
        p = f"c{i}/"
        n_l, n_r = int(rng.integers(8, 14)), int(rng.integers(10, 18))
        for prefix, g in (("lig/", _synth_graph(rng, n_l)),
                          ("rec/", _synth_graph(rng, n_r))):
            for key, val in g.items():
                out[p + prefix + key] = val
        out[p + "gt_lig"] = out[p + "lig/x"]
        out[p + "gt_rec"] = out[p + "rec/x"]
        out[p + "pocket"] = (rng.standard_normal((5, 3)) * 4).astype(np.float32)
    out["codes"] = np.array([f"cx{i}" for i in range(n_complexes)])
    return out


def _base_cfg(tmp_path):
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(sinkhorn_iters=20, bs=4, num_epochs=2,
                          val_repeats=2),
        data=DataConfig(cache_dir=str(tmp_path / "cache"),
                        node_buckets=(16, 32), pocket_buckets=(8,)),
        checkpoint_dir=str(tmp_path / "checkpts"),
        log_dir=str(tmp_path / "logs"),
    )


def test_curriculum_dips_then_db5(tmp_path):
    rng = np.random.default_rng(0)
    cfg = _base_cfg(tmp_path)

    dips_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data="dips"))
    db5_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data="db5"))

    # DIPS layout: sharded {split}_shard0000.npz; DB5 layout: {split}.npz
    os.makedirs(dips_cfg.cache_path(), exist_ok=True)
    os.makedirs(db5_cfg.cache_path(), exist_ok=True)
    for split, n in (("train", 6), ("val", 3), ("test", 3)):
        np.savez(os.path.join(dips_cfg.cache_path(),
                              f"{split}_shard0000.npz"),
                 **_synth_split(rng, n))
        np.savez(os.path.join(db5_cfg.cache_path(), f"{split}.npz"),
                 **_synth_split(rng, n))

    # both loaders must see the synthetic caches
    assert len(DockingDataset(dips_cfg, "train")) == 6
    assert len(DockingDataset(db5_cfg, "val")) == 3

    logs = []
    state = curriculum(cfg, toy=False, log=lambda *a: logs.append(" ".join(map(str, a))))

    import jax
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(state.params))
    # both stages ran and each saved a best checkpoint under the banner dir
    joined = "\n".join(logs)
    assert "[FINAL TEST dips]" in joined
    assert "[FINAL TEST db5]" in joined
    banner_dir = os.path.join(cfg.checkpoint_dir, cfg.banner())
    assert os.path.isdir(os.path.join(banner_dir, "dips_model_best"))
    assert os.path.isdir(os.path.join(banner_dir, "db5_model_best"))
