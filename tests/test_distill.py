"""Pose distillation via blended coordinate targets (DataConfig.distill_dir).

gt <- (1-a)*gt + a*teacher is gradient-identical to adding a*MSE(pred,
teacher) beside (1-a)*MSE(pred, gt): the cross terms are pred-independent.
The identity is asserted numerically here, plus the dataset-side blending
rules (train split only, matching shapes only, missing teachers skipped).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from equidock_public_tpu.config import Config, DataConfig, ModelConfig
from equidock_public_tpu.data.dataset import DockingDataset

from .test_curriculum import _synth_split


def _write_cache(tmp_path, cfg, n=4):
    rng = np.random.default_rng(0)
    os.makedirs(cfg.cache_path(), exist_ok=True)
    for split in ("train", "val", "test"):
        np.savez(os.path.join(cfg.cache_path(), f"{split}.npz"),
                 **_synth_split(rng, n))


def _teacher_pdb(path, coords):
    with open(path, "w") as f:
        for i, (x, y, z) in enumerate(coords):
            f.write(f"ATOM  {i+1:5d}  CA  ALA A{i+1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C\n")


def test_blending_rules(tmp_path):
    cfg = Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        data=DataConfig(cache_dir=str(tmp_path / "cache"),
                        node_buckets=(16, 32), pocket_buckets=(8,),
                        distill_dir=str(tmp_path / "teach"),
                        distill_alpha=0.25))
    _write_cache(tmp_path, cfg)
    plain = DockingDataset(dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, distill_dir="")), "train")

    os.makedirs(tmp_path / "teach")
    # teacher for complex 0: gt + 4 (blend applies)
    t0 = plain.samples[0].gt_lig + 4.0
    _teacher_pdb(tmp_path / "teach" / "cx0_l_b_EQUIDOCK_TPU.pdb", t0)
    # teacher for complex 1: wrong length (skipped)
    _teacher_pdb(tmp_path / "teach" / "cx1_l_b_EQUIDOCK_TPU.pdb",
                 np.zeros((3, 3)))
    # complexes 2, 3: no teacher file (skipped)

    ds = DockingDataset(cfg, "train")
    np.testing.assert_allclose(
        ds.samples[0].gt_lig, 0.75 * plain.samples[0].gt_lig + 0.25 * t0,
        rtol=1e-4, atol=1e-3)  # PDB coords quantized to 3 decimals
    for i in (1, 2, 3):
        np.testing.assert_array_equal(ds.samples[i].gt_lig,
                                      plain.samples[i].gt_lig)
    # val/test splits never blend
    val = DockingDataset(cfg, "val")
    plain_val = DockingDataset(dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, distill_dir="")), "val")
    np.testing.assert_array_equal(val.samples[0].gt_lig,
                                  plain_val.samples[0].gt_lig)


def test_blended_target_gradient_equals_weighted_aux_loss():
    """d/dp ||p - ((1-a)g + at)||^2 == (1-a) d/dp ||p-g||^2 + a d/dp ||p-t||^2."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))
    a = 0.3
    g1 = jax.grad(lambda p: jnp.mean((p - ((1 - a) * g + a * t)) ** 2))(p)
    g2 = jax.grad(lambda p: (1 - a) * jnp.mean((p - g) ** 2)
                  + a * jnp.mean((p - t) ** 2))(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
