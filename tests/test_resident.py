"""Device-resident epoch path (train/resident.py): assembly parity vs the
host collate, swap correctness, and a full resident train/eval cycle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.config import Config, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.data.featurize import uniform_rotation_translation
from equidock_public_tpu.data.synth import write_synth_split
from equidock_public_tpu.graph import collate
from equidock_public_tpu.train.resident import (assemble_batch,
                                                build_resident_split,
                                                random_rotations,
                                                run_eval_epoch_resident,
                                                run_train_epoch_resident)
from equidock_public_tpu.train.step import create_train_state, loss_fn

SIZES = [(10, 14), (12, 15), (9, 11), (13, 8)]


def _cfg(**train_kw):
    tk = dict(bs=2, sinkhorn_iters=50)
    tk.update(train_kw)
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(**tk))


def _ds(tmp_path, cfg, swap=False):
    cache = write_synth_split(str(tmp_path / "train.npz"), SIZES, seed=3, k=4)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, node_buckets=(16, 32), pocket_buckets=(8, 16)))
    return DockingDataset(cfg, "train", swap=swap, cache_path=cache), cfg


def test_assemble_matches_collate(tmp_path):
    """assemble_batch with a pinned rigid + no swap reproduces collate()'s
    padded batch field-for-field (padding included)."""
    ds, cfg = _ds(tmp_path, _cfg())
    rs = build_resident_split(ds, cfg)
    assert set(rs.groups) == {16}
    rng = np.random.default_rng(5)

    pair_ids = [0, 1]
    rots, trs, items = [], [], []
    for i in pair_ids:
        s = ds.samples[i]
        rot, tr = uniform_rotation_translation(rng, 5.0)
        mean = s.lig.x.mean(axis=0, keepdims=True)
        new_x = ((rot @ (s.lig.x - mean).T).T + tr).astype(np.float32)
        pl = ((rot @ (s.pocket - mean).T).T + tr).astype(np.float32)
        rots.append(rot)
        trs.append(tr[0])
        items.append((s.lig, s.rec, new_x, s.gt_lig, pl,
                      s.pocket.astype(np.float32)))
    ligs, recs, new_xs, gts, pls, prs = zip(*items)
    ref = collate(ligs, recs, new_xs, gts, pls, prs,
                  cfg.data.node_buckets, cfg.data.pocket_buckets,
                  batch_size=2)

    got, flag = assemble_batch(
        rs.groups[16], jnp.asarray(pair_ids, jnp.int32),
        jnp.ones(2, jnp.float32), jax.random.PRNGKey(0), do_swap=False,
        translation_interval=5.0,
        rigid=(jnp.asarray(np.stack(rots), jnp.float32),
               jnp.asarray(np.stack(trs), jnp.float32)))
    assert not bool(np.any(np.asarray(flag)))

    np.testing.assert_allclose(np.asarray(got.lig.x), np.asarray(ref.lig.x),
                               atol=1e-5)
    for side in ("lig", "rec"):
        g, r = getattr(got, side), getattr(ref, side)
        np.testing.assert_array_equal(np.asarray(g.res_id), np.asarray(r.res_id))
        np.testing.assert_array_equal(np.asarray(g.nbr), np.asarray(r.nbr))
        np.testing.assert_array_equal(np.asarray(g.nbr_mask),
                                      np.asarray(r.nbr_mask))
        np.testing.assert_array_equal(np.asarray(g.node_mask),
                                      np.asarray(r.node_mask))
        np.testing.assert_allclose(np.asarray(g.edge_feat),
                                   np.asarray(r.edge_feat), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g.mu_r_norm),
                                   np.asarray(r.mu_r_norm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.rec.x), np.asarray(ref.rec.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.gt_lig), np.asarray(ref.gt_lig),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.pocket_lig),
                               np.asarray(ref.pocket_lig), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.pocket_rec),
                               np.asarray(ref.pocket_rec), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.pocket_mask),
                                  np.asarray(ref.pocket_mask))
    np.testing.assert_array_equal(np.asarray(got.pair_mask),
                                  np.asarray(ref.pair_mask))

    # identical padded batches => identical loss
    cfg2 = cfg
    key = jax.random.PRNGKey(1)
    params = __import__(
        "equidock_public_tpu.models.iegmn",
        fromlist=["init_docking_model"]).init_docking_model(key, cfg2.model)
    l_ref, _ = loss_fn(params, cfg2, ref, None, False)
    l_got, _ = loss_fn(params, cfg2, got, None, False)
    np.testing.assert_allclose(float(l_ref), float(l_got), rtol=1e-5)


def test_swap_assembly(tmp_path):
    """swap_flag=1 exchanges roles: ligand side carries the receptor graph
    (augmented coords), target becomes the bound receptor CAs."""
    ds, cfg = _ds(tmp_path, _cfg())
    rs = build_resident_split(ds, cfg)
    g = rs.groups[16]
    i = 2
    s = ds.samples[i]
    rot = np.eye(3, dtype=np.float32)[None]
    tr = np.zeros((1, 3), np.float32)
    got, _ = assemble_batch(
        g, jnp.asarray([i], jnp.int32), jnp.ones(1, jnp.float32),
        jax.random.PRNGKey(0), do_swap=True, translation_interval=5.0,
        rigid=(jnp.asarray(rot), jnp.asarray(tr)),
        swap_flag=jnp.ones(1, bool))
    n_r = s.rec.num_nodes
    # identity rigid about the (swapped) ligand's centroid: new ligand coords
    # are the centered receptor coords
    exp = s.rec.x - s.rec.x.mean(axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(got.lig.x)[0, :n_r], exp, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.lig.res_id)[0, :n_r],
                                  s.rec.res_id)
    np.testing.assert_allclose(np.asarray(got.gt_lig)[0, :n_r], s.gt_rec,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.rec.res_id)[0, :s.lig.num_nodes],
                                  s.lig.res_id)
    # receptor side keeps its bound coords (the receptor never moves)
    np.testing.assert_allclose(np.asarray(got.rec.x)[0, :s.lig.num_nodes],
                               s.lig.x, atol=1e-6)


def test_random_rotations_are_rotations():
    R = np.asarray(random_rotations(jax.random.PRNGKey(0), 64))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_resident_epoch_cycle(tmp_path):
    """Two resident train epochs + a repeated resident eval produce finite
    losses and the full metric-dict contract of the host path."""
    cfg = _cfg(bs=3)
    ds, cfg = _ds(tmp_path, cfg, swap=True)
    rs = build_resident_split(ds, cfg)
    from equidock_public_tpu.models.iegmn import init_docking_model

    key = jax.random.PRNGKey(0)
    params = init_docking_model(key, cfg.model)
    state = create_train_state(params, cfg)
    rng = np.random.default_rng(0)
    losses = []
    for epoch in range(2):
        state, tr = run_train_epoch_resident(state, rs, cfg, rng, key, epoch,
                                             do_swap=True)
        losses.append(tr["loss"])
        assert np.isfinite(tr["loss"])
        assert tr["num_batches"] == 2  # ceil(4/3) = 2 steps
        assert np.isfinite(tr["complex_rmsd_median"])
    va = run_eval_epoch_resident(state.params, rs, cfg, jax.random.PRNGKey(7),
                                 repeats=2)
    for k in ("loss", "complex_rmsd_median", "complex_rmsd_mean",
              "interface_rmsd_median", "ligand_rmsd_median"):
        assert np.isfinite(va[k]), k


def test_fit_device_resident_e2e(tmp_path):
    """fit() with -device_resident trains end-to-end on a synthetic cache
    (monkeypatched split files), saving a best checkpoint."""
    pytest.importorskip("orbax.checkpoint")
    cfg = _cfg(bs=2, patience=3, val_repeats=2)
    cache_dir = tmp_path / "cache"
    import os

    from equidock_public_tpu.train.loop import fit

    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, device_resident=True, node_buckets=(16, 32),
        pocket_buckets=(8, 16), cache_dir=str(cache_dir)),
        checkpoint_dir=str(tmp_path / "ckpt"))
    split_dir = cfg.cache_path()
    os.makedirs(split_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        write_synth_split(os.path.join(split_dir, f"{split}.npz"),
                          SIZES, seed=7, k=4)
    state = fit(cfg, max_epochs=2, log=lambda *a: None)
    assert state is not None
    import glob

    assert glob.glob(str(tmp_path / "ckpt" / "*" / "db5_model_best"))
