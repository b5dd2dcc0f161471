"""dp-sharded resident epochs (train/resident.py, VERDICT r4 item 3):
the shard_map'ed epoch scan over a pair-sharded store must reproduce the
single-device resident update exactly (same global schedule, same
augmentation stream, psum-normalized loss, grads psum'd before clip/update).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.config import Config, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.data.synth import write_synth_split
from equidock_public_tpu.parallel.mesh import make_mesh
from equidock_public_tpu.train.resident import (_dp_train_epoch_fn,
                                                _schedule_dp,
                                                build_resident_split_dp,
                                                run_train_epoch_resident_dp,
                                                train_epoch_scan)
from equidock_public_tpu.train.step import create_train_state

# 6 pairs in one 16-node bucket: with dp=4 / bs=4 the shards hold (2,2,1,1)
# pairs — the uneven-valid-count case the psum normalization must get right
SIZES = [(10, 14), (12, 15), (9, 11), (13, 8), (11, 12), (8, 10)]


def _cfg(**train_kw):
    tk = dict(bs=4, sinkhorn_iters=50)
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


@pytest.mark.parametrize("dp", [2, 4])
def test_dp_scan_matches_single_device(tmp_path, dp):
    """One epoch slice on the dp mesh == the single-device scan on the same
    store layout and schedule: identical final params and scalars."""
    cfg = _cfg(bs=4)
    ds, cfg = _ds(tmp_path, cfg)
    mesh = make_mesh(dp, 1, devices=jax.devices()[:dp])
    rs = build_resident_split_dp(ds, cfg, mesh)
    (b,) = rs.groups
    bs_loc = rs.bs // dp
    idx, valid = _schedule_dp(rs.n_locs[b], bs_loc,
                              np.random.default_rng(11))
    # the same plan, seen by a single device as global store rows
    gid = (np.arange(dp * bs_loc) // bs_loc)[None, :] * rs.p_loc[b] + idx

    from equidock_public_tpu.models.iegmn import init_docking_model

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    key = jax.random.PRNGKey(42)
    scale = jnp.asarray(1.0, jnp.float32)

    # single-device reference: gather the sharded store back to one device
    store_np = jax.tree.map(lambda x: np.asarray(x), rs.groups[b])
    store_single = jax.device_put(
        jax.tree.map(jnp.asarray, store_np), jax.devices()[0])
    # deep-copy per path: both scans donate their state, and shared param
    # buffers would be consumed by the first run
    st_single = create_train_state(jax.tree.map(jnp.array, params), cfg)
    st_single, outs_single = train_epoch_scan(
        st_single, store_single, jnp.asarray(gid), jnp.asarray(valid), key,
        scale, cfg, True, emit_coords=True)

    fn = _dp_train_epoch_fn(cfg, mesh, True, True)
    st_dp = create_train_state(jax.tree.map(jnp.array, params), cfg)
    st_dp, outs_dp = fn(st_dp, rs.groups[b], jnp.asarray(idx),
                        jnp.asarray(valid), key, scale)

    for pth, a, bb in zip(
            [k for k, _ in
             jax.tree_util.tree_flatten_with_path(st_single.params)[0]],
            jax.tree.leaves(st_single.params),
            jax.tree.leaves(st_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5,
                                   err_msg=str(pth))
    for k in ("loss", "ligand_coors_loss", "ot_loss", "intersection_loss"):
        np.testing.assert_allclose(np.asarray(outs_single[k]),
                                   np.asarray(outs_dp[k]), rtol=2e-4,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(outs_single["swap"]),
                                  np.asarray(outs_dp["swap"]))
    np.testing.assert_allclose(np.asarray(outs_single["coords"]),
                               np.asarray(outs_dp["coords"]), atol=2e-4)


def test_dp_epoch_runner(tmp_path):
    """Full dp epoch runner: finite losses, the host metric contract, and a
    second epoch on donated state."""
    cfg = _cfg(bs=4)
    ds, cfg = _ds(tmp_path, cfg, swap=True)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    rs = build_resident_split_dp(ds, cfg, mesh)
    from equidock_public_tpu.models.iegmn import init_docking_model

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for epoch in range(2):
        state, tr = run_train_epoch_resident_dp(
            state, rs, cfg, mesh, rng, key, epoch, do_swap=True)
        assert np.isfinite(tr["loss"])
        assert tr["num_batches"] == 2   # ceil(3/2) with shards (3,3)
        assert np.isfinite(tr["complex_rmsd_median"])


def test_fit_dp_resident_e2e(tmp_path):
    """fit() with -device_resident -dp 2 trains end-to-end and checkpoints
    (the round-4 single-chip assert is gone)."""
    pytest.importorskip("orbax.checkpoint")
    import glob
    import os

    from equidock_public_tpu.config import ParallelConfig
    from equidock_public_tpu.train.loop import fit

    cfg = _cfg(bs=4, patience=3, val_repeats=2)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, device_resident=True, node_buckets=(16, 32),
            pocket_buckets=(8, 16), cache_dir=str(tmp_path / "cache")),
        parallel=ParallelConfig(dp=2),
        checkpoint_dir=str(tmp_path / "ckpt"))
    split_dir = cfg.cache_path()
    os.makedirs(split_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        write_synth_split(os.path.join(split_dir, f"{split}.npz"),
                          SIZES, seed=7, k=4)
    state = fit(cfg, max_epochs=2, log=lambda *a: None)
    assert state is not None
    assert glob.glob(str(tmp_path / "ckpt" / "*" / "db5_model_best"))
