"""Streamed resident epochs (train/resident.py, VERDICT r4 item 6):
group-by-group upload must match the fully-resident path exactly, bound host
residency to the shard-LRU window, and free each group's HBM eagerly."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from equidock_public_tpu.config import (Config, DataConfig, ModelConfig,
                                        TrainConfig)
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.data.synth import write_synth_split
from equidock_public_tpu.train.resident import (StreamedResidentSplit,
                                                build_resident_split,
                                                run_train_epoch_resident,
                                                run_train_epoch_resident_streamed)
from equidock_public_tpu.train.step import create_train_state

from .test_dips_stream import _write_shards

SIZES = [(10, 14), (12, 15), (9, 11), (13, 8), (18, 20), (20, 17)]


def _cfg(**data_kw):
    dk = dict(node_buckets=(16, 32), pocket_buckets=(8, 16))
    dk.update(data_kw)
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(bs=2, sinkhorn_iters=50),
        data=DataConfig(**dk))


def test_streamed_matches_resident(tmp_path):
    """Same seeds -> the streamed runner reproduces the fully-resident
    update exactly (two bucket groups, so ordering + rng interleaving is
    exercised)."""
    cfg = _cfg()
    cache = write_synth_split(str(tmp_path / "train.npz"), SIZES, seed=3, k=4)
    ds = DockingDataset(cfg, "train", cache_path=cache)
    assert len(set(StreamedResidentSplit.build(ds, cfg).by_bucket)) == 2

    from equidock_public_tpu.models.iegmn import init_docking_model

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)

    rs = build_resident_split(ds, cfg)
    st_a = create_train_state(jax.tree.map(jnp.array, params), cfg)
    st_a, tr_a = run_train_epoch_resident(
        st_a, rs, cfg, np.random.default_rng(7), jax.random.PRNGKey(5), 0,
        do_swap=True)

    srs = StreamedResidentSplit.build(ds, cfg)
    st_b = create_train_state(jax.tree.map(jnp.array, params), cfg)
    st_b, tr_b = run_train_epoch_resident_streamed(
        st_b, srs, cfg, np.random.default_rng(7), jax.random.PRNGKey(5), 0,
        do_swap=True)

    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert tr_a["num_batches"] == tr_b["num_batches"]
    np.testing.assert_allclose(tr_a["loss"], tr_b["loss"], rtol=1e-6)


def test_streamed_epoch_bounds_residency(tmp_path):
    """A sharded streaming corpus (stream_window=1) trains through the
    streamed-resident path with host residency <= LRU capacity and all group
    HBM freed by epoch end."""
    cache_dir = tmp_path / "dipscache" / "cv_0"
    _write_shards(str(cache_dir), n_shards=6, per_shard=8, seed=0)
    cfg = _cfg(data="dips", stream_dips=True, stream_window=1,
               cache_dir=str(tmp_path / "dipscache"))
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, device_resident=True))
    assert os.path.isdir(cache_dir)

    # point the streaming dataset at the written shards directly (the derived
    # cache path encodes featurization params this synthetic corpus skips)
    ds = DockingDataset.__new__(DockingDataset)
    from equidock_public_tpu.data.dips import DipsShardIndex, ShardLRU

    ds.cfg = cfg
    ds.index = DipsShardIndex(str(cache_dir), "train")
    ds._lru = ShardLRU(ds.index.shard_paths, capacity=1)
    ds.samples = None
    ds.codes = list(ds.index.codes)
    ds.swap = True

    from equidock_public_tpu.models.iegmn import init_docking_model

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    srs = StreamedResidentSplit.build(ds, cfg)
    state, tr = run_train_epoch_resident_streamed(
        state, srs, cfg, np.random.default_rng(0), jax.random.PRNGKey(1), 0,
        do_swap=True)
    assert np.isfinite(tr["loss"])
    expect = sum(-(-len(v) // cfg.train.bs)
                 for v in srs.by_bucket.values())
    assert tr["num_batches"] == expect
    assert ds._lru.resident() <= 1            # host bound: LRU window
    # HBM bound: every group's store was deleted after its scan; remaining
    # live device bytes are params/opt/metrics-scale, far below the corpus
    live = sum(getattr(a, "nbytes", 0) for a in jax.live_arrays()
               if not a.is_deleted())
    corpus_bytes = 48 * 32 * (27 * 4 + 16) * 4   # rough lower bound
    assert live < corpus_bytes, (live, corpus_bytes)
