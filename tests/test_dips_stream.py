"""Streaming DIPS epochs: DipsShardIndex + ShardLRU + windowed batches.

The reference loads its whole (cached) corpus into RAM before training
(`db5_data.py:133-168`); at the 42K-pair DIPS scale that is multi-GB of host
RSS. The streaming path keeps at most 2*stream_window shards resident and
must behave identically to the materialized path at the schedule level.
Synthetic corpus here: many tiny shards (the VERDICT r2 item-6 test recipe).
"""

import dataclasses
import os

import numpy as np
import jax

from equidock_public_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.data.dips import DipsShardIndex, ShardLRU
from equidock_public_tpu.parallel.input_pipeline import global_batch_schedule

N_SHARDS = 12
PER_SHARD = 24
BS = 4
WINDOW = 2


def _synth_graph(rng, n, k=4):
    return {
        "res_id": rng.integers(0, 21, (n,)).astype(np.int32),
        "x": (rng.standard_normal((n, 3)) * 8).astype(np.float32),
        "mu_r_norm": (np.abs(rng.standard_normal((n, 5))) + 0.5).astype(np.float32),
        "nbr": rng.integers(0, n, (n, k)).astype(np.int32),
        "nbr_mask": np.ones((n, k), np.float32),
        "edge_feat": rng.standard_normal((n, k, 27)).astype(np.float32),
    }


def _write_shards(cache_dir, split="train", n_shards=N_SHARDS,
                  per_shard=PER_SHARD, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(cache_dir, exist_ok=True)
    for s in range(n_shards):
        out = {}
        for i in range(per_shard):
            p = f"c{i}/"
            n_l, n_r = int(rng.integers(8, 14)), int(rng.integers(10, 18))
            for prefix, g in (("lig/", _synth_graph(rng, n_l)),
                              ("rec/", _synth_graph(rng, n_r))):
                for key, val in g.items():
                    out[p + prefix + key] = val
            out[p + "gt_lig"] = out[p + "lig/x"]
            out[p + "gt_rec"] = out[p + "rec/x"]
            out[p + "pocket"] = (rng.standard_normal((5, 3)) * 4).astype(np.float32)
        out["codes"] = np.array([f"s{s}c{i}" for i in range(per_shard)])
        np.savez(os.path.join(cache_dir, f"{split}_shard{s:04d}.npz"), **out)


def _cfg(tmp_path, stream, **data_kw):
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(bs=BS),
        data=DataConfig(data="dips", cache_dir=str(tmp_path / "cache"),
                        node_buckets=(16, 32), pocket_buckets=(8,),
                        stream_dips=stream, stream_window=WINDOW, **data_kw),
    )


def _make_corpus(tmp_path):
    cfg = _cfg(tmp_path, stream=True)
    _write_shards(cfg.cache_path())
    return cfg


def test_shard_index_sizes_and_sidecar(tmp_path):
    cfg = _make_corpus(tmp_path)
    idx = DipsShardIndex(cfg.cache_path(), "train")
    assert len(idx) == N_SHARDS * PER_SHARD
    # sizes agree with the materialized loader
    dense = DockingDataset(_cfg(tmp_path, stream=False), "train")
    for i in range(0, len(idx), 37):
        s = dense.samples[i]
        assert idx.n_lig[i] == s.lig.num_nodes
        assert idx.n_rec[i] == s.rec.num_nodes
        assert idx.n_pocket[i] == s.pocket.shape[0]
        assert str(idx.codes[i]) == str(dense.codes[i])
    # sidecars were written; a second index build reads them without
    # touching any shard npz
    sidecars = [p + ".index.json" for p in idx.shard_paths]
    assert all(os.path.exists(p) for p in sidecars)
    import equidock_public_tpu.data.dips as dips_mod
    calls = []
    orig = dips_mod.load_shard_samples
    dips_mod.load_shard_samples = lambda p: calls.append(p) or orig(p)
    try:
        DipsShardIndex(cfg.cache_path(), "train")
    finally:
        dips_mod.load_shard_samples = orig
    assert calls == []


def test_shard_lru_bounded_and_counts(tmp_path):
    cfg = _make_corpus(tmp_path)
    idx = DipsShardIndex(cfg.cache_path(), "train")
    lru = ShardLRU(idx.shard_paths, capacity=3)
    for s in range(N_SHARDS):
        lru.prefetch((s + 1) % N_SHARDS)
        samples = lru.get(s)
        assert len(samples) == PER_SHARD
        assert lru.resident() <= 3
    # shard 1 was prefetched then got; no double-load
    assert lru.loads <= N_SHARDS + 1  # wrap-around prefetch of shard 0


def test_streaming_epoch_equals_materialized_when_unshuffled(tmp_path):
    cfg_s = _make_corpus(tmp_path)
    cfg_d = _cfg(tmp_path, stream=False)
    ds_s = DockingDataset(cfg_s, "train", swap=False)
    ds_d = DockingDataset(cfg_d, "train", swap=False)
    assert len(ds_s) == len(ds_d) == N_SHARDS * PER_SHARD
    # PER_SHARD % BS == 0 and window boundaries align, so with shuffle off
    # the window-local chunking reproduces the dense chunking exactly
    bs_s = list(ds_s.batches(np.random.default_rng(7), shuffle=False,
                             sort_by_size=False))
    bs_d = list(ds_d.batches(np.random.default_rng(7), shuffle=False,
                             sort_by_size=False))
    assert len(bs_s) == len(bs_d)
    for a, b in zip(bs_s, bs_d):
        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb)
        for xa, xb in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_streaming_epoch_covers_every_sample_once_with_bounded_rss(tmp_path):
    cfg = _make_corpus(tmp_path)
    ds = DockingDataset(cfg, "train")
    seen = []
    orig = ds.sample
    ds.sample = lambda i, rng: (seen.append(int(i)), orig(i, rng))[1]
    n_batches = sum(1 for _ in ds.batches(np.random.default_rng(3),
                                          shuffle=True))
    n = N_SHARDS * PER_SHARD
    assert n_batches == n // BS
    assert sorted(seen) == list(range(n))        # exactly-once coverage
    assert ds._lru.loads == N_SHARDS             # each shard loaded once
    assert ds._lru.resident() <= 2 * WINDOW      # bounded residency


def test_streaming_global_batch_schedule_matches_materialized(tmp_path):
    cfg_s = _make_corpus(tmp_path)
    ds_s = DockingDataset(cfg_s, "train")
    ds_d = DockingDataset(_cfg(tmp_path, stream=False), "train")
    sched_s = global_batch_schedule(ds_s, np.random.default_rng(11), BS)
    sched_d = global_batch_schedule(ds_d, np.random.default_rng(11), BS)
    assert len(sched_s) == len(sched_d)
    for (ca, sa), (cb, sb) in zip(sched_s, sched_d):
        np.testing.assert_array_equal(ca, cb)
        assert sa == sb
    # the schedule derives from the index alone: no shard was materialized
    assert ds_s._lru.loads == 0


def test_streaming_respects_data_fraction_and_packing(tmp_path):
    cfg = _make_corpus(tmp_path)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, data_fraction=0.5, pack=True, pack_max_per_slot=2,
        slot_count_buckets=(1, 2, 3, 4)))
    ds = DockingDataset(cfg, "train")
    assert len(ds) == N_SHARDS * PER_SHARD // 2
    seen = []
    orig = ds.sample
    ds.sample = lambda i, rng: (seen.append(int(i)), orig(i, rng))[1]
    batches = list(ds.batches(np.random.default_rng(5), shuffle=True))
    assert sorted(seen) == list(range(len(ds)))
    # packed collate ran (seg axis present) and only prefix shards loaded
    assert all(b.n_segs > 1 and b.seg_mask is not None for b in batches)
    assert ds._lru.loads == N_SHARDS // 2


def test_pad_cache_byte_budget():
    """PadCache (graph.py) stays under its byte budget via LRU eviction and
    keeps returning correct padded fields after evictions (VERDICT r3
    item 10: explicit memory bounds on the host caches)."""
    from equidock_public_tpu.data.synth import synth_graph
    from equidock_public_tpu.data.featurize import ProteinGraph
    from equidock_public_tpu.graph import PadCache, pad_protein

    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(12):
        d = synth_graph(rng, 24, k=4)
        e = np.zeros(0, np.int32)
        graphs.append(ProteinGraph(
            res_id=d["res_id"], x=d["x"], mu_r_norm=d["mu_r_norm"],
            nbr=d["nbr"], nbr_mask=d["nbr_mask"], edge_feat=d["edge_feat"],
            src=e, dst=e))
    one_entry = sum(a.nbytes for a in pad_protein(graphs[0], 32).values())
    cache = PadCache(max_bytes=4 * one_entry)

    for rep in range(3):
        for g in graphs:
            for bucket in (32, 64):
                got = cache.get(g, bucket)
                want = pad_protein(g, bucket)
                for k in want:
                    np.testing.assert_array_equal(got[k], want[k])
            assert cache.nbytes <= cache.max_bytes

    # weak keying still frees entries when graphs die
    import gc

    before = cache.nbytes
    assert before > 0
    del graphs, g
    gc.collect()
    assert cache.nbytes == 0
