"""Dataset + cache pipeline.

Replaces `src/utils/db5_data.py` (Unbound_Bound_Data) and `src/utils/io.py`
(joblib pmap): preprocessing runs once on host CPUs (ProcessPoolExecutor),
results are stored as flat .npz shards (instead of DGL binary graph files +
pickles, `db5_data.py:62-63,133-138`), and batches collate into padded
PairBatch PyTrees.

Train-time augmentation matches `db5_data.py:174-210`: 50% ligand/receptor
swap, then center the ligand and apply a uniform random rotation + U(0,
translation_interval) translation to both the ligand coords and the
ligand-frame pocket cloud.
"""

from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..graph import PadCache, PairBatch, collate, collate_packed
from .featurize import (ProteinGraph, alpha_carbon_array, build_protein_graph,
                        extract_pocket, filter_residues,
                        uniform_rotation_translation)
from .pdb import group_residues, read_pdb

_SIDE_KEYS = ("res_id", "x", "mu_r_norm", "nbr", "nbr_mask", "edge_feat")


@dataclasses.dataclass
class ComplexSample:
    lig: ProteinGraph
    rec: ProteinGraph
    gt_lig: np.ndarray       # (N_l, 3) bound ligand CA
    gt_rec: np.ndarray       # (N_r, 3) bound receptor CA (== rec.x)
    pocket: np.ndarray       # (P, 3) pocket midpoints


def _process_one(task) -> Optional[ComplexSample]:
    lig_path, rec_path, pocket_cutoff, cutoff, max_neighbor = task
    lig_res = filter_residues(group_residues(read_pdb(lig_path)))
    rec_res = filter_residues(group_residues(read_pdb(rec_path)))
    if len(lig_res) <= 1 or len(rec_res) <= 1:
        return None
    lig_ca = alpha_carbon_array(lig_res)
    rec_ca = alpha_carbon_array(rec_res)
    pocket = extract_pocket(lig_ca, rec_ca, pocket_cutoff)
    if pocket is None:
        return None
    lig_g = build_protein_graph(lig_res, cutoff, max_neighbor)
    rec_g = build_protein_graph(rec_res, cutoff, max_neighbor)
    return ComplexSample(lig=lig_g, rec=rec_g, gt_lig=lig_ca, gt_rec=rec_ca,
                         pocket=pocket[0])


def _graph_to_npz(prefix: str, g: ProteinGraph, out: dict) -> None:
    out[f"{prefix}res_id"] = g.res_id
    out[f"{prefix}x"] = g.x
    out[f"{prefix}mu_r_norm"] = g.mu_r_norm
    out[f"{prefix}nbr"] = g.nbr
    out[f"{prefix}nbr_mask"] = g.nbr_mask
    out[f"{prefix}edge_feat"] = g.edge_feat


def _graph_from_npz(z, prefix: str) -> ProteinGraph:
    return ProteinGraph(
        res_id=z[f"{prefix}res_id"], x=z[f"{prefix}x"],
        mu_r_norm=z[f"{prefix}mu_r_norm"], nbr=z[f"{prefix}nbr"],
        nbr_mask=z[f"{prefix}nbr_mask"], edge_feat=z[f"{prefix}edge_feat"],
        src=np.zeros(0, np.int32), dst=np.zeros(0, np.int32))


def build_cache(cfg: Config, split: str, log=print) -> str:
    """Preprocess one split (train/val/test) of DB5.5 into an .npz cache.

    Mirrors `Unbound_Bound_Data.__init__(load_from_cache=False)`
    (`db5_data.py:67-168`) for the db5 layout: `{code}_l_b.pdb` /
    `{code}_r_b.pdb` under raw_data_path, split codes from
    `{split_files_path}/{split}.txt`.
    """
    dc, gc = cfg.data, cfg.graph
    cache_dir = cfg.cache_path()
    os.makedirs(cache_dir, exist_ok=True)
    out_path = os.path.join(cache_dir, f"{split}.npz")
    if os.path.exists(out_path):
        log(f"cache exists: {out_path}")
        return out_path

    with open(os.path.join(dc.split_files_path, split + ".txt")) as f:
        codes = sorted({line.strip() for line in f if line.strip()})
    files = set(os.listdir(dc.raw_data_path))
    codes = [c for c in codes if f"{c}_l_b.pdb" in files and f"{c}_r_b.pdb" in files]
    log(f"{split}: {len(codes)} complexes")

    tasks = [
        (os.path.join(dc.raw_data_path, f"{c}_l_b.pdb"),
         os.path.join(dc.raw_data_path, f"{c}_r_b.pdb"),
         gc.pocket_cutoff, gc.graph_cutoff, gc.graph_max_neighbor)
        for c in codes
    ]
    results: List[Optional[ComplexSample]] = []
    if dc.n_jobs > 1:
        with ProcessPoolExecutor(max_workers=dc.n_jobs) as ex:
            results = list(ex.map(_process_one, tasks))
    else:
        results = [_process_one(t) for t in tasks]

    out: dict = {}
    kept = []
    idx = 0
    for code, sample in zip(codes, results):
        if sample is None:
            log(f"  dropped {code} (pocket <= 3 pairs or too few residues)")
            continue
        p = f"c{idx}/"
        _graph_to_npz(p + "lig/", sample.lig, out)
        _graph_to_npz(p + "rec/", sample.rec, out)
        out[p + "gt_lig"] = sample.gt_lig
        out[p + "gt_rec"] = sample.gt_rec
        out[p + "pocket"] = sample.pocket
        kept.append(code)
        idx += 1
    out["codes"] = np.array(kept)
    np.savez_compressed(out_path, **out)
    log(f"wrote {out_path}: {idx} complexes")
    return out_path


class DockingDataset:
    """Loads a cached split and yields augmented, padded PairBatches."""

    def __init__(self, cfg: Config, split: str, swap: Optional[bool] = None,
                 cache_path: Optional[str] = None):
        """`cache_path` overrides the derived cache location — used to load
        synthetic caches (data.synth) for benchmarking without a mounted
        corpus."""
        self.cfg = cfg
        self.index = None       # streaming mode: DipsShardIndex
        self._lru = None
        if (cfg.data.data == "dips" and cache_path is None
                and cfg.data.stream_dips):
            # Streaming mode: never materialize the corpus. Sizes/codes come
            # from the shard index; samples are fetched through a bounded
            # shard LRU. Capacity = one window (batches within a window only
            # touch that window's shards); the next window's prefetch
            # futures live outside the cache, so peak residency is
            # 2 x stream_window shards total.
            from .dips import DipsShardIndex, ShardLRU

            self.index = DipsShardIndex(cfg.cache_path(), split)
            self._lru = ShardLRU(self.index.shard_paths,
                                 capacity=max(1, cfg.data.stream_window))
            self.samples = None
            self.codes = list(self.index.codes)
        elif cfg.data.data == "dips" and cache_path is None:
            from .dips import load_dips_shards

            self.samples, self.codes = load_dips_shards(cfg, split)
        else:
            path = cache_path or os.path.join(cfg.cache_path(), f"{split}.npz")
            z = np.load(path, allow_pickle=False)
            self.codes = list(z["codes"])
            self.samples = []
            for i in range(len(self.codes)):
                p = f"c{i}/"
                self.samples.append(ComplexSample(
                    lig=_graph_from_npz(z, p + "lig/"),
                    rec=_graph_from_npz(z, p + "rec/"),
                    gt_lig=z[p + "gt_lig"], gt_rec=z[p + "gt_rec"],
                    pocket=z[p + "pocket"]))
        if cfg.data.data_fraction < 1.0 and split == "train":
            n = max(1, int(cfg.data.data_fraction * len(self.codes)))
            if self.samples is not None:
                self.samples = self.samples[:n]
            self.codes = self.codes[:n]
        self.swap = (split == "train" and cfg.data.swap_train) if swap is None else swap
        self.split = split
        self._pad_cache = PadCache(
            max_bytes=int(cfg.data.pad_cache_gb * (1 << 30)))
        if split == "train" and cfg.data.distill_dir:
            self._blend_teacher_poses(cfg.data.distill_dir,
                                      cfg.data.distill_alpha)

    def _blend_teacher_poses(self, teacher_dir: str, alpha: float) -> None:
        """Pose distillation (DataConfig.distill_dir): replace each train
        complex's bound-ligand target with (1-a)*gt + a*teacher_pred. The
        blended-target MSE gradient equals the blend of the two MSEs'
        gradients, so this IS the auxiliary-distillation loss without any
        loss-code change. Requires materialized samples (not stream_dips)."""
        import glob as _glob

        from .pdb import ca_coords, read_pdb

        assert self.samples is not None, \
            "distill_dir requires a materialized dataset (not stream_dips)"
        n_blend = 0
        for s, code in zip(self.samples, self.codes):
            hits = _glob.glob(os.path.join(teacher_dir,
                                           f"{str(code)}_l_b_*.pdb"))
            if not hits:
                continue
            t = ca_coords(read_pdb(hits[0]))
            if t.shape != s.gt_lig.shape:
                continue
            s.gt_lig = ((1.0 - alpha) * s.gt_lig
                        + alpha * t).astype(np.float32)
            n_blend += 1
        print(f"distill: blended teacher poses into {n_blend}/"
              f"{len(self.codes)} train targets (alpha={alpha})")

    def __len__(self) -> int:
        return len(self.codes)

    # --- size/sample accessors: the only sanctioned way to touch samples,
    # so schedule code (batches, input_pipeline.global_batch_schedule) works
    # identically on materialized and streaming datasets.

    def pair_max_nodes(self, idx: int) -> int:
        if self.index is not None:
            return max(self.index.n_lig[idx], self.index.n_rec[idx])
        s = self.samples[idx]
        return max(s.lig.num_nodes, s.rec.num_nodes)

    def pocket_size(self, idx: int) -> int:
        if self.index is not None:
            return self.index.n_pocket[idx]
        return self.samples[idx].pocket.shape[0]

    def get_sample(self, idx: int) -> ComplexSample:
        if self.index is not None:
            shard = self._lru.get(self.index.shard_of[idx])
            return shard[self.index.index_in_shard[idx]]
        return self.samples[idx]

    def sample(self, idx: int, rng: np.random.Generator):
        """One augmented complex: returns (lig_graph, rec_graph, lig_new_x,
        gt_lig, pocket_lig, pocket_rec) following `db5_data.py:170-210`."""
        s = self.get_sample(idx)
        do_swap = self.swap and rng.uniform() > 0.5
        if do_swap:
            lig, rec = s.rec, s.lig
            gt_lig, gt_rec = s.gt_rec, s.gt_lig
        else:
            lig, rec = s.lig, s.rec
            gt_lig, gt_rec = s.gt_lig, s.gt_rec
        pocket = s.pocket

        rot, tr = uniform_rotation_translation(
            rng, self.cfg.graph.translation_interval)
        mean = lig.x.mean(axis=0, keepdims=True)
        pocket_lig = (rot @ (pocket - mean).T).T + tr
        lig_new_x = (rot @ (lig.x - mean).T).T + tr
        return lig, rec, lig_new_x.astype(np.float32), gt_lig, \
            pocket_lig.astype(np.float32), pocket.astype(np.float32)

    def batches(self, rng: np.random.Generator, shuffle: bool = True,
                batch_size: Optional[int] = None,
                sort_by_size: bool = True) -> Iterator[PairBatch]:
        """Yield padded PairBatches of fixed batch_size (last batch padded with
        duplicate masked complexes so XLA sees one batch dimension).

        `sort_by_size` groups similar-size complexes per batch to cut padding
        waste (the bucketing policy of SURVEY §7.3); order of batches is
        shuffled so the schedule stays stochastic.
        """
        bs = batch_size or self.cfg.train.bs
        if self.index is not None:
            yield from self._stream_batches(rng, shuffle, bs, sort_by_size)
            return
        order = np.arange(len(self.codes))
        if shuffle:
            rng.shuffle(order)
        yield from self._chunked(order, rng, bs, shuffle, sort_by_size)

    def _chunked(self, order: np.ndarray, rng: np.random.Generator, bs: int,
                 shuffle: bool, sort_by_size: bool) -> Iterator[PairBatch]:
        """Shared schedule tail: size-sort -> chunk -> shuffle chunks ->
        collate (padded or packed)."""
        if sort_by_size:
            sizes = np.array([self.pair_max_nodes(int(i)) for i in order])
            order = order[np.argsort(sizes, kind="stable")]
        chunks = [order[i:i + bs] for i in range(0, len(order), bs)]
        if shuffle:
            rng.shuffle(chunks)
        pack = self.cfg.data.pack
        for chunk in chunks:
            items = [self.sample(int(i), rng) for i in chunk]
            ligs, recs, new_xs, gts, pls, prs = zip(*items)
            if pack and self.cfg.data.pack_max_per_slot > 1:
                yield collate_packed(ligs, recs, new_xs, gts, pls, prs,
                                     self.cfg.data.node_buckets,
                                     self.cfg.data.pocket_buckets,
                                     self.cfg.data.pack_max_per_slot,
                                     self.cfg.data.slot_count_buckets,
                                     pad_cache=self._pad_cache)
            else:
                yield collate(ligs, recs, new_xs, gts, pls, prs,
                              self.cfg.data.node_buckets,
                              self.cfg.data.pocket_buckets, batch_size=bs,
                              pad_cache=self._pad_cache)

    def _stream_batches(self, rng: np.random.Generator, shuffle: bool,
                        bs: int, sort_by_size: bool) -> Iterator[PairBatch]:
        """Streaming epoch: deterministic shuffle over SHARD order, then the
        normal schedule within each window of `stream_window` shards, with
        the next window prefetched on the loader thread while the current
        one collates. RSS stays O(2 x window x SHARD_SIZE) for the whole
        epoch regardless of corpus size (VERDICT r2 next item 6).

        Shuffling granularity is the window, not the corpus — the standard
        streaming trade (tf.data shuffle buffers make the same one). Window
        membership reshuffles every epoch via `rng`, so any pair of samples
        still co-occurs in some epoch's window.
        """
        n = len(self.codes)
        shard_of = self.index.shard_of
        n_shards = (max(shard_of[:n]) + 1) if n else 0
        by_shard: List[List[int]] = [[] for _ in range(n_shards)]
        for i in range(n):
            by_shard[shard_of[i]].append(i)
        shard_order = np.arange(n_shards)
        if shuffle:
            rng.shuffle(shard_order)
        W = max(1, self.cfg.data.stream_window)
        windows = [shard_order[w:w + W]
                   for w in range(0, n_shards, W)]
        for wi, window in enumerate(windows):
            for si in window:
                self._lru.get(int(si))  # resident for the whole window
            if wi + 1 < len(windows):
                for si in windows[wi + 1]:
                    self._lru.prefetch(int(si))
            order = np.concatenate([np.array(by_shard[int(si)], np.int64)
                                    for si in window])
            if shuffle:
                rng.shuffle(order)
            yield from self._chunked(order, rng, bs, shuffle, sort_by_size)
