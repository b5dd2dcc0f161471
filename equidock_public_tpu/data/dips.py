"""DIPS dataset support: dill pair files -> residue lists -> graph cache.

The reference reads atom3 `Pair` pickles with `pd.read_pickle` and groups
atoms by (chain, residue, resname) (`db5_data.py:24-35`). DIPS raw data is
~42K pairs, so the cache is sharded (`SHARD_SIZE` complexes per .npz).
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from ..config import Config
from .dataset import ComplexSample, _graph_from_npz, _graph_to_npz
from .featurize import (alpha_carbon_array, build_protein_graph,
                        extract_pocket, filter_residues)
from .pdb import GroupedResidue

SHARD_SIZE = 512


def residues_from_dataframe(df) -> List[GroupedResidue]:
    """pandas DataFrame (atom3 layout: columns chain/residue/resname/
    atom_name/x/y/z/element) -> sorted GroupedResidue list, matching
    `get_residues_DIPS` (`db5_data.py:24-35`)."""
    order = {}
    chains = df["chain"].to_numpy()
    resnums = df["residue"].to_numpy()
    resnames = df["resname"].to_numpy()
    for i in range(len(df)):
        key = (str(chains[i]), int(resnums[i]), str(resnames[i]))
        order.setdefault(key, []).append(i)
    names = df["atom_name"].to_numpy()
    coords = df[["x", "y", "z"]].to_numpy().astype(np.float32)
    elements = (df["element"].to_numpy() if "element" in df.columns
                else np.array([""] * len(df)))
    out = []
    for key in sorted(order.keys()):
        idx = np.array(order[key], dtype=np.int64)
        out.append((key, {
            "atom_name": names[idx].astype(object),
            "coords": coords[idx],
            "element": elements[idx].astype(object),
            "resname": key[2],
        }))
    return out


def _normalize_dips_df(df):
    """DIPS dills use the atom3 column convention (aid/atom_name/chain/
    residue/resname/x/y/z/element); biopandas-style names are tolerated
    (rename of an absent column is a no-op)."""
    return df.rename(columns={
        "chain_id": "chain", "residue_number": "residue",
        "residue_name": "resname", "x_coord": "x", "y_coord": "y",
        "z_coord": "z", "element_symbol": "element"})


def read_dips_pair_tables(dill_path: str):
    """One DIPS pair pickle -> (ligand, receptor) full-atom AtomTables —
    the test-set generator needs ALL atoms, not the N/CA/C-filtered residue
    view (`testset_random_transf.py:97-141` writes every df0/df1 atom)."""
    import pandas as pd

    from .pdb import build_atom_table

    x = pd.read_pickle(dill_path)

    def table(df):
        df = _normalize_dips_df(df)
        coords = np.stack([df["x"].to_numpy(), df["y"].to_numpy(),
                           df["z"].to_numpy()], axis=1).astype(np.float32)
        return build_atom_table(
            df["atom_name"].to_numpy(), df["resname"].to_numpy(),
            df["chain"].to_numpy(),
            df["residue"].to_numpy().astype(np.int64),
            coords, df["element"].to_numpy())

    return table(x.df0), table(x.df1)


def read_dips_pair(dill_path: str) -> Tuple[List[GroupedResidue], List[GroupedResidue]]:
    """One DIPS pair pickle -> (ligand residues [df0], receptor residues [df1])."""
    import pandas as pd

    x = pd.read_pickle(dill_path)
    return (residues_from_dataframe(_normalize_dips_df(x.df0)),
            residues_from_dataframe(_normalize_dips_df(x.df1)))


def _process_dips_one(task) -> Optional[ComplexSample]:
    dill_path, pocket_cutoff, cutoff, max_neighbor = task
    try:
        lig_res, rec_res = read_dips_pair(dill_path)
    except Exception:
        return None
    lig_res = filter_residues(lig_res)
    rec_res = filter_residues(rec_res)
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


def build_dips_cache(cfg: Config, split: str,
                     raw_data_path: str, split_files_path: str,
                     log=print) -> List[str]:
    """Preprocess one DIPS split into sharded .npz caches. Split lists come
    from `pairs-postprocessed-{split}.txt` (SURVEY §2.3 #33)."""
    gc = cfg.graph
    cache_dir = cfg.cache_path()
    os.makedirs(cache_dir, exist_ok=True)

    list_file = os.path.join(split_files_path, f"pairs-postprocessed-{split}.txt")
    with open(list_file) as f:
        names = [l.strip() for l in f if l.strip()]
    if split == "train" and cfg.data.data_fraction < 1.0:
        rng = np.random.default_rng(cfg.train.random_seed)
        rng.shuffle(names)
        names = names[: int(cfg.data.data_fraction * len(names))]
    log(f"dips {split}: {len(names)} pairs")

    shard_paths = []
    for shard_idx, start in enumerate(range(0, len(names), SHARD_SIZE)):
        out_path = os.path.join(cache_dir, f"{split}_shard{shard_idx:04d}.npz")
        shard_paths.append(out_path)
        if os.path.exists(out_path):
            continue
        chunk = names[start: start + SHARD_SIZE]
        tasks = [(os.path.join(raw_data_path, n), gc.pocket_cutoff,
                  gc.graph_cutoff, gc.graph_max_neighbor) for n in chunk]
        if cfg.data.n_jobs > 1:
            with ProcessPoolExecutor(max_workers=cfg.data.n_jobs) as ex:
                results = list(ex.map(_process_dips_one, tasks))
        else:
            results = [_process_dips_one(t) for t in tasks]
        out: dict = {}
        kept = []
        idx = 0
        for name, sample in zip(chunk, results):
            if sample is None:
                continue
            p = f"c{idx}/"
            _graph_to_npz(p + "lig/", sample.lig, out)
            _graph_to_npz(p + "rec/", sample.rec, out)
            out[p + "gt_lig"] = sample.gt_lig
            out[p + "gt_rec"] = sample.gt_rec
            out[p + "pocket"] = sample.pocket
            kept.append(name)
            idx += 1
        out["codes"] = np.array(kept)
        np.savez_compressed(out_path, **out)
        log(f"  shard {shard_idx}: kept {idx}/{len(chunk)}")
    return shard_paths


def shard_files(cache_dir: str, split: str) -> List[str]:
    paths = []
    shard_idx = 0
    while True:
        path = os.path.join(cache_dir, f"{split}_shard{shard_idx:04d}.npz")
        if not os.path.exists(path):
            break
        paths.append(path)
        shard_idx += 1
    return paths


def load_shard_samples(path: str) -> Tuple[List[ComplexSample], List[str]]:
    """Materialize one shard's complexes."""
    z = np.load(path, allow_pickle=False)
    names = list(z["codes"])
    samples = []
    for i in range(len(names)):
        p = f"c{i}/"
        samples.append(ComplexSample(
            lig=_graph_from_npz(z, p + "lig/"),
            rec=_graph_from_npz(z, p + "rec/"),
            gt_lig=z[p + "gt_lig"], gt_rec=z[p + "gt_rec"],
            pocket=z[p + "pocket"]))
    return samples, names


def load_dips_shards(cfg: Config, split: str) -> Tuple[List[ComplexSample], List[str]]:
    """Load EVERY shard into RAM — fine for small corpora; the streaming
    path (`DipsShardIndex` + `DockingDataset(stream_dips=True)`) replaces
    this at the 42K-pair scale, where materializing all samples costs
    multi-GB of host RSS."""
    samples: List[ComplexSample] = []
    codes: List[str] = []
    for path in shard_files(cfg.cache_path(), split):
        s, n = load_shard_samples(path)
        samples.extend(s)
        codes.extend(n)
    return samples, codes


class DipsShardIndex:
    """Lightweight index over a sharded DIPS cache: per-sample sizes + codes
    WITHOUT materializing the arrays.

    Sizes live in a `<shard>.index.json` sidecar; when missing (older
    caches), it is derived by loading the shard once and written back
    best-effort, so the O(corpus) load happens at most once per cache, not
    once per run. Sizes are all `global_batch_schedule` needs, so the
    multi-host schedule works without touching sample data."""

    def __init__(self, cache_dir: str, split: str):
        import json

        self.shard_paths = shard_files(cache_dir, split)
        self.codes: List[str] = []
        self.shard_of: List[int] = []     # per sample
        self.index_in_shard: List[int] = []
        self.n_lig: List[int] = []
        self.n_rec: List[int] = []
        self.n_pocket: List[int] = []
        for si, path in enumerate(self.shard_paths):
            sidecar = path + ".index.json"
            meta = None
            if os.path.exists(sidecar):
                try:
                    with open(sidecar) as f:
                        meta = json.load(f)
                except ValueError:
                    meta = None  # truncated sidecar (killed mid-write): rederive
            if meta is None:
                samples, names = load_shard_samples(path)
                meta = {"codes": [str(n) for n in names],
                        "n_lig": [s.lig.num_nodes for s in samples],
                        "n_rec": [s.rec.num_nodes for s in samples],
                        "n_pocket": [int(s.pocket.shape[0]) for s in samples]}
                try:
                    # atomic write: queue scripts run training under
                    # `timeout`, and a SIGKILL mid-dump must not leave a
                    # truncated sidecar that bricks every later run
                    tmp = sidecar + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(meta, f)
                    os.replace(tmp, sidecar)
                except OSError:
                    pass  # read-only cache dir: derive again next run
            k = len(meta["codes"])
            self.codes.extend(meta["codes"])
            self.shard_of.extend([si] * k)
            self.index_in_shard.extend(range(k))
            self.n_lig.extend(meta["n_lig"])
            self.n_rec.extend(meta["n_rec"])
            self.n_pocket.extend(meta["n_pocket"])

    def __len__(self) -> int:
        return len(self.codes)


class ShardLRU:
    """Bounded cache of materialized shards for streaming epochs.

    `get(shard_idx)` returns the shard's ComplexSample list, loading it on
    miss and evicting the least-recently-used shard beyond `capacity` — so
    host RSS is O(capacity x SHARD_SIZE) instead of O(corpus), which is the
    whole point of streaming at the 42K-pair DIPS scale (VERDICT r2 weak
    item 4). `prefetch(idx)` warms a shard on a background thread (one
    loader thread: npz decompression releases the GIL in zlib, so the
    overlap with collation is real).
    """

    def __init__(self, shard_paths: List[str], capacity: int = 4):
        import collections
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self.shard_paths = shard_paths
        self.capacity = max(1, capacity)
        self._cache: "collections.OrderedDict[int, List[ComplexSample]]" = \
            collections.OrderedDict()
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending: dict = {}
        self.loads = 0  # test hook: total shard materializations

    def _load(self, idx: int) -> List[ComplexSample]:
        samples, _ = load_shard_samples(self.shard_paths[idx])
        return samples

    def _put(self, idx: int, samples: List[ComplexSample]) -> None:
        self._cache[idx] = samples
        self._cache.move_to_end(idx)
        while len(self._cache) > self.capacity:
            self._cache.popitem(last=False)

    def prefetch(self, idx: int) -> None:
        with self._lock:
            if idx in self._cache or idx in self._pending:
                return
            self.loads += 1
            self._pending[idx] = self._pool.submit(self._load, idx)

    def get(self, idx: int) -> List[ComplexSample]:
        with self._lock:
            if idx in self._cache:
                self._cache.move_to_end(idx)
                return self._cache[idx]
            fut = self._pending.pop(idx, None)
            if fut is None:
                self.loads += 1
        if fut is not None:
            samples = fut.result()
        else:
            samples = self._load(idx)
        with self._lock:
            self._put(idx, samples)
        return samples

    def resident(self) -> int:
        with self._lock:
            return len(self._cache)


def build_dips_frozen_cache(cfg: Config, complexes_dir: str,
                            log=print) -> List[str]:
    """Build a REAL-DIPS training cache from the frozen test set's bound
    complex PDBs (`test_sets_pdb/dips_test_random_transformed/complexes/
    *_{l,r}_b_COMPLEX.pdb`, written by `testset_random_transf.py:13-106`).

    This environment does not mount the 42K-pair DIPS training corpus
    (`.MISSING_LARGE_BLOBS`), so these 100 real bound pairs are the only real
    DIPS structures available for exercising the DIPS->DB5 curriculum on
    actual (rather than synthetic) data. IMPORTANT LEAKAGE CAVEAT: they ARE
    the DIPS *test* complexes — any model pretrained on this cache must never
    be scored on DIPS test metrics; DB5 test evaluation is unaffected (the
    DB5 benchmark shares no complexes with DIPS).

    Splits deterministically by sorted index mod 10 (8 train : 1 val : 1
    test) so every DIPS family directory contributes to each split."""
    from .dataset import _process_one

    gc = cfg.graph
    cache_dir = cfg.cache_path()
    os.makedirs(cache_dir, exist_ok=True)

    import glob as _glob

    lig_files = sorted(_glob.glob(os.path.join(complexes_dir,
                                               "*_l_b_COMPLEX.pdb")))
    pairs = [(f, f.replace("_l_b_COMPLEX.pdb", "_r_b_COMPLEX.pdb"))
             for f in lig_files]
    pairs = [(l, r) for l, r in pairs if os.path.exists(r)]
    log(f"dips-frozen: {len(pairs)} bound complex pairs in {complexes_dir}")

    by_split: dict = {"train": [], "val": [], "test": []}
    for i, (l, r) in enumerate(pairs):
        split = ("val" if i % 10 == 8 else "test" if i % 10 == 9 else "train")
        by_split[split].append((l, r))

    shard_paths = []
    for split, items in by_split.items():
        out_path = os.path.join(cache_dir, f"{split}_shard0000.npz")
        shard_paths.append(out_path)
        if os.path.exists(out_path):
            log(f"  {split}: cache exists")
            continue
        tasks = [(l, r, gc.pocket_cutoff, gc.graph_cutoff,
                  gc.graph_max_neighbor) for l, r in items]
        if cfg.data.n_jobs > 1:
            with ProcessPoolExecutor(max_workers=cfg.data.n_jobs) as ex:
                results = list(ex.map(_process_one, tasks))
        else:
            results = [_process_one(t) for t in tasks]
        out: dict = {}
        kept = []
        idx = 0
        for (l, _), sample in zip(items, results):
            if sample is None:
                continue
            pfx = f"c{idx}/"
            _graph_to_npz(pfx + "lig/", sample.lig, out)
            _graph_to_npz(pfx + "rec/", sample.rec, out)
            out[pfx + "gt_lig"] = sample.gt_lig
            out[pfx + "gt_rec"] = sample.gt_rec
            out[pfx + "pocket"] = sample.pocket
            kept.append(os.path.basename(l).replace("_l_b_COMPLEX.pdb", ""))
            idx += 1
        out["codes"] = np.array(kept)
        np.savez_compressed(out_path, **out)
        log(f"  {split}: kept {idx}/{len(items)}")
    return shard_paths
