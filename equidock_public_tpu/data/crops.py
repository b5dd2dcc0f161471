"""Interface-crop pseudo-pair corpus: DIPS-scale pretraining data from the
DB5.5 train complexes (round 4; VERDICT r3 "what's missing" item 2).

The 42K-pair DIPS corpus is environment-blocked (`.MISSING_LARGE_BLOBS`), so
the reference curriculum's pretrain stage (`src/train.py:263-285`: train on
DIPS, fine-tune on DB5) cannot be reproduced verbatim. This module builds the
closest unblocked substitute: random interface-anchored CROPS of the real
bound DB5 train structures —

  * pick a random interface residue pair (CA-CA < pocket_cutoff) as anchor,
  * take the n_l / n_r spatially nearest residues around each anchor side
    (sizes drawn jointly from the frozen DIPS test set's size distribution,
    `data/synth.py::dips_testset_sizes`),
  * re-featurize the cropped residue lists through the SAME pipeline as any
    real complex (`featurize.build_protein_graph`: all-atom mean-distance
    kNN, local frames, surface features) and re-extract the pocket.

Real residue statistics, real local geometry, one interface per pair (like
DIPS pairs); the imperfect realism is the crop boundary (cut surfaces read
as solvent-exposed). Leakage discipline: crops are generated ONLY from DB5
cv_0 TRAIN parents (val-split crops from val parents); DB5 test and the
frozen DIPS test stay untouched.

Output: DIPS-layout shards (`data/dips.py` SHARD_SIZE naming) under the
dips cache path, so `-data dips` / `-stream_dips` training runs unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from .dataset import ComplexSample, _graph_to_npz
from .dips import SHARD_SIZE
from .featurize import (alpha_carbon_array, build_protein_graph,
                        extract_pocket, filter_residues)
from .pdb import group_residues, read_pdb


@dataclasses.dataclass
class Parent:
    """One source complex, loaded and interface-indexed once."""

    code: str
    lig_res: list
    rec_res: list
    lig_ca: np.ndarray
    rec_ca: np.ndarray
    iface: np.ndarray        # (P, 2) int32 interface (lig_idx, rec_idx) pairs


def load_parent(code: str, lig_path: str, rec_path: str,
                pocket_cutoff: float = 8.0) -> Optional[Parent]:
    lig_res = filter_residues(group_residues(read_pdb(lig_path)))
    rec_res = filter_residues(group_residues(read_pdb(rec_path)))
    if len(lig_res) <= 8 or len(rec_res) <= 8:
        return None
    lig_ca = alpha_carbon_array(lig_res)
    rec_ca = alpha_carbon_array(rec_res)
    d = np.linalg.norm(lig_ca[:, None, :] - rec_ca[None, :, :], axis=-1)
    ai, aj = np.where(d < pocket_cutoff)
    if ai.size <= 3:
        return None
    return Parent(code=code, lig_res=lig_res, rec_res=rec_res,
                  lig_ca=lig_ca, rec_ca=rec_ca,
                  iface=np.stack([ai, aj], axis=1).astype(np.int32))


def _crop_side(ca: np.ndarray, anchor: int, n_keep: int) -> np.ndarray:
    """Indices (sorted, sequence order preserved) of the n_keep residues
    spatially nearest to the anchor residue's CA."""
    d = np.linalg.norm(ca - ca[anchor], axis=-1)
    return np.sort(np.argpartition(d, min(n_keep, d.size) - 1)[:n_keep])


def sample_crop(parent: Parent, rng: np.random.Generator,
                sizes: Sequence[Tuple[int, int]], max_side: int,
                min_side: int = 24, pocket_cutoff: float = 8.0,
                graph_cutoff: float = 30.0, max_neighbor: int = 10
                ) -> Optional[ComplexSample]:
    """One interface-anchored crop of `parent`, or None when the crop loses
    its pocket (<= 3 interface pairs, same drop rule as real preprocessing)."""
    ai, aj = parent.iface[rng.integers(parent.iface.shape[0])]
    n_l, n_r = sizes[rng.integers(len(sizes))]
    n_l = int(np.clip(n_l, min_side, min(max_side, len(parent.lig_res))))
    n_r = int(np.clip(n_r, min_side, min(max_side, len(parent.rec_res))))
    li = _crop_side(parent.lig_ca, int(ai), n_l)
    ri = _crop_side(parent.rec_ca, int(aj), n_r)
    lig_ca = parent.lig_ca[li]
    rec_ca = parent.rec_ca[ri]
    pocket = extract_pocket(lig_ca, rec_ca, pocket_cutoff)
    if pocket is None:
        return None
    lig_g = build_protein_graph([parent.lig_res[i] for i in li],
                                graph_cutoff, max_neighbor)
    rec_g = build_protein_graph([parent.rec_res[i] for i in ri],
                                graph_cutoff, max_neighbor)
    return ComplexSample(lig=lig_g, rec=rec_g, gt_lig=lig_ca, gt_rec=rec_ca,
                         pocket=pocket[0])


def _gen_for_parent(task):
    """(worker) all crops for one parent; returns list of (code, sample)."""
    (code, lig_path, rec_path, n_crops, seed, sizes, max_side,
     pocket_cutoff, graph_cutoff, max_neighbor) = task
    parent = load_parent(code, lig_path, rec_path, pocket_cutoff)
    if parent is None:
        return []
    rng = np.random.default_rng(seed)
    out = []
    attempts = 0
    while len(out) < n_crops and attempts < 4 * n_crops:
        attempts += 1
        s = sample_crop(parent, rng, sizes, max_side,
                        pocket_cutoff=pocket_cutoff,
                        graph_cutoff=graph_cutoff, max_neighbor=max_neighbor)
        if s is not None:
            out.append((f"{code}_crop{len(out)}", s))
    return out


def generate_crop_shards(cfg: Config, split: str, codes: List[str],
                         raw_db5_path: str, n_pairs: int, seed: int,
                         sizes: Sequence[Tuple[int, int]],
                         max_side: int = 256, n_jobs: int = 4,
                         log=print) -> List[str]:
    """Generate `n_pairs` crops across `codes` parents and write DIPS-layout
    shards into cfg.cache_path() (cfg must be a dips-data config)."""
    assert cfg.data.data == "dips", "crop corpus is written as a dips cache"
    cache_dir = cfg.cache_path()
    os.makedirs(cache_dir, exist_ok=True)
    from .dips import shard_files

    existing = shard_files(cache_dir, split)
    if existing:
        log(f"crop cache exists: {len(existing)} shards in {cache_dir}")
        return existing

    per_parent = -(-n_pairs // max(len(codes), 1))
    gc = cfg.graph
    tasks = [
        (c, os.path.join(raw_db5_path, f"{c}_l_b.pdb"),
         os.path.join(raw_db5_path, f"{c}_r_b.pdb"),
         per_parent, seed + 7919 * i, list(sizes), max_side,
         gc.pocket_cutoff, gc.graph_cutoff, gc.graph_max_neighbor)
        for i, c in enumerate(codes)
    ]
    results = []
    if n_jobs > 1:
        with ProcessPoolExecutor(max_workers=n_jobs) as ex:
            for i, r in enumerate(ex.map(_gen_for_parent, tasks)):
                results.extend(r)
                if (i + 1) % 20 == 0:
                    log(f"  parents {i + 1}/{len(tasks)}: "
                        f"{len(results)} crops so far")
    else:
        for t in tasks:
            results.extend(_gen_for_parent(t))
    rng = np.random.default_rng(seed)
    rng.shuffle(results)
    results = results[:n_pairs]
    log(f"crop corpus: {len(results)} pairs from {len(codes)} parents")

    shard_paths = []
    for shard_idx, start in enumerate(range(0, len(results), SHARD_SIZE)):
        out_path = os.path.join(cache_dir, f"{split}_shard{shard_idx:04d}.npz")
        chunk = results[start: start + SHARD_SIZE]
        out: dict = {}
        kept = []
        for idx, (name, sample) in enumerate(chunk):
            p = f"c{idx}/"
            _graph_to_npz(p + "lig/", sample.lig, out)
            _graph_to_npz(p + "rec/", sample.rec, out)
            out[p + "gt_lig"] = sample.gt_lig
            out[p + "gt_rec"] = sample.gt_rec
            out[p + "pocket"] = sample.pocket
            kept.append(name)
        out["codes"] = np.array(kept)
        np.savez_compressed(out_path, **out)
        shard_paths.append(out_path)
        log(f"  wrote shard {shard_idx}: {len(kept)} pairs")
    return shard_paths
