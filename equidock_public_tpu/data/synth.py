"""Synthetic cache generation: DIPS-distribution complexes without the corpus.

The 42K-pair DIPS training corpus is not mounted in this environment
(RESULTS.md); what IS available is the real SIZE distribution — the 100
frozen DIPS test complexes (`test_sets_pdb/dips_test_random_transformed`).
For throughput/bucketing work only the shapes matter, so this module writes
caches in the exact flat-npz layout of `data.dataset` with sizes drawn from a
real distribution and random (but geometrically sane) features. Used by the
`bench.py` dips_epoch mode and the curriculum tests.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def synth_graph(rng: np.random.Generator, n: int, k: int = 10) -> dict:
    """One protein in the npz-cache key layout (random features; coordinates
    drawn at protein-like density so distances/RBFs are in-range).

    The neighbor table is a real kNN graph of the synthetic coordinates —
    NOT uniformly random indices — because spatial locality is what real
    residue graphs have (`protein_utils.py:311-363`) and what halo-exchange
    partitioning and gather-locality measurements depend on; random tables
    would be an adversarial, unrepresentative graph topology."""
    x = (rng.standard_normal((n, 3)) * (2.0 * n ** (1 / 3))).astype(np.float32)
    kk = min(k, n)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :kk].astype(np.int32)
    return {
        "res_id": rng.integers(0, 21, (n,)).astype(np.int32),
        "x": x,
        "mu_r_norm": (np.abs(rng.standard_normal((n, 5))) + 0.5
                      ).astype(np.float32),
        "nbr": nbr,
        "nbr_mask": np.ones((n, kk), np.float32),
        "edge_feat": rng.standard_normal((n, kk, 27)).astype(np.float32),
    }


def write_synth_split(path: str, sizes: Sequence[Tuple[int, int]],
                      seed: int = 0, k: int = 10) -> str:
    """Write a synthetic split cache (one complex per (n_lig, n_rec))."""
    rng = np.random.default_rng(seed)
    out: dict = {}
    for i, (n_l, n_r) in enumerate(sizes):
        p = f"c{i}/"
        for prefix, g in (("lig/", synth_graph(rng, n_l, k)),
                          ("rec/", synth_graph(rng, n_r, k))):
            for key, val in g.items():
                out[p + prefix + key] = val
        out[p + "gt_lig"] = out[p + "lig/x"]
        out[p + "gt_rec"] = out[p + "rec/x"]
        n_p = max(4, min(n_l, n_r) // 8)
        out[p + "pocket"] = (rng.standard_normal((n_p, 3)) * 4
                             ).astype(np.float32)
    out["codes"] = np.array([f"synth{i}" for i in range(len(sizes))])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    return path


def dips_testset_sizes(dips_dir: str) -> List[Tuple[int, int]]:
    """Real (n_lig, n_rec) filtered-residue counts of the frozen DIPS test
    set — the closest available sample of the DIPS length distribution."""
    import glob

    from .featurize import filter_residues
    from .pdb import group_residues, read_pdb

    sizes = []
    for lig in sorted(glob.glob(os.path.join(dips_dir, "random_transformed",
                                             "*_l_b.pdb"))):
        rec = lig.replace("_l_b.pdb", "_r_b.pdb")
        if not os.path.exists(rec):
            continue
        n = [len(filter_residues(group_residues(read_pdb(f))))
             for f in (lig, rec)]
        sizes.append((n[0], n[1]))
    return sizes
