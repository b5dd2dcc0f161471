"""Frozen test-set generator (replaces
`src/test_all_methods/testset_random_transf.py:13-179`).

For each test complex, writes ground-truth `*_COMPLEX.pdb` files plus
randomly-transformed (rotation + translation ~ U(0, 20)) unbound inputs, with
residue/atom ids renumbered from 1.

    python -m equidock_public_tpu.cli.testset_gen -dataset db5 -out_dir DIR
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.featurize import uniform_rotation_translation
from ..data.pdb import read_pdb, write_pdb_renumbered


def write_table_variant(table, out_path: str, rng, unchanged: bool = False,
                        translation_interval: float = 20.0) -> None:
    """Write one AtomTable, either as-is (ground truth `*_COMPLEX.pdb`) or
    centered + randomly rotated/translated (`testset_random_transf.py:41-59`);
    residue/atom ids renumbered from 1 either way."""
    coords = table.coords
    if not unchanged:
        rot, tr = uniform_rotation_translation(rng, translation_interval)
        centered = coords - coords.mean(axis=0, keepdims=True)
        coords = (rot @ centered.T).T + tr
    write_pdb_renumbered(out_path, table, coords.astype(np.float32))


def random_transf_pdb(in_path: str, out_path: str, rng,
                      unchanged: bool = False,
                      translation_interval: float = 20.0) -> None:
    write_table_variant(read_pdb(in_path), out_path, rng, unchanged,
                        translation_interval)


def main_db5(raw_data_path: str, split_file: str, out_dir: str, rng) -> None:
    os.makedirs(out_dir, exist_ok=True)
    files = set(os.listdir(raw_data_path))
    with open(split_file) as f:
        codes = sorted({l.strip() for l in f if l.strip()})
    codes = [c for c in codes if f"{c}_l_b.pdb" in files]
    for code in codes:
        for side in ("l", "r"):
            src = os.path.join(raw_data_path, f"{code}_{side}_b.pdb")
            random_transf_pdb(src, os.path.join(
                out_dir, f"{code}_{side}_b_COMPLEX.pdb"), rng, unchanged=True)
            random_transf_pdb(src, os.path.join(
                out_dir, f"{code}_{side}_b.pdb"), rng, unchanged=False)
        print("wrote", code)


def sample_dips_round_robin(split_file: str, num_complexes: int,
                            shuffler) -> list:
    """Family-round-robin sampler (`testset_random_transf.py:66-96`): cycle
    over family directories, drawing one not-yet-selected pair per visit
    (shuffled within the family), until `num_complexes` are selected. Unlike
    the reference's inner while (which spins forever once every family is
    exhausted), exhausted families are skipped and the loop stops early when
    the split runs out of pairs."""
    by_cat = {}
    with open(split_file) as f:
        for line in f:
            name = line.strip()
            if name:
                by_cat.setdefault(name.split("/")[0], []).append(name)
    cats = list(by_cat.keys())
    total = sum(map(len, by_cat.values()))
    selected, seen, idx = [], set(), -1
    while len(selected) < num_complexes and len(seen) < total:
        idx = (idx + 1) % len(cats)
        choices = by_cat[cats[idx]]
        shuffler(choices)
        for name in choices:
            if name not in seen:
                seen.add(name)
                selected.append(name)
                break
    return selected


def main_dips(raw_data_path: str, split_file: str, out_dir: str, rng,
              num_complexes: int = 100, seed: int = 0) -> None:
    """DIPS frozen test set: 100 family-round-robin-sampled pairs, each
    written as ground-truth `*_COMPLEX.pdb` + randomly-transformed unbound
    inputs (`testset_random_transf.py:66-141`). Unlike the reference we seed
    the within-family shuffle so sets are reproducible."""
    import random as pyrandom

    from ..data.dips import read_dips_pair_tables

    os.makedirs(out_dir, exist_ok=True)
    shuffler = pyrandom.Random(seed).shuffle
    selected = sample_dips_round_robin(split_file, num_complexes, shuffler)
    for name in selected:
        lig_t, rec_t = read_dips_pair_tables(os.path.join(raw_data_path, name))
        base = name.replace("/", "_")
        for side, table in (("l", lig_t), ("r", rec_t)):
            write_table_variant(table, os.path.join(
                out_dir, f"{base}_{side}_b_COMPLEX.pdb"), rng, unchanged=True)
            write_table_variant(table, os.path.join(
                out_dir, f"{base}_{side}_b.pdb"), rng, unchanged=False)
        print("wrote", base)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-dataset", default="db5", choices=["db5", "dips"])
    p.add_argument("-raw_data_path",
                   default="/root/reference/data/benchmark5.5/structures")
    p.add_argument("-split_file",
                   default="/root/reference/data/benchmark5.5/cv/cv_0/test.txt")
    p.add_argument("-out_dir", required=True)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-num_complexes", type=int, default=100,
                   help="dips only: number of pairs to sample")
    a = p.parse_args()
    rng = np.random.default_rng(a.seed)
    if a.dataset == "db5":
        main_db5(a.raw_data_path, a.split_file, a.out_dir, rng)
    else:
        main_dips(a.raw_data_path, a.split_file, a.out_dir, rng,
                  num_complexes=a.num_complexes, seed=a.seed)


if __name__ == "__main__":
    main()
