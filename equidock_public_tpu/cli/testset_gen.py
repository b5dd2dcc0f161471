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


def random_transf_pdb(in_path: str, out_path: str, rng,
                      unchanged: bool = False,
                      translation_interval: float = 20.0) -> None:
    table = read_pdb(in_path)
    coords = table.coords
    if not unchanged:
        rot, tr = uniform_rotation_translation(rng, translation_interval)
        centered = coords - coords.mean(axis=0, keepdims=True)
        coords = (rot @ centered.T).T + tr
    write_pdb_renumbered(out_path, table, coords.astype(np.float32))


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


def main_dips(raw_data_path: str, split_file: str, out_dir: str, rng,
              num_complexes: int = 100) -> None:
    """Round-robin over family directories (`testset_random_transf.py:75-97`)."""
    import random as pyrandom

    from ..data.dips import read_dips_pair

    os.makedirs(out_dir, exist_ok=True)
    by_cat = {}
    with open(split_file) as f:
        for line in f:
            name = line.strip()
            if not name:
                continue
            by_cat.setdefault(name.split("/")[0], []).append(name)
    cats = list(by_cat.keys())
    selected, idx = [], -1
    seen = set()
    while len(selected) < num_complexes and len(seen) < sum(map(len, by_cat.values())):
        idx = (idx + 1) % len(cats)
        choices = by_cat[cats[idx]]
        pyrandom.shuffle(choices)
        for name in choices:
            if name not in seen:
                seen.add(name)
                selected.append(name)
                break
    for name in selected:
        # DIPS pairs come from pickles; write via a temporary PDB round trip
        lig_res, rec_res = read_dips_pair(os.path.join(raw_data_path, name))
        raise NotImplementedError(
            "DIPS raw dill files are not mounted in this environment; "
            "the reference's frozen DIPS test set is committed at "
            "test_sets_pdb/dips_test_random_transformed/")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-dataset", default="db5", choices=["db5", "dips"])
    p.add_argument("-raw_data_path",
                   default="/root/reference/data/benchmark5.5/structures")
    p.add_argument("-split_file",
                   default="/root/reference/data/benchmark5.5/cv/cv_0/test.txt")
    p.add_argument("-out_dir", required=True)
    p.add_argument("-seed", type=int, default=0)
    a = p.parse_args()
    rng = np.random.default_rng(a.seed)
    if a.dataset == "db5":
        main_db5(a.raw_data_path, a.split_file, a.out_dir, rng)
    else:
        main_dips(a.raw_data_path, a.split_file, a.out_dir, rng)


if __name__ == "__main__":
    main()
