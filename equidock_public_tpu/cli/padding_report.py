"""Padding-waste report for the bucketed batching policy (SURVEY §7.3).

Measures, on REAL complex-size distributions, how many padded node/edge slots
the configured `node_buckets` waste versus how many distinct XLA shapes they
cost, and scores candidate policies side by side:

    python -m equidock_public_tpu.cli.padding_report \
        [-dips_dir /root/reference/test_sets_pdb/dips_test_random_transformed]

Size sources: the cached DB5 train split (when the cache exists) and the 100
frozen DIPS test complexes (parsed with our PDB reader — the closest
available sample of the 42K-pair DIPS training distribution; the raw corpus
is not mounted, RESULTS.md).
"""

import argparse
import glob
import json
import os

from ..utils.padding import (compare_policies, waste_report,
                             waste_report_packed)
from ._common import add_config_args, config_from_args

CANDIDATES = {
    "configured": None,  # filled from cfg.data.node_buckets
    "coarse_pow2": (128, 256, 512, 1024, 2048),
    "fine": (64, 96, 128, 160, 192, 224, 256, 320, 384, 448, 512, 640,
             768, 1024, 1536),
    "single_max": (1536,),
}


def db5_sizes(cfg):
    """(n_lig, n_rec) for every cached DB5 train complex."""
    import numpy as np

    path = os.path.join(cfg.cache_path(), "train.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=True)
    sizes = []
    i = 0
    while f"c{i}/lig/x" in z:
        sizes.append((z[f"c{i}/lig/x"].shape[0], z[f"c{i}/rec/x"].shape[0]))
        i += 1
    return sizes


def dips_sizes(dips_dir: str):
    """(n_lig, n_rec) filtered-residue counts of the frozen DIPS test set."""
    from ..data.featurize import filter_residues
    from ..data.pdb import group_residues, read_pdb

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


def main():
    p = argparse.ArgumentParser()
    add_config_args(p)
    p.add_argument("-dips_dir",
                   default="/root/reference/test_sets_pdb/"
                           "dips_test_random_transformed")
    a = p.parse_args()
    cfg = config_from_args(a)

    policies = dict(CANDIDATES)
    policies["configured"] = cfg.data.node_buckets

    report = {"bs": cfg.train.bs}
    db5 = db5_sizes(cfg)
    def packed_rows(sizes):
        return {f"packed_c{c}": waste_report_packed(
                    sizes, cfg.data.node_buckets, cfg.train.bs, c,
                    cfg.data.slot_count_buckets)
                for c in (2, 4, 6)}

    if db5:
        report["db5_train"] = {
            "n_complexes": len(db5),
            "policies": compare_policies(db5, cfg.train.bs, policies),
            **packed_rows(db5)}
    if os.path.isdir(a.dips_dir):
        dips = dips_sizes(a.dips_dir)
        report["dips_test"] = {
            "n_complexes": len(dips),
            "policies": compare_policies(dips, cfg.train.bs, policies),
            **packed_rows(dips)}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
