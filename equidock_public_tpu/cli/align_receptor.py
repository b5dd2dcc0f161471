"""Baseline-output aligner (replaces `src/align_receptor.py:1-27`):
Kabsch-align a method's predicted receptor onto the ground-truth receptor and
apply the same transform to the predicted ligand (used for HDOCK/ATTRACT
outputs whose receptor frame differs from the ground truth).

    python -m equidock_public_tpu.cli.align_receptor \
        -ligand L.pdb -receptor R.pdb -receptor_gt R_COMPLEX.pdb -out OUT.pdb
"""

import argparse

import numpy as np

from ..data.featurize import rigid_transform_kabsch
from ..data.pdb import read_pdb, write_pdb


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-ligand", required=True)
    p.add_argument("-receptor", required=True)
    p.add_argument("-receptor_gt", required=True)
    p.add_argument("-out", required=True)
    a = p.parse_args()

    lig_table = read_pdb(a.ligand)
    rec = read_pdb(a.receptor).coords
    rec_gt = read_pdb(a.receptor_gt).coords
    R, b = rigid_transform_kabsch(rec.T, rec_gt.T)
    err = np.linalg.norm(((R @ rec.T) + b).T - rec_gt)
    assert err < 1e-1, f"receptor alignment residual {err}"
    moved = ((R @ lig_table.coords.T) + b).T
    write_pdb(a.out, lig_table, moved.astype(np.float32))
    print(f"wrote {a.out} (receptor alignment residual {err:.2e})")


if __name__ == "__main__":
    main()
