"""Offline evaluator: CRMSD / IRMSD over a directory of predicted ligand PDBs.

Reproduces `src/test_all_methods/eval_pdb_outputset.py:14-114` exactly:
  - CA atoms only;
  - CRMSD = RMSD after Kabsch-aligning the predicted [ligand ++ receptor]
    complex onto ground truth;
  - IRMSD = same restricted to interface residues (ground-truth CA pairs at
    distance < 8 A);
  - for single-ligand methods (equidock and ours) the receptor prediction is
    the ground-truth receptor; attract/hdock conventions supported.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.pdb import ca_coords, read_pdb
from ..train.meter import RmsdMeter


def evaluate_output_dir(
    input_dir: str,
    ground_truth_dir: str,
    method: str = "equidock",
) -> Dict[str, float]:
    meter = RmsdMeter()
    imeter = RmsdMeter()
    suffix_method = method.upper()
    num_files = 0

    for file in sorted(os.listdir(input_dir)):
        if method == "attract":
            tail = "_l_b_ATTRACT.pdb"
        elif method == "hdock":
            tail = "_l_b_HDOCK.pdb"
        else:
            tail = f"_l_b_{suffix_method}.pdb"
        if not file.endswith(tail):
            continue
        stem = file[: -len(tail)]
        lig_model_file = os.path.join(input_dir, f"{stem}_l_b_{suffix_method}.pdb")
        lig_gt_file = os.path.join(ground_truth_dir, f"{stem}_l_b_COMPLEX.pdb")
        rec_gt_file = os.path.join(ground_truth_dir, f"{stem}_r_b_COMPLEX.pdb")
        if method in ("attract", "hdock"):
            rec_model_file = os.path.join(input_dir, f"{stem}_r_b_{suffix_method}.pdb")
        else:
            rec_model_file = rec_gt_file
        num_files += 1

        lig_model = ca_coords(read_pdb(lig_model_file))
        rec_model = ca_coords(read_pdb(rec_model_file))
        lig_gt = ca_coords(read_pdb(lig_gt_file))
        rec_gt = ca_coords(read_pdb(rec_gt_file))
        assert lig_model.shape == lig_gt.shape, (stem, lig_model.shape, lig_gt.shape)
        assert rec_model.shape == rec_gt.shape

        d = np.linalg.norm(lig_gt[:, None, :] - rec_gt[None, :, :], axis=-1)
        ai, aj = np.where(d < 8.0)

        meter.update(lig_model, rec_model, lig_gt, rec_gt)
        imeter.update(lig_model[ai], rec_model[aj], lig_gt[ai], rec_gt[aj])

    if num_files == 0:
        raise FileNotFoundError(
            f"no '*_l_b_{suffix_method}.pdb' files found in {input_dir} — "
            f"check the -method name (it must match the output suffix)")
    crmsd_median, _ = meter.summarize_with_std("median")
    crmsd_mean, crmsd_std = meter.summarize_with_std("mean")
    irmsd_median, _ = imeter.summarize_with_std("median")
    irmsd_mean, irmsd_std = imeter.summarize_with_std("mean")
    return {
        "num_files": num_files,
        "crmsd_median": crmsd_median, "crmsd_mean": crmsd_mean,
        "crmsd_std": crmsd_std,
        "irmsd_median": irmsd_median, "irmsd_mean": irmsd_mean,
        "irmsd_std": irmsd_std,
    }
