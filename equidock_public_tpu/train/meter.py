"""RMSD metering (host-side numpy), matching `src/utils/eval.py:12-77`.

- ligand/receptor RMSD: unaligned RMSD of CA coords.
- complex RMSD: RMSD after Kabsch-aligning the full predicted complex
  (ligand ++ receptor) onto the ground truth.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..data.featurize import rigid_transform_kabsch


def complex_rmsd(lig_pred: np.ndarray, rec_pred: np.ndarray,
                 lig_true: np.ndarray, rec_true: np.ndarray) -> Tuple[float, float, float]:
    """Returns (ligand_rmsd, receptor_rmsd, complex_rmsd)."""
    lig_rmsd = float(np.sqrt(np.mean(np.sum((lig_pred - lig_true) ** 2, axis=1))))
    rec_rmsd = float(np.sqrt(np.mean(np.sum((rec_pred - rec_true) ** 2, axis=1))))
    pred = np.concatenate([lig_pred, rec_pred], axis=0)
    true = np.concatenate([lig_true, rec_true], axis=0)
    R, b = rigid_transform_kabsch(pred.T, true.T)
    aligned = ((R @ pred.T) + b).T
    crmsd = float(np.sqrt(np.mean(np.sum((aligned - true) ** 2, axis=1))))
    return lig_rmsd, rec_rmsd, crmsd


class RmsdMeter:
    """Accumulates per-complex RMSDs; mean/median summaries
    (Meter_Unbound_Bound)."""

    def __init__(self):
        self.ligand, self.receptor, self.complex = [], [], []
        # interface RMSD (eval_pdb_outputset.py:80-94 semantics), filled only
        # by update_batch(meter_interface=True); empty otherwise
        self.interface = []

    def update(self, lig_pred, rec_pred, lig_true, rec_true) -> float:
        l, r, c = complex_rmsd(np.asarray(lig_pred), np.asarray(rec_pred),
                               np.asarray(lig_true), np.asarray(rec_true))
        self.ligand.append(l)
        self.receptor.append(r)
        self.complex.append(c)
        return c

    def update_batch(self, batch, lig_pred_padded: np.ndarray,
                     meter_interface: bool = False) -> None:
        """Meter every valid complex of a padded PairBatch.

        With `meter_interface`, also records interface RMSD — same restricted
        to ground-truth CA pairs at distance < 8 A (the offline evaluator's
        IRMSD, `eval_pdb_outputset.py:80-94`) — enabling val-time model
        selection on the interface metric."""
        lig_mask = np.asarray(batch.lig.node_mask)
        rec_mask = np.asarray(batch.rec.node_mask)
        gt_lig = np.asarray(batch.gt_lig)
        rec_x = np.asarray(batch.rec.x)

        def meter_one(lp, rp, lt, rt):
            self.update(lp, rp, lt, rt)
            if meter_interface:
                d = np.linalg.norm(lt[:, None, :] - rt[None, :, :], axis=-1)
                ai, aj = np.where(d < 8.0)
                if ai.size:
                    _, _, irmsd = complex_rmsd(lp[ai], rp[aj], lt[ai], rt[aj])
                    self.interface.append(irmsd)

        if batch.n_segs > 1:
            # packed slots: extract each complex's own nodes via its seg id
            seg_l = np.asarray(batch.lig.seg_id)
            seg_r = np.asarray(batch.rec.seg_id)
            seg_mask = np.asarray(batch.seg_mask)
            for b in range(lig_mask.shape[0]):
                for c in range(batch.n_segs):
                    if seg_mask[b, c] == 0:
                        continue
                    il = np.where((lig_mask[b] > 0) & (seg_l[b] == c))[0]
                    ir = np.where((rec_mask[b] > 0) & (seg_r[b] == c))[0]
                    meter_one(lig_pred_padded[b, il], rec_x[b, ir],
                              gt_lig[b, il], rec_x[b, ir])
            return

        pair_mask = np.asarray(batch.pair_mask)
        for b in range(lig_mask.shape[0]):
            if pair_mask[b] == 0:
                continue
            nl = int(lig_mask[b].sum())
            nr = int(rec_mask[b].sum())
            meter_one(lig_pred_padded[b, :nl], rec_x[b, :nr],
                      gt_lig[b, :nl], rec_x[b, :nr])

    def summarize_interface(self, reduction: str = "median") -> float:
        red = np.median if reduction == "median" else np.mean
        if not self.interface:
            return float("nan")
        return float(red(self.interface))

    def summarize(self, reduction: str = "median"):
        red = np.median if reduction == "median" else np.mean
        if not self.complex:
            return float("nan"), float("nan"), float("nan")
        return (float(red(self.ligand)), float(red(self.receptor)),
                float(red(self.complex)))

    def summarize_with_std(self, reduction: str = "median"):
        red = np.median if reduction == "median" else np.mean
        arr = np.array(self.complex)
        return float(red(arr)), float(np.std(arr))
