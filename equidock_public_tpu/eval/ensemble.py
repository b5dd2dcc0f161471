"""Rigid-ensemble inference (round 4): average the rigid motions predicted by
several independently trained checkpoints.

EquiDock's output for a complex is exactly one rigid (R, t) applied to the
unbound ligand (`inference_rigid.py:202-205`), which makes checkpoint
ensembling well-posed in pose space rather than coordinate space:

  * rotation: the chordal mean — the SO(3) projection of sum_i R_i
    (argmin_R sum_i ||R - R_i||_F^2, computed by SVD with det correction);
  * translation: centroid-consistent — choose t* so the ensemble places the
    ligand centroid at the MEAN of the members' placements:
    t* = mean_i(R_i c + t_i) - R* c, with c the unbound-ligand CA centroid.

Independently trained members make partly independent pose errors, so this
is a training-free variance reducer — a new-angle attack on the dual-parity
bar (VERDICT r3 item 1). No reference counterpart (the reference releases a
single checkpoint per dataset).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from ..data.featurize import (alpha_carbon_array, build_protein_graph,
                              filter_residues)
from ..data.pdb import group_residues, read_pdb, write_pdb
from ..graph import collate
from ..models.iegmn import docking_forward


def chordal_mean_rotation(Rs: Sequence[np.ndarray],
                          weights: Sequence[float] = None) -> np.ndarray:
    """SO(3) projection of sum_i w_i R_i (the chordal/Frobenius mean)."""
    Rs = np.asarray(Rs, dtype=np.float64)
    if weights is not None:
        Rs = Rs * np.asarray(weights, np.float64)[:, None, None]
    M = np.sum(Rs, axis=0)
    U, _, Vt = np.linalg.svd(M)
    d = np.sign(np.linalg.det(U @ Vt))
    return (U @ np.diag([1.0, 1.0, d]) @ Vt).astype(np.float32)


def ensemble_rigid(Rs: Sequence[np.ndarray], ts: Sequence[np.ndarray],
                   center: np.ndarray, weights: Sequence[float] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Centroid-consistent rigid mean: R* = (weighted) chordal mean; t* keeps
    the weighted-mean centroid placement, t* = sum_i w_i (R_i c + t_i) - R* c."""
    R = chordal_mean_rotation(Rs, weights)
    w = (np.full(len(Rs), 1.0 / len(Rs)) if weights is None
         else np.asarray(weights, np.float64) / np.sum(weights))
    moved_c = np.sum([wi * (Ri @ center + ti)
                      for wi, Ri, ti in zip(w, Rs, ts)], axis=0)
    return R, (moved_c - R @ center).astype(np.float32)


class Member:
    """One loaded checkpoint: params + adopted config + jitted forward."""

    def __init__(self, ckpt_dir: str, base_cfg: Config):
        from ..train.checkpoint import load_checkpoint

        payload, cfg_ckpt, _ = load_checkpoint(ckpt_dir)
        self.params = payload["params"]
        self.bn_state = payload.get("bn_state")
        self.cfg = dataclasses.replace(base_cfg, model=cfg_ckpt.model)
        # Featurization params shape the member's INPUT graphs, which callers
        # build from base_cfg.graph before calling predict_rigid — a member
        # trained with different featurization would silently see mismatched
        # features (ADVICE r4). All committed artifacts share the defaults;
        # fail loudly if one ever doesn't.
        for f in ("graph_cutoff", "graph_max_neighbor", "pocket_cutoff"):
            got = getattr(cfg_ckpt.graph, f)
            want = getattr(base_cfg.graph, f)
            if got != want:
                raise ValueError(
                    f"ensemble member {ckpt_dir} was trained with "
                    f"graph.{f}={got} but the ensemble featurizes with "
                    f"{want}; rebuild inputs with the member's settings")
        self.name = ckpt_dir
        self.forward = jax.jit(lambda p, b: docking_forward(
            p, self.cfg.model, b, bn_state=self.bn_state))

    def predict_rigid(self, lig_g, rec_g, lig_ca) -> Tuple[np.ndarray, np.ndarray]:
        batch = collate([lig_g], [rec_g], [lig_g.x], [lig_ca],
                        [np.zeros((4, 3), np.float32)],
                        [np.zeros((4, 3), np.float32)],
                        self.cfg.data.node_buckets,
                        self.cfg.data.pocket_buckets)
        out = self.forward(self.params, batch)
        return np.asarray(out["R"][0]), np.asarray(out["t"][0])


def run_ensemble_dir(members: List[Member], input_dir: str,
                     ground_truth_dir: str, output_dir: str,
                     method_name: str = "equidock_tpu_ens",
                     weights: Sequence[float] = None,
                     log=print) -> None:
    """Dock every `*_l_b.pdb` with the rigid-ensemble of `members`."""
    os.makedirs(output_dir, exist_ok=True)
    times = []
    for file in sorted(os.listdir(input_dir)):
        if not file.endswith("_l_b.pdb"):
            continue
        t0 = time.time()
        stem = file[: -len("_l_b.pdb")]
        lig_path = os.path.join(input_dir, file)
        rec_path = os.path.join(ground_truth_dir, f"{stem}_r_b_COMPLEX.pdb")
        lig_table = read_pdb(lig_path)
        lig_res = filter_residues(group_residues(lig_table))
        rec_res = filter_residues(group_residues(read_pdb(rec_path)))
        lig_ca = alpha_carbon_array(lig_res)
        gc = members[0].cfg.graph
        lig_g = build_protein_graph(lig_res, gc.graph_cutoff,
                                    gc.graph_max_neighbor)
        rec_g = build_protein_graph(rec_res, gc.graph_cutoff,
                                    gc.graph_max_neighbor)
        rigids = [m.predict_rigid(lig_g, rec_g, lig_ca) for m in members]
        R, t = ensemble_rigid([r for r, _ in rigids], [t for _, t in rigids],
                              lig_g.x.mean(axis=0), weights)
        moved = (R @ lig_table.coords.T).T + t
        out_path = os.path.join(output_dir,
                                f"{stem}_l_b_{method_name.upper()}.pdb")
        write_pdb(out_path, lig_table, moved)
        times.append(time.time() - t0)
        log(f"{stem}: {times[-1]:.2f}s ({len(members)} members)")
    if times:
        log(f"Mean runtime: {np.mean(times):.3f}s over {len(times)} complexes")
