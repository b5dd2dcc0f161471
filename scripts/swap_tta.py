"""Role-swap TTA is a provable no-op: EquiDock is exactly role-symmetric.

Hypothesis tested: one checkpoint defines two docking functions per complex
— dock ligand onto receptor, or dock receptor onto ligand and invert the
rigid — and averaging them (chordal rotation mean) could be a single-
checkpoint ensemble (unlike the round-2 multi-model combiners, and unlike
input-pose TTA which SE(3) invariance kills, scripts/pose_scorer_n250.py).

Measured result: it is an exact invariance, not an ensemble. For every
complex tried, swap-then-invert reproduces the normal rigid to float32
precision (max |R1 - R2^T| ~ 1e-6, |t1 + R2^T t2| ~ 1e-5). Why: the IEGMN
trunk updates both sides with the same weights and symmetric cross-
attention, and the keypoint head computes keypoints for BOTH sides and
Kabsch-fits lig-keypoints -> rec-keypoints (`rigid_docking_model.py:
500-606` semantics); swapping roles produces the same keypoint pair with
the fit direction reversed — the exact inverse transform. So the two
"functions" are one function, and no same-checkpoint TTA exists over role
assignment. Together with the SE(3)-pose null this exhausts the single-
checkpoint ensemble space.

Usage: JAX_PLATFORMS=cpu python scripts/swap_tta.py [checkpoint]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402

from equidock_public_tpu.data.featurize import (alpha_carbon_array,  # noqa: E402
                                                build_protein_graph,
                                                filter_residues)
from equidock_public_tpu.data.pdb import group_residues, read_pdb  # noqa: E402
from equidock_public_tpu.graph import collate  # noqa: E402
from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model  # noqa: E402
from equidock_public_tpu.train.checkpoint import load_checkpoint  # noqa: E402
from equidock_public_tpu.train.step import create_train_state  # noqa: E402

REF = "/root/reference/test_sets_pdb/db5_test_random_transformed"


def load_params(ckpt):
    _, cfg, _ = load_checkpoint(ckpt)
    tmpl = create_train_state(
        init_docking_model(jax.random.PRNGKey(0), cfg.model), cfg)
    payload, _, _ = load_checkpoint(ckpt, tmpl)
    return payload["params"], cfg


def rigid_of(params, cfg, lig_pdb, rec_pdb, fwd_cache={}):
    lig_res = filter_residues(group_residues(read_pdb(lig_pdb)))
    rec_res = filter_residues(group_residues(read_pdb(rec_pdb)))
    gc = cfg.graph
    lig_g = build_protein_graph(lig_res, gc.graph_cutoff,
                                gc.graph_max_neighbor)
    rec_g = build_protein_graph(rec_res, gc.graph_cutoff,
                                gc.graph_max_neighbor)
    batch = collate([lig_g], [rec_g], [lig_g.x],
                    [alpha_carbon_array(lig_res)],
                    [np.zeros((4, 3), np.float32)],
                    [np.zeros((4, 3), np.float32)],
                    cfg.data.node_buckets, cfg.data.pocket_buckets)
    key = id(params)
    if key not in fwd_cache:
        fwd_cache[key] = jax.jit(
            lambda p, b: docking_forward(p, cfg.model, b))
    out = fwd_cache[key](params, batch)
    return np.asarray(out["R"][0]), np.asarray(out["t"][0])


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "artifacts/db5_model_small_s2"
    params, cfg = load_params(ckpt)
    in_dir, gt_dir = f"{REF}/random_transformed", f"{REF}/complexes"
    stems = sorted(f[:-8] for f in os.listdir(in_dir)
                   if f.endswith("_l_b.pdb"))
    worst_r = worst_t = 0.0
    for stem in stems:
        lp = f"{in_dir}/{stem}_l_b.pdb"
        rp = f"{gt_dir}/{stem}_r_b_COMPLEX.pdb"
        R1, t1 = rigid_of(params, cfg, lp, rp)
        R2, t2 = rigid_of(params, cfg, rp, lp)
        dr = float(np.abs(R1 - R2.T).max())
        dt = float(np.abs(t1.reshape(3) + R2.T @ t2.reshape(3)).max())
        worst_r, worst_t = max(worst_r, dr), max(worst_t, dt)
    print(f"{ckpt}: over {len(stems)} complexes, max |R_normal - R_swap^T| "
          f"= {worst_r:.2e}, max |t_normal + R_swap^T t_swap| = {worst_t:.2e}"
          f" -> role-swap TTA is an exact no-op")


if __name__ == "__main__":
    main()
