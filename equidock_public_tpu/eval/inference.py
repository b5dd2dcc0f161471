"""Single-complex inference: PDB in -> docked ligand PDB out.

Reproduces `src/inference_rigid.py:86-250`: parse ligand + ground-truth
receptor, featurize, one forward pass, apply the predicted (R, t) to ALL
ligand atoms, optionally run the clash-removal descent (gradient steps on
Euler angles + translation against the intersection loss, sigma=8, ct=8, up to
2000 iterations with the reference's lr schedule), write the output PDB.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.featurize import (alpha_carbon_array, build_protein_graph,
                              filter_residues)
from ..data.pdb import group_residues, read_pdb, write_pdb
from ..graph import collate
from ..models.iegmn import docking_forward
from ..ops.intersection import body_intersection_loss


def euler_to_rotmat(angles: jnp.ndarray) -> jnp.ndarray:
    """RZ(yaw) @ RY(pitch) @ RX(roll), matching `get_rot_mat`
    (`inference_rigid.py:47-74`)."""
    roll, yaw, pitch = angles[0], angles[1], angles[2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    RX = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    RY = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    RZ = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return RZ @ RY @ RX


def remove_clashes_descent(
    lig_atoms: np.ndarray, rec_atoms: np.ndarray,
    sigma: float = 8.0, surface_ct: float = 8.0, max_iters: int = 2000,
) -> np.ndarray:
    """Clash-removal postprocessing (`inference_rigid.py:211-234`): manual
    gradient descent on (euler, translation) of the whole ligand against the
    intersection loss, with the reference's eta schedule."""
    lig = jnp.asarray(lig_atoms)[None]
    rec = jnp.asarray(rec_atoms)[None]
    ones_l = jnp.ones(lig.shape[:2])
    ones_r = jnp.ones(rec.shape[:2])

    def loss(params):
        angles, trans = params
        moved = (euler_to_rotmat(angles) @ lig[0].T).T + trans
        return body_intersection_loss(moved[None], ones_l, rec, ones_r,
                                      sigma, surface_ct)[0]

    grad_fn = jax.jit(jax.value_and_grad(loss))
    angles = jnp.zeros(3)
    trans = jnp.zeros(3)
    for it in range(max_iters):
        val, (g_a, g_t) = grad_fn((angles, trans))
        v = float(val)
        if v <= 0.5:
            break
        eta = 1e-3
        if v < 2.0:
            eta = 1e-4
        if it > 1500:
            eta = 1e-2
        angles = angles - eta * g_a
        trans = trans - eta * g_t
    R = np.asarray(euler_to_rotmat(angles))
    t = np.asarray(trans)
    return (R @ lig_atoms.T).T + t


@dataclasses.dataclass
class InferenceResult:
    out_path: str
    seconds: float
    num_lig_res: int
    num_rec_res: int


def dock_one(
    params, cfg: Config,
    ligand_pdb: str, receptor_pdb: str, out_path: str,
    remove_clashes: bool = False,
    forward_fn=None,
    bn_state=None,
) -> InferenceResult:
    """Dock one ligand onto one receptor and write the transformed ligand PDB."""
    t0 = time.time()
    lig_table = read_pdb(ligand_pdb)
    lig_res = filter_residues(group_residues(lig_table))
    rec_res = filter_residues(group_residues(read_pdb(receptor_pdb)))
    lig_ca = alpha_carbon_array(lig_res)
    rec_ca = alpha_carbon_array(rec_res)
    gc = cfg.graph
    lig_g = build_protein_graph(lig_res, gc.graph_cutoff, gc.graph_max_neighbor)
    rec_g = build_protein_graph(rec_res, gc.graph_cutoff, gc.graph_max_neighbor)

    # one-complex padded batch; pocket arrays are unused placeholders
    batch = collate([lig_g], [rec_g], [lig_g.x], [lig_ca],
                    [np.zeros((4, 3), np.float32)], [np.zeros((4, 3), np.float32)],
                    cfg.data.node_buckets, cfg.data.pocket_buckets)

    if forward_fn is None:
        forward_fn = jax.jit(
            lambda p, b: docking_forward(p, cfg.model, b, bn_state=bn_state),
        )
    out = forward_fn(params, batch)
    R = np.asarray(out["R"][0])
    t = np.asarray(out["t"][0])

    # sanity: R @ CA + t must equal the model's deformed output
    # (`inference_rigid.py:202-203`)
    n_l = lig_ca.shape[0]
    pred_ca = np.asarray(out["ligand_coords"][0, :n_l])
    resid = np.linalg.norm((R @ lig_g.x.T).T + t - pred_ca)
    assert resid < 1e-1, f"R/t inconsistent with deformed coords: {resid}"

    # transform ALL atoms of the input ligand (`inference_rigid.py:205`)
    all_atoms = lig_table.coords
    moved = (R @ all_atoms.T).T + t

    if remove_clashes:
        rec_all_atoms = read_pdb(receptor_pdb).coords
        moved = remove_clashes_descent(moved.astype(np.float32),
                                       rec_all_atoms.astype(np.float32))

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_pdb(out_path, lig_table, moved)
    return InferenceResult(out_path, time.time() - t0, len(lig_res), len(rec_res))


def run_inference_dir(
    params, cfg: Config,
    input_dir: str, ground_truth_dir: str, output_dir: str,
    method_name: str = "equidock_tpu", remove_clashes: bool = False,
    log=print,
    bn_state=None,
) -> list:
    """Dock every `*_l_b.pdb` in input_dir against its ground-truth receptor
    (`inference_rigid.py:127-245`)."""
    os.makedirs(output_dir, exist_ok=True)
    results = []
    forward_fn = jax.jit(
        lambda p, b: docking_forward(p, cfg.model, b, bn_state=bn_state))
    for file in sorted(os.listdir(input_dir)):
        if not file.endswith("_l_b.pdb"):
            continue
        stem = file[: -len("_l_b.pdb")]
        lig = os.path.join(input_dir, f"{stem}_l_b.pdb")
        rec = os.path.join(ground_truth_dir, f"{stem}_r_b_COMPLEX.pdb")
        out = os.path.join(output_dir,
                           f"{stem}_l_b_{method_name.upper()}.pdb")
        r = dock_one(params, cfg, lig, rec, out,
                     remove_clashes=remove_clashes, forward_fn=forward_fn)
        log(f"{stem}: {r.seconds:.2f}s ({r.num_lig_res}/{r.num_rec_res} res)")
        results.append(r)
    times = np.array([r.seconds for r in results])
    if len(times):
        log(f"Mean runtime: {times.mean():.3f}s, std: {times.std():.3f}s")
    return results
