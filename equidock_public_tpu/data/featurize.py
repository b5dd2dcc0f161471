"""Host-side featurization: residue filtering, pocket extraction, local frames,
kNN graph construction, RBF + orientation edge features, surface features.

Reproduces the semantics of `/root/reference/src/utils/protein_utils.py`
(`preprocess_unbound_bound` :107-175, `protein_to_graph_unbound_bound` :180-416)
but vectorized with numpy and emitting **fixed-degree neighbor tables** —
`nbr (N, K)`, `nbr_mask (N, K)`, `edge_feat (N, K, 27)` — the TPU-native graph
representation (in-degree is capped at `max_neighbor` by construction, so the
graph is a dense masked table; no sparse scatter needed on device).

Edge direction convention (matches DGL `u_sub_v` semantics at
`rigid_docking_model.py:204`): an edge k of node i has source j = nbr[i, k] and
destination i; `x_rel = x_src - x_dst = x_j - x_i`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .pdb import GroupedResidue
from .residues import residue_type_index

RBF_LENGTH_SCALES = np.array([1.5 ** x for x in range(15)], dtype=np.float64)
MU_R_SIGMAS = np.array([1.0, 2.0, 5.0, 10.0, 30.0], dtype=np.float64)


@dataclasses.dataclass(eq=False)  # identity hash: PadCache keys on the object
class ProteinGraph:
    """Single-protein residue graph with fixed-degree neighbor tables."""

    res_id: np.ndarray        # (N,) int32 residue-type index in [0, 21)
    x: np.ndarray             # (N, 3) float32 representative (CA) coordinates
    mu_r_norm: np.ndarray     # (N, 5) float32 surface-awareness features
    nbr: np.ndarray           # (N, K) int32 source-node index per in-edge
    nbr_mask: np.ndarray      # (N, K) bool edge-validity mask
    edge_feat: np.ndarray     # (N, K, 27) float32: 15 RBF + 12 orientation
    # Flat COO view (kept for tests / export; dst-major order like the reference)
    src: np.ndarray           # (E,) int32
    dst: np.ndarray           # (E,) int32

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.src.shape[0]


def filter_residues(residues: Sequence[GroupedResidue]) -> List[GroupedResidue]:
    """Keep residues having exactly one N, one CA and one C atom
    (`protein_utils.py:109-119`)."""
    out = []
    for res in residues:
        names = res[1]["atom_name"]
        if (np.sum(names == "N") == 1 and np.sum(names == "CA") == 1
                and np.sum(names == "C") == 1):
            out.append(res)
    return out


def alpha_carbon_array(residues: Sequence[GroupedResidue]) -> np.ndarray:
    """(N, 3) CA locations; appends a zero row when N <= 1
    (`protein_utils.py:135-146`)."""
    locs = []
    for res in residues:
        names = res[1]["atom_name"]
        coords = res[1]["coords"]
        locs.append(coords[names == "CA"][0].astype(np.float32))
    if len(locs) <= 1:
        locs.append(np.zeros(3, dtype=np.float32))
    return np.stack(locs, axis=0)


def extract_pocket(
    lig_ca: np.ndarray, rec_ca: np.ndarray, pos_cutoff: float = 8.0
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Pocket pairs: (ligand CA, receptor CA) within `pos_cutoff`; the stored
    pocket cloud is the pair midpoints (`protein_utils.py:156-168`). Returns
    (pocket_midpoints, active_ligand_idx, active_receptor_idx) or None when
    there are <= 3 pairs (complex dropped)."""
    d = np.linalg.norm(lig_ca[:, None, :] - rec_ca[None, :, :], axis=-1)
    ai, aj = np.where(d < pos_cutoff)
    if ai.size <= 3:
        return None
    midpoints = 0.5 * (lig_ca[ai] + rec_ca[aj])
    return midpoints.astype(np.float32), ai, aj


def local_frames(residues: Sequence[GroupedResidue]) -> Tuple[np.ndarray, ...]:
    """Per-residue orthonormal frame (n_i, u_i, v_i) from N/CA/C atoms
    (`protein_utils.py:232-240`). Returns (ca, n, u, v), each (N, 3) float32,
    plus the per-residue all-atom coordinate list."""
    N = len(residues)
    ca = np.zeros((N, 3), dtype=np.float64)
    nn = np.zeros((N, 3), dtype=np.float64)
    uu = np.zeros((N, 3), dtype=np.float64)
    vv = np.zeros((N, 3), dtype=np.float64)
    atoms: List[np.ndarray] = []
    for i, res in enumerate(residues):
        names = res[1]["atom_name"]
        coords = res[1]["coords"].astype(np.float64)
        atoms.append(coords.astype(np.float32))
        n_loc = coords[names == "N"][0]
        ca_loc = coords[names == "CA"][0]
        c_loc = coords[names == "C"][0]
        u = (n_loc - ca_loc) / np.linalg.norm(n_loc - ca_loc)
        t = (c_loc - ca_loc) / np.linalg.norm(c_loc - ca_loc)
        n_vec = np.cross(u, t)
        n_vec = n_vec / np.linalg.norm(n_vec)
        v = np.cross(n_vec, u)
        ca[i], nn[i], uu[i], vv[i] = ca_loc, n_vec, u, v
    return (ca.astype(np.float32), nn.astype(np.float32),
            uu.astype(np.float32), vv.astype(np.float32), atoms)


def residue_mean_distance_matrix(atoms: List[np.ndarray], block: int = 2048) -> np.ndarray:
    """(N, N) matrix of mean all-atom pairwise distance between residues, with
    +inf on the diagonal (`protein_utils.py:322-329` — note: NOT CA distance).

    Vectorized: mean_ij = (1/(c_i * c_j)) * sum_{a in i, b in j} ||a - b||,
    computed as R_i^T D R_j with per-residue indicator matrices folded into
    segment sums, blocked over atom rows to bound memory.
    """
    counts = np.array([a.shape[0] for a in atoms], dtype=np.int64)
    n_res = len(atoms)
    all_atoms = np.concatenate(atoms, axis=0).astype(np.float32)
    res_of_atom = np.repeat(np.arange(n_res), counts)
    a_total = all_atoms.shape[0]

    sums = np.zeros((n_res, n_res), dtype=np.float64)
    for start in range(0, a_total, block):
        stop = min(start + block, a_total)
        # (b, A) pairwise atom distances for this row block
        diff = all_atoms[start:stop, None, :] - all_atoms[None, :, :]
        d = np.sqrt(np.maximum(np.einsum("bac,bac->ba", diff, diff), 0.0))
        # reduce columns into residues: (b, n_res)
        col_red = np.zeros((stop - start, n_res), dtype=np.float64)
        np.add.at(col_red.T, res_of_atom, d.T)
        # reduce rows into residues
        np.add.at(sums, res_of_atom[start:stop], col_red)
    mean = sums / (counts[:, None] * counts[None, :])
    np.fill_diagonal(mean, np.inf)
    return mean


def _rbf_features(dist: np.ndarray) -> np.ndarray:
    """15-dim RBF ladder exp(-d^2 / (1.5**x)), x in [0,15)
    (`protein_utils.py:71-86`)."""
    return np.exp(-(dist[..., None] ** 2) / RBF_LENGTH_SCALES).astype(np.float32)


def build_protein_graph(
    residues: Sequence[GroupedResidue],
    cutoff: float = 30.0,
    max_neighbor: int = 10,
    coords_override: Optional[np.ndarray] = None,
    frames_override: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> ProteinGraph:
    """Build the kNN residue graph with all node/edge features.

    `coords_override` / `frames_override` support the unbound->bound Kabsch
    alignment step (`protein_utils.py:282-308`; identity in the rigid pipeline
    since unbound == bound).
    """
    ca, n_i, u_i, v_i, atoms = local_frames(residues)
    if coords_override is not None:
        ca = coords_override.astype(np.float32)
    if frames_override is not None:
        n_i, u_i, v_i = frames_override

    num = ca.shape[0]
    if num <= 1:
        raise ValueError("protein contains only 1 residue")

    from .. import native

    dist = native.residue_mean_dist(atoms)
    if dist is None:
        dist = residue_mean_distance_matrix(atoms).astype(np.float32)

    K = max_neighbor
    tables = native.knn_edges(dist, cutoff, K)
    if tables is not None:
        nbr, nbr_mask, nbr_dist = tables
    else:
        nbr = np.tile(np.arange(num, dtype=np.int32)[:, None], (1, K))
        nbr_mask = np.zeros((num, K), dtype=bool)
        nbr_dist = np.zeros((num, K), dtype=np.float32)
        for i in range(num):
            valid = np.where(dist[i, :] < cutoff)[0]
            if valid.size > max_neighbor:
                valid = np.argsort(dist[i, :])[:max_neighbor]
            k = valid.size
            nbr[i, :k] = valid
            nbr_mask[i, :k] = True
            nbr_dist[i, :k] = dist[i, valid]

    # Surface-awareness feature mu_r_norm (`protein_utils.py:351-359`):
    # softmax(-d^2/sigma) weighted mean of (x_i - x_j) vs the weighted mean of
    # their norms, for 5 sigmas — vectorized over the neighbor tables.
    d64 = nbr_dist.astype(np.float64)                                  # (N, K)
    logits = -(d64[:, None, :] ** 2) / MU_R_SIGMAS[None, :, None]      # (N, 5, K)
    logits = np.where(nbr_mask[:, None, :], logits, -np.inf)
    logits -= np.max(np.where(nbr_mask[:, None, :], logits, -1e30),
                     axis=2, keepdims=True)
    w = np.exp(logits) * nbr_mask[:, None, :]
    wsum = w.sum(axis=2, keepdims=True)
    w = np.divide(w, wsum, out=np.zeros_like(w), where=wsum > 0)
    diff = ca[:, None, :].astype(np.float64) - ca[nbr].astype(np.float64)  # (N, K, 3)
    mean_vec = np.einsum("nsk,nkc->nsc", w, diff)                      # (N, 5, 3)
    denom = np.einsum("nsk,nk->ns", w, np.linalg.norm(diff, axis=2))
    ratio = np.divide(np.linalg.norm(mean_vec, axis=2), denom,
                      out=np.ones((num, 5)), where=denom > 0)
    mean_norm = ratio.astype(np.float32)
    mean_norm[nbr_mask.sum(axis=1) == 0] = 1.0

    src = nbr[nbr_mask].astype(np.int32)
    dst = np.broadcast_to(np.arange(num, dtype=np.int32)[:, None],
                          nbr.shape)[nbr_mask].astype(np.int32)

    # --- edge features: 15 RBF of mean-atom distance + 12-dim relative
    # orientation s_ij = (p, q, k, t) expressed in the dst frame
    # (`protein_utils.py:373-390`) -------------------------------------------
    rbf = _rbf_features(nbr_dist)                                       # (N, K, 15)
    basis = np.stack([n_i, u_i, v_i], axis=1)                           # (N, 3, 3) rows in dst frame
    x_src = ca[nbr]                                                     # (N, K, 3)
    rel = x_src - ca[:, None, :]                                        # x_src - x_dst
    p = np.einsum("nab,nkb->nka", basis, rel)
    q = np.einsum("nab,nkb->nka", basis, n_i[nbr])
    kk = np.einsum("nab,nkb->nka", basis, u_i[nbr])
    t = np.einsum("nab,nkb->nka", basis, v_i[nbr])
    ori = np.concatenate([p, q, kk, t], axis=-1).astype(np.float32)     # (N, K, 12)
    edge_feat = np.concatenate([rbf, ori], axis=-1)                     # (N, K, 27)
    edge_feat = edge_feat * nbr_mask[..., None]

    res_id = np.array([residue_type_index(r[1]["resname"]) for r in residues],
                      dtype=np.int32)

    return ProteinGraph(
        res_id=res_id, x=ca.astype(np.float32), mu_r_norm=mean_norm,
        nbr=nbr, nbr_mask=nbr_mask, edge_feat=edge_feat, src=src, dst=dst,
    )


def uniform_rotation_translation(
    rng: np.random.Generator, translation_interval: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform random rotation + random-direction translation of length
    ~ U(0, interval) (`protein_utils.py:15-23`)."""
    from scipy.spatial.transform import Rotation

    rot = Rotation.random(random_state=rng).as_matrix()
    t = rng.standard_normal((1, 3))
    t = t / np.sqrt(np.sum(t * t))
    t = t * rng.uniform(0.0, translation_interval)
    return rot.astype(np.float32), t.astype(np.float32)


def rigid_transform_kabsch(A: np.ndarray, B: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form rigid alignment R, t with A, B of shape (3, N): finds R, t
    minimizing ||R A + t - B|| (`protein_utils.py:31-64`)."""
    assert A.shape[0] == 3 and B.shape[0] == 3
    centroid_A = A.mean(axis=1, keepdims=True)
    centroid_B = B.mean(axis=1, keepdims=True)
    H = (A - centroid_A) @ (B - centroid_B).T
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        R = (Vt.T @ np.diag([1.0, 1.0, -1.0])) @ U.T
    t = -R @ centroid_A + centroid_B
    return R, t
