"""Featurization parity vs an independent, literal transcription of the
reference's preprocessing semantics (`src/utils/protein_utils.py:107-416`),
evaluated on a real DB5.5 PDB file."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist
from scipy.special import softmax

from equidock_public_tpu.data.featurize import (alpha_carbon_array,
                                                build_protein_graph,
                                                extract_pocket,
                                                filter_residues, local_frames,
                                                residue_mean_distance_matrix)
from equidock_public_tpu.data.pdb import group_residues, read_pdb
from equidock_public_tpu.data.residues import residue_type_index

PDB = "/root/reference/data/benchmark5.5/structures/1A2K_l_b.pdb"


@pytest.fixture(scope="module")
def residues():
    res = filter_residues(group_residues(read_pdb(PDB)))
    return res[:60]  # truncate for O(n^2) naive reference speed


def naive_reference_graph(residues, cutoff=30.0, max_neighbor=10):
    """Naive loop-for-loop implementation mirroring the reference exactly."""
    n = len(residues)
    atoms = [r[1]["coords"].astype(np.float64) for r in residues]
    # local frames
    ca = np.zeros((n, 3)); n_i = np.zeros((n, 3)); u_i = np.zeros((n, 3)); v_i = np.zeros((n, 3))
    for i, r in enumerate(residues):
        names = r[1]["atom_name"]; c = r[1]["coords"].astype(np.float64)
        N_loc = c[names == "N"][0]; ca_loc = c[names == "CA"][0]; C_loc = c[names == "C"][0]
        u = (N_loc - ca_loc) / np.linalg.norm(N_loc - ca_loc)
        t = (C_loc - ca_loc) / np.linalg.norm(C_loc - ca_loc)
        nn = np.cross(u, t); nn = nn / np.linalg.norm(nn)
        ca[i], n_i[i], u_i[i], v_i[i] = ca_loc, nn, u, np.cross(nn, u)
    # mean all-atom distance
    dist = np.full((n, n), np.inf)
    for i in range(n - 1):
        for j in range(i + 1, n):
            d = cdist(atoms[i], atoms[j]).mean()
            dist[i, j] = dist[j, i] = d
    # edges + mu_r_norm
    src_l, dst_l, d_l, mu = [], [], [], []
    for i in range(n):
        valid = list(np.where(dist[i, :] < cutoff)[0])
        if len(valid) > max_neighbor:
            valid = list(np.argsort(dist[i, :]))[:max_neighbor]
        src_l.extend(valid); dst_l.extend([i] * len(valid))
        dv = dist[i, valid]; d_l.extend(list(dv))
        sigma = np.array([1., 2., 5., 10., 30.]).reshape(-1, 1)
        w = softmax(-dv.reshape(1, -1) ** 2 / sigma, axis=1)
        diff = ca[[i] * len(valid), :] - ca[valid, :]
        mean_vec = w.dot(diff)
        denom = w.dot(np.linalg.norm(diff, axis=1))
        mu.append(np.linalg.norm(mean_vec, axis=1) / denom)
    # edge features
    he = []
    ls = [1.5 ** x for x in range(15)]
    for e in range(len(src_l)):
        s, d = src_l[e], dst_l[e]
        rbf = [np.exp(-(d_l[e] ** 2) / l) for l in ls]
        basis = np.stack((n_i[d], u_i[d], v_i[d]), axis=0)
        p = basis @ (ca[s] - ca[d]); q = basis @ n_i[s]
        k = basis @ u_i[s]; t = basis @ v_i[s]
        he.append(np.concatenate([rbf, p, q, k, t]))
    return (np.array(src_l), np.array(dst_l), np.array(he),
            np.stack(mu), ca, dist)


def test_graph_matches_naive_reference(residues):
    ref_src, ref_dst, ref_he, ref_mu, ref_ca, ref_dist = naive_reference_graph(residues)
    g = build_protein_graph(residues, cutoff=30.0, max_neighbor=10)

    # node coords & features
    np.testing.assert_allclose(g.x, ref_ca, atol=1e-4)
    np.testing.assert_allclose(g.mu_r_norm, ref_mu, rtol=1e-4, atol=1e-5)
    # distance matrix
    ours = residue_mean_distance_matrix([r[1]["coords"] for r in residues])
    finite = np.isfinite(ref_dist)
    np.testing.assert_allclose(ours[finite], ref_dist[finite], rtol=1e-4)

    # identical edge sets (as (src, dst) pairs) and per-edge features
    ref_edges = {}
    for i in range(len(ref_src)):
        ref_edges[(int(ref_src[i]), int(ref_dst[i]))] = ref_he[i]
    got_edges = {}
    for i in range(g.num_nodes):
        for k in range(g.nbr.shape[1]):
            if g.nbr_mask[i, k]:
                got_edges[(int(g.nbr[i, k]), i)] = g.edge_feat[i, k]
    assert set(got_edges) == set(ref_edges)
    for key in ref_edges:
        np.testing.assert_allclose(got_edges[key], ref_edges[key],
                                   rtol=1e-3, atol=1e-4)


def test_edge_feat_dim_is_27(residues):
    g = build_protein_graph(residues)
    assert g.edge_feat.shape[-1] == 27  # 15 RBF + 12 orientation


def test_residue_filter_and_pocket():
    lig = filter_residues(group_residues(read_pdb(PDB)))
    rec = filter_residues(group_residues(read_pdb(
        PDB.replace("_l_b", "_r_b"))))
    for r in lig:
        names = r[1]["atom_name"]
        assert (names == "CA").sum() == 1
    lig_ca, rec_ca = alpha_carbon_array(lig), alpha_carbon_array(rec)
    pk = extract_pocket(lig_ca, rec_ca, 8.0)
    assert pk is not None
    mid, ai, aj = pk
    d = np.linalg.norm(lig_ca[ai] - rec_ca[aj], axis=1)
    assert (d < 8.0).all()
    np.testing.assert_allclose(mid, 0.5 * (lig_ca[ai] + rec_ca[aj]), atol=1e-5)


def test_residue_type_indices():
    assert residue_type_index("ALA") == 6
    assert residue_type_index("TYR") == 0
    assert residue_type_index("HIE") == 9   # rare residue -> H
    assert residue_type_index("XXX") == 20  # unknown


def test_pdb_parser_tolerates_malformed_lines(tmp_path):
    """Short lines, missing element column, junk residue numbers."""
    p = tmp_path / "junk.pdb"
    p.write_text(
        "ATOM      1  N   ALA A   1      11.104   6.134  -6.504\n"   # no elem
        "ATOM      2  CA  ALA A   1      12.000   7.000  -6.000  1.00  0.00           C\n"
        "ATOM      3  C   ALA A  xx      13.000   8.000  -5.000  1.00  0.00           C\n"
        "HETATM    4  O   HOH A   2       0.000   0.000   0.000\n"    # skipped
        "REMARK whatever\n")
    from equidock_public_tpu.data.pdb import read_pdb

    t = read_pdb(str(p))
    assert len(t) == 3
    assert t.residue[2] == 0            # unparseable resSeq -> 0
    assert t.element[0] == ""           # missing element column
    assert t.coords.shape == (3, 3)
