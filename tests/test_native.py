"""Native C++ graph-builder kernels vs the numpy reference."""

import numpy as np
import pytest

from equidock_public_tpu import native
from equidock_public_tpu.data.featurize import residue_mean_distance_matrix

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_residue_mean_dist_matches_numpy(rng):
    atoms = [rng.standard_normal((int(rng.integers(3, 15)), 3)).astype(np.float32) * 10
             for _ in range(40)]
    ref = residue_mean_distance_matrix(atoms)
    got = native.residue_mean_dist(atoms)
    fin = np.isfinite(ref)
    np.testing.assert_allclose(got[fin], ref[fin], rtol=1e-5, atol=1e-5)
    assert np.isinf(np.diag(got)).all()


def test_knn_edges_matches_python(rng):
    n = 60
    d = (rng.uniform(1, 50, (n, n))).astype(np.float32)
    d = (d + d.T) / 2
    np.fill_diagonal(d, np.inf)
    cutoff, K = 30.0, 10
    nbr, mask, nd = native.knn_edges(d, cutoff, K)
    for i in range(n):
        valid = np.where(d[i] < cutoff)[0]
        if valid.size > K:
            valid = np.argsort(d[i])[:K]
        got = set(nbr[i][mask[i]].tolist())
        assert got == set(valid.tolist())
        np.testing.assert_allclose(sorted(nd[i][mask[i]]),
                                   sorted(d[i, list(got)]), rtol=1e-6)
