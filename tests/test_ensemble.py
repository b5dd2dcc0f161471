"""Rigid-ensemble math (eval/ensemble.py)."""

import numpy as np

from equidock_public_tpu.eval.ensemble import (chordal_mean_rotation,
                                               ensemble_rigid)


def _random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def test_chordal_mean_identities():
    rng = np.random.default_rng(0)
    R = _random_rotation(rng)
    # mean of copies is the rotation itself
    M = chordal_mean_rotation([R, R, R])
    np.testing.assert_allclose(M, R, atol=1e-6)
    # always a proper rotation, even for far-apart members
    Rs = [_random_rotation(rng) for _ in range(5)]
    M = chordal_mean_rotation(Rs)
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(M) > 0.99


def test_chordal_mean_small_perturbations():
    """For small perturbations about a base rotation, the chordal mean lands
    closer (Frobenius) to the base than the average member does."""
    rng = np.random.default_rng(1)
    base = _random_rotation(rng)

    def perturb(eps):
        w = rng.standard_normal(3) * eps
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        from scipy.linalg import expm

        return base @ expm(K)

    try:
        Rs = [perturb(0.3) for _ in range(8)]
    except ImportError:  # scipy always present in this env, but be safe
        return
    M = chordal_mean_rotation(Rs)
    d_mean = np.linalg.norm(M - base)
    d_members = np.mean([np.linalg.norm(R - base) for R in Rs])
    assert d_mean < d_members


def test_ensemble_rigid_singleton_and_centroid():
    rng = np.random.default_rng(2)
    R1, t1 = _random_rotation(rng), rng.standard_normal(3)
    c = rng.standard_normal(3)
    # singleton ensemble is exact
    R, t = ensemble_rigid([R1], [t1], c)
    np.testing.assert_allclose(R, R1, atol=1e-6)
    np.testing.assert_allclose(t, t1, atol=1e-5)
    # the ensemble places the centroid at the members' mean placement
    R2, t2 = _random_rotation(rng), rng.standard_normal(3)
    R, t = ensemble_rigid([R1, R2], [t1, t2], c)
    want = 0.5 * ((R1 @ c + t1) + (R2 @ c + t2))
    np.testing.assert_allclose(R @ c + t, want, atol=1e-5)
