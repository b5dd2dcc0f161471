"""Unit tests for the core ops against independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.ops.attention import cross_attention
from equidock_public_tpu.ops.intersection import body_intersection_loss
from equidock_public_tpu.ops.kabsch import apply_rigid, rigid_fit
from equidock_public_tpu.ops.segment import (gather_neighbors, masked_mean_over_k,
                                             masked_mean_over_nodes)
from equidock_public_tpu.ops.sinkhorn import pocket_ot_loss, sinkhorn_log, sq_dist_mat


def test_gather_and_masked_mean(rng):
    B, N, K, D = 2, 7, 3, 5
    vals = rng.standard_normal((B, N, D)).astype(np.float32)
    nbr = rng.integers(0, N, (B, N, K)).astype(np.int32)
    mask = (rng.uniform(size=(B, N, K)) > 0.3).astype(np.float32)

    got = np.asarray(gather_neighbors(jnp.asarray(vals), jnp.asarray(nbr)))
    for b in range(B):
        for i in range(N):
            for k in range(K):
                np.testing.assert_allclose(got[b, i, k], vals[b, nbr[b, i, k]])

    ev = rng.standard_normal((B, N, K, D)).astype(np.float32)
    agg = np.asarray(masked_mean_over_k(jnp.asarray(ev), jnp.asarray(mask)))
    for b in range(B):
        for i in range(N):
            m = mask[b, i] > 0
            expect = ev[b, i][m].mean(axis=0) if m.any() else np.zeros(D)
            np.testing.assert_allclose(agg[b, i], expect, rtol=1e-5, atol=1e-6)


def test_masked_mean_over_nodes(rng):
    B, N, D = 2, 6, 4
    vals = rng.standard_normal((B, N, D)).astype(np.float32)
    mask = np.zeros((B, N), np.float32)
    mask[0, :4] = 1
    mask[1, :6] = 1
    got = np.asarray(masked_mean_over_nodes(jnp.asarray(vals), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], vals[0, :4].mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(got[1], vals[1].mean(axis=0), rtol=1e-5)


def test_cross_attention_matches_reference_semantics(rng):
    """Batched masked attention == the reference's per-complex dense formula
    (`rigid_docking_model.py:46-64`) computed in numpy on the unpadded data."""
    B, N, M, D = 2, 5, 7, 4
    q = rng.standard_normal((B, N, D)).astype(np.float32)
    k = rng.standard_normal((B, M, D)).astype(np.float32)
    v = rng.standard_normal((B, M, D)).astype(np.float32)
    n_valid, m_valid = [4, 5], [6, 3]
    qm = np.zeros((B, N), np.float32)
    km = np.zeros((B, M), np.float32)
    for b in range(B):
        qm[b, :n_valid[b]] = 1
        km[b, :m_valid[b]] = 1

    out = np.asarray(cross_attention(*map(jnp.asarray, (q, k, v, qm, km))))

    for b in range(B):
        qq, kk, vv = q[b, :n_valid[b]], k[b, :m_valid[b]], v[b, :m_valid[b]]
        mask = np.ones((qq.shape[0], kk.shape[0]), np.float32)
        a = mask * (qq @ kk.T) - 1000.0 * (1 - mask)
        a = np.exp(a - a.max(axis=1, keepdims=True))
        a = a / a.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(out[b, :n_valid[b]], a @ vv, rtol=1e-4, atol=1e-5)


def test_rigid_fit_recovers_rotation(rng):
    from scipy.spatial.transform import Rotation

    src = rng.standard_normal((3, 20, 3)).astype(np.float32) * 5
    Rt = Rotation.random(3, random_state=1).as_matrix().astype(np.float32)
    t_true = rng.standard_normal((3, 1, 3)).astype(np.float32) * 10
    dst = np.einsum("bij,bnj->bni", Rt, src) + t_true

    R, t = jax.jit(rigid_fit)(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), Rt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-2)
    # proper rotation
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)


def test_rigid_fit_degenerate_is_finite_and_orthogonal():
    """Collinear keypoint clouds (rank-1 covariance) — the case where the
    reference jitter-retries (`rigid_docking_model.py:573-584`). Our
    deterministic jitter must give a finite proper rotation and gradient."""
    kl = jnp.asarray(np.linspace(0, 1, 50)[:, None] * np.array([[1.0, 0, 0]]),
                     jnp.float32)[None]
    kr = jnp.asarray(np.linspace(0, 1, 50)[:, None] * np.array([[0, 1.0, 0]]),
                     jnp.float32)[None]

    @jax.jit
    def run(kl, kr):
        R, t = rigid_fit(kl, kr)
        g = jax.grad(lambda kl: jnp.sum(apply_rigid(kl, *rigid_fit(kl, kr)) ** 2))(kl)
        return R, g

    R, g = run(kl, kr)
    assert bool(jnp.isfinite(R).all())
    assert bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, 1, 2)), np.eye(3)[None], atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-3)


def test_sinkhorn_matches_exact_emd(rng):
    """Sinkhorn objective ~= exact EMD (linear program) on small instances —
    validating the replacement of POT's network simplex (`ot_utils.py:26`)."""
    from scipy.optimize import linprog

    B, N, M = 3, 6, 4
    cost = (rng.uniform(size=(B, N, M)) * 10).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    mask[1, 4:] = 0  # one instance with padding

    plan = np.asarray(jax.jit(
        lambda c, m: sinkhorn_log(c, m, epsilon=0.002, iters=500)
    )(jnp.asarray(cost), jnp.asarray(mask)))

    for b in range(B):
        n = int(mask[b].sum())
        c = cost[b, :n].astype(np.float64)
        a = np.full(n, 1.0 / n)
        bb = np.full(M, 1.0 / M)
        # LP: min <c, P> s.t. row sums = a, col sums = b
        A_eq = []
        for i in range(n):
            row = np.zeros((n, M)); row[i, :] = 1
            A_eq.append(row.ravel())
        for j in range(M):
            col = np.zeros((n, M)); col[:, j] = 1
            A_eq.append(col.ravel())
        res = linprog(c.ravel(), A_eq=np.array(A_eq),
                      b_eq=np.concatenate([a, bb]), bounds=(0, None),
                      method="highs")
        exact = res.fun
        approx = float((plan[b, :n] * c).sum())
        # plan mass is correct
        np.testing.assert_allclose(plan[b].sum(), 1.0, atol=1e-3)
        np.testing.assert_allclose(plan[b, :n].sum(axis=1), a, atol=1e-3)
        assert plan[b, n:].sum() < 1e-6
        # entropic blur: within a few percent of exact EMD
        assert approx <= exact * 1.10 + 1e-3, (approx, exact)
        assert approx >= exact - 1e-3


def test_exact_emd_callback_matches_lp_and_is_differentiable(rng):
    """pocket_ot_loss_exact (host-callback LP, the reference's true solver
    semantics `ot_utils.py:22-29`): objective <= Sinkhorn's (it is exact),
    within blur distance of it, and gradient flows through the cost."""
    from equidock_public_tpu.ops.sinkhorn import (pocket_ot_loss,
                                                  pocket_ot_loss_exact)

    B, P, K = 3, 7, 4
    cost = jnp.asarray((rng.uniform(size=(B, P, K)) * 10).astype(np.float32))
    mask = np.ones((B, P), np.float32)
    mask[2, 5:] = 0
    mask = jnp.asarray(mask)

    exact = np.asarray(pocket_ot_loss_exact(cost, mask))
    approx = np.asarray(pocket_ot_loss(cost, mask, epsilon=0.002, iters=500))
    # note Sinkhorn can land slightly BELOW exact: its plan satisfies the
    # row marginals only approximately, so the two objectives are compared
    # by relative gap, not ordering
    np.testing.assert_allclose(exact, approx, rtol=0.02)

    # gradient flows through the cost (plan detached), also under jit
    g = jax.jit(jax.grad(
        lambda c: jnp.sum(pocket_ot_loss_exact(c, mask))))(cost)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # d<plan,cost>/dcost with plan detached == plan itself: row sums 1/n
    n = 5
    np.testing.assert_allclose(g[2, :n].sum(), 1.0, atol=1e-4)
    assert np.abs(g[2, n:]).sum() < 1e-6


def test_pocket_ot_loss_gradient_only_through_cost(rng):
    """The plan must be detached (`ot_utils.py:27-28`): gradient of
    <plan, cost> w.r.t. keypoints == plan-weighted cost gradient."""
    B, P, K = 1, 5, 4
    pocket = jnp.asarray(rng.standard_normal((B, P, 3)).astype(np.float32))
    keypts = jnp.asarray(rng.standard_normal((B, K, 3)).astype(np.float32))
    mask = jnp.ones((B, P))

    def loss(kp):
        cost = sq_dist_mat(pocket, kp)
        return jnp.sum(pocket_ot_loss(cost, mask, epsilon=0.01, iters=100))

    g = jax.jit(jax.grad(loss))(keypts)
    plan = np.asarray(sinkhorn_log(sq_dist_mat(pocket, keypts), mask,
                                   epsilon=0.01, iters=100))
    # manual: d/dkp sum_ij plan_ij ||p_i - kp_j||^2 = sum_i plan_ij * 2(kp_j - p_i)
    manual = 2 * (np.asarray(keypts)[0][None] - np.asarray(pocket)[0][:, None])
    manual = (plan[0][..., None] * manual).sum(axis=0)
    np.testing.assert_allclose(np.asarray(g)[0], manual, rtol=1e-3, atol=1e-5)


def test_intersection_loss_matches_unpadded_reference(rng):
    """Masked batched intersection loss == reference formula (`train.py:41-49`)
    on the unpadded arrays."""
    B = 2
    n_l, n_r, N_l, N_r = [5, 7], [6, 4], 8, 8
    lig = rng.standard_normal((B, N_l, 3)).astype(np.float32) * 3
    rec = rng.standard_normal((B, N_r, 3)).astype(np.float32) * 3
    lm = np.zeros((B, N_l), np.float32)
    rm = np.zeros((B, N_r), np.float32)
    for b in range(B):
        lm[b, :n_l[b]] = 1
        rm[b, :n_r[b]] = 1
    sigma, ct = 25.0, 10.0
    got = np.asarray(body_intersection_loss(
        jnp.asarray(lig), jnp.asarray(lm), jnp.asarray(rec), jnp.asarray(rm),
        sigma, ct))

    def G(prot, x):
        d2 = ((x[:, None, :] - prot[None, :, :]) ** 2).sum(-1)
        return -sigma * np.log(1e-3 + np.exp(-d2 / sigma).sum(1))

    for b in range(B):
        l, r = lig[b, :n_l[b]], rec[b, :n_r[b]]
        expect = (np.maximum(ct - G(r, l), 0).mean()
                  + np.maximum(ct - G(l, r), 0).mean())
        np.testing.assert_allclose(got[b], expect, rtol=1e-4, atol=1e-5)
