"""Batched differentiable Kabsch/SVD rigid fit.

The reference runs a per-complex Python loop with an unstable jitter+retry on
degenerate SVDs (`rigid_docking_model.py:521-589`). Here the whole batch of
3x3 covariance matrices goes through ONE batched `jnp.linalg.svd`; degeneracy
(tiny or nearly-equal singular values, where the SVD gradient blows up) is
handled deterministically: detect from the first SVD's singular values, add a
fixed asymmetric diagonal jitter to flagged matrices, and re-decompose — all
inside jit, no Python control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Asymmetric diagonal jitter splits coalesced singular values without breaking
# differentiability (deterministic analogue of `rigid_docking_model.py:578`).
_JITTER = jnp.array([0.31, 0.47, 0.59], dtype=jnp.float32)


def _is_degenerate(S: jnp.ndarray, tol_small: float, tol_gap: float) -> jnp.ndarray:
    """S (B, 3) -> (B,) bool. Mirrors the reference's retry condition
    (`rigid_docking_model.py:574`): min singular value < tol_small, or two
    squared singular values within tol_gap of each other."""
    small = jnp.min(S, axis=-1) < tol_small
    s2 = S**2
    diff = jnp.abs(s2[:, :, None] - s2[:, None, :]) + jnp.eye(3)[None]
    close = jnp.min(diff.reshape(S.shape[0], -1), axis=-1) < tol_gap
    return jnp.logical_or(small, close)


def kabsch_from_covariance(
    A: jnp.ndarray, tol_small: float = 1e-3, tol_gap: float = 1e-2
) -> jnp.ndarray:
    """A (B, 3, 3) covariance -> rotation R (B, 3, 3) = U diag(1,1,sign det A) Vt.

    The reflection correction uses sign(det(A)) like the reference
    (`rigid_docking_model.py:586`).
    """
    A = A.astype(jnp.float32)
    # First (ungraded) decomposition only to detect degeneracy.
    S_probe = jnp.linalg.svd(jax.lax.stop_gradient(A), compute_uv=False)
    bad = _is_degenerate(S_probe, tol_small, tol_gap)
    A_safe = A + bad[:, None, None] * jnp.diag(_JITTER)[None]
    U, S, Vt = jnp.linalg.svd(A_safe, full_matrices=False)
    sign = jnp.sign(jnp.linalg.det(A_safe))
    corr = jnp.stack(
        [jnp.ones_like(sign), jnp.ones_like(sign), sign], axis=-1
    )  # (B, 3)
    R = jnp.einsum("bij,bj,bjk->bik", U, corr, Vt)
    return R


def rigid_fit(
    keypts_src: jnp.ndarray,   # (B, K, 3)  e.g. ligand keypoints
    keypts_dst: jnp.ndarray,   # (B, K, 3)  e.g. receptor keypoints
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid (R, t) mapping src keypoints onto dst keypoints, batched.

    Matches the reference head (`rigid_docking_model.py:563-589`):
      A = (Y_dst - mean)^T (Y_src - mean); R = U diag(1,1,sign det A) Vt;
      t = mean_dst - R mean_src.
    Returns R (B, 3, 3), t (B, 1, 3).
    """
    mean_src = jnp.mean(keypts_src, axis=1, keepdims=True)
    mean_dst = jnp.mean(keypts_dst, axis=1, keepdims=True)
    A = jnp.einsum("bki,bkj->bij", keypts_dst - mean_dst, keypts_src - mean_src)
    R = kabsch_from_covariance(A)
    t = mean_dst - jnp.einsum("bij,bkj->bki", R, mean_src)
    return R, t


def apply_rigid(x: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x (B, N, 3), R (B, 3, 3), t (B, 1, 3) -> R x + t."""
    return jnp.einsum("bij,bnj->bni", R, x) + t


def apply_rigid_packed(x: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                       seg_id: jnp.ndarray, n_segs: int) -> jnp.ndarray:
    """Per-node rigid transform for packed slots: node n of slot b gets its
    own complex's (R, t). x (B, N, 3), R (B, C, 3, 3), t (B, C, 1, 3),
    seg_id (B, N) -> (B, N, 3). C is small, so a one-hot contraction beats a
    gather on TPU (stays in vector registers, no dynamic indexing)."""
    oh = (seg_id[..., None] == jnp.arange(n_segs)).astype(x.dtype)  # (B,N,C)
    Rx = jnp.einsum("bcij,bnj->bnci", R, x)
    return (jnp.einsum("bnci,bnc->bni", Rx, oh)
            + jnp.einsum("bckj,bnc->bnj", t, oh))
