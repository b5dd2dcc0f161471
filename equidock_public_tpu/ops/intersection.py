"""Soft body-intersection penalty, batched and mask-aware.

Reference: `G_fn` / `compute_body_intersection_loss` (`src/train.py:41-49`,
duplicated at `inference_rigid.py:33-43`):
    G(x) = -sigma * log(1e-3 + sum_i exp(-||x - a_i||^2 / sigma))
    IL   = mean_j relu(ct - G_rec(lig_j)) + mean_i relu(ct - G_lig(rec_i))
The (N_l, N_r) pairwise term is one fused distance + exp + sum — XLA fuses it;
masked entries contribute exp(-inf) = 0, matching the unpadded computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def g_fn(
    protein: jnp.ndarray,      # (B, N, 3) point cloud defining the body
    protein_mask: jnp.ndarray,  # (B, N)
    x: jnp.ndarray,            # (B, M, 3) query points
    sigma: float,
) -> jnp.ndarray:
    """(B, M): soft-min distance field of `protein` evaluated at `x`."""
    d2 = jnp.sum((x[:, :, None, :] - protein[:, None, :, :]) ** 2, axis=-1)
    e = jnp.exp(-d2 / float(sigma)) * protein_mask[:, None, :]
    return -sigma * jnp.log(1e-3 + jnp.sum(e, axis=-1))


def body_intersection_loss(
    lig: jnp.ndarray,        # (B, N_l, 3) predicted ligand coords
    lig_mask: jnp.ndarray,   # (B, N_l)
    rec: jnp.ndarray,        # (B, N_r, 3) receptor coords
    rec_mask: jnp.ndarray,   # (B, N_r)
    sigma: float,
    surface_ct: float,
) -> jnp.ndarray:
    """(B,) per-complex intersection loss."""
    pen_l = jnp.maximum(surface_ct - g_fn(rec, rec_mask, lig, sigma), 0.0)
    pen_r = jnp.maximum(surface_ct - g_fn(lig, lig_mask, rec, sigma), 0.0)
    mean_l = jnp.sum(pen_l * lig_mask, axis=1) / jnp.maximum(
        jnp.sum(lig_mask, axis=1), 1.0)
    mean_r = jnp.sum(pen_r * rec_mask, axis=1) / jnp.maximum(
        jnp.sum(rec_mask, axis=1), 1.0)
    return mean_l + mean_r


def _g_fn_seg(protein, protein_oh, x, sigma):
    """(B, M, C): per packed complex c, the soft-min field of `protein`'s
    seg-c points evaluated at every x. protein_oh is (B, N, C)."""
    d2 = jnp.sum((x[:, :, None, :] - protein[:, None, :, :]) ** 2, axis=-1)
    e = jnp.exp(-d2 / float(sigma))                       # (B, M, N)
    s = jnp.einsum("bmn,bnc->bmc", e, protein_oh)
    return -sigma * jnp.log(1e-3 + s)


def body_intersection_loss_packed(
    lig: jnp.ndarray,        # (B, N_l, 3) predicted ligand coords (packed)
    lig_oh: jnp.ndarray,     # (B, N_l, C) seg one-hot x node mask
    rec: jnp.ndarray,        # (B, N_r, 3)
    rec_oh: jnp.ndarray,     # (B, N_r, C)
    sigma: float,
    surface_ct: float,
) -> jnp.ndarray:
    """(B, C) per packed complex: same math as body_intersection_loss but the
    soft-min field and the means are restricted to same-complex pairs (the
    packed analogue of per-complex evaluation)."""
    pen_l = jnp.maximum(surface_ct - _g_fn_seg(rec, rec_oh, lig, sigma), 0.0)
    pen_r = jnp.maximum(surface_ct - _g_fn_seg(lig, lig_oh, rec, sigma), 0.0)
    mean_l = jnp.einsum("blc,blc->bc", pen_l, lig_oh) / jnp.maximum(
        jnp.sum(lig_oh, axis=1), 1.0)
    mean_r = jnp.einsum("brc,brc->bc", pen_r, rec_oh) / jnp.maximum(
        jnp.sum(rec_oh, axis=1), 1.0)
    return mean_l + mean_r
