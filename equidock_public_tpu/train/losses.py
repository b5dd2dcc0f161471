"""Training losses, batched and mask-aware.

Reference semantics: per-complex losses assembled in a Python loop at
`src/train.py:103-150`; here one fused computation over the padded batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..config import TrainConfig
from ..graph import PairBatch
from ..ops.intersection import body_intersection_loss
from ..ops.sinkhorn import pocket_ot_loss, pocket_ot_loss_exact, sq_dist_mat


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Per-complex mean squared error over valid nodes x 3 coords — matches
    torch MSELoss(reduction='mean') on the unpadded (N, 3) array
    (`train.py:114-115`). pred/target (B, N, 3), mask (B, N) -> (B,)."""
    se = jnp.sum(((pred - target) ** 2) * mask[..., None], axis=(1, 2))
    return se / jnp.maximum(3.0 * jnp.sum(mask, axis=1), 1.0)


def masked_mse_packed(pred: jnp.ndarray, target: jnp.ndarray,
                      oh: jnp.ndarray) -> jnp.ndarray:
    """Per packed complex MSE: pred/target (B, N, 3), oh (B, N, C) seg
    one-hot x node mask -> (B, C) (same per-complex normalization as
    masked_mse, restricted to each complex's own nodes)."""
    se = jnp.sum((pred - target) ** 2, axis=-1)             # (B, N)
    per_seg = jnp.einsum("bn,bnc->bc", se, oh)
    return per_seg / jnp.maximum(3.0 * jnp.sum(oh, axis=1), 1.0)


def total_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: PairBatch,
    tc: TrainConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scalar training loss + per-term metrics, batch-averaged over valid
    complexes (the reference divides by the batch length, `train.py:143-150`).

    Packed batches (n_segs = C > 1): every term is computed per packed
    complex (M = B * C of them) with the same per-complex normalizations as
    the unpacked path, so a packed batch of the same complexes produces the
    same loss as the unpacked batch (padding-invariance, extended to packing).
    """
    lig_pred = outputs["ligand_coords"]
    C = batch.n_segs
    pm = batch.complex_mask                                  # (M,)
    denom = jnp.maximum(jnp.sum(pm), 1.0)

    if C == 1:
        lig_coors = masked_mse(lig_pred, batch.gt_lig, batch.lig.node_mask)
        keypts_l, keypts_r = outputs["keypts_lig"], outputs["keypts_rec"]
        pocket_l, pocket_r = batch.pocket_lig, batch.pocket_rec
        pocket_mask = batch.pocket_mask
    else:
        lig_oh = batch.lig.seg_onehot(C)
        rec_oh = batch.rec.seg_onehot(C)
        lig_coors = masked_mse_packed(lig_pred, batch.gt_lig,
                                      lig_oh).reshape(-1)    # (M,)
        B = lig_pred.shape[0]
        H = outputs["keypts_lig"].shape[2]
        P = batch.pocket_lig.shape[2]
        keypts_l = outputs["keypts_lig"].reshape(B * C, H, 3)
        keypts_r = outputs["keypts_rec"].reshape(B * C, H, 3)
        pocket_l = batch.pocket_lig.reshape(B * C, P, 3)
        pocket_r = batch.pocket_rec.reshape(B * C, P, 3)
        pocket_mask = batch.pocket_mask.reshape(B * C, P)

    cost = (sq_dist_mat(pocket_l, keypts_l)
            + sq_dist_mat(pocket_r, keypts_r))
    if tc.ot_solver == "exact":
        ot = pocket_ot_loss_exact(cost, pocket_mask)
    else:
        ot = pocket_ot_loss(cost, pocket_mask,
                            epsilon=tc.sinkhorn_epsilon,
                            iters=tc.sinkhorn_iters)

    if C > 1:
        from ..ops.intersection import body_intersection_loss_packed

        intersection = body_intersection_loss_packed(
            lig_pred, lig_oh, batch.rec.x, rec_oh,
            tc.intersection_sigma, tc.intersection_surface_ct).reshape(-1)
    elif tc.use_fused_intersection:
        import jax

        from ..ops.pallas.softmin_field import body_intersection_loss_fused

        intersection = body_intersection_loss_fused(
            lig_pred, batch.lig.node_mask, batch.rec.x, batch.rec.node_mask,
            tc.intersection_sigma, tc.intersection_surface_ct,
            interpret=jax.default_backend() == "cpu")
    else:
        intersection = body_intersection_loss(
            lig_pred, batch.lig.node_mask, batch.rec.x, batch.rec.node_mask,
            tc.intersection_sigma, tc.intersection_surface_ct)

    lig_loss = jnp.sum(lig_coors * pm) / denom
    ot_loss = jnp.sum(ot * pm) / denom
    int_loss = jnp.sum(intersection * pm) / denom

    loss = (lig_loss
            + tc.pocket_ot_loss_weight * ot_loss
            + tc.intersection_loss_weight * int_loss)
    metrics = {
        "loss": loss,
        "ligand_coors_loss": lig_loss,
        "receptor_coors_loss": jnp.zeros(()),  # receptor never moves (train.py:105)
        "ot_loss": ot_loss,
        "intersection_loss": int_loss,
    }
    return loss, metrics
