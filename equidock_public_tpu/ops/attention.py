"""Masked ligand<->receptor cross-attention.

Reference semantics (`rigid_docking_model.py:46-78`): with the batch laid out
as padded (B, N, D) arrays, the reference's block-diagonal mask over a
concatenated node axis becomes a plain per-complex node mask — the (B, N_l,
N_r) attention is batched dense matmul on the MXU, no mask materialization
beyond the outer product of node masks.

Logit convention matches the reference exactly:
    a = mask * (Q @ K^T) - 1000 * (1 - mask)
(no 1/sqrt(d) scaling in the layer-level cross attention).
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_attention(
    queries: jnp.ndarray,      # (B, N, D)
    keys: jnp.ndarray,         # (B, M, D)
    values: jnp.ndarray,       # (B, M, Dv)
    q_mask: jnp.ndarray,       # (B, N)
    k_mask: jnp.ndarray,       # (B, M)
    cross_msgs: bool = True,
    q_seg: jnp.ndarray = None,  # (B, N) int32 packed-complex ids (optional)
    k_seg: jnp.ndarray = None,  # (B, M)
) -> jnp.ndarray:
    """Returns (B, N, Dv): each query attends over the valid keys of its own
    complex. With cross_msgs=False returns zeros (reference returns q * 0).
    With packed slots (q_seg/k_seg given), the mask additionally restricts
    attention to same-complex pairs — the block-diagonal structure the
    reference's get_mask builds over a concatenated node axis
    (`rigid_docking_model.py:68-78`), here per packed slot."""
    if not cross_msgs:
        return jnp.zeros(queries.shape[:-1] + (values.shape[-1],), queries.dtype)
    mask = q_mask[:, :, None] * k_mask[:, None, :]                  # (B, N, M)
    if q_seg is not None:
        mask = mask * (q_seg[:, :, None] == k_seg[:, None, :])
    scores = jnp.einsum("bnd,bmd->bnm", queries, keys,
                        preferred_element_type=jnp.float32)
    a = mask * scores - 1000.0 * (1.0 - mask)
    w = jnp.exp(a - jnp.max(a, axis=-1, keepdims=True))
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("bnm,bmd->bnd", w, values,
                      preferred_element_type=jnp.float32).astype(queries.dtype)
