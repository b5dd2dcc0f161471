"""Dense neighbor-table gather/aggregate ops.

The TPU-native replacement for DGL's sparse message-passing kernels
(`fn.u_sub_v` / `fn.copy_edge` + `fn.mean` at
`src/model/rigid_docking_model.py:204-205,274-283`): with in-degree capped at
K = graph_max_neighbor, the graph is a dense (B, N, K) table, so "SpMM" becomes
a masked mean over the K axis and "SDDMM" a `take_along_axis` gather — both
map directly onto TPU vector units with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_neighbors(values: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """values (B, N, D), nbr (B, M, K) int -> (B, M, K, D): values[b, nbr[b,i,k]].

    M may differ from N (edge-partitioned case: local destination block
    gathering from the full/gathered source set).
    """
    B, _, D = values.shape
    M, K = nbr.shape[1], nbr.shape[2]
    idx = nbr.reshape(B, M * K)
    out = jnp.take_along_axis(values, idx[..., None], axis=1)
    return out.reshape(B, M, K, D)


def masked_mean_over_k(edge_values: jnp.ndarray, nbr_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean-aggregate per-edge values to their destination node.

    edge_values (B, N, K, D), nbr_mask (B, N, K) -> (B, N, D). Matches DGL's
    `fn.mean` semantics: nodes with zero in-edges aggregate to 0.
    """
    w = nbr_mask[..., None]
    total = jnp.sum(edge_values * w, axis=2)
    count = jnp.sum(nbr_mask, axis=2)[..., None]
    return total / jnp.maximum(count, 1.0)


def masked_mean_over_nodes(values: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """values (B, N, D), node_mask (B, N) -> (B, D) masked mean over valid nodes."""
    w = node_mask[..., None]
    total = jnp.sum(values * w, axis=1)
    count = jnp.sum(node_mask, axis=1)[..., None]
    return total / jnp.maximum(count, 1.0)
