"""Ring cross-attention over the 'graph' mesh axis.

For complexes too large to gather one side's K/V onto every chip, the
ligand<->receptor attention runs as a ring: each chip holds a query row block
and one K/V chunk; chunks rotate around the ring via `lax.ppermute` (ICI
neighbor exchange) while an online-softmax accumulator folds in one chunk per
step — the (N_l x N_r) logits never exist on any chip, and peak memory is
O(N/gp * D) per chip. This is the graph analogue of ring/blockwise sequence
attention (SURVEY §5 long-context), with the reference's exact logit
convention `mask * (q.k) - 1000 * (1 - mask)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "graph"


def ring_cross_attention_local(q, k_c, v_c, q_mask, k_mask_c,
                               axis: str = AXIS):
    """Inside shard_map: q (B, Nq_loc, D) local queries; k_c/v_c
    (B, Nk_loc, D) local K/V chunk; masks likewise. Returns (B, Nq_loc, Dv).
    """
    gp = jax.lax.axis_size(axis)
    B, Nq, _ = q.shape
    Dv = v_c.shape[-1]

    m0 = jnp.full((B, Nq), -jnp.inf)
    l0 = jnp.zeros((B, Nq))
    acc0 = jnp.zeros((B, Nq, Dv))
    perm = [(i, (i + 1) % gp) for i in range(gp)]

    def step(carry, _):
        k_c, v_c, km_c, m, l, acc = carry
        scores = jnp.einsum("bnd,bmd->bnm", q, k_c,
                            preferred_element_type=jnp.float32)
        mask = q_mask[:, :, None] * km_c[:, None, :]
        a = mask * scores - 1000.0 * (1.0 - mask)
        m_new = jnp.maximum(m, jnp.max(a, axis=-1))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(a - m_new[:, :, None])
        l_new = l * corr + jnp.sum(e, axis=-1)
        acc_new = acc * corr[:, :, None] + jnp.einsum(
            "bnm,bmd->bnd", e, v_c, preferred_element_type=jnp.float32)
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        km_c = jax.lax.ppermute(km_c, axis, perm)
        return (k_c, v_c, km_c, m_new, l_new, acc_new), None

    (k_c, v_c, km_c, m, l, acc), _ = jax.lax.scan(
        step, (k_c, v_c, k_mask_c, m0, l0, acc0), None, length=gp)
    return acc / jnp.maximum(l, 1e-30)[:, :, None]


def make_ring_cross_attention(mesh: Mesh):
    """shard_map wrapper: batch over 'data', node axes over 'graph'."""
    spec = P("data", AXIS, None)
    mspec = P("data", AXIS)

    def fn(q, k, v, qm, km):
        return ring_cross_attention_local(q, k, v, qm, km)

    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(spec, spec, spec, mspec, mspec),
                         out_specs=spec, check_vma=False)
