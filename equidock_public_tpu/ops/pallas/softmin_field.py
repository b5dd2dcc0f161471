"""Fused soft-min distance-field kernel for the body-intersection loss.

The intersection penalty (`src/train.py:41-49`) needs, for every query point
x_m, the Gaussian mass S_m = sum_n mask_n * exp(-||x_m - a_n||^2 / sigma) of
the other protein — an (M, N) pairwise op. The XLA path materializes the
(B, M, N) distance tensor in HBM; this kernel blocks over queries with the
protein resident in VMEM (distances never leave VMEM), using one thin MXU
matmul for the cross term. A custom VJP recomputes the weights blockwise in
the backward kernel and accumulates dA across query blocks in VMEM.

`g_fn` = -sigma * log(1e-3 + S) and the relu/mean reductions stay in XLA
(cheap elementwise on (B, M)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_M = 256


def _fwd_kernel(x_ref, a_ref, am_ref, s_ref, *, sigma):
    x = x_ref[0]                                   # (BM, 3)
    a = a_ref[0]                                   # (N, 3)
    am = am_ref[0]                                 # (N, 1)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)    # (BM, 1)
    a2 = jnp.sum(a * a, axis=-1)[None, :]          # (1, N)
    cross = jnp.dot(x, a.T, preferred_element_type=jnp.float32)
    d2 = x2 + a2 - 2.0 * cross
    w = jnp.exp(-d2 / sigma) * am.T
    s_ref[0] = jnp.sum(w, axis=-1, keepdims=True)


def _bwd_kernel(x_ref, a_ref, am_ref, c_ref, dx_ref, da_ref, *, sigma):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        da_ref[0] = jnp.zeros_like(da_ref[0])

    x = x_ref[0]
    a = a_ref[0]
    am = am_ref[0]                                 # (N, 1)
    c = c_ref[0]                                   # (BM, 1) cotangent of S
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    a2 = jnp.sum(a * a, axis=-1)[None, :]
    cross = jnp.dot(x, a.T, preferred_element_type=jnp.float32)
    w = jnp.exp(-(x2 + a2 - 2.0 * cross) / sigma) * am.T          # (BM, N)
    s = jnp.sum(w, axis=-1, keepdims=True)                         # (BM, 1)
    wa = jnp.dot(w, a, preferred_element_type=jnp.float32)         # (BM, 3)
    scale = -2.0 / sigma
    dx_ref[0] = (scale * c * (s * x - wa)).astype(dx_ref.dtype)
    cw = w * c                                                     # (BM, N)
    cwx = jnp.dot(cw.T, x, preferred_element_type=jnp.float32)     # (N, 3)
    cw_sum = jnp.sum(cw, axis=0)[:, None]                          # (N, 1)
    da_ref[0] += (-scale * (cwx - cw_sum * a)).astype(da_ref.dtype)


def _pad_m(x, m):
    pad = [(0, 0), (0, m - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def softmin_field_sums(x, a, a_mask, sigma, interpret=False):
    """S (B, M) = sum_n a_mask_n exp(-||x_m - a_n||^2 / sigma)."""
    s, _ = _fwd(x, a, a_mask, sigma, interpret)
    return s


def _fwd(x, a, a_mask, sigma, interpret):
    B, M, _ = x.shape
    N = a.shape[1]
    Mp = pl.cdiv(M, BLOCK_M) * BLOCK_M
    xp = _pad_m(x, Mp)
    grid = (B, Mp // BLOCK_M)
    s = pl.pallas_call(
        functools.partial(_fwd_kernel, sigma=float(sigma)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_M, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_M, 1), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Mp, 1), jnp.float32),
        interpret=interpret,
    )(xp, a, a_mask[..., None])
    return s[:, :M, 0], (xp, a, a_mask, M)


def _vjp_fwd(x, a, a_mask, sigma, interpret):
    s, res = _fwd(x, a, a_mask, sigma, interpret)
    return s, res


def _vjp_bwd(sigma, interpret, res, g):
    xp, a, a_mask, M = res
    B, Mp, _ = xp.shape
    N = a.shape[1]
    gp = _pad_m(g[:, :, None], Mp)
    grid = (B, Mp // BLOCK_M)
    dx, da = pl.pallas_call(
        functools.partial(_bwd_kernel, sigma=float(sigma)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_M, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, BLOCK_M, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_M, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, 3), xp.dtype),
            jax.ShapeDtypeStruct((B, N, 3), a.dtype),
        ],
        interpret=interpret,
    )(xp, a, a_mask[..., None], gp)
    return dx[:, :M], da, jnp.zeros_like(a_mask)


softmin_field_sums.defvjp(_vjp_fwd, _vjp_bwd)


def body_intersection_loss_fused(
    lig, lig_mask, rec, rec_mask, sigma: float, surface_ct: float,
    interpret: bool = False,
):
    """Drop-in fused replacement for `ops.intersection.body_intersection_loss`."""
    def one_direction(queries, q_mask, prot, p_mask):
        s = softmin_field_sums(queries, prot, p_mask, float(sigma), interpret)
        G = -sigma * jnp.log(1e-3 + s)
        pen = jnp.maximum(surface_ct - G, 0.0)
        return jnp.sum(pen * q_mask, axis=1) / jnp.maximum(
            jnp.sum(q_mask, axis=1), 1.0)

    return (one_direction(lig, lig_mask, rec, rec_mask)
            + one_direction(rec, rec_mask, lig, lig_mask))
