"""Fused edge-message + segment-mean Pallas kernel (SURVEY §7.1 item 3).

The reference hot loop (`rigid_docking_model.py:226-283`) per layer and side:
    x_rel = x_src - x_dst                     (per edge)
    rbf   = exp(-||x_rel||^2 / sigma_k)       (15 per edge)
    msg   = edge_mlp([h_src | h_dst | he | rbf])
    coef  = coors_mlp(msg)
    aggr_msg = mean_k(msg);  x_upd = mean_k(x_rel * coef)

The XLA factored path (models/iegmn.py::_edge_mlp_factored) already avoids
the concat, but still materializes the (B, N, K, D) pre-activation, msg and
coef tensors in HBM between fusions. This kernel keeps ALL per-edge tensors in
VMEM: inputs are the per-NODE arrays (x, h@W_src, h@W_dst + b — two (N,D)x(D,D)
matmuls done outside, which is the factored trick) plus the static per-edge
features; per node-block it gathers source rows, builds the RBF, runs both
MLPs on the MXU and reduces over K — only the (B, N, D) aggregate and
(B, N, 3) coordinate update ever touch HBM.

The gather source array is an explicit input, so the halo path can pass its
[local | halo] buffer — this kernel is the "local aggregation" half of the
exchange/compute overlap design (PERF.md).

Backward: custom VJP that recomputes through the XLA reference expression
(one extra fwd); the fused win is forward-path HBM traffic (and inference).

Covers the paper-model config: layer_norm='LN' | '0' inside the edge MLP,
layer_norm_coors='0', dropout=0.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RBF_SIGMAS = tuple(1.5 ** x for x in range(15))  # rigid_docking_model.py:116
BLOCK_T = 128           # destination nodes per grid step


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _kernel(src_ref, dst_ref, he_ref, nbr_ref, msk_ref,
            Wc_ref, Wd_ref, lng_ref, lnb_ref, W2_ref, b2_ref,
            W1c_ref, b1c_ref, W2c_ref, b2c_ref,
            aggr_ref, xupd_ref, *, K, slope, use_ln, use_dist):
    T = dst_ref.shape[1]
    src = src_ref[0]                       # (Nsrc, 3+D) gather source
    dst = dst_ref[0]                       # (T, 3+D): [x | h@W_dst + b1]
    he = he_ref[0]                         # (T*K, E)
    idx = nbr_ref[0][:, 0]                 # (T*K,) int32 source rows
    msk = msk_ref[0]                       # (T*K, 1)

    # THE gather: Mosaic lowers lax.gather only in take_along_axis form
    # (indices.shape == operand.shape + (1,), gather along dim 0, batched
    # over dim 1 -> tpu.dynamic_gather). Pad rows of both operand and
    # indices to a common G, broadcast the row index across columns, and
    # slice the (T*K, C) result back out.
    C = dst.shape[-1]
    TK = idx.shape[0]
    G = max(src.shape[0], TK)
    src_g = src if src.shape[0] == G else jnp.concatenate(
        [src, jnp.zeros((G - src.shape[0], C), src.dtype)], axis=0)
    idx_g = idx if TK == G else jnp.concatenate(
        [idx, jnp.zeros((G - TK,), idx.dtype)], axis=0)
    gath = jnp.take_along_axis(
        src_g, jnp.broadcast_to(idx_g[:, None], (G, C)), axis=0,
        mode="promise_in_bounds")[:TK]     # (T*K, 3+D)
    # row t*K+k = dst row t (pltpu.repeat would TILE, not repeat per row)
    dstr = jnp.broadcast_to(dst[:, None, :], (T, K, C)).reshape(T * K, C)

    x_rel = gath[:, :3] - dstr[:, :3]
    d2 = jnp.sum(x_rel * x_rel, axis=-1, keepdims=True)
    # sigmas as python scalars (array constants can't be captured in-kernel)
    rbf = jnp.concatenate([jnp.exp(d2 * (-1.0 / s)) for s in RBF_SIGMAS],
                          axis=-1)         # (T*K, 15)
    if not use_dist:
        rbf = rbf * 0.0

    pre = (gath[:, 3:] + dstr[:, 3:]
           + jnp.dot(he, Wc_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(rbf, Wd_ref[:], preferred_element_type=jnp.float32))
    act = _leaky(pre, slope)
    if use_ln:
        mean = jnp.mean(act, axis=-1, keepdims=True)
        var = jnp.mean((act - mean) ** 2, axis=-1, keepdims=True)
        act = (act - mean) * jax.lax.rsqrt(var + 1e-5) * lng_ref[0] + lnb_ref[0]
    msg = jnp.dot(act, W2_ref[:], preferred_element_type=jnp.float32) + b2_ref[0]

    c1 = _leaky(jnp.dot(msg, W1c_ref[:],
                        preferred_element_type=jnp.float32) + b1c_ref[0], slope)
    coef = jnp.dot(c1, W2c_ref[:],
                   preferred_element_type=jnp.float32) + b2c_ref[0]  # (T*K, 1)

    D = msg.shape[-1]
    cnt = jnp.maximum(jnp.sum(msk.reshape(T, K), axis=1, keepdims=True), 1.0)
    aggr = jnp.sum((msg * msk).reshape(T, K, D), axis=1) / cnt
    xmom = x_rel * coef * msk
    xupd = jnp.sum(xmom.reshape(T, K, 3), axis=1) / cnt

    aggr_ref[0] = aggr.astype(aggr_ref.dtype)
    xupd_ref[0] = xupd.astype(xupd_ref.dtype)


def _reference(src, dst, he, nbr, msk, params, slope, use_ln, use_dist):
    """Pure-XLA expression of the same function (bwd path + parity tests)."""
    B, N, K = nbr.shape
    gath = jnp.take_along_axis(
        src, nbr.reshape(B, N * K)[..., None], axis=1).reshape(B, N, K, -1)
    dstr = dst[:, :, None, :]
    x_rel = gath[..., :3] - dstr[..., :3]
    d2 = jnp.sum(x_rel * x_rel, axis=-1, keepdims=True)
    rbf = jnp.exp(-d2 / jnp.asarray(RBF_SIGMAS, d2.dtype))
    if not use_dist:
        rbf = rbf * 0.0
    pre = (gath[..., 3:] + dstr[..., 3:]
           + jnp.einsum("bnke,ed->bnkd", he, params["Wc"])
           + jnp.einsum("bnks,sd->bnkd", rbf, params["Wd"]))
    act = jnp.where(pre >= 0, pre, pre * slope)
    if use_ln:
        mean = jnp.mean(act, axis=-1, keepdims=True)
        var = jnp.mean((act - mean) ** 2, axis=-1, keepdims=True)
        act = (act - mean) * jax.lax.rsqrt(var + 1e-5) * params["ln_g"] \
            + params["ln_b"]
    msg = jnp.einsum("bnkd,do->bnko", act, params["W2"]) + params["b2"]
    c1 = jnp.einsum("bnkd,do->bnko", msg, params["W1c"]) + params["b1c"]
    c1 = jnp.where(c1 >= 0, c1, c1 * slope)
    coef = jnp.einsum("bnkd,do->bnko", c1, params["W2c"]) + params["b2c"]
    w = msk[..., None]
    cnt = jnp.maximum(jnp.sum(msk, axis=-1), 1.0)[..., None]
    aggr = jnp.sum(msg * w, axis=2) / cnt
    xupd = jnp.sum(x_rel * coef * w, axis=2) / cnt
    return aggr, xupd


def _fused_call(src, dst, he, nbr, msk, params, slope, use_ln, use_dist,
                interpret):
    B, N, C = dst.shape
    K = nbr.shape[2]
    D = params["W2"].shape[0]
    E = he.shape[-1]
    T = BLOCK_T
    while N % T:                # buckets that aren't BLOCK_T multiples
        T //= 2
    assert T >= 8, (N, BLOCK_T)
    Nsrc = src.shape[1]

    he2 = he.reshape(B, N * K, E)
    nbr2 = nbr.reshape(B, N * K, 1)
    msk2 = msk.reshape(B, N * K, 1)

    const = pl.BlockSpec(
        params["Wc"].shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM)

    def cspec(p):
        return pl.BlockSpec(p.shape, lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)

    row = lambda p: p.reshape(1, -1)
    Wc, Wd = params["Wc"], params["Wd"]
    lng, lnb = row(params["ln_g"]), row(params["ln_b"])
    W2, b2 = params["W2"], row(params["b2"])
    W1c, b1c = params["W1c"], row(params["b1c"])
    W2c, b2c = params["W2c"], row(params["b2c"])

    kern = functools.partial(_kernel, K=K, slope=slope, use_ln=use_ln,
                             use_dist=use_dist)
    aggr, xupd = pl.pallas_call(
        kern,
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, Nsrc, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, E), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, 1), lambda b, i: (b, i, 0)),
            cspec(Wc), cspec(Wd), cspec(lng), cspec(lnb),
            cspec(W2), cspec(b2), cspec(W1c), cspec(b1c),
            cspec(W2c), cspec(b2c),
        ],
        out_specs=[
            pl.BlockSpec((1, T, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, 3), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        ],
        interpret=interpret,
    )(src, dst, he2, nbr2, msk2, Wc, Wd, lng, lnb, W2, b2, W1c, b1c, W2c, b2c)
    return aggr, xupd


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def edge_message_aggregate(src, dst, he, nbr, msk, params,
                           slope=0.01, use_ln=True, use_dist=True,
                           interpret=False):
    """Fused edge messages + means for one protein side.

    src (B, Nsrc, 3+D): [x | h @ W_src] gather source (Nsrc may exceed the
        destination count in the halo layout);
    dst (B, N, 3+D):  [x | h @ W_dst + b1] destination rows;
    he  (B, N, K, E) static edge features (pre-multiplied by the gmn gate);
    nbr (B, N, K) int32 source indices into src; msk (B, N, K) edge mask;
    params: dict with Wc (E,D), Wd (15,D), ln_g/ln_b (D,), W2 (D,D), b2 (D,),
        W1c (D,D), b1c (D,), W2c (D,1), b2c (1,).
    Returns (aggr_msg (B, N, D), x_upd (B, N, 3))."""
    return _fused_call(src, dst, he, nbr, msk, params, slope, use_ln,
                       use_dist, interpret)


def _vjp_fwd(src, dst, he, nbr, msk, params, slope, use_ln, use_dist,
             interpret):
    out = _fused_call(src, dst, he, nbr, msk, params, slope, use_ln,
                      use_dist, interpret)
    return out, (src, dst, he, nbr, msk, params)


def _vjp_bwd(slope, use_ln, use_dist, interpret, res, g):
    import numpy as np

    src, dst, he, nbr, msk, params = res

    def f(src, dst, he, msk, params):
        return _reference(src, dst, he, nbr, msk, params, slope, use_ln,
                          use_dist)

    _, vjp = jax.vjp(f, src, dst, he, msk, params)
    dsrc, ddst, dhe, dmsk, dparams = vjp(g)
    dnbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return dsrc, ddst, dhe, dnbr, dmsk, dparams


edge_message_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
