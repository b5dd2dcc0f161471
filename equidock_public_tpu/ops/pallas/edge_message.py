"""Fused edge-message + segment-mean Pallas kernel (SURVEY §7.1 item 3).

The reference hot loop (`rigid_docking_model.py:226-283`) per layer and side:
    x_rel = x_src - x_dst                     (per edge)
    rbf   = exp(-||x_rel||^2 / sigma_k)       (15 per edge)
    msg   = edge_mlp([h_src | h_dst | he | rbf])
    coef  = coors_mlp(msg)
    aggr_msg = mean_k(msg);  x_upd = mean_k(x_rel * coef)

The XLA factored path (models/iegmn.py::_edge_mlp_factored) already avoids
the concat, but still materializes the (B, N, K, D) pre-activation, msg, c1
and coef tensors in HBM between the per-edge matmuls. This kernel keeps all
of those in VMEM: the neighbor gather itself runs OUTSIDE the kernel as a
plain XLA gather (Mosaic's tpu.dynamic_gather cannot cross vregs along the
gather dim, so an in-kernel gather from a (N, C) table is a dead end — the
first version of this kernel failed TPU compile exactly there); the kernel
consumes the pre-gathered per-edge rows and fuses RBF construction, the
two-layer edge MLP, LayerNorm, the coors MLP and both masked segment means.

TPU-shape tricks (all Mosaic-friendly: iota, compare, matmul — no reshape,
concat, gather or transpose inside the kernel):
  * dst-row broadcast to edges:   dstr = P @ dst,  P[j,t] = (t*K <= j < t*K+K)
  * segment mean over K:          aggr = (Q @ (msg*msk)) / max(Q @ msk, 1),
                                  Q = P^T built by a second iota (no transpose)
  * the 15 RBF sigmas:            1.5**(-lane_iota) instead of a captured
                                  constant vector / 15-way lane concat.
P and Q are 0/1 matrices built from 2D iota in-register; the expand/reduce
ride the MXU (tiny-K matmuls) instead of Mosaic relayouts.

The gather source is an explicit input, so the halo path can pass its
[local | halo] buffer — this kernel is the "local aggregation" half of the
exchange/compute overlap design (PERF.md).

Backward: two options behind `fused_bwd` —
  * False: custom VJP that recomputes through the XLA reference expression
    (one extra fwd). All the (B, N, K, D) intermediates round-trip HBM in
    both the recompute and the transposed pass.
  * True: a second Pallas kernel that recomputes the forward block in VMEM
    and produces every input/parameter cotangent in the same pass —
    per-edge tensors never touch HBM in the backward either. Parameter
    gradients are emitted as per-block partial sums (B, N/T, ...) and
    reduced by XLA outside (cheap: ~KBs per block). The mask and neighbor
    table are treated as non-differentiable (zero cotangent): they are
    {0,1}/int batch data, never trained — use fused_bwd=False if a mask
    cotangent is ever needed.

Covers the paper-model config: layer_norm='LN' | '0' inside the edge MLP,
layer_norm_coors='0', dropout=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RBF_SIGMAS = tuple(1.5 ** x for x in range(15))  # rigid_docking_model.py:116
N_RBF = len(RBF_SIGMAS)
import os as _os
BLOCK_T = int(_os.environ.get("EDGE_BLOCK_T", "64"))  # dst nodes / grid step


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _kernel(gx_ref, gh_ref, dx_ref, dh_ref, he_ref, msk_ref,
            Wc_ref, Wd_ref, lng_ref, lnb_ref, W2_ref, b2_ref,
            W1c_ref, b1c_ref, W2c_ref, b2c_ref,
            aggr_ref, xupd_ref, *, K, slope, use_ln, use_dist):
    T = dx_ref.shape[1]
    TK = gx_ref.shape[1]
    gx = gx_ref[0]                         # (T*K, 3) gathered source coords
    gh = gh_ref[0]                         # (T*K, D) gathered h@W_src
    dx = dx_ref[0]                         # (T, 3) destination coords
    dh = dh_ref[0]                         # (T, D) h@W_dst + b1
    he = he_ref[0]                         # (T*K, E) static edge feats
    msk = msk_ref[0]                       # (T*K, 1)

    # Expansion matrix P (TK, T): row j hits column j // K. Built with
    # multiply+compare (no integer division) so Mosaic lowers it in-register.
    jj = jax.lax.broadcasted_iota(jnp.int32, (TK, T), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (TK, T), 1)
    P = ((jj >= tt * K) & (jj < tt * K + K)).astype(jnp.float32)
    # Reduction matrix Q = P^T, built directly (in-kernel transpose relayouts).
    tt2 = jax.lax.broadcasted_iota(jnp.int32, (T, TK), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (T, TK), 1)
    Q = ((jj2 >= tt2 * K) & (jj2 < tt2 * K + K)).astype(jnp.float32)

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    # The P/Q expand/reduce matmuls are pure selection/summation — run them
    # at HIGHEST precision so the MXU's default bf16 passes don't round the
    # coordinates/messages they merely route (observed 6e-3 abs error at
    # default precision on v5e; exact at HIGHEST).
    sel = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    dxr = sel(P, dx)                       # (T*K, 3) dst coords per edge
    dhr = sel(P, dh)                       # (T*K, D)

    x_rel = gx - dxr
    d2 = jnp.sum(x_rel * x_rel, axis=-1, keepdims=True)
    # sigma_k = 1.5^k as a lane iota — avoids captured constants / lane concat
    kk = jax.lax.broadcasted_iota(jnp.int32, (TK, N_RBF), 1).astype(jnp.float32)
    inv_sigma = jnp.exp(kk * (-jnp.log(1.5)))
    rbf = jnp.exp(-d2 * inv_sigma)         # (T*K, 15)
    if not use_dist:
        rbf = rbf * 0.0

    pre = gh + dhr + dot(he, Wc_ref[:]) + dot(rbf, Wd_ref[:])
    act = _leaky(pre, slope)
    if use_ln:
        mean = jnp.mean(act, axis=-1, keepdims=True)
        var = jnp.mean((act - mean) ** 2, axis=-1, keepdims=True)
        act = (act - mean) * jax.lax.rsqrt(var + 1e-5) * lng_ref[0] + lnb_ref[0]
    msg = dot(act, W2_ref[:]) + b2_ref[0]  # (T*K, D)

    c1 = _leaky(dot(msg, W1c_ref[:]) + b1c_ref[0], slope)
    coef = dot(c1, W2c_ref[:]) + b2c_ref[0]            # (T*K, 1)

    cnt = jnp.maximum(sel(Q, msk), 1.0)                # (T, 1)
    aggr = sel(Q, msg * msk) / cnt                     # (T, D)
    xupd = sel(Q, x_rel * coef * msk) / cnt            # (T, 3)

    aggr_ref[0] = aggr.astype(aggr_ref.dtype)
    xupd_ref[0] = xupd.astype(xupd_ref.dtype)


def _bwd_kernel(gx_ref, gh_ref, dx_ref, dh_ref, he_ref, msk_ref,
                Wc_ref, Wd_ref, lng_ref, lnb_ref, W2_ref, b2_ref,
                W1c_ref, b1c_ref, W2c_ref, b2c_ref, ga_ref, gxu_ref,
                dgx_ref, dgh_ref, ddx_ref, ddh_ref, dhe_ref,
                dWc_ref, dWd_ref, dlng_ref, dlnb_ref, dW2_ref, db2_ref,
                dW1c_ref, db1c_ref, dW2c_ref, db2c_ref,
                *, K, slope, use_ln, use_dist):
    """Recompute the forward block in VMEM, then walk it backwards. Same
    Mosaic constraints as the forward kernel: iota-built P/Q selection
    matmuls instead of reshape/transpose; a^T b and a b^T expressed as
    dot_general contractions so no operand is materially transposed."""
    T = dx_ref.shape[1]
    TK = gx_ref.shape[1]
    gx, gh = gx_ref[0], gh_ref[0]
    dx, dh = dx_ref[0], dh_ref[0]
    he, msk = he_ref[0], msk_ref[0]
    ga, gxu = ga_ref[0], gxu_ref[0]

    jj = jax.lax.broadcasted_iota(jnp.int32, (TK, T), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (TK, T), 1)
    P = ((jj >= tt * K) & (jj < tt * K + K)).astype(jnp.float32)
    tt2 = jax.lax.broadcasted_iota(jnp.int32, (T, TK), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (T, TK), 1)
    Q = ((jj2 >= tt2 * K) & (jj2 < tt2 * K + K)).astype(jnp.float32)

    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    sel = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    # a^T b (contract rows) / a b^T (contract cols) without transposing
    atb = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    abt = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- forward recompute (mirrors _kernel) ----
    dxr = sel(P, dx)
    dhr = sel(P, dh)
    x_rel = gx - dxr
    d2 = jnp.sum(x_rel * x_rel, axis=-1, keepdims=True)
    kk = jax.lax.broadcasted_iota(jnp.int32, (TK, N_RBF), 1).astype(jnp.float32)
    inv_sigma = jnp.exp(kk * (-jnp.log(1.5)))
    rbf = jnp.exp(-d2 * inv_sigma)
    if not use_dist:
        rbf = rbf * 0.0
    pre = gh + dhr + dot(he, Wc_ref[:]) + dot(rbf, Wd_ref[:])
    act0 = _leaky(pre, slope)
    if use_ln:
        mean = jnp.mean(act0, axis=-1, keepdims=True)
        var = jnp.mean((act0 - mean) ** 2, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        nrm = (act0 - mean) * rstd
        act = nrm * lng_ref[0] + lnb_ref[0]
    else:
        act = act0
    msg = dot(act, W2_ref[:]) + b2_ref[0]
    c1p = dot(msg, W1c_ref[:]) + b1c_ref[0]
    c1 = _leaky(c1p, slope)
    coef = dot(c1, W2c_ref[:]) + b2c_ref[0]
    cnt = jnp.maximum(sel(Q, msk), 1.0)                 # (T, 1)

    # ---- backward ----
    gam = sel(P, ga / cnt) * msk                        # (TK, D) d msg (aggr)
    gxm = sel(P, gxu / cnt) * msk                       # (TK, 3) d (x_rel*coef)
    g_coef = jnp.sum(gxm * x_rel, axis=-1, keepdims=True)
    g_xrel = gxm * coef

    dW2c_ref[0, 0] = atb(c1, g_coef)
    db2c_ref[0, 0] = jnp.sum(g_coef, axis=0, keepdims=True)
    g_c1 = abt(g_coef, W2c_ref[:])                      # (TK, D)
    g_c1p = g_c1 * jnp.where(c1p >= 0, 1.0, slope)
    dW1c_ref[0, 0] = atb(msg, g_c1p)
    db1c_ref[0, 0] = jnp.sum(g_c1p, axis=0, keepdims=True)
    g_msg = gam + abt(g_c1p, W1c_ref[:])

    dW2_ref[0, 0] = atb(act, g_msg)
    db2_ref[0, 0] = jnp.sum(g_msg, axis=0, keepdims=True)
    g_act = abt(g_msg, W2_ref[:])

    if use_ln:
        dlng_ref[0, 0] = jnp.sum(g_act * nrm, axis=0, keepdims=True)
        dlnb_ref[0, 0] = jnp.sum(g_act, axis=0, keepdims=True)
        g_nrm = g_act * lng_ref[0]
        m1 = jnp.mean(g_nrm, axis=-1, keepdims=True)
        m2 = jnp.mean(g_nrm * nrm, axis=-1, keepdims=True)
        g_act0 = rstd * (g_nrm - m1 - nrm * m2)
    else:
        dlng_ref[0, 0] = jnp.zeros_like(dlng_ref[0, 0])
        dlnb_ref[0, 0] = jnp.zeros_like(dlnb_ref[0, 0])
        g_act0 = g_act
    g_pre = g_act0 * jnp.where(pre >= 0, 1.0, slope)

    dWc_ref[0, 0] = atb(he, g_pre)
    dWd_ref[0, 0] = atb(rbf, g_pre)
    dhe_ref[0] = abt(g_pre, Wc_ref[:]).astype(dhe_ref.dtype)
    dgh_ref[0] = g_pre.astype(dgh_ref.dtype)

    if use_dist:
        g_rbf = abt(g_pre, Wd_ref[:])                   # (TK, 15)
        g_d2 = jnp.sum(g_rbf * rbf * (-inv_sigma), axis=-1, keepdims=True)
        g_xrel = g_xrel + 2.0 * x_rel * g_d2
    dgx_ref[0] = g_xrel.astype(dgx_ref.dtype)
    ddx_ref[0] = (-sel(Q, g_xrel)).astype(ddx_ref.dtype)
    ddh_ref[0] = sel(Q, g_pre).astype(ddh_ref.dtype)


def _fused_bwd_call(src, dst, he, nbr, msk, params, g_aggr, g_xupd,
                    slope, use_ln, use_dist, interpret):
    """Run the fused backward kernel; returns (d_src, d_dst, d_he, d_params).
    The neighbor gather's transpose (scatter-add of per-edge cotangents back
    into src rows) runs in XLA outside the kernel, mirroring the forward."""
    B, N, C = dst.shape
    K = nbr.shape[2]
    D = params["W2"].shape[0]
    E = he.shape[-1]
    T = BLOCK_T
    while N % T:
        T //= 2
    assert T >= 8, (N, BLOCK_T)
    NB = N // T

    idx = nbr.reshape(B, N * K)[..., None]
    gather = lambda s: jnp.take_along_axis(s, idx, axis=1)
    gath, gather_vjp = jax.vjp(gather, src)
    gx, gh = gath[..., :3], gath[..., 3:]
    dx, dh = dst[..., :3], dst[..., 3:]
    he2 = he.reshape(B, N * K, E)
    msk2 = msk.reshape(B, N * K, 1).astype(jnp.float32)

    def cspec(p):
        return pl.BlockSpec(p.shape, lambda b, i: (0,) * p.ndim,
                            memory_space=pltpu.VMEM)

    def pgrad(r, c):
        """Per-block parameter-gradient partial: (B, NB, r, c)."""
        return (pl.BlockSpec((1, 1, r, c), lambda b, i: (b, i, 0, 0)),
                jax.ShapeDtypeStruct((B, NB, r, c), jnp.float32))

    row = lambda p: p.reshape(1, -1)
    Wc, Wd = params["Wc"], params["Wd"]
    lng, lnb = row(params["ln_g"]), row(params["ln_b"])
    W2, b2 = params["W2"], row(params["b2"])
    W1c, b1c = params["W1c"], row(params["b1c"])
    W2c, b2c = params["W2c"], row(params["b2c"])

    pspecs, pshapes = zip(pgrad(E, D), pgrad(N_RBF, D), pgrad(1, D),
                          pgrad(1, D), pgrad(D, D), pgrad(1, D),
                          pgrad(D, D), pgrad(1, D), pgrad(D, 1), pgrad(1, 1))

    kern = functools.partial(_bwd_kernel, K=K, slope=slope, use_ln=use_ln,
                             use_dist=use_dist)
    outs = pl.pallas_call(
        kern,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, T * K, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, E), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, 1), lambda b, i: (b, i, 0)),
            cspec(Wc), cspec(Wd), cspec(lng), cspec(lnb),
            cspec(W2), cspec(b2), cspec(W1c), cspec(b1c),
            cspec(W2c), cspec(b2c),
            pl.BlockSpec((1, T, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, 3), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T * K, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, E), lambda b, i: (b, i, 0)),
            *pspecs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N * K, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N * K, C - 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C - 3), jnp.float32),
            jax.ShapeDtypeStruct((B, N * K, E), jnp.float32),
            *pshapes,
        ],
        interpret=interpret,
    )(gx, gh, dx, dh, he2, msk2, Wc, Wd, lng, lnb, W2, b2, W1c, b1c,
      W2c, b2c, g_aggr, g_xupd)

    (dgx, dgh, ddx, ddh, dhe,
     pWc, pWd, plng, plnb, pW2, pb2, pW1c, pb1c, pW2c, pb2c) = outs

    (d_src,) = gather_vjp(jnp.concatenate([dgx, dgh], axis=-1))
    d_dst = jnp.concatenate([ddx, ddh], axis=-1)
    d_he = dhe.reshape(he.shape)
    psum = lambda p: jnp.sum(p, axis=(0, 1))
    d_params = dict(
        Wc=psum(pWc), Wd=psum(pWd),
        ln_g=psum(plng).reshape(params["ln_g"].shape),
        ln_b=psum(plnb).reshape(params["ln_b"].shape),
        W2=psum(pW2), b2=psum(pb2).reshape(params["b2"].shape),
        W1c=psum(pW1c), b1c=psum(pb1c).reshape(params["b1c"].shape),
        W2c=psum(pW2c), b2c=psum(pb2c).reshape(params["b2c"].shape))
    return d_src, d_dst, d_he, d_params


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

    # The neighbor gather runs in XLA (HBM-native); the kernel fuses
    # everything downstream of it.
    gath = jnp.take_along_axis(
        src, nbr.reshape(B, N * K)[..., None], axis=1)     # (B, N*K, C)
    gx, gh = gath[..., :3], gath[..., 3:]
    dx, dh = dst[..., :3], dst[..., 3:]
    he2 = he.reshape(B, N * K, E)
    msk2 = msk.reshape(B, N * K, 1).astype(jnp.float32)

    def cspec(p):
        return pl.BlockSpec(p.shape, lambda b, i: (0,) * p.ndim,
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
            pl.BlockSpec((1, T * K, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, C - 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T * K, E), lambda b, i: (b, i, 0)),
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
    )(gx, gh, dx, dh, he2, msk2, Wc, Wd, lng, lnb, W2, b2, W1c, b1c, W2c, b2c)
    return aggr, xupd


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def edge_message_aggregate(src, dst, he, nbr, msk, params,
                           slope=0.01, use_ln=True, use_dist=True,
                           interpret=False, fused_bwd=False):
    """Fused edge messages + means for one protein side.

    src (B, Nsrc, 3+D): [x | h @ W_src] gather source (Nsrc may exceed the
        destination count in the halo layout);
    dst (B, N, 3+D):  [x | h @ W_dst + b1] destination rows;
    he  (B, N, K, E) static edge features (pre-multiplied by the gmn gate);
    nbr (B, N, K) int32 source indices into src; msk (B, N, K) edge mask;
    params: dict with Wc (E,D), Wd (15,D), ln_g/ln_b (D,), W2 (D,D), b2 (D,),
        W1c (D,D), b1c (D,), W2c (D,1), b2c (1,).
    fused_bwd: True routes the backward through the fused Pallas kernel
        (VMEM recompute, zero msk cotangent); False recomputes through XLA.
    Returns (aggr_msg (B, N, D), x_upd (B, N, 3))."""
    return _fused_call(src, dst, he, nbr, msk, params, slope, use_ln,
                       use_dist, interpret)


def _vjp_fwd(src, dst, he, nbr, msk, params, slope, use_ln, use_dist,
             interpret, fused_bwd):
    out = _fused_call(src, dst, he, nbr, msk, params, slope, use_ln,
                      use_dist, interpret)
    return out, (src, dst, he, nbr, msk, params)


def _vjp_bwd(slope, use_ln, use_dist, interpret, fused_bwd, res, g):
    import numpy as np

    src, dst, he, nbr, msk, params = res
    dnbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)

    if fused_bwd:
        dsrc, ddst, dhe, dparams = _fused_bwd_call(
            src, dst, he, nbr, msk, params, g[0], g[1], slope, use_ln,
            use_dist, interpret)
        return dsrc, ddst, dhe, dnbr, jnp.zeros_like(msk), dparams

    def f(src, dst, he, msk, params):
        return _reference(src, dst, he, nbr, msk, params, slope, use_ln,
                          use_dist)

    _, vjp = jax.vjp(f, src, dst, he, msk, params)
    dsrc, ddst, dhe, dmsk, dparams = vjp(g)
    return dsrc, ddst, dhe, dnbr, dmsk, dparams


edge_message_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
