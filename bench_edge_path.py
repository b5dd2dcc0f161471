"""Speed-of-light accounting for the IEGMN edge-message path (PERF.md).

The reference's hot loop is the per-edge message MLP + segment-mean
aggregation (`rigid_docking_model.py:226-283`, DGL SDDMM/SpMM). This harness
times each op of our padded-neighbor-table replacement in isolation and
reports achieved TFLOP/s and HBM GB/s against v5e peaks (197 TFLOP/s bf16,
~98 TFLOP/s f32 MXU, ~820 GB/s HBM), so PERF.md can state how far each op
sits from speed-of-light and WHICH wall (compute vs bandwidth) it faces.

    python bench_edge_path.py                   # on TPU
    JAX_PLATFORMS=cpu python bench_edge_path.py # functional check only

Env: BENCH_N=256,1024,2048 (comma list), BENCH_B, BENCH_K.
"""

import functools
import json
import os
import time

import numpy as np

F32 = 4  # bytes

PEAK_F32 = 98e12     # v5e MXU f32 TFLOP/s (see bench_kernels.py)
PEAK_HBM = 820e9     # v5e HBM bytes/s


def chain_time(step, state, iters=50):
    """Device time per op via ITERS chained applications inside ONE jitted
    fori_loop. Each step feeds its full output back into its input at full
    magnitude, so XLA's loop-invariant code motion cannot hoist or elide any
    iteration, and the ~1 ms/dispatch tunnel overhead (which dwarfs every op
    here when timed with a Python loop) is amortized to noise."""
    import jax

    @jax.jit
    def run(s):
        return jax.lax.fori_loop(0, iters, lambda i, t: step(t), s)

    jax.block_until_ready(run(state))          # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(state))
    return (time.perf_counter() - t0) / iters


def row(name, t, flops, bytes_):
    ach_f = flops / t
    ach_b = bytes_ / t
    # which wall: time lower bound from each resource
    t_flops = flops / PEAK_F32
    t_hbm = bytes_ / PEAK_HBM
    bound = "HBM" if t_hbm > t_flops else "MXU"
    sol = max(t_flops, t_hbm)  # speed-of-light time
    return {
        "op": name, "ms": round(t * 1e3, 3),
        "gflops": round(flops / 1e9, 2), "gbytes": round(bytes_ / 1e9, 3),
        "tflops_s": round(ach_f / 1e12, 2), "gb_s": round(ach_b / 1e9, 1),
        "bound": bound, "sol_ms": round(sol * 1e3, 3),
        "pct_of_sol": round(100 * sol / t, 1),
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from utils import synth_protein

    from equidock_public_tpu.config import ModelConfig
    from equidock_public_tpu.models.iegmn import (_edge_mlp_factored, _mlp2,
                                                  _rbf_of_sq_dist,
                                                  init_iegmn_layer)
    from equidock_public_tpu.ops.kabsch import rigid_fit
    from equidock_public_tpu.ops.pallas.edge_message import (
        edge_message_aggregate)
    from equidock_public_tpu.ops.segment import (gather_neighbors,
                                                 masked_mean_over_k)

    interpret = jax.default_backend() == "cpu"
    B = int(os.environ.get("BENCH_B", "10"))
    K = int(os.environ.get("BENCH_K", "10"))
    D, E, R, H = 64, 27, 15, 50
    Ns = [int(x) for x in os.environ.get("BENCH_N", "256,1024,2048").split(",")]

    cfg = ModelConfig()
    cfgF = ModelConfig(factored_edge_mlp=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    p = init_iegmn_layer(key, cfg, D, D, D, fine_tune=False)

    rows = []
    for N in Ns:
        side = synth_protein(rng, B, N, K, N)
        h = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
        Egs = B * N * K  # edge slots per side

        # 1) concat edge MLP: gather h_src (+bcast h_dst), concat(2D+E+R),
        #    lin1 -> LN -> lin2
        def concat_path(x, h, he):
            x_src = gather_neighbors(x, side.nbr)
            x_rel = x_src - x[:, :, None, :]
            rbf = _rbf_of_sq_dist(x_rel, True)
            h_src = gather_neighbors(h, side.nbr)
            h_dst = jnp.broadcast_to(h[:, :, None, :], h_src.shape)
            msg_in = jnp.concatenate([h_src, h_dst, he, rbf], axis=-1)
            return _mlp2(p["edge_mlp"], msg_in, cfg, "LN", None, False,
                         None, "", side.nbr_mask[..., None])

        def msg_feedback(path):
            """(x, h) -> (x, h) with full-magnitude dependency on every
            element of the per-edge msg tensor (max over K is cheap next to
            the MLP matmuls but touches everything)."""
            def step(s):
                x, hh = s
                msg = path(x, hh, side.edge_feat)
                return (x + 1e-3 * jnp.max(msg[..., :3], axis=2),
                        jnp.max(msg, axis=2))
            return step

        t = chain_time(msg_feedback(concat_path), (side.x, h))
        flops = Egs * 2 * ((2 * D + E + R) * D + D * D)
        bytes_ = (Egs * (2 * D + E + R) * F32          # concat intermediate w
                  + Egs * (2 * D + E + R) * F32        # ... and read
                  + 2 * Egs * D * F32                  # lin1 out w+r
                  + Egs * D * F32)                     # msg out
        rows.append({"N": N, **row("edge_mlp_concat_fwd", t, flops, bytes_)})

        # 2) factored edge MLP: per-node h@W (2 matmuls) + per-edge he/rbf
        #    matmuls + lin2
        def factored_path(x, h, he):
            x_src = gather_neighbors(x, side.nbr)
            x_rel = x_src - x[:, :, None, :]
            rbf = _rbf_of_sq_dist(x_rel, True)
            return _edge_mlp_factored(p["edge_mlp"], side, h, h, he, rbf,
                                      cfgF, None, False)

        t = chain_time(msg_feedback(factored_path), (side.x, h))
        flops = (2 * B * N * D * D * 2                 # node-level h@W halves
                 + Egs * 2 * (E + R) * D               # per-edge he/rbf matmuls
                 + Egs * 2 * D * D)                    # lin2
        bytes_ = (2 * B * N * D * F32                  # node projections out
                  + Egs * D * F32                      # gathered src proj
                  + Egs * (E + R) * F32                # he/rbf reads
                  + 2 * Egs * D * F32                  # lin2 in/out
                  + Egs * D * F32)
        rows.append({"N": N, **row("edge_mlp_factored_fwd", t, flops, bytes_)})

        # 3) fused Pallas kernel (gather+RBF+edge MLP+coors MLP+both means)
        ep, cp = p["edge_mlp"], p["coors_mlp"]
        W = ep["lin1"]["w"]
        mm = lambda a, w: jnp.einsum("...i,io->...o", a, w,
                                     preferred_element_type=jnp.float32)
        kparams = dict(
            Wc=W[2 * D:2 * D + E], Wd=W[2 * D + E:],
            ln_g=ep["ln"]["g"], ln_b=ep["ln"]["b"],
            W2=ep["lin2"]["w"], b2=ep["lin2"]["b"],
            W1c=cp["lin1"]["w"], b1c=cp["lin1"]["b"],
            W2c=cp["lin2"]["w"], b2c=cp["lin2"]["b"])

        def fused_path(x, h, he):
            src_arr = jnp.concatenate([x, mm(h, W[:D])], axis=-1)
            dst_arr = jnp.concatenate([x, mm(h, W[D:2 * D]) + ep["lin1"]["b"]],
                                      axis=-1)
            return edge_message_aggregate(src_arr, dst_arr, he, side.nbr,
                                          side.nbr_mask, kparams,
                                          interpret=interpret)

        def fused_step(s):
            x, hh = s
            aggr, xupd = fused_path(x, hh, side.edge_feat)
            return (x + 1e-3 * xupd, aggr)

        try:
            t = chain_time(fused_step, (side.x, h))
            flops = (2 * B * N * D * D * 2             # node projections
                     + Egs * 2 * (E + R) * D           # he/rbf matmuls
                     + Egs * 2 * D * D                 # lin2
                     + Egs * 2 * D * D + Egs * 2 * D)  # coors mlp
            bytes_ = (Egs * (3 + D) * F32              # XLA-gathered edge rows
                      + B * N * (3 + D) * F32          # dst arrays read
                      + Egs * E * F32                  # he read
                      + B * N * (D + 3) * F32)         # aggr + x_upd out
            rows.append({"N": N,
                         **row("edge_fused_pallas_fwd", t, flops, bytes_)})
        except Exception as e:  # one failing path must not kill the table
            rows.append({"N": N, "op": "edge_fused_pallas_fwd",
                         "error": str(e).split("\n")[0][:200]})

        # 4) segment mean alone ((B,N,K,D) -> (B,N,D)): pure HBM streaming.
        # The feedback add re-touches msg, so measured time is <= 2x the op
        # alone — %SoL here is a lower bound.
        msg = jnp.asarray(rng.standard_normal((B, N, K, D)).astype(np.float32))

        def segmean_step(m):
            aggr = masked_mean_over_k(m, side.nbr_mask)
            return m + 1e-3 * aggr[:, :, None, :]

        t = chain_time(segmean_step, msg, iters=200)
        flops = Egs * D
        bytes_ = Egs * D * F32 + B * N * D * F32
        rows.append({"N": N, **row("segment_mean", t, flops, bytes_)})

        # 5) coors path tail: msg -> coef (D->D->1) -> x_rel*coef -> mean
        x_rel = jnp.asarray(
            rng.standard_normal((B, N, K, 3)).astype(np.float32))

        def coors_tail(msg, x_rel):
            coef = _mlp2(p["coors_mlp"], msg, cfg, "0", None, False,
                         None, "", side.nbr_mask[..., None])
            return masked_mean_over_k(x_rel * coef, side.nbr_mask)

        def coors_step(m):
            xu = coors_tail(m, x_rel)
            return m + 1e-3 * xu[:, :, None, :1]

        t = chain_time(coors_step, msg, iters=200)
        flops = Egs * 2 * (D * D + D)
        bytes_ = Egs * D * F32 + Egs * 3 * F32 + B * N * 3 * F32
        rows.append({"N": N, **row("coors_mlp_tail_fwd", t, flops, bytes_)})

        # 6) keypoint head: 50-head attention pooling + batched 3x3 SVD
        #    (`rigid_docking_model.py:540-589`); the (B,N,D)@(D,H*D)
        #    projections dominate FLOPs
        Wk = jnp.asarray(rng.standard_normal((D, H * D)).astype(np.float32)
                         / np.sqrt(D))
        Wq = jnp.asarray(rng.standard_normal((D, H * D)).astype(np.float32)
                         / np.sqrt(D))

        def keypoint_head(h_l, h_r, x_l, x_r):
            def keypts(h_side, mean_other, x_side, mask):
                keys = (h_side @ Wk).reshape(B, -1, H, D)
                query = (mean_other @ Wq).reshape(B, H, D)
                logits = jnp.einsum("bnhd,bhd->bhn", keys, query) / np.sqrt(D)
                logits = jnp.where(mask[:, None, :] > 0, logits, -1e9)
                att = jax.nn.softmax(logits, axis=-1)
                return jnp.einsum("bhn,bnd->bhd", att, x_side)

            mean_l = h_l.mean(axis=1)
            mean_r = h_r.mean(axis=1)
            yl = keypts(h_l, mean_r, x_l, side.node_mask)
            yr = keypts(h_r, mean_l, x_r, side.node_mask)
            R_, t_ = rigid_fit(yl, yr)
            return R_, t_

        h2 = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

        def keyhead_step(s):
            hl, hr = s
            R_, t_ = keypoint_head(hl, hr, side.x, side.x)
            return (hl + 1e-3 * t_[:, :, :1], hr + 1e-3 * R_[:, :1, :1])

        t = chain_time(keyhead_step, (h, h2), iters=30)
        flops = (2 * 2 * B * N * D * H * D             # two key projections
                 + 2 * 2 * B * H * D * D               # two query projections
                 + 2 * 2 * B * N * H * D               # logits
                 + 2 * 2 * B * H * N * 3)              # pooling
        bytes_ = (2 * B * N * D * F32 + 2 * D * H * D * F32
                  + 2 * B * N * H * D * F32)           # keys materialized
        rows.append({"N": N, **row("keypoint_head_fwd", t, flops, bytes_)})

        # 7) end-to-end fwd+bwd of the edge path (factored), the training
        #    gradient cost of (1)+(5)
        def loss_factored(x, h, he):
            x_src = gather_neighbors(x, side.nbr)
            x_rel = x_src - x[:, :, None, :]
            rbf = _rbf_of_sq_dist(x_rel, True)
            msg = _edge_mlp_factored(p["edge_mlp"], side, h, h, he, rbf,
                                     cfgF, None, False)
            aggr = masked_mean_over_k(msg, side.nbr_mask)
            coef = _mlp2(p["coors_mlp"], msg, cfg, "0", None, False,
                         None, "", side.nbr_mask[..., None])
            xu = masked_mean_over_k(x_rel * coef, side.nbr_mask)
            return jnp.sum(aggr ** 2) + jnp.sum(xu ** 2)

        gradf = jax.grad(loss_factored, argnums=(0, 1))

        def fwdbwd_step(s):
            x, hh = s
            gx, gh = gradf(x, hh, side.edge_feat)
            return (x + 1e-4 * gx, hh + 1e-4 * gh)

        t = chain_time(fwdbwd_step, (side.x, h), iters=30)
        fwd_flops = (2 * B * N * D * D * 2 + Egs * 2 * (E + R) * D
                     + Egs * 2 * D * D + Egs * 2 * (D * D + D))
        rows.append({"N": N, **row("edge_path_factored_fwd_bwd", t,
                                   3 * fwd_flops, 3 * Egs * D * F32 * 3)})

        # 8) fwd+bwd through the fused kernel pair (Pallas fwd + Pallas bwd):
        #    the gradient cost of (3) with the VMEM-recompute backward
        def loss_fused(x, h, he, fused_bwd=True):
            src_arr = jnp.concatenate([x, mm(h, W[:D])], axis=-1)
            dst_arr = jnp.concatenate([x, mm(h, W[D:2 * D]) + ep["lin1"]["b"]],
                                      axis=-1)
            aggr, xu = edge_message_aggregate(
                src_arr, dst_arr, he, side.nbr, side.nbr_mask, kparams,
                interpret=interpret, fused_bwd=fused_bwd)
            return jnp.sum(aggr ** 2) + jnp.sum(xu ** 2)

        for lbl, fb in (("edge_path_fused_fwd_xla_bwd", False),
                        ("edge_path_fused_fwd_bwd", True)):
            gradfb = jax.grad(functools.partial(loss_fused, fused_bwd=fb),
                              argnums=(0, 1))

            def fusedbwd_step(s):
                x, hh = s
                gx, gh = gradfb(x, hh, side.edge_feat)
                return (x + 1e-4 * gx, hh + 1e-4 * gh)

            try:
                t = chain_time(fusedbwd_step, (side.x, h), iters=30)
                rows.append({"N": N, **row(lbl, t, 3 * fwd_flops,
                                           3 * Egs * D * F32 * 3)})
            except Exception as e:
                rows.append({"N": N, "op": lbl,
                             "error": str(e).split("\n")[0][:200]})

    print(json.dumps({"backend": jax.default_backend(),
                      "B": B, "K": K, "D": D, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
