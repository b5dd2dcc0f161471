"""Kernel micro-benchmarks on the current backend: fused Pallas kernels vs
XLA compositions, with roofline context for v5e (~197 TFLOP/s bf16,
~98 TFLOP/s f32 MXU, ~820 GB/s HBM).

    python bench_kernels.py            # on TPU (slow first compile)
    JAX_PLATFORMS=cpu python bench_kernels.py   # functional check only
"""

import json
import os
import time

import numpy as np


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def edge_sol():
    """Speed-of-light table for the fused edge-message kernel (VERDICT r3
    item 6): exact FLOP/byte accounting vs MEASURED chip ceilings.

    Ceilings are self-calibrated on the current backend instead of trusting
    datasheet constants: a 4096^3 f32 matmul (MXU), a chained FMA loop on a
    64M-element array (VPU), and a 512 MB copy (HBM BW). The kernel is timed
    chained-into-itself inside one jitted fori_loop (a Python-loop dispatch
    through the tunnel costs ~1 ms — more than the op itself).

    Counts per side call (B, N, K, D, E=27), per edge:
      MXU: he@Wc 2ED + rbf@Wd 2*15*D + act@W2 2D^2 + act@W1c 2D^2 + @W2c 2D
      VPU: x_rel+d2 ~9, rbf exp 15 (counted 8 flops/exp), pre-sum 3D,
           leaky 2D, LN 8D, biases/coef 4D, masked-mean + x_upd ~2D+10
      HBM (min traffic): src+dst rows (3+D)*4 each, he K*E*4, nbr+msk K*8,
           outputs (D+3)*4.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from equidock_public_tpu.ops.pallas.edge_message import (
        edge_message_aggregate)

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    # --- measured ceilings -------------------------------------------------
    def chain_time(f, x, iters):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, iters, lambda _, v: f(v), x)

        jax.block_until_ready(run(x))
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        return (time.perf_counter() - t0) / iters

    mm = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
    t = chain_time(lambda a: (a @ mm) * 1e-3, mm, 20)
    mxu_peak = 2 * 4096 ** 3 / t
    # VPU: a 128-deep dependent FMA chain on an 8 MB array — arithmetic
    # intensity 64 flop/byte, far above the HBM roof, so the fused kernel is
    # VPU-compute-bound (a single FMA over a huge array would measure HBM
    # bandwidth instead — the first version of this calibration did exactly
    # that and produced >100% "VPU" rows)
    # the chain must be non-affine or XLA folds it to one op (v*a+b chains
    # collapse algebraically — both earlier calibrations hit that)
    K_FMA = 128
    small = jnp.full((2 * 1024 * 1024,), 0.1, jnp.float32)

    def fma_chain(v):
        for _ in range(K_FMA):
            v = v * v - 0.5 * v      # bounded, non-foldable; 3 flops/elt
        return v

    t = chain_time(fma_chain, small, 20)
    vpu_peak = 3 * K_FMA * small.size / t
    half = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    t = chain_time(lambda v: v + 1.0, half, 20)   # read+write = 512 MB
    hbm_peak = 2 * 4 * half.size / t
    import sys

    print(f"measured ceilings: MXU {mxu_peak/1e12:.1f} TF/s f32, "
          f"VPU {vpu_peak/1e12:.2f} TF/s (dependent-chain, conservative), "
          f"HBM {hbm_peak/1e9:.0f} GB/s", file=sys.stderr)

    B, K, D, E = 10, 10, 64, 27
    rows = []
    for N in (256, 1024, 2048):
        src = jnp.asarray(
            rng.standard_normal((B, N, 3 + D)).astype(np.float32))
        dst = jnp.asarray(
            rng.standard_normal((B, N, 3 + D)).astype(np.float32))
        he = jnp.asarray(
            rng.standard_normal((B, N, K, E)).astype(np.float32))
        nbr = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
        msk = jnp.ones((B, N, K), jnp.float32)
        params = {k: jnp.asarray(v) for k, v in dict(
            Wc=rng.standard_normal((E, D)).astype(np.float32) * 0.1,
            Wd=rng.standard_normal((15, D)).astype(np.float32) * 0.1,
            ln_g=np.ones(D, np.float32), ln_b=np.zeros(D, np.float32),
            W2=rng.standard_normal((D, D)).astype(np.float32) * 0.1,
            b2=np.zeros(D, np.float32),
            W1c=rng.standard_normal((D, D)).astype(np.float32) * 0.1,
            b1c=np.zeros(D, np.float32),
            W2c=rng.standard_normal((D, 1)).astype(np.float32) * 0.1,
            b2c=np.zeros(1, np.float32)).items()}

        def step(sd):
            s, d = sd
            a, x = edge_message_aggregate(s, d, he, nbr, msk, params,
                                          interpret=interpret)
            upd = jnp.concatenate([x, a], axis=-1) * 1e-4
            return (s + upd, d - upd)

        t = chain_time(step, (src, dst), 10 if interpret else 50)

        edges = B * N * K
        mxu_f = edges * 2 * D * (E + 15 + 2 * D + 1)
        vpu_f = edges * (9 + 15 * 8 + 17 * D + 10)
        bytes_ = B * N * (2 * (3 + D) * 4 + K * E * 4 + K * 8 + (D + 3) * 4)
        sol = {"MXU": mxu_f / mxu_peak, "VPU": vpu_f / vpu_peak,
               "HBM": bytes_ / hbm_peak}
        bind = max(sol, key=sol.get)
        rows.append({
            "N": N, "ms": round(t * 1e3, 3),
            "mxu_pct": round(100 * mxu_f / mxu_peak / t, 1),
            "vpu_pct": round(100 * vpu_f / vpu_peak / t, 1),
            "hbm_pct": round(100 * bytes_ / hbm_peak / t, 1),
            "bound": bind,
            "sol_ms": round(sol[bind] * 1e3, 4),
            "pct_sol": round(100 * sol[bind] / t, 1),
            "gb": round(bytes_ / 1e9, 4),
            "mxu_gflop": round(mxu_f / 1e9, 2),
            "vpu_gflop": round(vpu_f / 1e9, 2),
        })
    print(json.dumps({"backend": jax.default_backend(),
                      "ceilings": {"mxu_tfs": round(mxu_peak / 1e12, 1),
                                   "vpu_tfs": round(vpu_peak / 1e12, 2),
                                   "hbm_gbs": round(hbm_peak / 1e9, 0)},
                      "rows": rows}, indent=1))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_MODE") == "edge_sol":
        return edge_sol()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from equidock_public_tpu.ops.attention import cross_attention
    from equidock_public_tpu.ops.pallas.cross_attention import cross_attention_fused
    from equidock_public_tpu.ops.intersection import body_intersection_loss
    from equidock_public_tpu.ops.pallas.softmin_field import (
        body_intersection_loss_fused)

    interpret = jax.default_backend() == "cpu"
    B, N, M, D = 8, 2048, 2048, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    qm = jnp.ones((B, N), jnp.float32)
    km = jnp.ones((B, M), jnp.float32)

    results = {}

    f_xla = jax.jit(lambda q, k, v: cross_attention(q, k, v, qm, km))
    f_pal = jax.jit(lambda q, k, v: cross_attention_fused(q, k, v, qm, km,
                                                          interpret))
    t_xla = timeit(f_xla, q, k, v)
    t_pal = timeit(f_pal, q, k, v)
    flops = 2 * 2 * B * N * M * D  # two matmuls
    results["xattn_fwd"] = {
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
        "xla_tflops": round(flops / t_xla / 1e12, 2),
        "pallas_tflops": round(flops / t_pal / 1e12, 2),
    }

    def loss_xla(q, k, v):
        return jnp.sum(cross_attention(q, k, v, qm, km) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(cross_attention_fused(q, k, v, qm, km, interpret) ** 2)

    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))
    t_xla = timeit(g_xla, q, k, v, iters=10)
    t_pal = timeit(g_pal, q, k, v, iters=10)
    results["xattn_fwd_bwd"] = {
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
    }

    lig = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 5)
    rec = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32) * 5)
    i_xla = jax.jit(lambda l, r: jnp.sum(
        body_intersection_loss(l, qm, r, km, 25.0, 10.0)))
    i_pal = jax.jit(lambda l, r: jnp.sum(
        body_intersection_loss_fused(l, qm, r, km, 25.0, 10.0, interpret)))
    t_xla = timeit(i_xla, lig, rec, iters=10)
    t_pal = timeit(i_pal, lig, rec, iters=10)
    results["intersection_fwd"] = {
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
    }

    gi_xla = jax.jit(jax.grad(lambda l, r: jnp.sum(
        body_intersection_loss(l, qm, r, km, 25.0, 10.0)), argnums=(0, 1)))
    gi_pal = jax.jit(jax.grad(lambda l, r: jnp.sum(
        body_intersection_loss_fused(l, qm, r, km, 25.0, 10.0, interpret)),
        argnums=(0, 1)))
    t_xla = timeit(gi_xla, lig, rec, iters=10)
    t_pal = timeit(gi_pal, lig, rec, iters=10)
    results["intersection_fwd_bwd"] = {
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
    }

    print(json.dumps({"backend": jax.default_backend(),
                      "shape": [B, N, M, D], **results}, indent=2))


if __name__ == "__main__":
    main()
