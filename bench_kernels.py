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


def main():
    import jax
    import jax.numpy as jnp

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
