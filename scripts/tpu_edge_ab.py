"""Device-time A/B: fused Pallas edge-message kernel vs the XLA factored path.

Timing over the axon tunnel is dispatch-bound for sub-ms kernels, so each
measurement runs ITERS iterations inside ONE jitted lax.fori_loop (data
dependency through a carried accumulator defeats DCE) and divides by ITERS.
Forward path only — the custom VJP's backward recomputes through XLA either
way, so the fused win is forward HBM traffic.

Writes one JSON line per (N, path) to stdout.
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from equidock_public_tpu.ops.pallas.edge_message import (
    _reference, edge_message_aggregate)

import os

ITERS = int(os.environ.get("AB_ITERS", "50"))
B, K, D, E = 10, 10, 64, 27
NS = [int(x) for x in os.environ.get("AB_NS", "256,1024,2048").split(",")]
PATHS = os.environ.get("AB_PATHS", "fused_pallas,xla_factored").split(",")


def make_inputs(N, seed=0):
    rng = np.random.default_rng(seed)
    s = 0.1
    src = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
    he = jnp.asarray(rng.standard_normal((B, N, K, E)).astype(np.float32))
    # kNN-realistic: neighbors near the destination index (halo locality)
    base = np.arange(N)[None, :, None]
    off = rng.integers(-8, 9, (B, N, K))
    nbr = jnp.asarray(np.clip(base + off, 0, N - 1).astype(np.int32))
    msk = jnp.asarray((rng.random((B, N, K)) < 0.95).astype(np.float32))
    params = {
        "Wc": jnp.asarray(rng.standard_normal((E, D)).astype(np.float32)) * s,
        "Wd": jnp.asarray(rng.standard_normal((15, D)).astype(np.float32)) * s,
        "ln_g": jnp.ones((D,), jnp.float32),
        "ln_b": jnp.zeros((D,), jnp.float32),
        "W2": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * s,
        "b2": jnp.zeros((D,), jnp.float32),
        "W1c": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * s,
        "b1c": jnp.zeros((D,), jnp.float32),
        "W2c": jnp.asarray(rng.standard_normal((D, 1)).astype(np.float32)) * s,
        "b2c": jnp.zeros((1,), jnp.float32),
    }
    return src, dst, he, nbr, msk, params


def timed_loop(fn, src, dst, he, nbr, msk, params):
    @jax.jit
    def run(src, dst, he, nbr, msk, params):
        def body(i, carry):
            a_acc, x_acc = carry
            # perturb src by the running sum so iterations can't be hoisted
            a, x = fn(src + a_acc[:, :, :1] * 1e-20, dst, he, nbr, msk, params)
            return (a_acc + a, x_acc + x)

        z = (jnp.zeros((B, src.shape[1], D)), jnp.zeros((B, src.shape[1], 3)))
        return jax.lax.fori_loop(0, ITERS, body, z)

    out = jax.block_until_ready(run(src, dst, he, nbr, msk, params))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(src, dst, he, nbr, msk, params))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, float(jnp.sum(out[0]))


def main():
    fused = functools.partial(edge_message_aggregate,
                              slope=0.01, use_ln=True, use_dist=True)
    xla = functools.partial(_reference,
                            slope=0.01, use_ln=True, use_dist=True)
    for N in NS:
        inp = make_inputs(N)
        Eg = B * N * K
        paths = [("fused_pallas", fused), ("xla_factored", xla)]
        for name, fn in [p for p in paths if p[0] in PATHS]:
            try:
                dt, chk = timed_loop(fn, *inp)
                print(json.dumps({
                    "N": N, "path": name, "us_per_call": round(dt * 1e6, 1),
                    "edges_per_s": round(Eg / dt / 1e6, 1),
                    "unit": "Medges/s", "check": chk, "iters": ITERS,
                    "block_t": os.environ.get("EDGE_BLOCK_T", "64"),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "N": N, "path": name,
                    "error": str(e).split("\n")[0][:200]}), flush=True)


if __name__ == "__main__":
    main()
