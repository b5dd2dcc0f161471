"""Benchmark: training throughput (fwd+bwd+update) of the flagship DIPS-config
model on one chip. Prints ONE JSON line.

Workload: batch of 10 complexes (the reference's bs, `args.py:40`) at the
DIPS median size bucket (256 residues/protein, K=10 in-edges per node =>
~2,560 edges/protein, 2 proteins/pair), full training objective (MSE +
Sinkhorn OT + intersection), 8-layer unshared IEGMN (the released DIPS model,
`inference_rigid.py:90-91`).

Baseline for vs_baseline: the reference publishes NO throughput numbers
(BASELINE.md); we use 25 pairs/s as the documented estimate of the reference
PyTorch/DGL pipeline on one A100 — it is overhead-bound (per-complex Python
loss loop + per-complex SVD + GPU->CPU->GPU exact-EMD round trip per complex,
`train.py:112-141`, `ot_utils.py:22-29`), not FLOP-bound. BASELINE.json's
north-star target is >=5x that (=125 pairs/s/chip).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: repeated bench/train runs skip the (expensive)
    # remote compile when the program is unchanged
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from equidock_public_tpu.config import Config, ModelConfig, TrainConfig
    from equidock_public_tpu.models.iegmn import init_docking_model
    from equidock_public_tpu.train.step import create_train_state, train_step
    from __graft_entry__ import _tiny_batch

    B = int(os.environ.get("BENCH_BS", "10"))
    N = int(os.environ.get("BENCH_N", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))

    import dataclasses

    cfg = Config.dips_paper_model()
    N = int(os.environ.get("BENCH_N", "256"))
    if jax.default_backend() != "cpu" and N >= 1024:
        # fused Pallas kernels win at large node counts (2.1x attention bwd at
        # N=2048, bench_kernels.py); below ~512 the XLA path is faster
        # (536 vs 554 pairs/s measured at N=256) — pick per size.
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, use_fused_attention=True),
            train=dataclasses.replace(cfg.train, use_fused_intersection=True))
    # Factored edge MLP wins at every measured size (605.6 vs 549.7 pairs/s
    # at N=256, 130.4 vs 122 at N=1024 — results/bench_sweep.jsonl); default
    # ON here, override with BENCH_FACTORED=0. BENCH_DTYPE=bfloat16 -> bf16
    # matmuls w/ f32 accumulation (slightly slower at N=256: VPU/overhead-
    # bound, not MXU-bound).
    if os.environ.get("BENCH_FACTORED", "1") not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, factored_edge_mlp=True))
    if os.environ.get("BENCH_DTYPE"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           dtype=os.environ["BENCH_DTYPE"]))
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng, B=B, N_l=N, N_r=N)

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    key = jax.random.PRNGKey(1)

    # compile + warmup
    state, m = train_step(state, batch, key, cfg)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = train_step(state, batch, sub, cfg)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    pairs_per_s = B * steps / dt
    baseline = 25.0  # estimated reference A100 pairs/s (see module docstring)
    print(json.dumps({
        "metric": "train_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
