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

import functools
import json
import os
import time

import numpy as np


def epoch_bench(mode: str):
    """Real-epoch throughput: a full cached-data training epoch end-to-end —
    host collate + device transfer (prefetch thread) + jitted train step —
    NOT a fixed synthetic batch. `mode` is 'db5' (the real cached DB5.5 train
    split, 203 complexes) or 'dips' (synthetic cache with sizes resampled
    from the 100 frozen DIPS test complexes — the closest available sample of
    the unmounted 42K-pair corpus; see data/synth.py). Also reports the
    padding waste the bucket policy paid this epoch (VERDICT item 6).
    """
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from equidock_public_tpu.data.dataset import DockingDataset
    from equidock_public_tpu.models.iegmn import init_docking_model
    from equidock_public_tpu.train.loop import prefetch_to_device
    from equidock_public_tpu.train.step import create_train_state, train_step
    from equidock_public_tpu.utils.padding import waste_report

    if mode == "db5":
        from equidock_public_tpu.config import Config

        cfg = Config.db5_paper_model()
        ds = DockingDataset(cfg, "train")
    else:
        from equidock_public_tpu.config import Config
        from equidock_public_tpu.data.synth import (dips_testset_sizes,
                                                    write_synth_split)

        cfg = Config.dips_paper_model()
        n_pairs = int(os.environ.get("BENCH_PAIRS", "200"))
        from equidock_public_tpu.config import reference_root
        base = dips_testset_sizes(reference_root(
            "test_sets_pdb/dips_test_random_transformed", must_exist=True))
        rs = np.random.default_rng(7)
        sizes = [base[i] for i in rs.integers(0, len(base), n_pairs)]
        path = write_synth_split("/tmp/bench_dips_cache/train.npz", sizes,
                                 seed=7)
        ds = DockingDataset(cfg, "train", cache_path=path)
    if os.environ.get("BENCH_FACTORED", "1") not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, factored_edge_mlp=True))
    if os.environ.get("BENCH_BUCKETS"):
        # e.g. BENCH_BUCKETS=512,1024,2048,3072 aligns the epoch's shape set
        # with the training CLI's coarse tunnel buckets (PERF.md bucket-policy
        # section) so persistent-cache compiles are reused
        bk = tuple(int(x) for x in os.environ["BENCH_BUCKETS"].split(","))
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, node_buckets=bk))
    # BENCH_PACK=C packs up to C complexes per padded slot (graph.py
    # collate_packed) — the round-3 attack on the 40-56% padding floor
    if os.environ.get("BENCH_PACK", "0") not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, pack=True,
                pack_max_per_slot=int(os.environ["BENCH_PACK"])))
    # BENCH_FUSED_ATTN=1: the packed+fused A/B (r4 — packed batches now ride
    # the fused cross-attention kernel via seg tags)
    if os.environ.get("BENCH_FUSED_ATTN", "0") not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           use_fused_attention=True))
    ds.cfg = cfg

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    key = jax.random.PRNGKey(1)

    def one_epoch(state, key, seed):
        rng = np.random.default_rng(seed)
        n = 0
        for batch in prefetch_to_device(ds.batches(rng, shuffle=True)):
            key, sub = jax.random.split(key)
            state, m = train_step(state, batch, sub, cfg)
            n += 1
        jax.block_until_ready(m["loss"])
        return state, key, n

    # Warm until the shape set is (probably) closed: with shuffled epochs the
    # chunk compositions — hence padded shapes — differ per epoch, so ONE
    # warm epoch leaves fresh compiles inside the timed epoch for fine-bucket
    # or packed configs (~30 s each on the tunnel; the round-3 stage-3 run
    # measured compile noise, not throughput). BENCH_WARM_EPOCHS (default 3)
    # warm epochs with distinct seeds, then BENCH_TIMED_EPOCHS (default 2)
    # timed epochs, reporting aggregate pairs/s.
    warm = int(os.environ.get("BENCH_WARM_EPOCHS", "3"))
    timed = int(os.environ.get("BENCH_TIMED_EPOCHS", "2"))
    for w in range(warm):
        state, key, _ = one_epoch(state, key, seed=w)
    t0 = time.perf_counter()
    for t in range(timed):
        state, key, n_batches = one_epoch(state, key, seed=warm + t)
    dt = (time.perf_counter() - t0) / max(timed, 1)

    if cfg.data.pack:
        # realized waste of the packed epoch: valid node rows vs padded
        # slot rows, from the actual collated batches (host-side replay)
        valid = padded = 0
        shapes = set()
        for b in ds.batches(np.random.default_rng(1), shuffle=True):
            valid += int(np.asarray(b.lig.node_mask).sum()
                         + np.asarray(b.rec.node_mask).sum())
            padded += (b.lig.x.shape[0] * b.lig.x.shape[1]
                       + b.rec.x.shape[0] * b.rec.x.shape[1])
            shapes.add((b.lig.x.shape, b.rec.x.shape, b.n_segs))
        waste = {"waste_pct": 100.0 * (1 - valid / padded),
                 "distinct_shapes": len(shapes)}
    else:
        sizes_lr = [(s.lig.num_nodes, s.rec.num_nodes) for s in ds.samples]
        waste = waste_report(sizes_lr, cfg.data.node_buckets, cfg.train.bs)
    pairs_per_s = len(ds) / dt
    baseline = 25.0
    print(json.dumps({
        "metric": f"{mode}_epoch_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 3),
        "epoch_s": round(dt, 2),
        "pairs": len(ds),
        "batches": n_batches,
        "packed": cfg.data.pack,
        "padding_waste_pct": round(waste["waste_pct"], 1),
        "distinct_shapes": waste["distinct_shapes"],
    }))


def _resident_epoch_fields() -> dict:
    """REAL end-to-end epoch throughput on the device-resident path
    (train/resident.py): the whole split lives in HBM, one lax.scan dispatch
    per bucket group per epoch — the production path fixing the r3 host
    bottleneck (20 pairs/s collate+transfer-bound) and the tunnel-transport
    RSS leak. Uses the real cached DB5.5 train split (203 complexes) when the
    cache exists, else a self-contained synthetic split with sizes resampled
    from the frozen DIPS test set. Flagship DIPS-config model (8-layer,
    64-dim), full training objective, identical to what `-device_resident`
    training runs (reference hot loop being replaced: `train.py:54-212`)."""
    import dataclasses

    import jax

    from equidock_public_tpu.config import Config
    from equidock_public_tpu.data.dataset import DockingDataset
    from equidock_public_tpu.models.iegmn import init_docking_model
    from equidock_public_tpu.train.resident import (build_resident_split,
                                                    run_train_epoch_resident)
    from equidock_public_tpu.train.step import create_train_state

    cfg = Config.dips_paper_model()
    # Round-5 throughput config (VERDICT r4 item 4): `-trim_remainder` (the
    # n % bs leftover pairs of each group run as one narrow scan step) on
    # the r4 bucket ladder. Measured on the tunneled chip (PERF.md round-5
    # table): trim cuts the padded compute 26% at the SAME dispatch count,
    # while fine ladders (12 steps, 11.3% node waste) LOSE end-to-end —
    # each extra bucket group adds a dispatch+host-sync round-trip, and
    # through the tunnel that latency dominates the saved FLOPs. On locally
    # attached chips the crossover moves toward finer ladders; both knobs
    # are env-overridable here and user-reachable flags in training.
    ladder = tuple(int(x) for x in os.environ.get(
        "BENCH_LADDER", "512,1024,2048,3072").split(","))
    trim = os.environ.get("BENCH_TRIM", "1") not in ("", "0")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, node_buckets=ladder),
        train=dataclasses.replace(cfg.train, trim_remainder=trim))
    cache = ("./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/"
             "cv_0/train.npz")
    if (os.path.exists(cache)
            and os.environ.get("BENCH_REAL_SOURCE", "db5") == "db5"):
        ds = DockingDataset(cfg, "train", cache_path=cache)
        source = "db5_cached"
    else:
        from equidock_public_tpu.data.synth import (dips_testset_sizes,
                                                    write_synth_split)

        n_pairs = int(os.environ.get("BENCH_PAIRS", "200"))
        from equidock_public_tpu.config import reference_root
        base = dips_testset_sizes(reference_root(
            "test_sets_pdb/dips_test_random_transformed", must_exist=True))
        rs_ = np.random.default_rng(7)
        sizes = [base[i] for i in rs_.integers(0, len(base), n_pairs)]
        path = write_synth_split("/tmp/bench_dips_cache/train.npz", sizes,
                                 seed=7)
        ds = DockingDataset(cfg, "train", cache_path=path)
        source = "synth_dips_sizes"
    ds.cfg = cfg
    rs = build_resident_split(ds, cfg)

    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def one_epoch(state, e):
        return run_train_epoch_resident(state, rs, cfg, rng,
                                        jax.random.fold_in(key, e), e,
                                        log=lambda *a, **k: None)

    # shapes are static per bucket group, so ONE warm epoch closes the
    # compile set (unlike the host-collate path, whose chunk compositions
    # shift per shuffle)
    state, _ = one_epoch(state, 0)
    timed = int(os.environ.get("BENCH_TIMED_EPOCHS", "3"))
    t0 = time.perf_counter()
    for e in range(timed):
        state, _ = one_epoch(state, 1 + e)
    dt = (time.perf_counter() - t0) / max(timed, 1)
    return {
        "real_epoch_pairs_per_s": round(len(ds) / dt, 2),
        "real_epoch_s": round(dt, 3),
        "real_epoch_pairs": len(ds),
        "real_epoch_source": source,
        "real_epoch_vs_baseline": round(len(ds) / dt / 25.0, 3),
        "real_epoch_buckets": len(cfg.data.node_buckets),
        "real_epoch_trim": cfg.train.trim_remainder,
    }


def resident_epoch_bench():
    """Standalone: print the real-epoch number as the headline metric."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    f = _resident_epoch_fields()
    print(json.dumps({
        "metric": "real_epoch_pairs_per_s",
        "value": f["real_epoch_pairs_per_s"],
        "unit": "pairs/s",
        "vs_baseline": f["real_epoch_vs_baseline"],
        "epoch_s": f["real_epoch_s"],
        "pairs": f["real_epoch_pairs"],
        "source": f["real_epoch_source"],
    }))


def infer_bench():
    """Serving throughput: jitted eval forward, one complex per call (the
    inference CLI's regime). The reference's only published speed metric is
    per-complex inference wall time (`inference_rigid.py:241-245`, seconds
    per complex on CPU/GPU); this reports ms/complex on one chip."""
    import dataclasses
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath("./jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from equidock_public_tpu.config import Config
    from equidock_public_tpu.models.iegmn import (docking_forward,
                                                  init_docking_model)
    from __graft_entry__ import _tiny_batch

    N = int(os.environ.get("BENCH_N", "512"))       # DB5 median bucket
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    cfg = Config.db5_paper_model()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng, B=1, N_l=N, N_r=N)

    @jax.jit
    def fwd(params, batch):
        out = docking_forward(params, cfg.model, batch, train=False)
        return out["ligand_coords"], out["R"], out["t"]

    jax.block_until_ready(fwd(params, batch))       # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    # reference: ~1 s/complex order (CPU, inference_rigid.py timing prints)
    baseline_s = 1.0
    print(json.dumps({
        "metric": "inference_ms_per_complex",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_s / dt, 1),
        "complexes_per_s": round(1.0 / dt, 1),
        "N": N,
    }))


def main():
    mode = os.environ.get("BENCH_MODE", "")
    if mode in ("db5_epoch", "dips_epoch"):
        return epoch_bench(mode.split("_")[0])
    if mode == "infer":
        return infer_bench()
    if mode == "resident_epoch":
        return resident_epoch_bench()
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
    # Fused Pallas edge-message+segment-mean kernel (ops/pallas/edge_message
    # .py) in place of the factored XLA path. KEPT after the round-2 A/B:
    # it wins end-to-end at every measured size on v5e (691.2 vs 605.4
    # pairs/s at N=256, 142.6 vs 124.4 at N=1024 — PERF.md "Fused
    # edge-message kernel"), so it defaults ON on TPU; BENCH_FUSED_EDGE=0
    # reverts to the factored XLA path.
    default_fused = "0" if jax.default_backend() == "cpu" else "1"
    if os.environ.get("BENCH_FUSED_EDGE", default_fused) not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fused_edge_message=True,
                                           factored_edge_mlp=False))
    # Fused Pallas BACKWARD for the edge kernel (A/B knob; default off until
    # the train-step A/B on chip decides — see PERF.md).
    if os.environ.get("BENCH_FUSED_EDGE_BWD", "0") not in ("", "0"):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fused_edge_bwd=True))
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
    loop_pairs_per_s = B * steps / dt

    # Scan-dispatched variant (the production regime since r4: resident
    # epochs run S steps per dispatch, train/resident.py), which amortizes
    # the ~1 ms/step host dispatch the loop above pays through the tunnel.
    # BENCH_SCAN=0 disables.
    scan_pairs_per_s = None
    if os.environ.get("BENCH_SCAN", "1") not in ("", "0"):
        from equidock_public_tpu.train.step import step_body

        @functools.partial(jax.jit, static_argnames=("cfg_",),
                           donate_argnums=(0,))
        def run_scan(state_, keys, cfg_):
            def body(st, k):
                st, m = step_body(st, batch, k, cfg_)
                return st, m["loss"]
            return jax.lax.scan(body, state_, keys)

        keys = jax.random.split(jax.random.PRNGKey(2), steps)
        state, losses = run_scan(state, keys, cfg)          # compile+warm
        jax.block_until_ready(losses)
        keys = jax.random.split(jax.random.PRNGKey(3), steps)
        t0 = time.perf_counter()
        state, losses = run_scan(state, keys, cfg)
        jax.block_until_ready(losses)
        scan_pairs_per_s = B * steps / (time.perf_counter() - t0)

    pairs_per_s = max(loop_pairs_per_s, scan_pairs_per_s or 0.0)
    baseline = 25.0  # estimated reference A100 pairs/s (see module docstring)
    # VERDICT r3 weak-item 4: the synthetic fixed-shape number alone can
    # drift from real training cost — publish BOTH in the one driver-captured
    # line. real_epoch_* fields measure a full end-to-end epoch on the
    # device-resident production path (see _resident_epoch_fields).
    extra = {}
    if os.environ.get("BENCH_RESIDENT", "1") not in ("", "0"):
        try:
            extra = _resident_epoch_fields()
        except Exception as e:  # keep the headline line intact regardless
            extra = {"real_epoch_error": repr(e)[:160]}
    print(json.dumps({
        "metric": "train_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 3),
        "loop_pairs_per_s": round(loop_pairs_per_s, 2),
        **({"scan_pairs_per_s": round(scan_pairs_per_s, 2)}
           if scan_pairs_per_s else {}),
        **extra,
    }))


if __name__ == "__main__":
    main()
