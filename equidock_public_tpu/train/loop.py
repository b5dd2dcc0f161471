"""Epoch runner, early stopping and the DIPS->DB5 curriculum driver.

Mirrors the structure of `src/train.py:54-415` (run_a_generic_epoch / train /
main) on top of jitted steps and padded batches.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import DockingDataset
from .checkpoint import load_checkpoint, save_checkpoint
from .meter import RmsdMeter
from .optim import ReduceOnPlateau, epoch_lr_factor
from .step import TrainState, create_train_state, eval_step, train_step


def prefetch_to_device(iterator, size: int = 2, put=None):
    """Producer-thread prefetch: collate + device_put the next batches while
    the current step runs (hides the host->device transfer latency, which
    dominates per-step time on the tunneled TPU). `put` overrides the
    placement (the mesh path passes a sharding device_put)."""
    import queue as queue_mod
    import threading

    put = put or jax.device_put
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def host_rss_gb() -> float:
    """Current host resident-set size in GB (0.0 if /proc is unavailable).

    Watchdog telemetry (SURVEY §5): long runs through a remote-device
    transport can accumulate host-side staging buffers outside this
    process's control — a DB5 fine-tune through the axon TPU tunnel grew
    ~790 MB/epoch of anon RSS and was OOM-killed at 130 GB after 165
    epochs, while the identical loop on the CPU backend holds flat ~2 GB
    (live jax/numpy bytes constant; see PERF.md "Host memory"). Logging
    RSS per epoch makes that failure mode visible long before the kernel
    kills the run; pair with `-save_every_epochs` for preemption safety."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def make_tb_logger(cfg: Config):
    """TensorBoard scalar writer (the reference's SummaryWriter usage,
    `train.py:244,326-381`); no-op fallback when tensorboard is missing."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs("./tb_logs", exist_ok=True)
        return SummaryWriter(log_dir=os.path.join("./tb_logs", cfg.banner()))
    except Exception:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

        return _Null()


def make_logger(cfg: Config) -> Callable:
    os.makedirs(cfg.log_dir, exist_ok=True)
    path = os.path.join(cfg.log_dir, cfg.banner() + ".txt")

    def log(*args):
        line = "[{}] {}".format(time.strftime("%Y-%m-%d %H:%M:%S"),
                                " ".join(str(a) for a in args))
        print(line, flush=True)
        with open(path, "a+") as f:
            f.write(line + "\n")

    return log


def run_train_epoch(state: TrainState, ds: DockingDataset, cfg: Config,
                    rng: np.random.Generator, key, epoch: int,
                    log=print, lr_scale: float = 1.0,
                    step_fn=None) -> tuple:
    """One training epoch (`run_a_generic_epoch('train')`, train.py:54-212).
    Returns (state, metrics dict). Train RMSD is metered on ~10% of batches
    (train.py:136). `lr_scale` is the per-epoch scheduler factor. `step_fn`
    swaps the optimizer step (the mesh path of `fit`); defaults to the
    single-chip `train_step`."""
    step_fn = step_fn or train_step
    put_fn = getattr(step_fn, "put_fn", None)
    meter_rng = np.random.default_rng((cfg.train.random_seed, 7919, epoch))
    meter = RmsdMeter()
    sums: Dict[str, float] = {}
    num_batches = 0
    num_clips = 0
    scale = jnp.asarray(lr_scale, jnp.float32)
    for batch in prefetch_to_device(ds.batches(rng, shuffle=True),
                                    put=put_fn):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub, cfg, scale)
        num_batches += 1
        for k in ("loss", "ligand_coors_loss", "ot_loss", "intersection_loss"):
            sums[k] = sums.get(k, 0.0) + float(metrics[k])
        num_clips += int(float(metrics["clipped"]))
        # always meter the first batch so short epochs (few batches x 10%
        # sampling) never report a NaN train RMSD. The sampling draw uses a
        # DEDICATED rng: `rng` is consumed concurrently by the prefetch
        # producer thread (ds.batches runs there), and np Generators are not
        # thread-safe — drawing from it here raced the augmentation stream
        # and silently broke seeded reproducibility.
        sampled = meter_rng.uniform() < cfg.train.train_rmsd_fraction
        if (num_batches == 1 or sampled) and "ligand_coords" in metrics:
            # meter from the training forward's own coords (train.py:133-137
            # semantics) — no second forward; the array only leaves the
            # device on these sampled batches. The mesh step omits the coords
            # (replicated out_shardings would force an all-gather per step),
            # so the mesh path's train RMSD reads nan; val metering (the
            # selection signal) is unaffected.
            meter.update_batch(batch, np.asarray(metrics["ligand_coords"]))
    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    _, _, crmsd_median = meter.summarize("median")
    _, _, crmsd_mean = meter.summarize("mean")
    avg.update(complex_rmsd_median=crmsd_median, complex_rmsd_mean=crmsd_mean,
               num_clips=num_clips, num_batches=num_batches)

    # param-norm watchdog (`train.py:167-169`): log parameters whose norm
    # exploded past 500 (checked per epoch to stay off the hot path)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        norm = float(jnp.linalg.norm(jnp.asarray(leaf)))
        if norm > 500.0:
            log(f"    PARAM {jax.tree_util.keystr(path)} --> norm = {norm:.1f}")
    return state, avg


def run_eval_epoch(params, ds: DockingDataset, cfg: Config,
                   rng: np.random.Generator, bn_state=()) -> Dict[str, float]:
    """Eval epoch (`run_an_eval_epoch`, train.py:220-236): no shuffle/swap, but
    each call still draws a fresh random SE(3) pose per complex (the reference's
    `__getitem__` augmentation, db5_data.py:195-204) — which is why the val
    metric is stochastic and `val_repeats` averaging denoises selection."""
    meter = RmsdMeter()
    sums: Dict[str, float] = {}
    num_batches = 0
    for batch in ds.batches(rng, shuffle=False):
        out = eval_step(params, batch, cfg, bn_state)
        num_batches += 1
        for k in ("loss", "ligand_coors_loss", "ot_loss", "intersection_loss"):
            sums[k] = sums.get(k, 0.0) + float(out[k])
        meter.update_batch(batch, np.asarray(out["ligand_coords"]),
                           meter_interface=True)
    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    lig_med, _, crmsd_median = meter.summarize("median")
    lig_mean, _, crmsd_mean = meter.summarize("mean")
    avg.update(complex_rmsd_median=crmsd_median, complex_rmsd_mean=crmsd_mean,
               ligand_rmsd_median=lig_med, ligand_rmsd_mean=lig_mean,
               interface_rmsd_median=meter.summarize_interface("median"),
               interface_rmsd_mean=meter.summarize_interface("mean"))
    return avg


def selection_value(va: Dict[str, float], metric: str) -> float:
    """Scalar the early-stopping rule minimizes. 'crmsd' is the reference's
    rule (val complex-RMSD median, train.py:372); 'irmsd' selects on the
    interface metric; 'sum' on their sum (equal weight, both in Angstrom)."""
    if metric == "crmsd":
        return va["complex_rmsd_median"]
    if metric == "irmsd":
        return va["interface_rmsd_median"]
    if metric == "sum":
        return va["complex_rmsd_median"] + va["interface_rmsd_median"]
    if metric == "bar":
        # worst constraint violation vs the dual-parity bar (reference
        # committed model: 14.14 CRMSD / 11.97 IRMSD medians): an epoch
        # satisfying BOTH scores negative; 'sum' can trade one metric away,
        # 'bar' cannot. Both terms are in Angstrom.
        return max(va["complex_rmsd_median"] - 14.2,
                   va["interface_rmsd_median"] - 12.1)
    raise ValueError(f"unknown select_metric {metric!r}")


def fit(cfg: Config, state: Optional[TrainState] = None,
        max_epochs: Optional[int] = None, log=None,
        checkpoint_name: Optional[str] = None,
        max_seconds: Optional[float] = None) -> TrainState:
    """Train with early stopping on val complex-RMSD median, 0.98-improvement
    rule and best-checkpoint reload for the final test — the reference's
    `train()` driver (train.py:289-415)."""
    log = log or make_logger(cfg)
    rng = np.random.default_rng(cfg.train.random_seed)
    key = jax.random.PRNGKey(cfg.train.random_seed)

    train_ds = DockingDataset(cfg, "train")
    val_ds = DockingDataset(cfg, "val", swap=False)
    test_ds = DockingDataset(cfg, "test", swap=False)
    log(f"Train:{len(train_ds)} Valid:{len(val_ds)} Test:{len(test_ds)}")

    if cfg.data.auto_buckets_max or cfg.data.auto_pocket_max:
        from ..config import auto_node_buckets

        repl = {"auto_buckets_max": 0, "auto_pocket_max": 0}
        if cfg.data.auto_buckets_max:
            sizes = [ds.pair_max_nodes(i)
                     for ds in (train_ds, val_ds, test_ds)
                     for i in range(len(ds.codes))]
            repl["node_buckets"] = auto_node_buckets(
                sizes, cfg.data.auto_buckets_max)
            log(f"auto node buckets ({len(repl['node_buckets'])} steps): "
                f"{repl['node_buckets']}")
        if cfg.data.auto_pocket_max:
            psizes = [ds.pocket_size(i)
                      for ds in (train_ds, val_ds, test_ds)
                      for i in range(len(ds.codes))]
            repl["pocket_buckets"] = auto_node_buckets(
                psizes, cfg.data.auto_pocket_max, align=32, quad_at=256)
            log(f"auto pocket buckets ({len(repl['pocket_buckets'])} "
                f"steps): {repl['pocket_buckets']}")
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, **repl))
        for ds in (train_ds, val_ds, test_ds):
            ds.cfg = cfg

    if state is None:
        from ..models.iegmn import init_docking_model

        key, sub = jax.random.split(key)
        params = init_docking_model(sub, cfg.model)
        state = create_train_state(params, cfg)
        n_params = sum(x.size for x in jax.tree.leaves(params))
        log(f"Number of parameters = {n_params:,}")

    ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.banner())
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(
        ckpt_dir, checkpoint_name or (cfg.data.data + "_model_best"))

    # Mesh training (SURVEY §2.2): dp shards the complex axis, gp the node
    # axis; parameters replicated, XLA inserts the gradient psum / boundary
    # gathers. Same step math as single-chip (`step_body`), proven equal by
    # tests/test_parallel.py. The explicit halo-exchange variant stays
    # available through `parallel.halo.make_halo_train_step` for
    # collective-level control; the SPMD-annotation path is the production
    # default here.
    # Device-resident epochs (train/resident.py): split uploaded to HBM once,
    # one lax.scan dispatch per bucket group per epoch. Fixes the tunnel
    # transport's byte-proportional host-RSS leak AND the host-collate
    # bottleneck (VERDICT r3 items 2-3).
    resident = None
    resident_mesh = None
    if cfg.data.device_resident:
        assert cfg.parallel.gp == 1, \
            "-device_resident shards pairs (dp); node sharding (gp) needs " \
            "the halo path — drop -gp or -device_resident"
        assert not cfg.data.pack, \
            "-device_resident already removes the padding-collate cost; " \
            "it does not compose with -pack"
        from .resident import (StreamedResidentSplit,
                               build_resident_split,
                               build_resident_split_dp,
                               run_eval_epoch_resident,
                               run_train_epoch_resident,
                               run_train_epoch_resident_dp,
                               run_train_epoch_resident_streamed)

        streamed = (cfg.data.data == "dips" and cfg.data.stream_dips)
        if streamed:
            # Streamed resident (VERDICT r4 item 6): group-by-group upload
            # with double buffering; HBM bounded by the two largest groups,
            # host RSS by the shard LRU window.
            assert cfg.parallel.dp == 1, \
                "-stream_dips -device_resident is single-chip for now; " \
                "drop -dp for streamed-resident or -stream_dips for dp"
            train_store = StreamedResidentSplit.build(train_ds, cfg)
            log("streamed-resident epochs: groups uploaded per epoch "
                f"(prefetch 1), {len(train_store.by_bucket)} bucket groups")
        elif cfg.parallel.dp > 1:
            # dp-resident (VERDICT r4 item 3): train store pair-sharded over
            # 'data', shard_map'ed epoch scans with explicit grad psum. Val/
            # test stores stay on the default device (selection metering is
            # a tiny fraction of epoch time).
            from ..parallel.mesh import make_mesh

            resident_mesh = make_mesh(cfg.parallel.dp, 1,
                                      devices=jax.devices()[: cfg.parallel.dp])
            train_store = build_resident_split_dp(train_ds, cfg,
                                                  resident_mesh)
            log(f"dp-resident epochs: pair axis sharded over "
                f"dp={cfg.parallel.dp}")
        else:
            train_store = build_resident_split(train_ds, cfg)
        resident = {
            "train": train_store,
            "val": build_resident_split(val_ds, cfg),
            "test": build_resident_split(test_ds, cfg),
        }
        n_bytes = sum(
            x.size * x.dtype.itemsize
            for rs in resident.values()
            for x in jax.tree.leaves(getattr(rs, "groups", {})))
        log(f"device-resident epochs: {n_bytes / 1e6:.0f} MB in HBM"
            + (" (train streams per epoch)" if streamed else "")
            + ", groups/split = "
            + str({k: sorted(getattr(rs, "groups", None)
                             or rs.by_bucket)
                   for k, rs in resident.items()}))

    step_fn = None
    par = cfg.parallel
    if par.dp * par.gp > 1 and resident is None:
        from ..parallel.mesh import make_mesh, replicate, shard_batch
        from ..parallel.train import make_parallel_train_step

        assert cfg.train.bs % par.dp == 0, (cfg.train.bs, par.dp)
        packed = cfg.data.pack and cfg.data.pack_max_per_slot > 1
        if packed and par.dp > 1:
            # the packed slot dim is dp-sharded: round every slot-count
            # bucket up to a multiple of dp so the shard is always exact
            scb = tuple(sorted({((b + par.dp - 1) // par.dp) * par.dp
                                for b in cfg.data.slot_count_buckets}))
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data,
                                              slot_count_buckets=scb))
            train_ds.cfg = cfg
            log(f"packed mesh training: slot-count buckets -> {scb}")
        mesh = make_mesh(par.dp, par.gp,
                         devices=jax.devices()[: par.dp * par.gp])
        pstep = make_parallel_train_step(
            cfg, mesh, shard_nodes=par.gp > 1, packed=packed,
            n_segs=cfg.data.pack_max_per_slot if packed else 1)

        def step_fn(state_, batch, sub, _cfg, scale):
            return pstep(state_, batch, sub, scale)

        step_fn.put_fn = lambda b: shard_batch(b, mesh,
                                               shard_nodes=par.gp > 1)
        state = jax.tree.map(lambda x: replicate(x, mesh), state)
        log(f"mesh training: dp={par.dp} x gp={par.gp} over "
            f"{par.dp * par.gp} of {len(jax.devices())} devices")

    best_val = float("inf")
    best_epoch = -1
    patience_left = cfg.train.patience
    epochs = max_epochs if max_epochs is not None else cfg.train.num_epochs
    t_start = time.time()
    tb = make_tb_logger(cfg)
    tb_banner = cfg.data.data + "_"

    # epoch-stepped schedulers (`train.py:364-369`): cyclic triangle factor /
    # ReduceLROnPlateau on the val loss
    plateau = (ReduceOnPlateau(factor=0.5, patience=100)
               if cfg.train.scheduler == "ROP" else None)

    for epoch in range(epochs):
        if max_seconds is not None and time.time() - t_start > max_seconds:
            log(f"Wall-clock budget ({max_seconds}s) reached at epoch {epoch}.")
            break
        t0 = time.time()
        lr_scale = epoch_lr_factor(cfg.train, epoch, plateau)
        if resident is not None:
            if resident_mesh is not None:
                state, tr = run_train_epoch_resident_dp(
                    state, resident["train"], cfg, resident_mesh, rng, key,
                    epoch, log, lr_scale=lr_scale, do_swap=train_ds.swap)
            elif isinstance(resident["train"], StreamedResidentSplit):
                state, tr = run_train_epoch_resident_streamed(
                    state, resident["train"], cfg, rng, key, epoch, log,
                    lr_scale=lr_scale, do_swap=train_ds.swap)
            else:
                state, tr = run_train_epoch_resident(
                    state, resident["train"], cfg, rng, key, epoch, log,
                    lr_scale=lr_scale, do_swap=train_ds.swap)
            key = jax.random.fold_in(key, epoch + 1)
            va = run_eval_epoch_resident(
                state.params, resident["val"], cfg,
                jax.random.fold_in(key, 7), bn_state=state.bn_state,
                repeats=max(cfg.train.val_repeats, 1))
        else:
            state, tr = run_train_epoch(state, train_ds, cfg, rng, key, epoch,
                                        log, lr_scale=lr_scale,
                                        step_fn=step_fn)
            key = jax.random.fold_in(key, epoch + 1)
            reps = [run_eval_epoch(state.params, val_ds, cfg, rng,
                                    state.bn_state)
                    for _ in range(max(cfg.train.val_repeats, 1))]
            va = {k: float(np.mean([r[k] for r in reps])) for k in reps[0]}
        if plateau is not None:
            new_scale = plateau.step(va["loss"])
            if new_scale != lr_scale:
                log(f"  ReduceLROnPlateau: lr factor -> {new_scale}")
        log(f"[TRAIN] epoch {epoch} loss {tr['loss']:.4f} "
            f"lig {tr['ligand_coors_loss']:.4f} ot {tr['ot_loss']:.4f} "
            f"int {tr['intersection_loss']:.4f} "
            f"crmsd med {tr['complex_rmsd_median']:.4f} "
            f"clips {tr['num_clips']}/{tr['num_batches']}")
        rss = host_rss_gb()
        log(f"[VAL]   epoch {epoch} loss {va['loss']:.4f} "
            f"crmsd med {va['complex_rmsd_median']:.4f} "
            f"mean {va['complex_rmsd_mean']:.4f} "
            f"irmsd med {va['interface_rmsd_median']:.4f} "
            f"time {time.time()-t0:.1f}s rss {rss:.1f}G")
        if rss > 0.0:
            tb.add_scalar("host/" + tb_banner + "rss_gb", rss, epoch)
            total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 1e9
            if rss > 0.85 * total:
                log(f"  WARNING host RSS {rss:.1f}G > 85% of {total:.0f}G — "
                    "likely transport-side buffer growth; checkpoint now and "
                    "restart the run (resume with -continue_train_model)")

        # TB scalars mirror `train.py:327-329,360-362`
        tb.add_scalar("rmsd/" + tb_banner + "train_median",
                      min(100.0, tr["complex_rmsd_median"]), epoch)
        tb.add_scalar("sqrt_ot_loss/" + tb_banner + "train",
                      min(100.0, math.sqrt(max(tr["ot_loss"], 0.0))), epoch)
        tb.add_scalar("intersection_loss/" + tb_banner + "train",
                      tr["intersection_loss"], epoch)
        tb.add_scalar("rmsd/" + tb_banner + "valid_median_REF",
                      min(100.0, va["complex_rmsd_median"]), epoch)
        tb.add_scalar("sqrt_ot_loss/" + tb_banner + "valid",
                      min(100.0, math.sqrt(max(va["ot_loss"], 0.0))), epoch)
        tb.add_scalar("intersection_loss/" + tb_banner + "valid",
                      va["intersection_loss"], epoch)

        # preemption-safe periodic save (TPU pods preempt; SURVEY §5)
        if cfg.train.save_every_epochs and \
                (epoch + 1) % cfg.train.save_every_epochs == 0:
            save_checkpoint(ckpt_path + "_latest", state, cfg, epoch)

        # 0.98-improvement rule (train.py:372-377). The selection value is
        # val CRMSD median by default (the reference's rule); `-select_metric
        # irmsd` selects on the interface metric, `sum` on CRMSD+IRMSD (both
        # in A) — used by the single-checkpoint-both-metrics campaign.
        sel = selection_value(va, cfg.train.select_metric)
        # 0.98-improvement rule (sign-safe): require a >=2%-of-|best|
        # improvement. The plain multiplicative form inverts for NEGATIVE
        # selection values ('bar' goes negative exactly when both parity
        # constraints are met), where best*0.98 is a WORSE value and a
        # regressing epoch would overwrite the best checkpoint.
        threshold = best_val * 0.98 if best_val >= 0 else best_val * 1.02
        if sel < threshold:
            best_val = sel
            best_epoch = epoch
            patience_left = cfg.train.patience
            save_checkpoint(ckpt_path, state, cfg, epoch)
            log(f"  saved best checkpoint (val {cfg.train.select_metric} "
                f"{best_val:.4f})")
        else:
            patience_left -= 1
        log(f"[BEST] epoch {best_epoch} val {cfg.train.select_metric} "
            f"{best_val:.4f} patience left {patience_left}")
        if patience_left <= 0:
            log("Early stopping.")
            break

    # Reload best for the final test (train.py:396-413)
    if os.path.exists(ckpt_path):
        payload, _, _ = load_checkpoint(ckpt_path, state)
        state = TrainState(payload["params"], payload["opt_state"],
                           payload["step"], payload.get("bn_state", ()))
    if resident is not None:
        te = run_eval_epoch_resident(state.params, resident["test"], cfg,
                                     jax.random.fold_in(key, 13),
                                     bn_state=state.bn_state)
    else:
        te = run_eval_epoch(state.params, test_ds, cfg, rng, state.bn_state)
    log(f"[FINAL TEST {cfg.data.data}] crmsd med {te['complex_rmsd_median']:.4f} "
        f"mean {te['complex_rmsd_mean']:.4f} loss {te['loss']:.4f}")
    return state


def curriculum(cfg: Config, toy: bool = False, log=None) -> TrainState:
    """DIPS -> DB5 curriculum (`main`, train.py:239-285); `toy` trains DB5
    only (args.py:113)."""
    log = log or make_logger(cfg)
    state = None
    if not toy:
        dips_cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, data="dips"),
            train=dataclasses.replace(cfg.train, lr=2e-4, patience=100))
        state = fit(dips_cfg, state, log=log)
    db5_cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, data="db5"),
        train=dataclasses.replace(cfg.train, lr=1e-4, patience=500))
    return fit(db5_cfg, state, log=log)
