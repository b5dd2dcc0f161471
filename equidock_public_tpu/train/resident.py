"""Device-resident epochs: the whole cached split lives in HBM; one
`lax.scan` dispatch runs a full train epoch (or all val repeats).

Why this exists (round-4, VERDICT r3 items 2+3): the axon/TPU tunnel
transport leaks host RSS proportionally to host->device bytes
(scripts/rss_probe.py: ~9.8 MB RSS per 10 MB device_put, in every mode,
flat on CPU backend) and the per-step collate+transfer makes real cached
epochs host-bound (20 pairs/s vs 709 pairs/s synthetic). Both problems
share one cause — per-step host->device traffic — and one fix: upload the
padded split ONCE, then per epoch send only a (S, bs) int32 schedule and a
PRNG key.

The reference counterpart of what moves on-device here is the Dataset
augmentation (`src/utils/db5_data.py:174-210`): the 50% ligand/receptor
swap and the uniform random SE(3) pose are re-expressed as jax ops inside
the jitted step. Everything static per pair (residue ids, neighbor
tables, edge features — all invariant under rigid motion of the inputs)
is gathered from the resident store by index.

Layout: pairs are grouped by `bucket_for(max(n_lig, n_rec))` and BOTH
sides pad to that bucket, so a role swap is shape-neutral (a masked
`where`, not a reshape). One scan per group per epoch; the schedule is
host-generated (np RNG, seeded) so runs stay reproducible.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Config, bucket_for
from ..graph import PairBatch, ProteinBatch, pad_protein
from .meter import RmsdMeter
from .step import TrainState, loss_fn, step_body

_SCALARS = ("loss", "ligand_coors_loss", "ot_loss", "intersection_loss")


@struct.dataclass
class ResidentGroup:
    """All pairs of one node-bucket group, padded to (N,) and stacked on a
    leading pair axis P. Both sides share the same N so swap is a select."""

    lig: ProteinBatch        # (P, N, ...) bound coordinates in .x
    rec: ProteinBatch        # (P, N, ...)
    gt_lig: jnp.ndarray      # (P, N, 3) bound ligand CA (MSE target)
    gt_rec: jnp.ndarray      # (P, N, 3) bound receptor CA (target under swap)
    pocket: jnp.ndarray      # (P, Pk, 3) pocket midpoints (frame-shared)
    pocket_mask: jnp.ndarray  # (P, Pk)


@dataclasses.dataclass
class HostMeta:
    """Host-side copies the meter needs (never re-uploaded)."""

    n_lig: List[int]
    n_rec: List[int]
    gt_lig: List[np.ndarray]   # unpadded (n_l, 3)
    gt_rec: List[np.ndarray]   # unpadded (n_r, 3) == bound receptor coords


@dataclasses.dataclass
class ResidentSplit:
    groups: Dict[int, ResidentGroup]       # bucket N -> device arrays
    metas: Dict[int, HostMeta]
    bs: int


def _side_to_fields(g, n_max: int) -> dict:
    return pad_protein(g, n_max)


def _group_by_bucket(ds, cfg: Config) -> Dict[int, List[int]]:
    """Bucket-group a dataset by padded pair size. Works on materialized AND
    streaming datasets (sizes come from the accessors / shard index); for a
    streaming dataset each group's indices are ordered by owning shard so a
    later materialization walks shards sequentially through the LRU instead
    of thrashing it."""
    by_bucket: Dict[int, List[int]] = {}
    for i in range(len(ds.codes)):
        b = bucket_for(ds.pair_max_nodes(i), cfg.data.node_buckets)
        by_bucket.setdefault(b, []).append(i)
    if ds.index is not None:
        for idxs in by_bucket.values():
            idxs.sort(key=lambda i: ds.index.shard_of[i])
    return by_bucket


def _materialize_group(ds, cfg: Config, b: int, idxs: List[int]
                       ) -> Tuple[ResidentGroup, HostMeta]:
    """Pad + stack one bucket group's pairs on a leading pair axis (host
    arrays; the caller decides device placement/sharding)."""
    pk = bucket_for(max(ds.pocket_size(i) for i in idxs),
                    cfg.data.pocket_buckets)
    sides = {"lig": [], "rec": []}
    gts_l, gts_r, pockets, pmasks = [], [], [], []
    meta = HostMeta([], [], [], [])
    for i in idxs:
        s = ds.get_sample(i)
        sides["lig"].append(_side_to_fields(s.lig, b))
        sides["rec"].append(_side_to_fields(s.rec, b))
        gl = np.zeros((b, 3), np.float32)
        gl[: s.gt_lig.shape[0]] = s.gt_lig
        gr = np.zeros((b, 3), np.float32)
        gr[: s.gt_rec.shape[0]] = s.gt_rec
        gts_l.append(gl)
        gts_r.append(gr)
        p = np.zeros((pk, 3), np.float32)
        pm = np.zeros(pk, np.float32)
        p[: s.pocket.shape[0]] = s.pocket
        pm[: s.pocket.shape[0]] = 1.0
        pockets.append(p)
        pmasks.append(pm)
        meta.n_lig.append(s.lig.num_nodes)
        meta.n_rec.append(s.rec.num_nodes)
        meta.gt_lig.append(np.asarray(s.gt_lig, np.float32))
        meta.gt_rec.append(np.asarray(s.gt_rec, np.float32))

    def stack_side(cols):
        stacked = {k: np.stack([c[k] for c in cols]) for k in cols[0]}
        return ProteinBatch(**stacked)

    group = ResidentGroup(
        lig=stack_side(sides["lig"]), rec=stack_side(sides["rec"]),
        gt_lig=np.stack(gts_l), gt_rec=np.stack(gts_r),
        pocket=np.stack(pockets), pocket_mask=np.stack(pmasks))
    return group, meta


def build_resident_split(ds, cfg: Config) -> ResidentSplit:
    """Group a materialized DockingDataset by symmetric node bucket, pad,
    stack, and push each group to the default device once."""
    groups: Dict[int, ResidentGroup] = {}
    metas: Dict[int, HostMeta] = {}
    for b, idxs in sorted(_group_by_bucket(ds, cfg).items()):
        group, meta = _materialize_group(ds, cfg, b, idxs)
        groups[b] = jax.device_put(jax.tree.map(jnp.asarray, group))
        metas[b] = meta
    return ResidentSplit(groups=groups, metas=metas, bs=cfg.train.bs)


# --------------------------------------------------------------------------- #
# On-device augmentation (db5_data.py:174-210 semantics)
# --------------------------------------------------------------------------- #

def random_rotations(key, n: int) -> jnp.ndarray:
    """(n, 3, 3) uniform rotations via normalized quaternions (equivalent in
    distribution to scipy `Rotation.random`, `protein_utils.py:15-17`)."""
    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def draw_augmentations(key, bs: int, do_swap: bool,
                       translation_interval: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The per-batch random draws of `assemble_batch`, exposed so the
    dp-sharded epoch scan can draw the GLOBAL (bs,) stream once per step and
    slice its local rows — keeping the dp path's augmentation stream
    bit-identical to the single-device scan's (tests/test_resident_dp.py).
    Returns (swap_flag (bs,), rot (bs, 3, 3), tr (bs, 3))."""
    k_swap, k_rot, k_dir, k_len = jax.random.split(key, 4)
    if do_swap:
        swap_flag = jax.random.bernoulli(k_swap, 0.5, (bs,))
    else:
        swap_flag = jnp.zeros((bs,), bool)
    rot = random_rotations(k_rot, bs)
    d = jax.random.normal(k_dir, (bs, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tr = d * jax.random.uniform(k_len, (bs, 1), minval=0.0,
                                maxval=translation_interval)
    return swap_flag, rot, tr


def assemble_batch(store: ResidentGroup, idx: jnp.ndarray, valid: jnp.ndarray,
                   key, do_swap: bool, translation_interval: float,
                   rigid: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                   swap_flag: Optional[jnp.ndarray] = None
                   ) -> Tuple[PairBatch, jnp.ndarray]:
    """Gather `idx` rows from the resident store, apply the 50% role swap and
    a fresh uniform SE(3) pose to the ligand side — all on device.

    `rigid`/`swap_flag` override the random draws (parity tests, dp scan).
    Returns (batch, swap_flag)."""
    bs = idx.shape[0]
    g = jax.tree.map(lambda t: t[idx], store)
    drawn_swap, drawn_rot, drawn_tr = draw_augmentations(
        key, bs, do_swap, translation_interval)
    if swap_flag is None:
        swap_flag = drawn_swap

    def sel(a, b):
        f = swap_flag.reshape((bs,) + (1,) * (a.ndim - 1))
        return jnp.where(f, a, b)

    lig = jax.tree.map(sel, g.rec, g.lig)
    rec = jax.tree.map(sel, g.lig, g.rec)
    gt = sel(g.gt_rec, g.gt_lig)

    if rigid is None:
        rot, tr = drawn_rot, drawn_tr
    else:
        rot, tr = rigid

    mask = lig.node_mask                                   # (bs, N)
    mean = ((lig.x * mask[..., None]).sum(axis=1)
            / jnp.maximum(mask.sum(axis=1), 1.0)[..., None])  # (bs, 3)
    new_x = jnp.einsum("bij,bnj->bni", rot, lig.x - mean[:, None]) \
        + tr[:, None]
    new_x = new_x * mask[..., None]
    pocket_lig = jnp.einsum("bij,bpj->bpi", rot, g.pocket - mean[:, None]) \
        + tr[:, None]

    v = valid.astype(jnp.float32)                          # (bs,)
    lig = lig.replace(x=new_x, node_mask=lig.node_mask * v[:, None],
                      nbr_mask=lig.nbr_mask * v[:, None, None])
    rec = rec.replace(node_mask=rec.node_mask * v[:, None],
                      nbr_mask=rec.nbr_mask * v[:, None, None])
    pk_mask = g.pocket_mask * v[:, None]
    batch = PairBatch(
        lig=lig, rec=rec, gt_lig=gt,
        pocket_lig=pocket_lig * pk_mask[..., None],
        pocket_rec=g.pocket * pk_mask[..., None],
        pocket_mask=pk_mask,
        pair_mask=v)
    return batch, swap_flag


# --------------------------------------------------------------------------- #
# Jitted epoch scans
# --------------------------------------------------------------------------- #

@functools.partial(jax.jit,
                   static_argnames=("cfg", "do_swap", "emit_coords"),
                   donate_argnums=(0,))
def train_epoch_scan(state: TrainState, store: ResidentGroup,
                     idx: jnp.ndarray, valid: jnp.ndarray, key,
                     lr_scale: jnp.ndarray, cfg: Config, do_swap: bool,
                     emit_coords: bool = True):
    """Run S steps of one group's epoch slice in a single dispatch.

    `emit_coords=False` drops the (S, bs, N, 3) per-step coordinate stack
    from the scan outputs — the epoch runner permutes each group's schedule
    so the ~10% RMSD-metered steps form a PREFIX and only that prefix scan
    pays the coordinate HBM (at DIPS scale the full stack would be hundreds
    of MB per dispatch for rows that were immediately discarded)."""

    def body(carry, inp):
        st, k = carry
        i, v = inp
        k, k_aug, k_step = jax.random.split(k, 3)
        batch, flag = assemble_batch(store, i, v, k_aug, do_swap,
                                     cfg.graph.translation_interval)
        st, m = step_body(st, batch, k_step, cfg, lr_scale)
        out = {s: m[s] for s in _SCALARS}
        out["clipped"] = m["clipped"]
        if emit_coords:
            out["coords"] = m.get("ligand_coords",
                                  jnp.zeros_like(batch.gt_lig))
            out["swap"] = flag
        return (st, k), out

    (state, _), outs = jax.lax.scan(body, (state, key), (idx, valid))
    return state, outs


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_epoch_scan(params, store: ResidentGroup, idx: jnp.ndarray,
                    valid: jnp.ndarray, keys, bn_state, cfg: Config):
    """All eval steps (incl. val repeats, folded into S) in one dispatch."""

    def body(_, inp):
        i, v, k = inp
        batch, _ = assemble_batch(store, i, v, k, False,
                                  cfg.graph.translation_interval)
        loss, (metrics, out) = loss_fn(params, cfg, batch, None, False,
                                       bn_state)
        o = {s: metrics[s] for s in _SCALARS}
        o["coords"] = out["ligand_coords"]
        return None, o

    _, outs = jax.lax.scan(body, None, (idx, valid, keys))
    return outs


# --------------------------------------------------------------------------- #
# Host-side schedule + metering glue
# --------------------------------------------------------------------------- #

def _schedule(n: int, bs: int, rng: Optional[np.random.Generator]
              ) -> Tuple[np.ndarray, np.ndarray]:
    """(S, bs) index plan + validity; last chunk padded with repeats."""
    order = (rng.permutation(n) if rng is not None
             else np.arange(n)).astype(np.int32)
    S = -(-n // bs)
    idx = np.zeros((S, bs), np.int32)
    valid = np.zeros((S, bs), np.float32)
    flat = np.concatenate([order, np.full(S * bs - n, order[-1], np.int32)])
    idx[:] = flat.reshape(S, bs)
    valid.reshape(-1)[:n] = 1.0
    return idx, valid


def _group_chunks(n: int, bs: int, rng: np.random.Generator,
                  meter_rng: np.random.Generator, frac: float,
                  trim: bool) -> Tuple[list, int]:
    """Partition one group's shuffled epoch schedule into scan chunks.

    trim=False reproduces the legacy layout exactly: ceil(n/bs) steps of
    width bs, last step padded with repeats (valid=0), all S steps permuted
    and the first k_c metered.

    trim=True (cfg.train.trim_remainder) runs the n % bs leftover pairs as
    ONE narrow (1, r) step with no dead slots. Step membership is the same
    partition of the shuffled order, and dead slots contribute zero to the
    pair_mask-normalized loss (train/losses.py total_loss), so the update
    math is unchanged — only padded compute is removed (~15-30% of scheduled
    node-slots on fine bucket ladders at DB5 scale). The remainder step is
    excluded from RMSD metering unless it is the group's only step.

    Returns (chunks, S): chunks = [(idx (s, w) int32, valid (s, w) f32,
    emit_coords), ...]; S = gradient-step count (== ceil(n/bs) either way).
    """
    if not trim:
        idx, valid = _schedule(n, bs, rng)
        S = idx.shape[0]
        k_c = max(1, round(S * frac))
        perm = meter_rng.permutation(S).astype(np.int64)
        idx, valid = idx[perm], valid[perm]
        chunks = [(idx[:k_c], valid[:k_c], True)]
        if k_c < S:
            chunks.append((idx[k_c:], valid[k_c:], False))
        return chunks, S
    order = (rng.permutation(n) if rng is not None
             else np.arange(n)).astype(np.int32)
    s_full, r = divmod(n, bs)
    S = s_full + (1 if r else 0)
    k_c = max(1, round(S * frac))
    if s_full == 0:
        # group smaller than bs: the trimmed remainder IS the epoch slice
        return [(order.reshape(1, n), np.ones((1, n), np.float32), True)], S
    idx = order[: s_full * bs].reshape(s_full, bs)
    perm = meter_rng.permutation(s_full).astype(np.int64)
    idx = idx[perm]
    k_m = min(k_c, s_full)
    chunks = [(idx[:k_m], np.ones((k_m, bs), np.float32), True)]
    if k_m < s_full:
        chunks.append((idx[k_m:], np.ones((s_full - k_m, bs), np.float32),
                       False))
    if r:
        chunks.append((order[s_full * bs:].reshape(1, r),
                       np.ones((1, r), np.float32), False))
    return chunks, S


def _dispatch_group(state: TrainState, store: ResidentGroup, meta: HostMeta,
                    bs: int, cfg: Config, rng: np.random.Generator,
                    meter_rng: np.random.Generator, key, swap: bool, scale
                    ) -> Tuple[TrainState, "jax.Array", int, list]:
    """Dispatch one bucket group's epoch-slice scans WITHOUT reading any
    result back. Returns (state, key, steps, pending), pending =
    [(outs, idx, valid, emit), ...] with `outs` still on device — the
    caller syncs via _sync_group. Keeping the host ahead of the device lets
    consecutive scan dispatches pipeline instead of paying one
    host<->device round-trip per chunk (on the tunneled chip that latency
    is ~40-80 ms, comparable to a whole DB5 bucket-group scan)."""
    chunks, S = _group_chunks(len(meta.n_lig), bs, rng, meter_rng,
                              cfg.train.train_rmsd_fraction,
                              cfg.train.trim_remainder)
    pending = []
    for idx, valid, emit in chunks:
        key, sub = jax.random.split(key)
        state, outs = train_epoch_scan(
            state, store, jnp.asarray(idx), jnp.asarray(valid), sub, scale,
            cfg, swap, emit_coords=emit)
        pending.append((outs, idx, valid, emit))
    return state, key, S, pending


def _sync_group(pending: list, meta: HostMeta, meter: RmsdMeter,
                sums: Dict[str, float]) -> int:
    """Host side of _dispatch_group: scalar accumulation + sampled-coords
    metering. Returns the group's clip count."""
    n_clips = 0
    for outs, idx, valid, emit in pending:
        host = {k: np.asarray(outs[k]) for k in _SCALARS + ("clipped",)}
        for k in _SCALARS:
            sums[k] = sums.get(k, 0.0) + float(host[k].sum())
        n_clips += int(host["clipped"].sum())
        if emit:
            coords = np.asarray(outs["coords"])
            swaps = np.asarray(outs["swap"])
            for si in range(idx.shape[0]):
                _meter_rows(meter, meta, idx[si], valid[si], coords[si],
                            swaps[si], meter_interface=False)
    return n_clips


def _run_group(state: TrainState, store: ResidentGroup, meta: HostMeta,
               bs: int, cfg: Config, rng: np.random.Generator,
               meter_rng: np.random.Generator, key, swap: bool, scale,
               meter: RmsdMeter, sums: Dict[str, float]
               ) -> Tuple[TrainState, "jax.Array", int, int]:
    """One bucket group's train-epoch slice: scheduled scans + host-side
    scalar/metering accumulation. Shared by the fully-resident and streamed
    runners so their math stays identical (tests/test_resident_stream.py).
    Returns (state, key, steps, clips)."""
    state, key, S, pending = _dispatch_group(
        state, store, meta, bs, cfg, rng, meter_rng, key, swap, scale)
    return state, key, S, _sync_group(pending, meta, meter, sums)


def _meter_rows(meter: RmsdMeter, meta: HostMeta, idx: np.ndarray,
                valid: np.ndarray, coords: np.ndarray,
                swap: Optional[np.ndarray], meter_interface: bool) -> None:
    """Meter one step's batch from returned predicted coords + static host
    ground truth (no device batch needed)."""
    for b in range(idx.shape[0]):
        if valid[b] == 0:
            continue
        j = int(idx[b])
        if swap is not None and swap[b]:
            lt, rt = meta.gt_rec[j], meta.gt_lig[j]
        else:
            lt, rt = meta.gt_lig[j], meta.gt_rec[j]
        nl = lt.shape[0]
        lp = coords[b, :nl]
        meter.update(lp, rt, lt, rt)
        if meter_interface:
            d = np.linalg.norm(lt[:, None, :] - rt[None, :, :], axis=-1)
            ai, aj = np.where(d < 8.0)
            if ai.size:
                from .meter import complex_rmsd

                _, _, irmsd = complex_rmsd(lp[ai], rt[aj], lt[ai], rt[aj])
                meter.interface.append(irmsd)


def run_train_epoch_resident(state: TrainState, rs: ResidentSplit,
                             cfg: Config, rng: np.random.Generator, key,
                             epoch: int, log=print, lr_scale: float = 1.0,
                             do_swap: Optional[bool] = None
                             ) -> Tuple[TrainState, Dict[str, float]]:
    """Device-resident replacement for loop.run_train_epoch: one scan per
    bucket group; host receives stacked scalars + sampled-coords metering."""
    meter_rng = np.random.default_rng((cfg.train.random_seed, 7919, epoch))
    meter = RmsdMeter()
    sums: Dict[str, float] = {}
    num_batches = 0
    num_clips = 0
    scale = jnp.asarray(lr_scale, jnp.float32)
    buckets = list(rs.groups)
    rng.shuffle(buckets)
    swap = cfg.data.swap_train if do_swap is None else do_swap
    # Sampled train-RMSD metering (train.py:136): the schedule is permuted so
    # sampled steps form a PREFIX and only that prefix scan emits coords; the
    # sampled COUNT is a fixed function of S (not per-step Bernoulli) so the
    # scan lengths are epoch-invariant — otherwise every epoch would draw a
    # new k_c and pay a fresh XLA compile per length. See _group_chunks.
    # Dispatch every group's scans first, read results after: the device
    # chains the donated-state scans back-to-back while the host stays
    # ahead, instead of paying one host<->device round-trip per chunk
    # (see _dispatch_group; ~15% real-epoch win through the tunnel).
    deferred = []
    for b in buckets:
        state, key, S, pending = _dispatch_group(
            state, rs.groups[b], rs.metas[b], rs.bs, cfg, rng, meter_rng,
            key, swap, scale)
        num_batches += S
        deferred.append((pending, rs.metas[b]))
    for pending, meta in deferred:
        num_clips += _sync_group(pending, meta, meter, sums)
    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    _, _, crmsd_median = meter.summarize("median")
    _, _, crmsd_mean = meter.summarize("mean")
    avg.update(complex_rmsd_median=crmsd_median, complex_rmsd_mean=crmsd_mean,
               num_clips=num_clips, num_batches=num_batches)
    return state, avg


# --------------------------------------------------------------------------- #
# Streamed resident epochs (VERDICT r4 item 6): DIPS-scale corpora whose
# resident stores exceed HBM run group-by-group — the next bucket group's
# arrays are materialized (host) and uploaded (H2D) by a producer thread
# WHILE the current group's scan runs, and a group's device arrays are
# deleted as soon as its scan results are on host. Peak HBM is therefore
# bounded by the two largest groups (+ params/opt), and host RSS by the
# shard LRU window — `-device_resident -stream_dips` composes.
#
# The schedule/augmentation/update math is identical to the fully-resident
# path (same `_schedule` + `train_epoch_scan`), so the two runners produce
# the same parameters given the same seeds (tests/test_resident_stream.py).
# --------------------------------------------------------------------------- #


@dataclasses.dataclass
class StreamedResidentSplit:
    """Host-side plan for streamed resident epochs: the dataset stays on
    host (materialized or shard-streaming); groups are realized per epoch."""

    ds: object
    by_bucket: Dict[int, List[int]]
    bs: int

    @classmethod
    def build(cls, ds, cfg: Config) -> "StreamedResidentSplit":
        return cls(ds=ds, by_bucket=_group_by_bucket(ds, cfg),
                   bs=cfg.train.bs)


def run_train_epoch_resident_streamed(
        state: TrainState, srs: StreamedResidentSplit, cfg: Config,
        rng: np.random.Generator, key, epoch: int, log=print,
        lr_scale: float = 1.0, do_swap: Optional[bool] = None,
        prefetch: int = 1) -> Tuple[TrainState, Dict[str, float]]:
    """Streamed twin of run_train_epoch_resident: double-buffered group
    upload, per-group scan, eager group deletion."""
    import queue as queue_mod
    import threading

    meter_rng = np.random.default_rng((cfg.train.random_seed, 7919, epoch))
    meter = RmsdMeter()
    sums: Dict[str, float] = {}
    num_batches = 0
    num_clips = 0
    scale = jnp.asarray(lr_scale, jnp.float32)
    buckets = list(srs.by_bucket)
    rng.shuffle(buckets)

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, prefetch))
    _END = object()

    def producer():
        try:
            for b in buckets:
                group, meta = _materialize_group(srs.ds, cfg, b,
                                                 srs.by_bucket[b])
                dev = jax.device_put(jax.tree.map(jnp.asarray, group))
                q.put((b, dev, meta))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        b, store, meta = item
        swap = cfg.data.swap_train if do_swap is None else do_swap
        state, key, S, clips = _run_group(
            state, store, meta, srs.bs, cfg, rng, meter_rng, key, swap,
            scale, meter, sums)
        num_batches += S
        num_clips += clips
        # everything this group produced is on host now (_run_group's
        # np.asarray synced); free its HBM before the next group's scan
        for x in jax.tree.leaves(store):
            x.delete()
    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    _, _, crmsd_median = meter.summarize("median")
    _, _, crmsd_mean = meter.summarize("mean")
    avg.update(complex_rmsd_median=crmsd_median, complex_rmsd_mean=crmsd_mean,
               num_clips=num_clips, num_batches=num_batches)
    return state, avg


# --------------------------------------------------------------------------- #
# Data-parallel resident epochs (VERDICT r4 item 3): the store's PAIR axis is
# sharded over the mesh 'data' axis, schedules are per-shard-local, and one
# shard_map'ed lax.scan per bucket group runs the epoch slice with an explicit
# gradient psum. The fastest path (device-resident) is thereby also the
# scalable path (SURVEY §2.2): per-host uploads touch only the local shard,
# and per-epoch host->device traffic stays one (S, bs) int32 schedule + key.
#
# Exactness: with the global batch laid out as dp blocks of bs/dp rows, the
# dp update equals the single-device resident update bit-for-bit-modulo-
# float-reduction-order (tests/test_resident_dp.py): the augmentation stream
# is the same global draw sliced per shard (`draw_augmentations`), the loss
# is re-normalized by the psum'd valid count, and the gradient psum runs
# BEFORE clip telemetry and the optimizer. Dropout > 0 breaks exactness only
# (per-device mask streams differ) — still valid SGD; paper configs use 0.
# --------------------------------------------------------------------------- #


@dataclasses.dataclass
class ResidentSplitDP:
    groups: Dict[int, ResidentGroup]   # leaves (dp*P_loc, ...), 'data'-sharded
    metas: Dict[int, HostMeta]         # shard-concatenated order
    n_locs: Dict[int, List[int]]       # real pair count per shard per bucket
    p_loc: Dict[int, int]              # padded per-shard rows per bucket
    bs: int
    dp: int


def build_resident_split_dp(ds, cfg: Config, mesh) -> ResidentSplitDP:
    """Shard each bucket group's pair axis over the mesh 'data' axis.

    Pairs are dealt round-robin to shards, every shard pads to the max shard
    size with duplicates of its first pair (never scheduled), and the stacked
    (dp*P_loc, ...) arrays are placed with NamedSharding(P('data')) so shard
    d owns rows [d*P_loc, (d+1)*P_loc) — a per-host-local upload on real
    multi-host meshes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["data"]
    assert cfg.train.bs % dp == 0, (cfg.train.bs, dp)
    sharding = NamedSharding(mesh, P("data"))
    groups, metas, n_locs, p_locs = {}, {}, {}, {}
    for b, idxs in sorted(_group_by_bucket(ds, cfg).items()):
        shards = [idxs[d::dp] for d in range(dp)]
        n_loc = [len(s) for s in shards]
        p_loc = max(max(n_loc), 1)
        any_pair = idxs[0]
        padded = [s + [s[0] if s else any_pair] * (p_loc - len(s))
                  for s in shards]
        order = [i for s in padded for i in s]
        group, meta = _materialize_group(ds, cfg, b, order)
        groups[b] = jax.device_put(group, sharding)
        metas[b] = meta
        n_locs[b] = n_loc
        p_locs[b] = p_loc
    return ResidentSplitDP(groups=groups, metas=metas, n_locs=n_locs,
                           p_loc=p_locs, bs=cfg.train.bs, dp=dp)


def _schedule_dp(n_locs: List[int], bs_loc: int,
                 rng: Optional[np.random.Generator]
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shard schedules with a COMMON step count: (S, dp*bs_loc) local
    indices + validity, where columns [d*bs_loc, (d+1)*bs_loc) hold shard
    d's plan (same layout the single-device scan sees as one global batch)."""
    dp = len(n_locs)
    S = max(max(-(-n // bs_loc) for n in n_locs), 1)
    idx = np.zeros((S, dp * bs_loc), np.int32)
    valid = np.zeros((S, dp * bs_loc), np.float32)
    for d, n in enumerate(n_locs):
        cols = slice(d * bs_loc, (d + 1) * bs_loc)
        if n == 0:
            continue
        order = (rng.permutation(n) if rng is not None
                 else np.arange(n)).astype(np.int32)
        flat = np.concatenate(
            [order, np.full(S * bs_loc - n, order[-1], np.int32)])
        idx[:, cols] = flat.reshape(S, bs_loc)
        v = np.zeros((S, bs_loc), np.float32)
        v.reshape(-1)[:n] = 1.0
        valid[:, cols] = v
    return idx, valid


@functools.lru_cache(maxsize=None)
def _dp_train_epoch_fn(cfg: Config, mesh, do_swap: bool, emit_coords: bool):
    """Jitted shard_map'ed epoch-slice scan for one (cfg, mesh) pair."""
    from jax.sharding import PartitionSpec as P

    from ..models.iegmn import uses_batch_norm

    assert not uses_batch_norm(cfg.model), \
        "dp-resident path does not track per-device BN statistics; use LN/GN"
    dp = mesh.shape["data"]

    def shard_body(state, store, idx, valid, key, lr_scale):
        bs_loc = idx.shape[1]
        bs_global = dp * bs_loc
        d = jax.lax.axis_index("data")

        def loss_fn_dp(params, cfg_, batch, rng, train, bn_state):
            loss_l, (metrics, out) = loss_fn(params, cfg_, batch, rng, train,
                                             bn_state)
            w_l = jnp.sum(batch.complex_mask)
            s_l = loss_l * jnp.maximum(w_l, 1.0)
            w_g = jax.lax.psum(w_l, "data")
            metrics = dict(metrics)
            metrics["_w_local"] = w_l
            return s_l / jnp.maximum(w_g, 1.0), (metrics, out)

        def body(carry, inp):
            st, k = carry
            i, v = inp
            k, k_aug, k_step = jax.random.split(k, 3)
            # same GLOBAL draw as the single-device scan, sliced locally
            swap_g, rot_g, tr_g = draw_augmentations(
                k_aug, bs_global, do_swap, cfg.graph.translation_interval)
            lo = d * bs_loc
            swap = jax.lax.dynamic_slice_in_dim(swap_g, lo, bs_loc)
            rot = jax.lax.dynamic_slice_in_dim(rot_g, lo, bs_loc)
            tr = jax.lax.dynamic_slice_in_dim(tr_g, lo, bs_loc)
            batch, flag = assemble_batch(
                store, i, v, k_aug, do_swap, cfg.graph.translation_interval,
                rigid=(rot, tr), swap_flag=swap)
            st, m = step_body(
                st, batch, k_step, cfg, lr_scale, loss_fn_=loss_fn_dp,
                grad_reduce=lambda g: jax.lax.psum(g, "data"))
            w_l = m.pop("_w_local")
            w_g = jnp.maximum(jax.lax.psum(w_l, "data"), 1.0)
            out = {s: jax.lax.psum(m[s] * jnp.maximum(w_l, 1.0), "data") / w_g
                   for s in _SCALARS}
            out["clipped"] = m["clipped"]     # from psum'd grads: replicated
            if emit_coords:
                out["coords"] = m.get("ligand_coords",
                                      jnp.zeros_like(batch.gt_lig))
                out["swap"] = flag
            return (st, k), out

        (state, _), outs = jax.lax.scan(body, (state, key), (idx, valid))
        return state, outs

    out_scalars = {s: P() for s in _SCALARS}
    out_scalars["clipped"] = P()
    if emit_coords:
        out_scalars["coords"] = P(None, "data")
        out_scalars["swap"] = P(None, "data")
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P("data"), P(None, "data"), P(None, "data"),
                  P(), P()),
        out_specs=(P(), out_scalars),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def run_train_epoch_resident_dp(state: TrainState, rs: ResidentSplitDP,
                                cfg: Config, mesh, rng: np.random.Generator,
                                key, epoch: int, log=print,
                                lr_scale: float = 1.0,
                                do_swap: Optional[bool] = None
                                ) -> Tuple[TrainState, Dict[str, float]]:
    """dp-sharded twin of run_train_epoch_resident: one shard_map'ed scan per
    bucket group; host receives psum'd scalars + the metered coord prefix."""
    meter_rng = np.random.default_rng((cfg.train.random_seed, 7919, epoch))
    meter = RmsdMeter()
    sums: Dict[str, float] = {}
    num_batches = 0
    num_clips = 0
    scale = jnp.asarray(lr_scale, jnp.float32)
    bs_loc = rs.bs // rs.dp
    buckets = list(rs.groups)
    rng.shuffle(buckets)
    for b in buckets:
        meta = rs.metas[b]
        idx, valid = _schedule_dp(rs.n_locs[b], bs_loc, rng)
        S = idx.shape[0]
        num_batches += S
        swap = cfg.data.swap_train if do_swap is None else do_swap
        k_c = max(1, round(S * cfg.train.train_rmsd_fraction))
        perm = meter_rng.permutation(S).astype(np.int64)
        idx = idx[perm]
        valid = valid[perm]
        outs_list = []
        for (lo, hi, emit) in ((0, k_c, True), (k_c, S, False)):
            if lo == hi:
                continue
            key, sub = jax.random.split(key)
            fn = _dp_train_epoch_fn(cfg, mesh, swap, emit)
            state, outs = fn(state, rs.groups[b], jnp.asarray(idx[lo:hi]),
                             jnp.asarray(valid[lo:hi]), sub, scale)
            outs_list.append(outs)
        for outs in outs_list:
            host_scalars = {k: np.asarray(outs[k]) for k in
                            _SCALARS + ("clipped",)}
            for k in _SCALARS:
                sums[k] = sums.get(k, 0.0) + float(host_scalars[k].sum())
            num_clips += int(host_scalars["clipped"].sum())
        if k_c:
            coords = np.asarray(outs_list[0]["coords"])
            swaps = np.asarray(outs_list[0]["swap"])
            # map (step, col) -> global store row: shard d = col // bs_loc,
            # local index i -> row d*P_loc + i (the shard-concat meta order)
            gid = (np.arange(rs.dp * bs_loc) // bs_loc)[None, :] \
                * rs.p_loc[b] + idx[:k_c]
            for si in range(k_c):
                _meter_rows(meter, meta, gid[si], valid[si], coords[si],
                            swaps[si], meter_interface=False)
    avg = {k: v / max(num_batches, 1) for k, v in sums.items()}
    _, _, crmsd_median = meter.summarize("median")
    _, _, crmsd_mean = meter.summarize("mean")
    avg.update(complex_rmsd_median=crmsd_median, complex_rmsd_mean=crmsd_mean,
               num_clips=num_clips, num_batches=num_batches)
    return state, avg


def run_eval_epoch_resident(params, rs: ResidentSplit, cfg: Config, key,
                            repeats: int = 1, bn_state=()) -> Dict[str, float]:
    """Device-resident eval: per group ONE dispatch covers all repeats (each
    repeat re-draws the random pose, matching run_eval_epoch semantics).
    Per-repeat metric dicts are averaged exactly like the loop's
    `val_repeats` reduction (median within repeat, mean across)."""
    reps: List[Dict[str, float]] = [dict() for _ in range(repeats)]
    meters = [RmsdMeter() for _ in range(repeats)]
    counts = [0] * repeats
    for b, store in rs.groups.items():
        meta = rs.metas[b]
        n = len(meta.n_lig)
        if cfg.train.trim_remainder:
            # same step partition as _group_chunks(trim=True), unshuffled:
            # full-width steps + one narrow (1, r) step with no dead slots
            s_full, rr = divmod(n, rs.bs)
            order = np.arange(n, dtype=np.int32)
            parts = []
            if s_full:
                parts.append((order[: s_full * rs.bs].reshape(s_full, rs.bs),
                              np.ones((s_full, rs.bs), np.float32)))
            if rr:
                parts.append((order[s_full * rs.bs:].reshape(1, rr),
                              np.ones((1, rr), np.float32)))
        else:
            parts = [_schedule(n, rs.bs, rng=None)]
        for idx, valid in parts:
            S = idx.shape[0]
            idx_r = np.tile(idx, (repeats, 1))
            valid_r = np.tile(valid, (repeats, 1))
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, S * repeats)
            outs = eval_epoch_scan(params, store, jnp.asarray(idx_r),
                                   jnp.asarray(valid_r), keys, bn_state, cfg)
            host = {k: np.asarray(v) for k, v in outs.items()}
            for r in range(repeats):
                for s in range(S):
                    row = r * S + s
                    for k in _SCALARS:
                        reps[r][k] = reps[r].get(k, 0.0) + float(host[k][row])
                    counts[r] += 1
                    _meter_rows(meters[r], meta, idx[s], valid[s],
                                host["coords"][row], None,
                                meter_interface=True)
    out_reps = []
    for r in range(repeats):
        avg = {k: v / max(counts[r], 1) for k, v in reps[r].items()}
        m = meters[r]
        lig_med, _, crmsd_median = m.summarize("median")
        lig_mean, _, crmsd_mean = m.summarize("mean")
        avg.update(complex_rmsd_median=crmsd_median,
                   complex_rmsd_mean=crmsd_mean,
                   ligand_rmsd_median=lig_med, ligand_rmsd_mean=lig_mean,
                   interface_rmsd_median=m.summarize_interface("median"),
                   interface_rmsd_mean=m.summarize_interface("mean"))
        out_reps.append(avg)
    return {k: float(np.mean([r[k] for r in out_reps])) for k in out_reps[0]}
