"""Boundary (halo) exchange graph parallelism — explicit collectives.

The graph analogue of context/sequence parallelism (SURVEY §2.2, §5,
BASELINE.json north_star): the padded node axis of each protein is partitioned
contiguously over the 'graph' mesh axis; each chip owns one node block and all
in-edges of those nodes (edges partitioned by destination, the fixed-degree
table layout). Per layer, each chip exchanges ONLY the boundary rows its
remote in-edges reference — an `all_to_all` of the requested halo rows over
ICI — instead of all-gathering every node's x/h (what the removed round-1
demo `edge_partition.py` did: O(N·D) per layer regardless of locality).

Pipeline:
  host collate  -> `build_halo_batch`: spatially reorder nodes (principal-axis
                   sort, so contiguous blocks are spatially compact and halos
                   small), plan per-(owner, dest) halo send lists, remap the
                   neighbor tables into each shard's local+halo index space;
  device        -> `make_halo_forward` / `make_halo_train_step`: shard_map
                   trunk where each IEGMN layer 1) gathers its send rows,
                   2) all_to_all's them (x and h fused in one collective),
                   3) runs the UNCHANGED dense layer body
                   (`models.iegmn.iegmn_layer_forward` with src views) on the
                   local destination block, with ring (ppermute online-softmax)
                   cross-attention so ligand x receptor logits stay row-sharded.

Overlap: the all_to_all depends only on layer-entry x/h, while the
destination-local edge work for LOCAL sources does not depend on it — the code
keeps them dependency-free so the XLA latency-hiding scheduler can run the
collective concurrently with local compute; see PERF.md ("overlap design").

No reference counterpart (the reference is single-GPU, `args.py:122-126`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, ModelConfig
from ..graph import PairBatch, ProteinBatch
from ..models.iegmn import iegmn_layer_forward, keypoint_head
from ..models.layers import embedding
from ..ops.kabsch import apply_rigid
from .ring_attention import ring_cross_attention_local
from .mesh import batch_pspec

AXIS = "graph"

HALO_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


# --------------------------------------------------------------------------- #
# Host-side partition planning
# --------------------------------------------------------------------------- #

@struct.dataclass
class HaloPlan:
    """Per-protein-side exchange plan (two tiers).

    After the bandwidth-minimizing node reorder, halo demand is banded: almost
    all remote in-edges reference the ±1 neighbor shard (measured on DB5:
    |i-j|>=2 demand is ~0; PERF.md). The exchange therefore runs as
      * a neighbor RING tier — `send_next`/`send_prev` (B, gp, Hr): local row
        indices each shard ships to shard+1 / shard-1 via `ppermute`, the
        nearest-neighbor ICI pattern;
      * a RESIDUAL all_to_all tier — `send_res` (B, gp, gp*Hres) for the rare
        |i-j|>=2 references; Hres is usually 0 and the collective is elided.
    All sharded over dim 1 (the owner shard). Hr/Hres are static (bucketed).

    RAGGED ring transport (round 3, `build_halo_batch(ragged=True, dp=...)`):
    the padded ring buffer ships B x Hr rows where Hr is the max demand over
    the whole batch x shard pairs — heterogeneous batches pad most of the
    demand win away (PERF.md round-2 table: shipped only 1.0-1.7x below
    full-gather). The ragged tier instead packs each (element, owner)
    boundary at its EXACT width into one flat buffer per direction whose
    only static dim is the bucketed max-over-(dp-group, owner) TOTAL:
      * `send_next_flat`/`send_prev_flat` (dp, gp, R): indices into the
        owner shard's flattened (B_local*S) row space (padding slots point
        at row 0: shipped but never referenced);
      * `unpack_prev`/`unpack_next` (dp, gp, B_local, Hr): where in the
        received flat buffer each padded-view slot lives (clamped for slots
        beyond the element's true width — the remapped nbr tables never
        reference those).
    The padded [local | from_prev | from_next | residual] view the layer
    body indexes is IDENTICAL either way; only the wire format changes."""

    send_next: jnp.ndarray
    send_prev: jnp.ndarray
    send_res: jnp.ndarray
    send_next_flat: Optional[jnp.ndarray] = None
    send_prev_flat: Optional[jnp.ndarray] = None
    unpack_prev: Optional[jnp.ndarray] = None
    unpack_next: Optional[jnp.ndarray] = None


@struct.dataclass
class HaloBatch:
    """A PairBatch whose node arrays are spatially reordered and whose nbr
    tables are remapped to each shard's local+halo index space, plus the
    exchange plans. `pair` is self-consistent (gt/masks permuted the same
    way), so losses/metrics on it equal the dense ones up to ordering."""

    pair: PairBatch
    plan_lig: HaloPlan
    plan_rec: HaloPlan


@dataclasses.dataclass
class HaloStats:
    """Actual (pre-padding) halo sizes + the static tier widths, for traffic
    accounting."""

    sizes_lig: np.ndarray    # (B, gp, gp) unique remote rows dest i needs of j
    sizes_rec: np.ndarray
    hring_lig: int           # padded ring-tier width (rows per direction)
    hring_rec: int
    hres_lig: int            # padded residual-tier width (rows per pair)
    hres_rec: int
    # ragged transport: (R_next, R_prev) flat widths per side, else None;
    # dp records the ragged packing's group count (widths are per dp-group)
    ring_flat_lig: Optional[Tuple[int, int]] = None
    ring_flat_rec: Optional[Tuple[int, int]] = None
    dp: int = 1

    def bytes_per_layer(self, feat_dim: int, padded: bool = True) -> int:
        """Per-layer bytes RECEIVED per chip (x and h fused: feat_dim + 3
        f32). `padded=True` counts the shipped buffers as compiled: for the
        ragged ring tier the two per-direction flat totals (already
        per-dp-group), otherwise two B x Hr ring chunks; plus gp residual
        chunks per side. The per-chip batch share is B/dp throughout."""
        gp = self.sizes_lig.shape[1]
        B = self.sizes_lig.shape[0]
        row = 4 * (feat_dim + 3)
        res = (B // max(self.dp, 1)) * gp * (self.hres_lig + self.hres_rec)
        if padded:
            if self.ring_flat_lig is not None:
                ring = (sum(self.ring_flat_lig) + sum(self.ring_flat_rec))
            else:
                ring = (B // max(self.dp, 1)) * 2 * (self.hring_lig
                                                     + self.hring_rec)
            per_chip = ring + res
        else:
            per_chip = int(self.sizes_lig.sum()
                           + self.sizes_rec.sum()) // gp // max(self.dp, 1)
        return per_chip * row

    def full_gather_bytes_per_layer(self, feat_dim: int, n_l: int, n_r: int,
                                    batch: int) -> int:
        """What the round-1 demo exchanged: every remote node row, both
        sides (received bytes per chip)."""
        row = 4 * (feat_dim + 3)
        gp = self.sizes_lig.shape[1]
        return batch * ((n_l - n_l // gp) + (n_r - n_r // gp)) * row


def spatial_permutation(x: np.ndarray, nbr: np.ndarray, nbr_mask: np.ndarray,
                        n_valid: int) -> np.ndarray:
    """Node ordering that makes contiguous blocks graph-compact: reverse
    Cuthill-McKee on the symmetrized kNN adjacency (bandwidth minimization,
    so in-edges of a block reference mostly that block and its ring
    neighbors). Falls back to a principal-axis coordinate sort without scipy.
    Padding rows stay at the end."""
    n_total = x.shape[0]
    if n_valid <= 1:
        return np.arange(n_total)
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        K = nbr.shape[1]
        dst = np.repeat(np.arange(n_total), K)
        src = np.asarray(nbr).reshape(-1)
        ok = (np.asarray(nbr_mask).reshape(-1) > 0) & (dst < n_valid) \
            & (src < n_valid)
        A = sp.coo_matrix(
            (np.ones(int(ok.sum())), (dst[ok], src[ok])),
            shape=(n_valid, n_valid)).tocsr()
        A = (A + A.T).tocsr()
        order = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    except Exception:
        xs = np.asarray(x[:n_valid], np.float64)
        c = xs - xs.mean(0)
        _, vecs = np.linalg.eigh(c.T @ c)
        order = np.argsort(c @ vecs[:, -1], kind="stable")
    return np.concatenate([order, np.arange(n_valid, n_total)])


def permute_protein(side: ProteinBatch, perms: np.ndarray) -> ProteinBatch:
    """Apply a per-complex node permutation (B, N) to every per-node array.
    nbr rows move with their destination and nbr VALUES are renumbered."""
    B, N = perms.shape
    inv = np.zeros_like(perms)
    rows = np.arange(B)[:, None]
    inv[rows, perms] = np.arange(N)[None, :]

    def pnode(a):
        return np.asarray(a)[rows, perms]

    nbr = np.asarray(side.nbr)[rows, perms]            # rows follow dst
    nbr = inv[rows[..., None], nbr]                    # values renumbered
    return ProteinBatch(
        res_id=jnp.asarray(pnode(side.res_id)),
        x=jnp.asarray(pnode(side.x)),
        mu_r_norm=jnp.asarray(pnode(side.mu_r_norm)),
        nbr=jnp.asarray(nbr.astype(np.int32)),
        nbr_mask=jnp.asarray(pnode(side.nbr_mask)),
        edge_feat=jnp.asarray(pnode(side.edge_feat)),
        node_mask=jnp.asarray(pnode(side.node_mask)))


def _bucketed(required: int, cap: int) -> int:
    h = next((h for h in HALO_BUCKETS if h >= required),
             required if required else 0)
    return min(h, cap)


def _plan_side(nbr: np.ndarray, nbr_mask: np.ndarray, gp: int,
               hmax: Optional[int] = None):
    """Compute the two-tier halo send lists + remapped neighbor tables for
    one side.

    Returns (plan arrays dict, nbr_local (B, N, K) int32, sizes (B, gp, gp)
    int32, hr, hres). Gathered-array layout on destination shard i:
        [local S | from i-1 (Hr) | from i+1 (Hr) | residual gp*Hres]
    `hmax` forces both tier widths (testing)."""
    B, N, K = nbr.shape
    assert N % gp == 0, (N, gp)
    S = N // gp

    # pass 1: unique remote-source lists per (batch, dest, owner)
    sizes = np.zeros((B, gp, gp), np.int32)
    uniq: dict = {}
    for b in range(B):
        for i in range(gp):
            rows = nbr[b, i * S:(i + 1) * S]
            msk = nbr_mask[b, i * S:(i + 1) * S] > 0
            srcs = np.where(msk, rows, i * S)          # masked edges: local
            owners = srcs // S
            for j in range(gp):
                if j == i:
                    continue
                in_j = np.unique(srcs[owners == j])
                uniq[(b, i, j)] = in_j
                sizes[b, i, j] = len(in_j)

    ring_req = max([sizes[b, i, j]
                    for b in range(B) for i in range(gp) for j in range(gp)
                    if abs(i - j) == 1] or [0])
    res_req = max([sizes[b, i, j]
                   for b in range(B) for i in range(gp) for j in range(gp)
                   if abs(i - j) >= 2] or [0])
    hr = _bucketed(ring_req, S) if hmax is None else hmax
    hres = _bucketed(res_req, S) if hmax is None else hmax
    hr = max(hr, 1)                      # keep nonzero ring shapes
    assert ring_req <= hr and res_req <= hres, (ring_req, hr, res_req, hres)

    send_next = np.zeros((B, gp, hr), np.int32)        # shard j -> j+1
    send_prev = np.zeros((B, gp, hr), np.int32)        # shard j -> j-1
    send_res = np.zeros((B, gp, gp * hres), np.int32)
    nbr_local = np.zeros_like(nbr, dtype=np.int32)
    for b in range(B):
        for i in range(gp):
            rows = nbr[b, i * S:(i + 1) * S]
            msk = nbr_mask[b, i * S:(i + 1) * S] > 0
            srcs = np.where(msk, rows, i * S)
            maptab = np.zeros(N, np.int64)
            maptab[i * S:(i + 1) * S] = np.arange(S)
            for j in range(gp):
                if j == i:
                    continue
                in_j = uniq[(b, i, j)]
                t = np.arange(len(in_j))
                if j == i - 1:                         # ring: from prev
                    send_next[b, j, :len(in_j)] = in_j - j * S
                    maptab[in_j] = S + t
                elif j == i + 1:                       # ring: from next
                    send_prev[b, j, :len(in_j)] = in_j - j * S
                    maptab[in_j] = S + hr + t
                else:                                  # residual tier
                    send_res[b, j, i * hres:i * hres + len(in_j)] = in_j - j * S
                    maptab[in_j] = S + 2 * hr + j * hres + t
            nbr_local[b, i * S:(i + 1) * S] = maptab[srcs]
    plan = dict(send_next=send_next, send_prev=send_prev, send_res=send_res)
    return plan, nbr_local, sizes, hr, hres


def _pack_ring(plan: dict, sizes: np.ndarray, S: int, hr: int, dp: int):
    """Ragged ring transport tables (see HaloPlan docstring). Packs each
    (element, owner) boundary at its exact width into per-direction flat
    buffers; the only static dims are the bucketed max-over-(dp-group,
    owner) totals, so shipped rows track the SUM of per-element demands
    instead of B x max."""
    B, gp, _ = sizes.shape
    assert B % dp == 0, (B, dp)
    Bl = B // dp
    # rows owner j ships toward j+1 (dest j+1's demand of j) / toward j-1
    w_next = np.zeros((B, gp), np.int64)
    w_prev = np.zeros((B, gp), np.int64)
    w_next[:, : gp - 1] = np.stack(
        [sizes[:, j + 1, j] for j in range(gp - 1)], axis=1)
    w_prev[:, 1:] = np.stack(
        [sizes[:, j - 1, j] for j in range(1, gp)], axis=1)

    def pack(w, send):
        group_sum = w.reshape(dp, Bl, gp).sum(axis=1)          # (dp, gp)
        # multiple-of-32 rounding instead of HALO_BUCKETS: the flat total is
        # a SUM of per-element demands, where the bucket ladder's big jumps
        # (96->128->192->...) waste up to ~50% at exactly the sizes the
        # ragged tier exists for; 32-granularity keeps the recompile set
        # bounded while tracking the sum tightly
        req = int(group_sum.max())
        R = max(1, min(((req + 31) // 32) * 32, Bl * S)) if req else 1
        flat = np.zeros((dp, gp, R), np.int32)
        offs = np.zeros((dp, gp, Bl), np.int64)
        for d in range(dp):
            for j in range(gp):
                off = 0
                for bl in range(Bl):
                    b = d * Bl + bl
                    offs[d, j, bl] = off
                    k = int(w[b, j])
                    flat[d, j, off:off + k] = bl * S + send[b, j, :k]
                    off += k
        return flat, offs, R

    flat_next, offs_next, r_next = pack(w_next, plan["send_next"])
    flat_prev, offs_prev, r_prev = pack(w_prev, plan["send_prev"])

    # dest-side unpack: shard i reads owner i-1's next-buffer (its
    # from_prev) / owner i+1's prev-buffer (from_next); slots beyond the
    # element's true width are clamped (never referenced by nbr_local)
    t = np.arange(hr)
    unpack_prev = np.zeros((dp, gp, Bl, hr), np.int32)
    unpack_next = np.zeros((dp, gp, Bl, hr), np.int32)
    for d in range(dp):
        for i in range(gp):
            if i > 0:
                unpack_prev[d, i] = np.minimum(
                    offs_next[d, i - 1][:, None] + t[None, :], r_next - 1)
            if i < gp - 1:
                unpack_next[d, i] = np.minimum(
                    offs_prev[d, i + 1][:, None] + t[None, :], r_prev - 1)
    plan["send_next_flat"] = flat_next
    plan["send_prev_flat"] = flat_prev
    plan["unpack_prev"] = unpack_prev
    plan["unpack_next"] = unpack_next
    return r_next, r_prev


def build_halo_batch(
    pair: PairBatch, gp: int,
    spatial: bool = True,
    hmax: Optional[int] = None,
    ragged: bool = False,
    dp: int = 1,
) -> Tuple[HaloBatch, HaloStats, np.ndarray, np.ndarray]:
    """Host-side: reorder, plan, remap. Returns (HaloBatch, HaloStats,
    perm_lig, perm_rec); perms map new position -> original index (apply
    `out[..., perm, :] = dense_out` ... i.e. `halo_out == dense_out[perm]`)."""
    lig, rec = pair.lig, pair.rec
    B = lig.x.shape[0]

    def side_perm(side: ProteinBatch) -> np.ndarray:
        N = side.x.shape[1]
        if not spatial:
            return np.tile(np.arange(N), (B, 1))
        x = np.asarray(side.x)
        nbr = np.asarray(side.nbr)
        nm = np.asarray(side.node_mask)
        nbrm = np.asarray(side.nbr_mask)
        return np.stack([
            spatial_permutation(x[b], nbr[b], nbrm[b], int(nm[b].sum()))
            for b in range(B)])

    perm_l = side_perm(lig)
    perm_r = side_perm(rec)
    lig_p = permute_protein(lig, perm_l)
    rec_p = permute_protein(rec, perm_r)
    gt_p = np.asarray(pair.gt_lig)[np.arange(B)[:, None], perm_l]

    plan_l, nbr_l, sz_l, hr_l, hres_l = _plan_side(
        np.asarray(lig_p.nbr), np.asarray(lig_p.nbr_mask), gp, hmax)
    plan_r, nbr_r, sz_r, hr_r, hres_r = _plan_side(
        np.asarray(rec_p.nbr), np.asarray(rec_p.nbr_mask), gp, hmax)
    rf_l = rf_r = None
    if ragged:
        rf_l = _pack_ring(plan_l, sz_l, lig_p.x.shape[1] // gp, hr_l, dp)
        rf_r = _pack_ring(plan_r, sz_r, rec_p.x.shape[1] // gp, hr_r, dp)

    pair_p = PairBatch(
        lig=dataclasses.replace(lig_p, nbr=jnp.asarray(nbr_l)),
        rec=dataclasses.replace(rec_p, nbr=jnp.asarray(nbr_r)),
        gt_lig=jnp.asarray(gt_p),
        pocket_lig=pair.pocket_lig, pocket_rec=pair.pocket_rec,
        pocket_mask=pair.pocket_mask, pair_mask=pair.pair_mask)
    hb = HaloBatch(
        pair=pair_p,
        plan_lig=HaloPlan(**{k: jnp.asarray(v) for k, v in plan_l.items()}),
        plan_rec=HaloPlan(**{k: jnp.asarray(v) for k, v in plan_r.items()}))
    stats = HaloStats(sizes_lig=sz_l, sizes_rec=sz_r,
                      hring_lig=hr_l, hring_rec=hr_r,
                      hres_lig=hres_l, hres_rec=hres_r,
                      ring_flat_lig=rf_l, ring_flat_rec=rf_r,
                      dp=dp if ragged else 1)
    return hb, stats, perm_l, perm_r


# --------------------------------------------------------------------------- #
# Device-side: exchange + sharded trunk
# --------------------------------------------------------------------------- #

def _halo_exchange(x, h, plan: HaloPlan, axis: str = AXIS,
                   pallas_ring: bool = False, interpret: bool = False):
    """x (B, S, 3), h (B, S, D) local; `plan` holds this shard's send lists.
    Ships x and h fused in one buffer per collective. Tier 1: ppermute the
    ±1-neighbor chunks (nearest-neighbor ICI links) — or, with
    `pallas_ring`, the explicit Pallas RDMA kernel that overlaps both
    directions with the local block copy (`pallas_halo.ring_exchange`).
    Tier 2: residual all_to_all, statically elided when the planner found no
    |i-j|>=2 demand. Returns (x_src, h_src) of shape
    (B, S + 2*Hr + gp*Hres, .) laid out as
    [local | from prev | from next | residual]."""
    gp = jax.lax.axis_size(axis)
    xh = jnp.concatenate([x, h], axis=-1)

    def take(idx):
        return jnp.take_along_axis(xh, idx[..., None], axis=1)

    ring_next = [(i, i + 1) for i in range(gp - 1)]
    ring_prev = [(i + 1, i) for i in range(gp - 1)]
    if plan.send_next_flat is not None:
        # Ragged transport: gather exact-width send rows into the flat
        # per-direction buffers, ship those (sum-of-demands wide, not
        # B x max), then unpack into the same padded per-element view.
        B, S = x.shape[0], x.shape[1]
        flat = xh.reshape(B * S, xh.shape[-1])
        snd_n = flat[plan.send_next_flat]
        snd_p = flat[plan.send_prev_flat]
        if pallas_ring:
            from .pallas_halo import ring_ship

            from_prev_f, from_next_f = ring_ship(snd_n, snd_p, axis, gp,
                                                 interpret)
        else:
            from_prev_f = jax.lax.ppermute(snd_n, axis, ring_next)
            from_next_f = jax.lax.ppermute(snd_p, axis, ring_prev)
        parts = [xh, from_prev_f[plan.unpack_prev],
                 from_next_f[plan.unpack_next]]
    elif pallas_ring:
        from .pallas_halo import ring_exchange

        main = ring_exchange(xh, take(plan.send_next), take(plan.send_prev),
                             axis, gp, interpret)
        parts = [main]
    else:
        # ppermute fills non-receiving shards (the chain ends) with zeros;
        # the remapped tables never reference those slots.
        from_prev = jax.lax.ppermute(take(plan.send_next), axis, ring_next)
        from_next = jax.lax.ppermute(take(plan.send_prev), axis, ring_prev)
        parts = [xh, from_prev, from_next]
    if plan.send_res.shape[-1] > 0:
        rcv = jax.lax.all_to_all(take(plan.send_res), axis,
                                 split_axis=1, concat_axis=1, tiled=True)
        parts.append(rcv)
    full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return full[..., :3], full[..., 3:]


def _ring_attend(q, k, v, qm, km, cross_msgs: bool):
    """Cross-attention callable for the sharded layer body: queries stay
    local, K/V chunks rotate over the ring (`ring_attention.py`)."""
    if not cross_msgs:
        return jnp.zeros(q.shape[:-1] + (v.shape[-1],), q.dtype)
    return ring_cross_attention_local(q, k, v, qm, km)


def _trunk_local(p, cfg: ModelConfig, n_lays: int, fine_tune: bool,
                 lig: ProteinBatch, rec: ProteinBatch,
                 x_l_in, plan_l: HaloPlan, plan_r: HaloPlan,
                 pallas_ring: bool = False, interpret: bool = False):
    """Full IEGMN trunk on node shards, inside shard_map. Per layer: halo
    exchange, then the unchanged dense layer body on the local block.
    Returns the final x/h of both sides all-gathered (the only full-array
    exchange per forward; the keypoint head runs densely on it)."""

    def slice_plan(plan: HaloPlan) -> HaloPlan:
        # padded tables (B, 1, H) -> (B, H); ragged tables carry explicit
        # (dp, gp) lead dims -> local (1, 1, ...) -> drop both
        return HaloPlan(
            send_next=plan.send_next[:, 0], send_prev=plan.send_prev[:, 0],
            send_res=plan.send_res[:, 0],
            send_next_flat=(None if plan.send_next_flat is None
                            else plan.send_next_flat[0, 0]),
            send_prev_flat=(None if plan.send_prev_flat is None
                            else plan.send_prev_flat[0, 0]),
            unpack_prev=(None if plan.unpack_prev is None
                         else plan.unpack_prev[0, 0]),
            unpack_next=(None if plan.unpack_next is None
                         else plan.unpack_next[0, 0]))

    plan_l = slice_plan(plan_l)
    plan_r = slice_plan(plan_r)

    orig_x_l, orig_x_r = x_l_in, rec.x
    x_l, x_r = x_l_in, rec.x
    h_l = embedding(p["embedding"], lig.res_id)
    h_r = embedding(p["embedding"], rec.res_id)
    if cfg.use_mean_node_features:
        h_l = jnp.concatenate([h_l, jnp.log(lig.mu_r_norm)], axis=-1)
        h_r = jnp.concatenate([h_r, jnp.log(rec.mu_r_norm)], axis=-1)
    orig_h_l, orig_h_r = h_l, h_r
    gate = 1.0 if cfg.use_edge_features_in_gmn else 0.0
    he_l = lig.edge_feat * gate
    he_r = rec.edge_feat * gate

    def run_layer(lp, skip, x_l, h_l, x_r, h_r):
        src_l = _halo_exchange(x_l, h_l, plan_l,
                               pallas_ring=pallas_ring, interpret=interpret)
        src_r = _halo_exchange(x_r, h_r, plan_r,
                               pallas_ring=pallas_ring, interpret=interpret)
        return iegmn_layer_forward(
            lp, cfg, fine_tune, skip, lig, rec, x_l, h_l, x_r, h_r,
            orig_h_l, orig_h_r, he_l, he_r, orig_x_l, orig_x_r,
            src_l=src_l, src_r=src_r, attend=_ring_attend, gn_axis=AXIS)

    x_l, h_l, x_r, h_r = run_layer(p["layer0"], False, x_l, h_l, x_r, h_r)

    if n_lays > 1:
        rest = p["rest"]

        def body(carry, lp):
            out = run_layer(lp, True, *carry)
            return out, None

        if cfg.remat:
            body = jax.checkpoint(body)
        if cfg.shared_layers:
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_lays - 1,) + x.shape), rest)
        else:
            stacked = rest
        (x_l, h_l, x_r, h_r), _ = jax.lax.scan(
            body, (x_l, h_l, x_r, h_r), stacked)

    def gather(v):
        return jax.lax.all_gather(v, AXIS, axis=1, tiled=True)

    return gather(x_l), gather(h_l), gather(x_r), gather(h_r)


def make_halo_forward(cfg: Config, mesh: Mesh):
    """Returns docking_forward over a HaloBatch: shard_map'ed trunk(s) +
    dense keypoint head + rigid fit, same output dict as
    `models.iegmn.docking_forward` (coordinates in the HaloBatch's node
    order). Dropout must be 0 in this path (paper models use 0)."""
    mc = cfg.model
    assert mc.dropout == 0.0, "halo path supports dropout=0 only"

    node = P("data", AXIS)
    prot = ProteinBatch(
        res_id=node, x=P("data", AXIS, None), mu_r_norm=P("data", AXIS, None),
        nbr=P("data", AXIS, None), nbr_mask=P("data", AXIS, None),
        edge_feat=P("data", AXIS, None, None), node_mask=node)
    gathered = P("data", None, None)

    # Overlapped Pallas ring tier: RDMA kernel on real TPU; mosaic interpret
    # mode (simulated semaphores/remote DMAs) everywhere else, so the CPU
    # mesh tests exercise the same kernel logic.
    pallas_ring = cfg.parallel.pallas_ring_halo
    interpret = jax.default_backend() != "tpu"

    def trunk_fn(n_lays: int, fine_tune: bool, ragged: bool):
        def fn(p, lig, rec, x_l_in, plan_l, plan_r):
            return _trunk_local(p, mc, n_lays, fine_tune, lig, rec,
                                x_l_in, plan_l, plan_r,
                                pallas_ring=pallas_ring, interpret=interpret)

        ps = plan_pspec(ragged)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), prot, prot, P("data", AXIS, None), ps, ps),
            out_specs=(gathered,) * 4, check_vma=False)

    def stage(params_stage, hb: HaloBatch, x_l_in, n_lays, fine_tune):
        ragged = hb.plan_lig.send_next_flat is not None
        x_l_f, h_l_f, x_r_f, h_r_f = trunk_fn(n_lays, fine_tune, ragged)(
            params_stage, hb.pair.lig, hb.pair.rec, x_l_in,
            hb.plan_lig, hb.plan_rec)
        return keypoint_head(params_stage, mc, h_l_f, x_l_f, h_r_f, x_r_f,
                             hb.pair.lig.node_mask, hb.pair.rec.node_mask)

    def forward(params, hb: HaloBatch, n_lays: Optional[int] = None):
        n_lays = n_lays if n_lays is not None else mc.iegmn_n_lays
        x_l = hb.pair.lig.x
        if mc.fine_tune and "finetune" in params:
            R0, t0, _, _ = stage(params["original"], hb, x_l, n_lays, False)
            x_l = apply_rigid(x_l, R0, t0)
            R, t, kl, kr = stage(params["finetune"], hb, x_l, 2, True)
            lig_pred = apply_rigid(x_l, R, t)
            # Compose the two stages so (R, t) maps the ORIGINAL input
            # ligand to `ligand_coords` — same convention as the dense
            # `docking_forward` (models/iegmn.py, fine-tune branch).
            R2, t2 = R, t
            R = jnp.einsum("bij,bjk->bik", R2, R0)
            t = jnp.einsum("bij,bnj->bni", R2, t0) + t2
        else:
            R, t, kl, kr = stage(params["original"], hb, x_l, n_lays, False)
            lig_pred = apply_rigid(x_l, R, t)
        return {"ligand_coords": lig_pred, "keypts_lig": kl,
                "keypts_rec": kr, "R": R, "t": t}

    return forward


# --------------------------------------------------------------------------- #
# Production train step over a HaloBatch
# --------------------------------------------------------------------------- #

def plan_pspec(ragged: bool = False) -> HaloPlan:
    flat = P("data", AXIS, None) if ragged else None
    up = P("data", AXIS, None, None) if ragged else None
    return HaloPlan(send_next=P("data", AXIS, None),
                    send_prev=P("data", AXIS, None),
                    send_res=P("data", AXIS, None),
                    send_next_flat=flat, send_prev_flat=flat,
                    unpack_prev=up, unpack_next=up)


def halo_batch_pspec(ragged: bool = False) -> HaloBatch:
    plan = plan_pspec(ragged)
    return HaloBatch(pair=batch_pspec(shard_nodes=True),
                     plan_lig=plan, plan_rec=plan)


def shard_halo_batch(hb: HaloBatch, mesh: Mesh) -> HaloBatch:
    specs = halo_batch_pspec(hb.plan_lig.send_next_flat is not None)
    return jax.tree.map(
        # None pairs = absent optional fields (seg_id/seg_mask; the halo path
        # is never packed) — pass through
        lambda x, s: x if x is None else jax.device_put(
            x, NamedSharding(mesh, s)),
        hb, specs,
        is_leaf=lambda x: not isinstance(x, (HaloBatch, HaloPlan, PairBatch,
                                             ProteinBatch)))


def make_halo_train_step(cfg: Config, mesh: Mesh, ragged: bool = False):
    """jitted train step whose forward is the halo-exchange trunk; the step
    math is `train.step.step_body` with the forward swapped, so the scheduler
    (lr_scale) and clip telemetry match the single-chip path."""
    from ..train.losses import total_loss
    from ..train.step import TrainState, step_body

    fwd = make_halo_forward(cfg, mesh)

    def halo_loss_fn(params, cfg_, hb: HaloBatch, rng, train: bool,
                     bn_state=()):
        assert not bn_state, "BN norm options are not supported in the halo path"
        out = fwd(params, hb)
        loss, metrics = total_loss(out, hb.pair, cfg_.train)
        return loss, (metrics, out)

    repl = NamedSharding(mesh, P())
    hb_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), halo_batch_pspec(ragged),
        is_leaf=lambda x: isinstance(x, P))

    def step(state: TrainState, hb: HaloBatch, rng, lr_scale):
        new_state, metrics = step_body(state, hb, rng, cfg, lr_scale,
                                       loss_fn_=halo_loss_fn)
        # Same as the dp path: don't force an all-gather of per-batch coords
        # through the replicated out_shardings (only the epoch loop meters).
        metrics.pop("ligand_coords", None)
        return new_state, metrics

    return jax.jit(step,
                   in_shardings=(repl, hb_shardings, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))
