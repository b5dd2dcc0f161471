"""Padded, fixed-shape batch schema — the TPU replacement for DGL's dynamic
hetero-graph batching (`dgl.batch` at `src/utils/train_utils.py:98`).

A batch of B docking complexes is a single PyTree of dense arrays, bucketed by
(N_lig, N_rec, P) so XLA compiles a bounded set of shapes (SURVEY §7.1/§7.3).
Message passing uses fixed-degree neighbor tables (K = graph_max_neighbor = 10),
so aggregation is a dense masked mean over the K axis — no sparse scatter.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from flax import struct
import jax.numpy as jnp

from .config import bucket_for
from .data.featurize import ProteinGraph


@struct.dataclass
class ProteinBatch:
    """One side (ligand or receptor) of a batch of complexes, padded to N.

    With complex packing (several small complexes sharing one padded slot —
    the graph analogue of LLM sequence packing, killing the per-slot padding
    floor of `dgl.batch`-style one-complex-per-row batching), `seg_id` labels
    each node with its within-slot complex index; None for unpacked batches
    (the default), which keeps the one-complex-per-slot fast path unchanged.
    Neighbor tables are block-diagonal by construction (indices offset per
    packed complex), so message passing needs no segment awareness."""

    res_id: jnp.ndarray      # (B, N) int32 residue-type index
    x: jnp.ndarray           # (B, N, 3) f32 current coordinates (ligand: randomly
    #                          transformed 'new_x'; receptor: bound 'x')
    mu_r_norm: jnp.ndarray   # (B, N, 5) f32 (padded entries = 1.0 so log() = 0)
    nbr: jnp.ndarray         # (B, N, K) int32 source-node index per in-edge
    nbr_mask: jnp.ndarray    # (B, N, K) f32 {0, 1}
    edge_feat: jnp.ndarray   # (B, N, K, 27) f32
    node_mask: jnp.ndarray   # (B, N) f32 {0, 1}
    seg_id: Optional[jnp.ndarray] = None   # (B, N) int32 in [0, C); packed only

    @property
    def n_nodes(self) -> jnp.ndarray:
        return self.node_mask.sum(axis=1)

    def seg_onehot(self, n_segs: int) -> jnp.ndarray:
        """(B, N, C) f32: node-to-complex assignment AND validity (padded
        nodes are all-zero rows)."""
        oh = (self.seg_id[..., None] ==
              jnp.arange(n_segs, dtype=self.seg_id.dtype)).astype(jnp.float32)
        return oh * self.node_mask[..., None]


@struct.dataclass
class PairBatch:
    """A batch of ligand/receptor complexes plus training labels.

    Unpacked (default): one complex per slot; `n_segs == 1`, `seg_mask` is
    None, pockets are (B, P, 3) and pair_mask is (B,).

    Packed (`n_segs == C > 1`): each slot holds up to C complexes; per-complex
    arrays grow a seg axis — pockets (B, C, P, 3), pocket_mask (B, C, P),
    seg_mask (B, C) — and per-complex outputs/losses index complexes as
    m = b * C + c. `pair_mask` stays (B,) (1 when the slot holds any valid
    complex) so slot-level code keeps working."""

    lig: ProteinBatch
    rec: ProteinBatch
    gt_lig: jnp.ndarray        # (B, N_l, 3) bound ligand CA coords (MSE target)
    pocket_lig: jnp.ndarray    # (B, [C,] P, 3) pocket midpoints, ligand frame
    pocket_rec: jnp.ndarray    # (B, [C,] P, 3) pocket midpoints, receptor frame
    pocket_mask: jnp.ndarray   # (B, [C,] P) f32 {0, 1}
    pair_mask: jnp.ndarray     # (B,) f32 {0, 1}: 0 for padding slots
    seg_mask: Optional[jnp.ndarray] = None   # (B, C) f32 {0,1}; packed only
    n_segs: int = struct.field(pytree_node=False, default=1)

    @property
    def batch_size(self) -> int:
        return self.pair_mask.shape[0]

    @property
    def complex_mask(self) -> jnp.ndarray:
        """(M,) validity over complexes, M = B * n_segs."""
        if self.n_segs == 1:
            return self.pair_mask
        return self.seg_mask.reshape(-1)


def _pad_axis0(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


class PadCache:
    """Per-(graph, n_max) cache of the padded STATIC protein fields.

    Augmentation only changes coordinates (`db5_data.py:195-204`); res_id,
    mu_r_norm, neighbor tables and edge features are identical every epoch, so
    their padded copies are built once per bucket and reused — this removes
    most of the host-side collation cost per step. Keyed on the live graph
    object via weak references (entries die with the graph), so reloading a
    sample can never alias a stale cache entry the way a raw `id()` key could.

    Explicitly byte-bounded (round 4, VERDICT r3 item 10): `max_bytes` caps
    the total padded-array bytes held; beyond it, least-recently-used entries
    are evicted (they rebuild on next use — a throughput cliff, never an RSS
    cliff). Weak keying handles graph death; the LRU handles long-lived
    datasets whose graphs never die (materialized DB5) meeting many buckets."""

    def __init__(self, max_bytes: int = 4 << 30):
        import collections
        import weakref

        self.max_bytes = int(max_bytes)
        self._weakref = weakref
        self._cache: "weakref.WeakKeyDictionary[ProteinGraph, dict]" = \
            weakref.WeakKeyDictionary()
        # (id(graph), n_max) -> nbytes, oldest first
        self._lru: "collections.OrderedDict[tuple, int]" = \
            collections.OrderedDict()
        self._refs: dict = {}
        # gid -> set of live _lru keys: makes graph-death cleanup O(entries)
        # and lets _refs shrink when a live graph's last entry is evicted
        # (ADVICE r4: the weakref bookkeeping must track the byte budget,
        # not the number of graphs ever seen)
        self._gid_keys: dict = {}
        self._bytes = 0

    @property
    def nbytes(self) -> int:
        return self._bytes

    def _drop_key(self, key: tuple) -> None:
        gid = key[0]
        keys = self._gid_keys.get(gid)
        if keys is not None:
            keys.discard(key)
            if not keys:
                self._gid_keys.pop(gid, None)
                self._refs.pop(gid, None)

    def _forget_graph(self, gid: int) -> None:
        for key in self._gid_keys.pop(gid, set()):
            self._bytes -= self._lru.pop(key, 0)
        self._refs.pop(gid, None)

    def get(self, g: ProteinGraph, n_max: int) -> dict:
        per_graph = self._cache.get(g)
        if per_graph is None:
            per_graph = {}
            self._cache[g] = per_graph
            self._weakref.finalize(g, self._forget_graph, id(g))
        key = (id(g), n_max)
        hit = per_graph.get(n_max)
        if hit is not None:
            self._lru.move_to_end(key)
            return hit
        hit = pad_protein(g, n_max)
        nb = sum(a.nbytes for a in hit.values())
        if nb <= self.max_bytes:
            per_graph[n_max] = hit
            self._refs[id(g)] = self._weakref.ref(g)
            self._gid_keys.setdefault(id(g), set()).add(key)
            self._lru[key] = nb
            self._bytes += nb
            while self._bytes > self.max_bytes and self._lru:
                (ogid, on), onb = self._lru.popitem(last=False)
                self._bytes -= onb
                ref = self._refs.get(ogid)
                og = ref() if ref is not None else None
                if og is not None:
                    self._cache.get(og, {}).pop(on, None)
                self._drop_key((ogid, on))
        return hit


def pad_protein(g: ProteinGraph, n_max: int) -> dict:
    """Pad one ProteinGraph to n_max nodes. Padded nodes self-loop (masked)."""
    n = g.num_nodes
    assert n <= n_max, (n, n_max)
    res_id = _pad_axis0(g.res_id.astype(np.int32), n_max)
    x = _pad_axis0(g.x, n_max)
    mu = _pad_axis0(g.mu_r_norm, n_max, fill=1.0)  # log(1) = 0 for padding
    pad_nbr = np.tile(np.arange(n, n_max, dtype=np.int32)[:, None],
                      (1, g.nbr.shape[1]))
    nbr = np.concatenate([g.nbr.astype(np.int32), pad_nbr], axis=0)
    nbr_mask = _pad_axis0(g.nbr_mask.astype(np.float32), n_max)
    efeat = _pad_axis0(g.edge_feat, n_max)
    node_mask = np.zeros(n_max, dtype=np.float32)
    node_mask[:n] = 1.0
    return dict(res_id=res_id, x=x, mu_r_norm=mu, nbr=nbr, nbr_mask=nbr_mask,
                edge_feat=efeat, node_mask=node_mask)


def collate(
    ligs: Sequence[ProteinGraph],
    recs: Sequence[ProteinGraph],
    lig_new_x: Sequence[np.ndarray],
    gt_lig: Sequence[np.ndarray],
    pockets_lig: Sequence[np.ndarray],
    pockets_rec: Sequence[np.ndarray],
    node_buckets: Tuple[int, ...],
    pocket_buckets: Tuple[int, ...],
    batch_size: Optional[int] = None,
    pad_cache: Optional[PadCache] = None,
) -> PairBatch:
    """Collate complexes into one padded PairBatch (replaces
    `batchify_and_create_hetero_graphs`, `train_utils.py:87-100`).

    `lig_new_x` is the randomly-transformed ligand coordinate array used as the
    model input; `gt_lig` is the bound target. The receptor input coordinates
    are `recs[i].x` (the receptor never moves).
    """
    b_actual = len(ligs)
    B = batch_size if batch_size is not None else b_actual
    assert b_actual <= B
    n_l = bucket_for(max(g.num_nodes for g in ligs), node_buckets)
    n_r = bucket_for(max(g.num_nodes for g in recs), node_buckets)
    P = bucket_for(max(p.shape[0] for p in pockets_lig), pocket_buckets)

    def stack_side(graphs, coords_override) -> ProteinBatch:
        n_max = n_l if graphs is ligs else n_r
        cols: List[dict] = []
        for i in range(B):
            j = min(i, b_actual - 1)
            g = graphs[j]
            d = (pad_cache.get(g, n_max) if pad_cache is not None
                 else pad_protein(g, n_max))
            if coords_override is not None:
                d = dict(d)
                d["x"] = _pad_axis0(
                    np.asarray(coords_override[j], dtype=np.float32), n_max)
            if i >= b_actual:  # padding complex: zero all masks
                d = {k: (np.zeros_like(v) if k in ("nbr_mask", "node_mask") else v)
                     for k, v in d.items()}
            cols.append(d)
        stacked = {k: np.stack([c[k] for c in cols]) for k in cols[0]}
        return ProteinBatch(**{k: jnp.asarray(v) for k, v in stacked.items()})

    lig_batch = stack_side(ligs, lig_new_x)
    rec_batch = stack_side(recs, None)

    def stack_pad(arrs, n_max):
        rows = []
        for i in range(B):
            j = min(i, b_actual - 1)
            rows.append(_pad_axis0(np.asarray(arrs[j], dtype=np.float32), n_max))
        return jnp.asarray(np.stack(rows))

    pocket_mask_np = np.zeros((B, P), dtype=np.float32)
    for i in range(b_actual):
        pocket_mask_np[i, : pockets_lig[i].shape[0]] = 1.0

    pair_mask = np.zeros(B, dtype=np.float32)
    pair_mask[:b_actual] = 1.0

    return PairBatch(
        lig=lig_batch,
        rec=rec_batch,
        gt_lig=stack_pad(gt_lig, n_l),
        pocket_lig=stack_pad(pockets_lig, P),
        pocket_rec=stack_pad(pockets_rec, P),
        pocket_mask=jnp.asarray(pocket_mask_np),
        pair_mask=jnp.asarray(pair_mask),
    )


# --------------------------------------------------------------------------- #
# Complex packing
# --------------------------------------------------------------------------- #

def _snake_partition(order: List[int], n_slots: int) -> List[List[int]]:
    """Deal size-ordered items into n_slots boustrophedon (snake) so slot
    sums stay balanced — near-uniform when item sizes are similar (which the
    size-sorted chunking guarantees)."""
    slots: List[List[int]] = [[] for _ in range(n_slots)]
    for i, idx in enumerate(order):
        row, col = divmod(i, n_slots)
        if row % 2:
            col = n_slots - 1 - col
        slots[col].append(idx)
    return slots


def packed_shape(slots, sizes_l, sizes_r, node_buckets, slot_count_buckets):
    """(B, b_l, b_r) the packed collate will produce for this plan: every
    slot pads to the plan's max packed (lig, rec) buckets and the slot count
    pads to its bucket. Single source of truth for the packed shape policy
    (used by `collate_packed`, the plan cost, and `utils.padding`)."""
    B = bucket_for(len(slots), slot_count_buckets)
    b_l = bucket_for(max(sum(sizes_l[i] for i in s) for s in slots),
                     node_buckets)
    b_r = bucket_for(max(sum(sizes_r[i] for i in s) for s in slots),
                     node_buckets)
    return B, b_l, b_r


def _plan_cost(slots, sizes_l, sizes_r, node_buckets, slot_count_buckets):
    """Total padded node slots of a plan (see `packed_shape`)."""
    B, b_l, b_r = packed_shape(slots, sizes_l, sizes_r, node_buckets,
                               slot_count_buckets)
    return B * (b_l + b_r)


def plan_packing(sizes_l: Sequence[int], sizes_r: Sequence[int],
                 node_buckets: Tuple[int, ...],
                 max_per_slot: int,
                 slot_count_buckets: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7,
                                                        8, 9, 10),
                 ) -> List[List[int]]:
    """Pack complexes into slots minimizing total padded node slots
    (B_bucket x (bucket(max packed n_l) + bucket(max packed n_r))).

    Two candidate families, best by exact padded cost:
      * uniform-k: ceil(n/k) slots, snake-balanced, for every k <=
        max_per_slot — optimal when the chunk's complexes are similar-sized
        (the size-sorted chunking's common case), because every slot then
        lands in the same tight bucket;
      * first-fit-decreasing: largest-first into the slot whose padded size
        grows least — wins on heterogeneous chunks (one huge + many small).
    Host-side, O(n x slots x k) per batch of ~10 complexes.
    """
    n = len(sizes_l)
    order = sorted(range(n), key=lambda i: -(sizes_l[i] + sizes_r[i]))

    def cost(nl, nr):
        return bucket_for(nl, node_buckets) + bucket_for(nr, node_buckets)

    candidates: List[List[List[int]]] = []
    for k in range(1, max_per_slot + 1):
        n_slots = -(-n // k)
        candidates.append(_snake_partition(order, n_slots))

    slots: List[List[int]] = []
    fill_l: List[int] = []
    fill_r: List[int] = []
    for i in order:
        nl, nr = sizes_l[i], sizes_r[i]
        best, best_delta = -1, cost(nl, nr)  # a fresh slot costs this
        for s in range(len(slots)):
            if len(slots[s]) >= max_per_slot:
                continue
            delta = cost(fill_l[s] + nl, fill_r[s] + nr) - cost(fill_l[s],
                                                                fill_r[s])
            if delta < best_delta:
                best, best_delta = s, delta
        if best >= 0:
            slots[best].append(i)
            fill_l[best] += nl
            fill_r[best] += nr
        else:
            slots.append([i])
            fill_l.append(nl)
            fill_r.append(nr)
    candidates.append(slots)

    return min(candidates, key=lambda c: _plan_cost(
        c, sizes_l, sizes_r, node_buckets, slot_count_buckets))


def _pack_side(graphs: Sequence[ProteinGraph],
               coords_override: Optional[Sequence[np.ndarray]],
               slot_assign: Sequence[Sequence[int]],
               n_max: int, n_segs: int,
               pad_cache: Optional[PadCache] = None):
    """Concatenate each slot's complexes along the node axis (neighbor
    indices offset so the packed table stays block-diagonal), pad to n_max.
    Returns (stacked field dict incl. seg_id, per-(slot, member) node offsets
    for unpacking)."""
    B = len(slot_assign)
    K = graphs[0].nbr.shape[1]
    fields = {k: [] for k in ("res_id", "x", "mu_r_norm", "nbr", "nbr_mask",
                              "edge_feat", "node_mask", "seg_id")}
    offsets: List[List[Tuple[int, int]]] = []   # (start, n) per member
    for members in slot_assign:
        segs = []
        offs = []
        base = 0
        for c, gi in enumerate(members):
            g = graphs[gi]
            # unpadded dict view; copy before mutating (the cache entry is
            # shared across epochs)
            d = dict(pad_cache.get(g, g.num_nodes) if pad_cache is not None
                     else pad_protein(g, g.num_nodes))
            if coords_override is not None:
                d["x"] = np.asarray(coords_override[gi], dtype=np.float32)
            d["nbr"] = d["nbr"] + base
            d["seg_id"] = np.full(g.num_nodes, c, np.int32)
            segs.append(d)
            offs.append((base, g.num_nodes))
            base += g.num_nodes
        assert base <= n_max, (base, n_max)
        if segs:
            cat = {k: np.concatenate([s[k] for s in segs], axis=0)
                   for k in segs[0]}
        else:  # padding slot (slot-count bucketing): fully masked
            g0 = graphs[0]
            cat = dict(
                res_id=np.zeros(0, np.int32), x=np.zeros((0, 3), np.float32),
                mu_r_norm=np.zeros((0, g0.mu_r_norm.shape[1]), np.float32),
                nbr=np.zeros((0, K), np.int32),
                nbr_mask=np.zeros((0, K), np.float32),
                edge_feat=np.zeros((0, K, g0.edge_feat.shape[2]), np.float32),
                node_mask=np.zeros(0, np.float32),
                seg_id=np.zeros(0, np.int32))
        # pad tail: self-looping masked nodes, seg id past the last member
        pad_n = n_max - base
        pad_nbr = np.tile(np.arange(base, n_max, dtype=np.int32)[:, None],
                          (1, K))
        fields["res_id"].append(_pad_axis0(cat["res_id"], n_max))
        fields["x"].append(_pad_axis0(cat["x"], n_max))
        fields["mu_r_norm"].append(_pad_axis0(cat["mu_r_norm"], n_max, fill=1.0))
        fields["nbr"].append(np.concatenate([cat["nbr"], pad_nbr], axis=0))
        fields["nbr_mask"].append(_pad_axis0(cat["nbr_mask"], n_max))
        fields["edge_feat"].append(_pad_axis0(cat["edge_feat"], n_max))
        fields["node_mask"].append(_pad_axis0(cat["node_mask"], n_max))
        fields["seg_id"].append(np.concatenate(
            [cat["seg_id"], np.full(pad_n, n_segs - 1, np.int32)], axis=0))
        offsets.append(offs)
    stacked = {k: np.stack(v) for k, v in fields.items()}
    return ProteinBatch(**{k: jnp.asarray(v) for k, v in stacked.items()}), \
        offsets


def collate_packed(
    ligs: Sequence[ProteinGraph],
    recs: Sequence[ProteinGraph],
    lig_new_x: Sequence[np.ndarray],
    gt_lig: Sequence[np.ndarray],
    pockets_lig: Sequence[np.ndarray],
    pockets_rec: Sequence[np.ndarray],
    node_buckets: Tuple[int, ...],
    pocket_buckets: Tuple[int, ...],
    max_per_slot: int,
    slot_count_buckets: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
    pad_cache: Optional[PadCache] = None,
) -> PairBatch:
    """Packed collate: bin-pack the complexes into slots (plan_packing), then
    build one PairBatch whose slots each hold up to `max_per_slot` complexes.
    The slot count is bucketed (padding slots carry all-zero masks) so XLA
    compiles a bounded set of batch shapes."""
    assert max_per_slot >= 2, "packing with 1 complex/slot: use collate()"
    slot_assign = plan_packing([g.num_nodes for g in ligs],
                               [g.num_nodes for g in recs],
                               node_buckets, max_per_slot,
                               slot_count_buckets)
    B, n_l, n_r = packed_shape(slot_assign,
                               [g.num_nodes for g in ligs],
                               [g.num_nodes for g in recs],
                               node_buckets, slot_count_buckets)
    C = max_per_slot
    P = bucket_for(max(p.shape[0] for p in pockets_lig), pocket_buckets)
    pad_slots = [[] for _ in range(B - len(slot_assign))]
    slot_assign = list(slot_assign) + pad_slots

    lig_batch, lig_offs = _pack_side(ligs, lig_new_x, slot_assign, n_l, C,
                                     pad_cache)
    rec_batch, _ = _pack_side(recs, None, slot_assign, n_r, C, pad_cache)

    gt = np.zeros((B, n_l, 3), np.float32)
    pl = np.zeros((B, C, P, 3), np.float32)
    pr = np.zeros((B, C, P, 3), np.float32)
    pmask = np.zeros((B, C, P), np.float32)
    seg_mask = np.zeros((B, C), np.float32)
    for b, members in enumerate(slot_assign):
        for c, gi in enumerate(members):
            start, n = lig_offs[b][c]
            gt[b, start:start + n] = np.asarray(gt_lig[gi], np.float32)
            np_l = pockets_lig[gi].shape[0]
            pl[b, c, :np_l] = np.asarray(pockets_lig[gi], np.float32)
            pr[b, c, :np_l] = np.asarray(pockets_rec[gi], np.float32)
            pmask[b, c, :np_l] = 1.0
            seg_mask[b, c] = 1.0

    return PairBatch(
        lig=lig_batch, rec=rec_batch, gt_lig=jnp.asarray(gt),
        pocket_lig=jnp.asarray(pl), pocket_rec=jnp.asarray(pr),
        pocket_mask=jnp.asarray(pmask),
        pair_mask=jnp.asarray((seg_mask.sum(axis=1) > 0).astype(np.float32)),
        seg_mask=jnp.asarray(seg_mask), n_segs=C)
