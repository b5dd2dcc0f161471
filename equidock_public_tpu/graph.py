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
    """One side (ligand or receptor) of a batch of complexes, padded to N."""

    res_id: jnp.ndarray      # (B, N) int32 residue-type index
    x: jnp.ndarray           # (B, N, 3) f32 current coordinates (ligand: randomly
    #                          transformed 'new_x'; receptor: bound 'x')
    mu_r_norm: jnp.ndarray   # (B, N, 5) f32 (padded entries = 1.0 so log() = 0)
    nbr: jnp.ndarray         # (B, N, K) int32 source-node index per in-edge
    nbr_mask: jnp.ndarray    # (B, N, K) f32 {0, 1}
    edge_feat: jnp.ndarray   # (B, N, K, 27) f32
    node_mask: jnp.ndarray   # (B, N) f32 {0, 1}

    @property
    def n_nodes(self) -> jnp.ndarray:
        return self.node_mask.sum(axis=1)


@struct.dataclass
class PairBatch:
    """A batch of ligand/receptor complexes plus training labels."""

    lig: ProteinBatch
    rec: ProteinBatch
    gt_lig: jnp.ndarray        # (B, N_l, 3) bound ligand CA coords (MSE target)
    pocket_lig: jnp.ndarray    # (B, P, 3) pocket midpoints, ligand frame (augmented)
    pocket_rec: jnp.ndarray    # (B, P, 3) pocket midpoints, receptor frame
    pocket_mask: jnp.ndarray   # (B, P) f32 {0, 1}
    pair_mask: jnp.ndarray     # (B,) f32 {0, 1}: 0 for padding complexes

    @property
    def batch_size(self) -> int:
        return self.pair_mask.shape[0]


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
    sample can never alias a stale cache entry the way a raw `id()` key could."""

    def __init__(self):
        import weakref

        self._cache: "weakref.WeakKeyDictionary[ProteinGraph, dict]" = \
            weakref.WeakKeyDictionary()

    def get(self, g: ProteinGraph, n_max: int) -> dict:
        per_graph = self._cache.get(g)
        if per_graph is None:
            per_graph = {}
            self._cache[g] = per_graph
        hit = per_graph.get(n_max)
        if hit is None:
            hit = pad_protein(g, n_max)
            per_graph[n_max] = hit
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
