"""Device-mesh construction and sharding specs.

All of this is new, TPU-first design (the reference is single-GPU; SURVEY
§2.2). Two mesh axes:
  * 'data'  — data parallelism over the batch of complexes,
  * 'graph' — graph parallelism over the padded node axis (the graph analogue
    of sequence/context parallelism): node features and coordinates are
    sharded over chips; XLA SPMD inserts the boundary all-gathers for
    neighbor gathers and the ligand<->receptor cross-attention, which ride
    ICI inside a slice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import PairBatch, ProteinBatch


def make_mesh(dp: Optional[int] = None, gp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // gp
    assert dp * gp == n, f"dp({dp}) * gp({gp}) != n_devices({n})"
    dev_array = np.asarray(devices).reshape(dp, gp)
    return Mesh(dev_array, axis_names=("data", "graph"))


def protein_pspec(shard_nodes: bool, packed: bool = False) -> ProteinBatch:
    """PartitionSpecs for one ProteinBatch: batch over 'data', optionally the
    node axis over 'graph'."""
    n = "graph" if shard_nodes else None
    return ProteinBatch(
        res_id=P("data", n),
        x=P("data", n, None),
        mu_r_norm=P("data", n, None),
        nbr=P("data", n, None),
        nbr_mask=P("data", n, None),
        edge_feat=P("data", n, None, None),
        node_mask=P("data", n),
        seg_id=P("data", n) if packed else None,
    )


def batch_pspec(shard_nodes: bool = False, packed: bool = False,
                n_segs: int = 1) -> PairBatch:
    """PartitionSpecs for a PairBatch. `packed` batches carry a seg axis on
    the pocket arrays plus seg_id/seg_mask; the slot dim stays the
    dp-sharded batch dim (slot_count_buckets must be multiples of dp).
    `n_segs` must equal the batches' static n_segs (a non-node pytree
    field, so spec trees must carry the same value to match treedefs)."""
    seg = (None,) if packed else ()
    return PairBatch(
        lig=protein_pspec(shard_nodes, packed),
        rec=protein_pspec(shard_nodes, packed),
        gt_lig=P("data", "graph" if shard_nodes else None, None),
        pocket_lig=P("data", *seg, None, None),
        pocket_rec=P("data", *seg, None, None),
        pocket_mask=P("data", *seg, None),
        pair_mask=P("data"),
        seg_mask=P("data", None) if packed else None,
        n_segs=n_segs,
    )


def shard_batch(batch: PairBatch, mesh: Mesh,
                shard_nodes: bool = False) -> PairBatch:
    """Place a host PairBatch onto the mesh with the training shardings."""
    specs = batch_pspec(shard_nodes, packed=batch.seg_mask is not None,
                        n_segs=batch.n_segs)
    return jax.tree.map(
        # None pairs = absent optional fields (seg_id/seg_mask on unpacked
        # batches) — pass through
        lambda x, s: x if x is None else jax.device_put(
            x, NamedSharding(mesh, s)),
        batch, specs,
        is_leaf=lambda x: not isinstance(x, (PairBatch, ProteinBatch)))


def replicate(tree, mesh: Mesh):
    """Replicate params/opt state across the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
