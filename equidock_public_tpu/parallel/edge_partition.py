"""Edge-partitioned message passing with explicit collectives (shard_map).

The graph analogue of sequence/context parallelism (SURVEY §2.2, §5
long-context): the padded node axis of each protein is sharded across the
'graph' mesh axis. Each chip owns a contiguous node block and all in-edges of
those nodes (edges are partitioned by destination, matching the fixed-degree
table layout). One boundary exchange per layer — an `all_gather` of the
current coordinates and features over ICI — provides the source-node values
the local edge block gathers from; everything else (edge MLPs, masked means,
feature updates) is chip-local. Cross-attention gathers K/V the same way and
keeps queries local, so the (N_l x N_r) logits are row-sharded.

Compared to the sharding-annotation path (`parallel/train.py`, XLA SPMD
inserts the collectives), this module places the collectives explicitly via
`shard_map` — the layout a Pallas latency-hiding kernel (RDMA overlapped with
local aggregation) drops into.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..graph import ProteinBatch
from ..models.layers import Params

AXIS = "graph"


def _gather_sources(values_local: jnp.ndarray) -> jnp.ndarray:
    """(B, N/gp, ...) local shard -> (B, N, ...) full array via all_gather
    over the graph axis (the boundary-feature exchange; rides ICI)."""
    g = jax.lax.all_gather(values_local, AXIS, axis=1, tiled=True)
    return g


def sharded_layer_forward(
    lp: Params,
    cfg: ModelConfig,
    skip: bool,
    lig_local: ProteinBatch, rec_local: ProteinBatch,
    x_l, h_l, x_r, h_r,              # local shards (B, N/gp, ...)
    orig_h_l, orig_h_r,              # local shards
    he_l, he_r,                      # local shards (edge feats partitioned by dst)
    orig_x_l, orig_x_r,              # local shards
):
    """One IEGMN layer on node shards inside shard_map.

    Strategy: all_gather the per-node quantities each edge/attention gather
    reads (x, h, and the skip/orig inputs indexed by nbr), then reuse the
    dense layer body on a "local destination block vs full source set" view:
    the fixed-degree tables already store GLOBAL source indices, so a local
    ProteinBatch whose nbr/edge tables cover only the local destination block
    plus full gathered node arrays computes exactly the unsharded result for
    the local block.
    """
    x_l_full = _gather_sources(x_l)
    h_l_full = _gather_sources(h_l)
    x_r_full = _gather_sources(x_r)
    h_r_full = _gather_sources(h_r)
    mask_l_full = _gather_sources(lig_local.node_mask)
    mask_r_full = _gather_sources(rec_local.node_mask)

    i = jax.lax.axis_index(AXIS)
    n_loc_l = x_l.shape[1]
    n_loc_r = x_r.shape[1]

    from ..ops.attention import cross_attention
    from ..ops.segment import gather_neighbors, masked_mean_over_k
    from ..models.layers import linear, nonlin, layer_norm
    from ..models.iegmn import _mlp2, _rbf_of_sq_dist

    def edge_messages(local: ProteinBatch, x_full, h_full, x_loc, h_loc, he):
        x_src = gather_neighbors(x_full, local.nbr)            # (B, nloc, K, 3)
        x_rel = x_src - x_loc[:, :, None, :]
        rbf = _rbf_of_sq_dist(x_rel, cfg.use_dist_in_layers)
        h_src = gather_neighbors(h_full, local.nbr)
        h_dst = jnp.broadcast_to(h_loc[:, :, None, :], h_src.shape)
        msg_in = jnp.concatenate([h_src, h_dst, he, rbf], axis=-1)
        msg = _mlp2(lp["edge_mlp"], msg_in, cfg, cfg.layer_norm, None, False)
        return x_rel, msg

    x_rel_l, msg_l = edge_messages(lig_local, x_l_full, h_l_full, x_l, h_l, he_l)
    x_rel_r, msg_r = edge_messages(rec_local, x_r_full, h_r_full, x_r, h_r, he_r)

    def qk(h):
        return nonlin(linear(lp["att_q"], h), cfg.nonlin, cfg.leakyrelu_neg_slope)

    def kk(h):
        return nonlin(linear(lp["att_k"], h), cfg.nonlin, cfg.leakyrelu_neg_slope)

    # queries local, keys/values full: logits stay row-sharded
    cross_l = cross_attention(qk(h_l), kk(h_r_full), linear(lp["att_v"], h_r_full),
                              lig_local.node_mask, mask_r_full, cfg.cross_msgs)
    cross_r = cross_attention(qk(h_r), kk(h_l_full), linear(lp["att_v"], h_l_full),
                              rec_local.node_mask, mask_l_full, cfg.cross_msgs)

    def coord_update(local, x_loc, x_rel, msg, orig_x_loc):
        coef = _mlp2(lp["coors_mlp"], msg, cfg, cfg.layer_norm_coors, None, False)
        x_upd = masked_mean_over_k(x_rel * coef, local.nbr_mask)
        return (cfg.x_connection_init * orig_x_loc
                + (1.0 - cfg.x_connection_init) * x_loc + x_upd)

    x_final_l = coord_update(lig_local, x_l, x_rel_l, msg_l, orig_x_l)
    x_final_r = coord_update(rec_local, x_r, x_rel_r, msg_r, orig_x_r)

    def node_update(local, h_loc, msg, cross, orig_h_loc):
        aggr = masked_mean_over_k(msg, local.nbr_mask)
        upd_in = jnp.concatenate([h_loc, aggr, cross, orig_h_loc], axis=-1)
        upd = _mlp2(lp["node_mlp"], upd_in, cfg, cfg.layer_norm, None, False)
        if skip:
            upd = cfg.skip_weight_h * upd + (1.0 - cfg.skip_weight_h) * h_loc
        if cfg.final_h_layer_norm == "LN":
            upd = layer_norm(lp["final_h_norm"], upd)
        return upd

    h_final_l = node_update(lig_local, h_l, msg_l, cross_l, orig_h_l)
    h_final_r = node_update(rec_local, h_r, msg_r, cross_r, orig_h_r)

    return x_final_l, h_final_l, x_final_r, h_final_r


def make_sharded_layer(cfg: ModelConfig, mesh: Mesh, skip: bool):
    """Wrap `sharded_layer_forward` in shard_map over the ('data','graph')
    mesh: batch over 'data', node axis over 'graph', params replicated."""
    node = P("data", AXIS)
    prot = ProteinBatch(
        res_id=node, x=P("data", AXIS, None), mu_r_norm=P("data", AXIS, None),
        nbr=P("data", AXIS, None), nbr_mask=P("data", AXIS, None),
        edge_feat=P("data", AXIS, None, None), node_mask=node)
    arr3 = P("data", AXIS, None)

    in_specs = (P(), prot, prot, arr3, arr3, arr3, arr3, arr3, arr3,
                P("data", AXIS, None, None), P("data", AXIS, None, None),
                arr3, arr3)
    out_specs = (arr3, arr3, arr3, arr3)

    def fn(lp, lig, rec, x_l, h_l, x_r, h_r, orig_h_l, orig_h_r,
           he_l, he_r, orig_x_l, orig_x_r):
        return sharded_layer_forward(lp, cfg, skip, lig, rec, x_l, h_l,
                                     x_r, h_r, orig_h_l, orig_h_r,
                                     he_l, he_r, orig_x_l, orig_x_r)

    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
