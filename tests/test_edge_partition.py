"""Edge-partitioned (shard_map) layer == dense layer on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from equidock_public_tpu.models.iegmn import (init_docking_model,
                                              iegmn_layer_forward)
from equidock_public_tpu.parallel.edge_partition import make_sharded_layer
from equidock_public_tpu.parallel.mesh import make_mesh

from .utils import synth_batch, tiny_config

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_layer_matches_dense(rng):
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    lp = params["original"]["layer0"]
    B, N = 4, 16  # N divisible by gp
    batch = synth_batch(rng, B=B, N_l=N, N_r=N, n_l=N - 2, n_r=N - 2)

    D = cfg.model.input_node_feats_dim
    h_l = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, N, D)).astype(np.float32))
    h_r = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, N, D)).astype(np.float32))

    dense = iegmn_layer_forward(
        lp, cfg.model, False, False, batch.lig, batch.rec,
        batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
        batch.lig.edge_feat, batch.rec.edge_feat, batch.lig.x, batch.rec.x)

    mesh = make_mesh(dp=4, gp=2)
    layer = make_sharded_layer(cfg.model, mesh, skip=False)
    with jax.set_mesh(mesh):
        sharded = layer(lp, batch.lig, batch.rec,
                        batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
                        batch.lig.edge_feat, batch.rec.edge_feat,
                        batch.lig.x, batch.rec.x)

    for a, b in zip(dense, sharded):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
