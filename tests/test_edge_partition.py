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


def test_ring_cross_attention_matches_dense(rng):
    from equidock_public_tpu.ops.attention import cross_attention
    from equidock_public_tpu.parallel.ring_attention import (
        make_ring_cross_attention)

    B, N, M, D = 4, 16, 24, 8
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    qm = np.zeros((B, N), np.float32); qm[:, :13] = 1
    km = np.zeros((B, M), np.float32); km[:, :19] = 1
    qm, km = jnp.asarray(qm), jnp.asarray(km)

    ref = cross_attention(q, k, v, qm, km)

    mesh = make_mesh(dp=4, gp=2)
    ring = make_ring_cross_attention(mesh)
    with jax.set_mesh(mesh):
        got = ring(q, k, v, qm, km)

    w = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got) * w, np.asarray(ref) * w,
                               rtol=1e-4, atol=1e-5)
