"""Shared synthetic-batch builders for tests."""

import numpy as np
import jax.numpy as jnp

from equidock_public_tpu.config import Config, ModelConfig, TrainConfig
from equidock_public_tpu.graph import PairBatch, ProteinBatch


def tiny_config(**model_kw) -> Config:
    mk = dict(residue_emb_dim=8, iegmn_lay_hid_dim=8, iegmn_n_lays=2,
              num_att_heads=4)
    mk.update(model_kw)
    return Config(model=ModelConfig(**mk),
                  train=TrainConfig(sinkhorn_iters=50))


def synth_protein(rng, B, N, K, n_valid, coord_scale=10.0) -> ProteinBatch:
    x = (rng.standard_normal((B, N, 3)) * coord_scale).astype(np.float32)
    nbr = rng.integers(0, n_valid, (B, N, K)).astype(np.int32)
    node_mask = np.zeros((B, N), np.float32)
    node_mask[:, :n_valid] = 1
    nbr_mask = (rng.uniform(size=(B, N, K)) > 0.2).astype(np.float32)
    nbr_mask *= node_mask[:, :, None]
    ef = rng.standard_normal((B, N, K, 27)).astype(np.float32) * nbr_mask[..., None]
    mu = (np.abs(rng.standard_normal((B, N, 5))) + 0.5).astype(np.float32)
    rid = rng.integers(0, 21, (B, N)).astype(np.int32)
    return ProteinBatch(
        res_id=jnp.asarray(rid), x=jnp.asarray(x), mu_r_norm=jnp.asarray(mu),
        nbr=jnp.asarray(nbr), nbr_mask=jnp.asarray(nbr_mask),
        edge_feat=jnp.asarray(ef), node_mask=jnp.asarray(node_mask))


def synth_batch(rng, B=2, N_l=12, N_r=16, K=4, P=8, n_l=10, n_r=13,
                n_pocket=6, coord_scale=10.0) -> PairBatch:
    lig = synth_protein(rng, B, N_l, K, n_l, coord_scale)
    rec = synth_protein(rng, B, N_r, K, n_r, coord_scale)
    pm = np.zeros((B, P), np.float32)
    pm[:, :n_pocket] = 1
    return PairBatch(
        lig=lig, rec=rec,
        gt_lig=jnp.asarray((rng.standard_normal((B, N_l, 3)) * 10).astype(np.float32)),
        pocket_lig=jnp.asarray((rng.standard_normal((B, P, 3)) * 5).astype(np.float32)),
        pocket_rec=jnp.asarray((rng.standard_normal((B, P, 3)) * 5).astype(np.float32)),
        pocket_mask=jnp.asarray(pm), pair_mask=jnp.ones(B))
