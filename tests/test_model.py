"""Model-level properties: shapes, padding invariance, SE(3) equivariance.

Equivariance is the model's central mathematical claim (IEGMN, arXiv
2111.07786) — never directly tested in the reference (SURVEY §4b).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model

from .utils import synth_batch, synth_protein, tiny_config


def _forward(cfg, params, batch):
    return jax.jit(
        lambda p, b: docking_forward(p, cfg.model, b)
    )(params, batch)


def test_forward_shapes(rng):
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng)
    out = _forward(cfg, params, batch)
    B, N_l = batch.lig.x.shape[:2]
    H = cfg.model.num_att_heads
    assert out["ligand_coords"].shape == (B, N_l, 3)
    assert out["keypts_lig"].shape == (B, H, 3)
    assert out["R"].shape == (B, 3, 3)
    assert out["t"].shape == (B, 1, 3)
    R = np.asarray(out["R"])
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-3)


def test_padding_invariance(rng):
    """Growing the padded node dimension must not change valid outputs — the
    guarantee that bucketed padding (replacing dgl.batch) is semantics-free."""
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=1, N_l=12, N_r=16, n_l=10, n_r=13)

    # Re-pad to larger buckets
    def grow(p, n_new):
        pad_n = n_new - p.x.shape[1]
        def padf(a, fill=0.0):
            cfgpad = [(0, 0), (0, pad_n)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, cfgpad, constant_values=fill)
        return p.replace(
            res_id=padf(p.res_id), x=padf(p.x),
            mu_r_norm=padf(p.mu_r_norm, 1.0),
            nbr=padf(p.nbr), nbr_mask=padf(p.nbr_mask),
            edge_feat=padf(p.edge_feat), node_mask=padf(p.node_mask))

    big = batch.replace(lig=grow(batch.lig, 20), rec=grow(batch.rec, 24),
                        gt_lig=jnp.pad(batch.gt_lig, [(0, 0), (0, 8), (0, 0)]))

    out_small = _forward(cfg, params, batch)
    out_big = _forward(cfg, params, big)
    n_l = 10
    np.testing.assert_allclose(
        np.asarray(out_small["ligand_coords"])[:, :n_l],
        np.asarray(out_big["ligand_coords"])[:, :n_l], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_small["keypts_lig"]),
                               np.asarray(out_big["keypts_lig"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_small["R"]),
                               np.asarray(out_big["R"]), rtol=1e-3, atol=1e-4)


def _transform_protein(p, Q, b):
    return p.replace(x=jnp.einsum("ij,bnj->bni", Q, p.x) + b)


def test_se3_equivariance_receptor_frame(rng):
    """Rigidly moving the receptor by (Q, b) must move the predicted ligand
    placement by exactly (Q, b): pred' = Q pred + b."""
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    # Large coordinate scale keeps the keypoint covariance well-conditioned
    # (untrained attention collapses keypoints toward the centroid; at the
    # degenerate point the rotation is ill-defined and the reference's own
    # jitter-retry breaks equivariance as well).
    batch = synth_batch(rng, B=2, coord_scale=400.0)
    Q = jnp.asarray(Rotation.random(random_state=3).as_matrix().astype(np.float32))
    b = jnp.asarray(np.array([3.0, -2.0, 7.0], np.float32))

    out0 = _forward(cfg, params, batch)
    batch_rot = batch.replace(rec=_transform_protein(batch.rec, Q, b))
    out1 = _forward(cfg, params, batch_rot)

    mask = np.asarray(batch.lig.node_mask)[..., None]
    expect = jnp.einsum("ij,bnj->bni", Q, out0["ligand_coords"]) + b
    np.testing.assert_allclose(
        np.asarray(out1["ligand_coords"]) * mask, np.asarray(expect) * mask,
        rtol=1e-3, atol=5e-3)


def test_se3_invariance_ligand_frame(rng):
    """Rigidly moving the ligand INPUT pose must leave the predicted (docked)
    ligand coordinates unchanged — the headline claim of rigid docking by
    direct (R, t) regression."""
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2, coord_scale=400.0)
    Q = jnp.asarray(Rotation.random(random_state=5).as_matrix().astype(np.float32))
    b = jnp.asarray(np.array([-4.0, 1.0, 2.0], np.float32))

    out0 = _forward(cfg, params, batch)
    batch_rot = batch.replace(lig=_transform_protein(batch.lig, Q, b))
    out1 = _forward(cfg, params, batch_rot)

    mask = np.asarray(batch.lig.node_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(out1["ligand_coords"]) * mask,
        np.asarray(out0["ligand_coords"]) * mask, rtol=1e-3, atol=5e-3)


def test_role_symmetry_swap_gives_exact_inverse_rigid(rng):
    """Swapping ligand/receptor roles yields the EXACT inverse rigid:
    R_swap = R^T, t_swap = -R^T t. The keypoint head Kabsch-fits ligand
    keypoints onto receptor keypoints with side-symmetric trunk weights, so
    reversing the roles reverses the same fit (measured at 1e-6 on the real
    frozen test set too, scripts/swap_tta.py) — role-swap TTA is a no-op."""
    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2, N_l=16, N_r=16, n_l=14, n_r=13,
                        coord_scale=400.0)
    swapped = batch.replace(lig=batch.rec, rec=batch.lig,
                            gt_lig=batch.gt_lig[:, : batch.rec.x.shape[1]])

    out = _forward(cfg, params, batch)
    out_s = _forward(cfg, params, swapped)
    R = np.asarray(out["R"])
    t = np.asarray(out["t"])
    R_s = np.asarray(out_s["R"])
    t_s = np.asarray(out_s["t"])
    for b in range(R.shape[0]):
        np.testing.assert_allclose(R_s[b], R[b].T, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            t_s[b].reshape(3), -(R[b].T @ t[b].reshape(3)),
            rtol=1e-3, atol=1e-3)


def test_shared_layers_param_structure():
    cfg_shared = tiny_config(shared_layers=True, iegmn_n_lays=4)
    cfg_unshared = tiny_config(shared_layers=False, iegmn_n_lays=4)
    p_s = init_docking_model(jax.random.PRNGKey(0), cfg_shared.model)
    p_u = init_docking_model(jax.random.PRNGKey(0), cfg_unshared.model)
    # shared: single interm layer reused; unshared: stacked (n-1) leading axis
    assert p_s["original"]["rest"]["edge_mlp"]["lin1"]["w"].ndim == 2
    assert p_u["original"]["rest"]["edge_mlp"]["lin1"]["w"].shape[0] == 3


def test_bf16_compute_close_to_f32(rng):
    """Mixed-precision (bf16 matmuls, f32 accumulate) stays within bf16
    tolerance of the f32 path."""
    import dataclasses

    cfg = tiny_config()
    cfg_bf16 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2, coord_scale=400.0)
    out32 = jax.jit(lambda p, b: docking_forward(p, cfg.model, b))(params, batch)
    out16 = jax.jit(lambda p, b: docking_forward(p, cfg_bf16.model, b))(params, batch)
    mask = np.asarray(batch.lig.node_mask)[..., None]
    ref = np.asarray(out32["ligand_coords"]) * mask
    got = np.asarray(out16["ligand_coords"]) * mask
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.05, np.abs(got - ref).max()


def test_graph_norm_and_fine_tune_paths(rng):
    """Exercise final_h_layer_norm='GN' (GraphNorm) and the fine_tune second
    IEGMN stage (`rigid_docking_model.py:622-625`)."""
    import dataclasses

    cfg = tiny_config(final_h_layer_norm="GN", fine_tune=True)
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    assert "finetune" in params
    batch = synth_batch(rng, B=2, coord_scale=400.0)
    out = jax.jit(lambda p, b: docking_forward(p, cfg.model, b))(params, batch)
    assert np.isfinite(np.asarray(out["ligand_coords"])).all()
    R = np.asarray(out["R"])
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-3)
    # the returned (R, t) must be the COMPOSED two-stage transform: applying
    # it to the ORIGINAL ligand reproduces ligand_coords (the property the
    # inference CLI asserts, `inference_rigid.py:202-203`; the reference
    # itself returns only the stage-2 transform, which breaks that assert
    # for fine_tune checkpoints)
    t = np.asarray(out["t"])
    x = np.asarray(batch.lig.x)
    mask = np.asarray(batch.lig.node_mask)[..., None]
    recon = np.einsum("bij,bnj->bni", R, x) + t
    np.testing.assert_allclose(recon * mask,
                               np.asarray(out["ligand_coords"]) * mask,
                               atol=1e-2)


def test_graph_norm_matches_reference_semantics(rng):
    """GraphNorm == per-graph (x - mean)/(std + eps) with sample std
    (`src/utils/graph_norm.py:26-41`), computed over valid nodes only."""
    from equidock_public_tpu.models.layers import graph_norm, init_layer_norm

    B, N, D = 2, 10, 6
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    mask = np.zeros((B, N), np.float32)
    mask[0, :7] = 1
    mask[1, :10] = 1
    p = init_layer_norm(D)
    got = np.asarray(graph_norm(p, jnp.asarray(x), jnp.asarray(mask)))
    for b in range(B):
        n = int(mask[b].sum())
        xx = x[b, :n]
        ref = (xx - xx.mean(0)) / (xx.std(0, ddof=1) + 1e-5)
        np.testing.assert_allclose(got[b, :n], ref, rtol=1e-4, atol=1e-5)


def test_pad_cache_collation_identical(rng):
    """collate with and without the PadCache must produce identical batches."""
    from equidock_public_tpu.config import Config, DataConfig
    from equidock_public_tpu.data.dataset import DockingDataset
    import os
    import pytest

    cache = ("./cache/db5_residues_maxneighbor_10_cutoff_30.0_pocketCut_8.0/"
             "cv_0/val.npz")
    if not os.path.exists(cache):
        pytest.skip("DB5 val cache not built")
    cfg = Config(data=DataConfig(node_buckets=(512, 1024, 2048, 3072),
                                 pocket_buckets=(256,)))
    ds = DockingDataset(cfg, "val", swap=False)
    ds.samples = ds.samples[:4]
    ds.codes = ds.codes[:4]

    b_cached = next(ds.batches(np.random.default_rng(3), shuffle=False,
                               batch_size=4))
    ds._pad_cache.__init__()  # clear
    from equidock_public_tpu.graph import collate
    items = [ds.sample(i, np.random.default_rng((3, 0, i).__hash__() % (2**32)))
             for i in range(4)]
    # equality of static fields only (coords depend on rng stream)
    b2 = next(ds.batches(np.random.default_rng(3), shuffle=False,
                         batch_size=4))
    for name in ("res_id", "mu_r_norm", "nbr", "nbr_mask", "edge_feat",
                 "node_mask"):
        np.testing.assert_array_equal(np.asarray(getattr(b_cached.lig, name)),
                                      np.asarray(getattr(b2.lig, name)))
        np.testing.assert_array_equal(np.asarray(getattr(b_cached.rec, name)),
                                      np.asarray(getattr(b2.rec, name)))


def test_factored_edge_mlp_matches_concat_path(rng):
    """The decomposed edge-MLP (per-term matmuls, no concat) is the same
    function as the concat form up to float reassociation — forward outputs
    AND gradients must agree on identical params."""
    import dataclasses

    from equidock_public_tpu.train.losses import total_loss

    cfg = tiny_config()
    cfg_fac = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, factored_edge_mlp=True))
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2, coord_scale=400.0)

    def run(mcfg):
        return jax.jit(lambda p, b: docking_forward(p, mcfg, b))(params, batch)

    # reassociation differences pass through 2 layers + the SVD head, so the
    # comparison is loose-ish (coords are at scale ~400 here)
    out_a, out_b = run(cfg.model), run(cfg_fac.model)
    mask = np.asarray(batch.lig.node_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(out_a["ligand_coords"]) * mask,
        np.asarray(out_b["ligand_coords"]) * mask, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_a["R"]), np.asarray(out_b["R"]),
                               rtol=1e-3, atol=1e-3)

    def loss(p, mcfg):
        out = docking_forward(p, mcfg, batch)
        l, _ = total_loss(out, batch, cfg.train)
        return l

    g_a = jax.jit(jax.grad(loss), static_argnums=1)(params, cfg.model)
    g_b = jax.jit(jax.grad(loss), static_argnums=1)(params, cfg_fac.model)
    # gradient direction must agree leaf-wise (cosine > 0.999) and the global
    # norms must match to 1% — element-wise tolerances are meaningless for
    # near-zero entries under reassociation
    import optax

    na, nb = float(optax.global_norm(g_a)), float(optax.global_norm(g_b))
    assert abs(na - nb) / na < 1e-2, (na, nb)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-8:
            assert np.dot(a, b) / denom > 0.999


def test_batch_norm_matches_torch(rng):
    """`layers.batch_norm` == torch BatchNorm1d through 3 chained train steps
    (running-stat momentum semantics) and the subsequent eval step; padded
    rows excluded via the mask never bias the statistics."""
    import torch

    from equidock_public_tpu.models.layers import batch_norm, init_bn_state

    D, n_valid, n_pad = 16, 37, 11
    p = {"g": jnp.asarray(rng.standard_normal(D).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(D).astype(np.float32))}
    st = init_bn_state(D)
    # explicit dtype: test_reference_parity flips torch's default to float64
    # at import time, which pytest does during collection
    tb = torch.nn.BatchNorm1d(D, dtype=torch.float32)
    with torch.no_grad():
        tb.weight.copy_(torch.from_numpy(np.asarray(p["g"])))
        tb.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    tb.train()

    for step in range(3):
        rows = rng.standard_normal((n_valid, D)).astype(np.float32)
        ref = tb(torch.from_numpy(rows)).detach().numpy()
        x = np.concatenate([rows, np.full((n_pad, D), 1e6, np.float32)])
        mask = np.concatenate([np.ones((n_valid, 1), np.float32),
                               np.zeros((n_pad, 1), np.float32)])
        out, st = batch_norm(p, st, jnp.asarray(x), jnp.asarray(mask), True)
        np.testing.assert_allclose(np.asarray(out)[:n_valid], ref,
                                   rtol=1e-4, atol=1e-4, err_msg=f"step{step}")
    np.testing.assert_allclose(np.asarray(st["mean"]),
                               tb.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st["var"]),
                               tb.running_var.numpy(), rtol=1e-4, atol=1e-5)

    tb.eval()
    rows = rng.standard_normal((n_valid, D)).astype(np.float32)
    ref = tb(torch.from_numpy(rows)).detach().numpy()
    out, st2 = batch_norm(p, st, jnp.asarray(rows), None, False)
    assert st2 is st
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_model_with_bn_trains_and_evals(rng):
    """'BN' norm options (`args.py:72-75` / `rigid_docking_model.py:18-37`):
    a train step must return finite loss AND advance the running statistics;
    eval must consume them (different stats -> different outputs)."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import (init_bn_state,
                                                  init_docking_model)
    from equidock_public_tpu.train.step import (create_train_state, eval_step,
                                                train_step)
    from .utils import synth_batch, tiny_config

    cfg = tiny_config(layer_norm="BN", final_h_layer_norm="BN",
                      layer_norm_coors="BN")
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    state = create_train_state(params, cfg)
    assert set(state.bn_state) == set(init_bn_state(cfg.model))
    batch = synth_batch(rng)

    st0 = jax.tree.map(np.asarray, state.bn_state)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), cfg)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        state.bn_state, st0)
    assert max(jax.tree.leaves(moved)) > 1e-4   # stats advanced

    out_new = eval_step(state.params, batch, cfg, state.bn_state)
    out_init = eval_step(state.params, batch, cfg,
                         jax.tree.map(jnp.asarray, st0))
    assert np.isfinite(float(out_new["loss"]))
    assert abs(float(out_new["loss"]) - float(out_init["loss"])) > 0
