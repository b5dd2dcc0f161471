"""Per-layer activation parity vs an independent PyTorch transcription of the
reference's IEGMN semantics (`rigid_docking_model.py:189-352,521-589`),
run with IDENTICAL weights on the same unpadded graph.

This is the BASELINE.json "per-layer IEGMN activations allclose" check: the
torch side below follows the reference equations (not its DGL code), our JAX
side runs the padded batched path; both must agree on the valid slice.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from equidock_public_tpu.models.iegmn import (docking_forward,
                                              iegmn_layer_forward,
                                              init_docking_model)

from .utils import synth_batch, tiny_config

torch.set_default_dtype(torch.float64)


def t64(x):
    return torch.tensor(np.asarray(x, dtype=np.float64))


def torch_linear(p, x):
    y = x @ t64(p["w"])
    if "b" in p:
        y = y + t64(p["b"])
    return y


def torch_mlp2(p, x, slope, use_ln):
    h = torch_linear(p["lin1"], x)
    h = torch.nn.functional.leaky_relu(h, negative_slope=slope)
    if use_ln:
        mean = h.mean(-1, keepdim=True)
        var = h.var(-1, unbiased=False, keepdim=True)
        h = (h - mean) / torch.sqrt(var + 1e-5) * t64(p["ln"]["g"]) + t64(p["ln"]["b"])
    return torch_linear(p["lin2"], h)


def torch_layer(lp, cfg, skip, x_l, h_l, x_r, h_r, orig_h_l, orig_h_r,
                he_l, he_r, nbr_l, mask_l, nbr_r, mask_r, fine_tune=False):
    """One IEGMN layer per the reference equations, unpadded, float64.

    `fine_tune=True` adds the coordinate cross-attention correction of
    `rigid_docking_model.py:294-310`."""
    slope = cfg.leakyrelu_neg_slope
    sig = torch.tensor([1.5 ** k for k in range(15)], dtype=torch.float64)

    def side(x, h, he, nbr, mask):
        # per-edge: x_rel = x_src - x_dst  (u_sub_v semantics)
        x_src = x[nbr]                       # (N, K, 3)
        x_rel = x_src - x[:, None, :]
        d2 = (x_rel ** 2).sum(-1, keepdim=True)
        rbf = torch.exp(-d2 / sig)
        h_src = h[nbr]
        h_dst = h[:, None, :].expand(-1, nbr.shape[1], -1)
        msg_in = torch.cat([h_src, h_dst, he, rbf], dim=-1)
        msg = torch_mlp2(lp["edge_mlp"], msg_in, slope, cfg.layer_norm == "LN")
        return x_rel, msg

    x_rel_l, msg_l = side(x_l, h_l, he_l, nbr_l, mask_l)
    x_rel_r, msg_r = side(x_r, h_r, he_r, nbr_r, mask_r)

    def att(q_h, k_h, v_h):
        q = torch.nn.functional.leaky_relu(q_h @ t64(lp["att_q"]["w"]), slope)
        k = torch.nn.functional.leaky_relu(k_h @ t64(lp["att_k"]["w"]), slope)
        v = v_h @ t64(lp["att_v"]["w"])
        a = q @ k.T                               # mask == 1 everywhere (single complex)
        w = torch.softmax(a, dim=1)
        return w @ v

    cross_l = att(h_l, h_r, h_r)
    cross_r = att(h_r, h_l, h_l)

    def coord(x, x_rel, msg, mask):
        coef = torch_mlp2(lp["coors_mlp"], msg, slope, cfg.layer_norm_coors == "LN")
        mom = x_rel * coef
        m = mask[..., None].to(torch.float64)
        x_upd = (mom * m).sum(1) / m.sum(1).clamp(min=1.0)
        return x + x_upd                           # x_connection_init = 0

    x_fin_l = coord(x_l, x_rel_l, msg_l, mask_l)
    x_fin_r = coord(x_r, x_rel_r, msg_r, mask_r)

    if fine_tune:
        # x_final += V(h) * (x_now - cross_att(Q(h), K(h_other), x_now_other))
        # (`rigid_docking_model.py:294-310`; Q/K are bias-free + LeakyReLU,
        #  V is Linear -> LeakyReLU -> Linear(d, 1))
        def ft_att(q_h, k_h, x_vals):
            q = torch.nn.functional.leaky_relu(
                q_h @ t64(lp["ft_att_q"]["w"]), slope)
            k = torch.nn.functional.leaky_relu(
                k_h @ t64(lp["ft_att_k"]["w"]), slope)
            w = torch.softmax(q @ k.T, dim=1)
            return w @ x_vals

        def ft_v(h):
            z = torch.nn.functional.leaky_relu(
                torch_linear(lp["ft_att_v1"], h), slope)
            return torch_linear(lp["ft_att_v2"], z)

        x_fin_l = x_fin_l + ft_v(h_l) * (x_l - ft_att(h_l, h_r, x_r))
        x_fin_r = x_fin_r + ft_v(h_r) * (x_r - ft_att(h_r, h_l, x_l))

    def node(h, msg, cross, orig_h, mask):
        m = mask[..., None].to(torch.float64)
        aggr = (msg * m).sum(1) / m.sum(1).clamp(min=1.0)
        upd = torch_mlp2(lp["node_mlp"], torch.cat([h, aggr, cross, orig_h], -1),
                         slope, cfg.layer_norm == "LN")
        if skip:
            upd = cfg.skip_weight_h * upd + (1 - cfg.skip_weight_h) * h
        return upd

    h_fin_l = node(h_l, msg_l, cross_l, orig_h_l, mask_l)
    h_fin_r = node(h_r, msg_r, cross_r, orig_h_r, mask_r)
    return x_fin_l, h_fin_l, x_fin_r, h_fin_r


def torch_keypoint_head(p, cfg, h_l, x_l, h_r, x_r):
    """Reference keypoint head + Kabsch (`rigid_docking_model.py:521-589`)."""
    slope = cfg.leakyrelu_neg_slope
    d = cfg.iegmn_lay_hid_dim
    H = cfg.num_att_heads

    def h_mean(h):
        z = torch_linear(p["mlp_h_mean_rot"], h)
        z = torch.nn.functional.leaky_relu(z, negative_slope=slope)
        return z.mean(0, keepdim=True)

    mean_l, mean_r = h_mean(h_l), h_mean(h_r)

    def keypts(h_side, x_side, mean_other):
        keys = (h_side @ t64(p["att_key_rot"]["w"])).view(-1, H, d).transpose(0, 1)
        query = (mean_other @ t64(p["att_query_rot"]["w"])).view(1, H, d)
        query = query.transpose(0, 1).transpose(1, 2)          # (H, d, 1)
        att = torch.softmax(keys @ query / math.sqrt(d), dim=1).view(H, -1)
        return att @ x_side

    Y_rec = keypts(h_r, x_r, mean_l)
    Y_lig = keypts(h_l, x_l, mean_r)
    A = (Y_rec - Y_rec.mean(0, keepdim=True)).T @ (Y_lig - Y_lig.mean(0, keepdim=True))
    U, S, Vt = torch.linalg.svd(A)
    corr = torch.diag(torch.tensor([1.0, 1.0, torch.sign(torch.det(A)).item()],
                                   dtype=torch.float64))
    R = (U @ corr) @ Vt
    t = Y_rec.mean(0, keepdim=True) - (R @ Y_lig.mean(0, keepdim=True).T).T
    return R, t, Y_lig, Y_rec


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(iegmn_n_lays=3)
    rng = np.random.default_rng(0)
    B, N_l, N_r = 1, 12, 16
    n_l, n_r = 12, 16  # no padding: torch side is unpadded
    batch = synth_batch(rng, B=B, N_l=N_l, N_r=N_r, n_l=n_l, n_r=n_r,
                        coord_scale=500.0)
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    return cfg, batch, params


def test_per_layer_activations_allclose(setup):
    cfg, batch, params = setup
    mc = cfg.model
    p0 = params["original"]

    # JAX layer 0 on the padded batch
    D = mc.input_node_feats_dim
    rngh = np.random.default_rng(3)
    h_l = jnp.asarray(rngh.standard_normal((1, 12, D)).astype(np.float32))
    h_r = jnp.asarray(rngh.standard_normal((1, 16, D)).astype(np.float32))
    jax_out = iegmn_layer_forward(
        p0["layer0"], mc, False, False, batch.lig, batch.rec,
        batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
        batch.lig.edge_feat, batch.rec.edge_feat, batch.lig.x, batch.rec.x)

    # torch transcription on the unpadded graph
    t_out = torch_layer(
        p0["layer0"], mc, False,
        t64(batch.lig.x[0]), t64(h_l[0]), t64(batch.rec.x[0]), t64(h_r[0]),
        t64(h_l[0]), t64(h_r[0]),
        t64(batch.lig.edge_feat[0]), t64(batch.rec.edge_feat[0]),
        torch.tensor(np.asarray(batch.lig.nbr[0], dtype=np.int64)),
        t64(batch.lig.nbr_mask[0]),
        torch.tensor(np.asarray(batch.rec.nbr[0], dtype=np.int64)),
        t64(batch.rec.nbr_mask[0]))

    labels = ["x_lig", "h_lig", "x_rec", "h_rec"]
    for lbl, j, t in zip(labels, jax_out, t_out):
        np.testing.assert_allclose(np.asarray(j[0]), t.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=lbl)


def test_full_forward_R_t_allclose(setup):
    cfg, batch, params = setup
    mc = cfg.model

    out = docking_forward(params, mc, batch)

    # torch full trunk: embedding + log(mu) + 3 layers + head
    p = params["original"]
    emb = t64(p["embedding"]["e"])
    h_l = torch.cat([emb[np.asarray(batch.lig.res_id[0], dtype=np.int64)],
                     torch.log(t64(batch.lig.mu_r_norm[0]))], dim=1)
    h_r = torch.cat([emb[np.asarray(batch.rec.res_id[0], dtype=np.int64)],
                     torch.log(t64(batch.rec.mu_r_norm[0]))], dim=1)
    x_l, x_r = t64(batch.lig.x[0]), t64(batch.rec.x[0])
    orig_h_l, orig_h_r = h_l, h_r
    nbr_l = torch.tensor(np.asarray(batch.lig.nbr[0], dtype=np.int64))
    nbr_r = torch.tensor(np.asarray(batch.rec.nbr[0], dtype=np.int64))
    mask_l = t64(batch.lig.nbr_mask[0])
    mask_r = t64(batch.rec.nbr_mask[0])
    he_l, he_r = t64(batch.lig.edge_feat[0]), t64(batch.rec.edge_feat[0])

    for i in range(mc.iegmn_n_lays):
        lp = (p["layer0"] if i == 0 else
              jax.tree.map(lambda a: a[i - 1], p["rest"]))
        x_l, h_l, x_r, h_r = torch_layer(
            lp, mc, i > 0, x_l, h_l, x_r, h_r, orig_h_l, orig_h_r,
            he_l, he_r, nbr_l, mask_l, nbr_r, mask_r)

    R_t, t_t, Y_lig, Y_rec = torch_keypoint_head(p, mc, h_l, x_l, h_r, x_r)

    np.testing.assert_allclose(np.asarray(out["keypts_lig"][0]),
                               Y_lig.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["keypts_rec"][0]),
                               Y_rec.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["R"][0]), R_t.numpy(),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out["t"][0]), t_t.numpy(),
                               rtol=1e-2, atol=5e-2)
    pred_torch = (R_t @ t64(batch.lig.x[0]).T).T + t_t
    np.testing.assert_allclose(np.asarray(out["ligand_coords"][0]),
                               pred_torch.numpy(), rtol=1e-2, atol=5e-2)


# --------------------------------------------------------------------------- #
# Fine-tune (two-stage) path, `rigid_docking_model.py:294-310,611-692`
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def ft_setup():
    cfg = tiny_config(iegmn_n_lays=3, fine_tune=True)
    rng = np.random.default_rng(7)
    batch = synth_batch(rng, B=1, N_l=12, N_r=16, n_l=12, n_r=16,
                        coord_scale=500.0)
    params = init_docking_model(jax.random.PRNGKey(5), cfg.model)
    return cfg, batch, params


def _torch_trunk(p, mc, batch, x_l, x_r, n_lays, fine_tune):
    """Reference IEGMN trunk + keypoint head in float64 torch, starting the
    ligand at coordinates `x_l` (the stage input, `rigid_docking_model.py:
    459-471,483-501`)."""
    emb = t64(p["embedding"]["e"])
    h_l = torch.cat([emb[np.asarray(batch.lig.res_id[0], dtype=np.int64)],
                     torch.log(t64(batch.lig.mu_r_norm[0]))], dim=1)
    h_r = torch.cat([emb[np.asarray(batch.rec.res_id[0], dtype=np.int64)],
                     torch.log(t64(batch.rec.mu_r_norm[0]))], dim=1)
    orig_h_l, orig_h_r = h_l, h_r
    nbr_l = torch.tensor(np.asarray(batch.lig.nbr[0], dtype=np.int64))
    nbr_r = torch.tensor(np.asarray(batch.rec.nbr[0], dtype=np.int64))
    mask_l = t64(batch.lig.nbr_mask[0])
    mask_r = t64(batch.rec.nbr_mask[0])
    he_l, he_r = t64(batch.lig.edge_feat[0]), t64(batch.rec.edge_feat[0])
    for i in range(n_lays):
        lp = (p["layer0"] if i == 0 else
              jax.tree.map(lambda a: a[i - 1], p["rest"]))
        x_l, h_l, x_r, h_r = torch_layer(
            lp, mc, i > 0, x_l, h_l, x_r, h_r, orig_h_l, orig_h_r,
            he_l, he_r, nbr_l, mask_l, nbr_r, mask_r, fine_tune=fine_tune)
    return torch_keypoint_head(p, mc, h_l, x_l, h_r, x_r)


def test_fine_tune_layer_parity(ft_setup):
    """The ft coordinate cross-attention terms match the reference equations
    (`rigid_docking_model.py:294-310`) with identical weights."""
    cfg, batch, params = ft_setup
    mc = cfg.model
    pft = params["finetune"]

    D = mc.input_node_feats_dim
    rngh = np.random.default_rng(11)
    h_l = jnp.asarray(rngh.standard_normal((1, 12, D)).astype(np.float32))
    h_r = jnp.asarray(rngh.standard_normal((1, 16, D)).astype(np.float32))
    jax_out = iegmn_layer_forward(
        pft["layer0"], mc, True, False, batch.lig, batch.rec,
        batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
        batch.lig.edge_feat, batch.rec.edge_feat, batch.lig.x, batch.rec.x)

    t_out = torch_layer(
        pft["layer0"], mc, False,
        t64(batch.lig.x[0]), t64(h_l[0]), t64(batch.rec.x[0]), t64(h_r[0]),
        t64(h_l[0]), t64(h_r[0]),
        t64(batch.lig.edge_feat[0]), t64(batch.rec.edge_feat[0]),
        torch.tensor(np.asarray(batch.lig.nbr[0], dtype=np.int64)),
        t64(batch.lig.nbr_mask[0]),
        torch.tensor(np.asarray(batch.rec.nbr[0], dtype=np.int64)),
        t64(batch.rec.nbr_mask[0]), fine_tune=True)

    for lbl, j, t in zip(["x_lig", "h_lig", "x_rec", "h_rec"], jax_out, t_out):
        np.testing.assert_allclose(np.asarray(j[0]), t.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg="ft " + lbl)


def test_two_stage_forward_parity(ft_setup):
    """Full -fine_tune forward: stage-1 (R0,t0) applied to the ligand, then the
    2-layer ft trunk — final coords match the reference composition
    (`rigid_docking_model.py:642-692`)."""
    cfg, batch, params = ft_setup
    mc = cfg.model

    out = docking_forward(params, mc, batch)

    # torch: stage 1 (original trunk, no ft terms)
    R0, t0, _, _ = _torch_trunk(params["original"], mc, batch,
                                t64(batch.lig.x[0]), t64(batch.rec.x[0]),
                                mc.iegmn_n_lays, fine_tune=False)
    x_l_mid = (R0 @ t64(batch.lig.x[0]).T).T + t0
    # stage 2 (2-layer ft trunk) on the moved ligand
    R, t, Y_lig, Y_rec = _torch_trunk(params["finetune"], mc, batch,
                                      x_l_mid, t64(batch.rec.x[0]), 2,
                                      fine_tune=True)
    pred = (R @ x_l_mid.T).T + t

    np.testing.assert_allclose(np.asarray(out["keypts_lig"][0]),
                               Y_lig.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["keypts_rec"][0]),
                               Y_rec.numpy(), rtol=1e-3, atol=1e-3)
    # we return the COMPOSED transform R2@R0 / R2 t0 + t2 (the reference
    # returns only the stage-2 pair, `rigid_docking_model.py:683-686`, which
    # contradicts its own inference assert for fine_tune checkpoints —
    # see docking_forward); the composition must map the ORIGINAL ligand to
    # the reference's final composed coordinates
    np.testing.assert_allclose(np.asarray(out["R"][0]), (R @ R0).numpy(),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out["t"][0]),
                               ((R @ t0.T).T + t).numpy(),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out["ligand_coords"][0]),
                               pred.numpy(), rtol=1e-2, atol=5e-2)
