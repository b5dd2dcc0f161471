"""Pallas kernels vs their XLA-composition references (interpret mode on CPU;
the same kernels compile for TPU in the bench/train paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equidock_public_tpu.ops.attention import cross_attention
from equidock_public_tpu.ops.pallas.cross_attention import cross_attention_fused


def _inputs(rng, B=2, N=200, M=150, D=16):
    q = rng.standard_normal((B, N, D)).astype(np.float32)
    k = rng.standard_normal((B, M, D)).astype(np.float32)
    v = rng.standard_normal((B, M, D)).astype(np.float32)
    qm = np.zeros((B, N), np.float32)
    km = np.zeros((B, M), np.float32)
    qm[0, :180] = 1
    qm[1, :77] = 1
    km[0, :150] = 1
    km[1, :31] = 1
    return map(jnp.asarray, (q, k, v, qm, km))


def test_fused_cross_attention_forward(rng):
    q, k, v, qm, km = _inputs(rng)
    ref = cross_attention(q, k, v, qm, km)
    got = cross_attention_fused(q, k, v, qm, km, True)
    # only valid query rows are semantically meaningful (masked rows attend
    # uniformly over whatever padding exists and are discarded downstream)
    w = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got) * w, np.asarray(ref) * w,
                               rtol=1e-4, atol=1e-5)


def test_fused_cross_attention_backward(rng):
    q, k, v, qm, km = _inputs(rng, N=130, M=70)

    def loss_ref(q, k, v):
        out = cross_attention(q, k, v, qm, km)
        return jnp.sum(out ** 2 * qm[..., None])

    def loss_fused(q, k, v):
        out = cross_attention_fused(q, k, v, qm, km, True)
        return jnp.sum(out ** 2 * qm[..., None])

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_fused_cross_attention_outlier_sizes(rng):
    """M beyond one key block (BLOCK_M=512) and not a block multiple: the
    online-softmax M-blocking must keep fwd+bwd exact for arbitrarily large
    complexes (the largest configured bucket is 3072; VMEM residency is
    O(BLOCK_N x BLOCK_M) regardless)."""
    q, k, v, qm, km = _inputs(rng, B=2, N=96, M=1219, D=16)

    ref = cross_attention(q, k, v, qm, km)
    got = cross_attention_fused(q, k, v, qm, km, True)
    w = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got) * w, np.asarray(ref) * w,
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v, qm, km) ** 2 * qm[..., None])
        return f

    g_ref = jax.grad(loss(cross_attention), argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(
        loss(lambda *a: cross_attention_fused(*a, True)),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_fused_cross_attention_seg_mask(rng):
    """Packed-slot block-diagonal masking (seg tags riding the mask
    operands) == the XLA q_seg/k_seg path, forward and gradients. This is
    the r4 composition fix: -pack and -use_fused_attention together
    (reference mask semantics: rigid_docking_model.py:68-78)."""
    B, N, M, D = 2, 140, 170, 16
    q = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, M, D)).astype(np.float32))
    qm = np.zeros((B, N), np.float32)
    km = np.zeros((B, M), np.float32)
    qseg = np.zeros((B, N), np.int32)
    kseg = np.zeros((B, M), np.int32)
    # slot 0: segs 0 (60 q / 50 k) and 1 (40 q / 80 k); slot 1: one seg of 77/31
    qm[0, :100] = 1
    qseg[0, 60:100] = 1
    km[0, :130] = 1
    kseg[0, 50:130] = 1
    qm[1, :77] = 1
    km[1, :31] = 1
    qseg[0, 100:] = 7      # garbage on invalid rows must not matter
    kseg[1, 31:] = 5
    qm, km = jnp.asarray(qm), jnp.asarray(km)
    qseg, kseg = jnp.asarray(qseg), jnp.asarray(kseg)

    ref = cross_attention(q, k, v, qm, km, q_seg=qseg, k_seg=kseg)
    got = cross_attention_fused(q, k, v, qm, km, True, q_seg=qseg,
                                k_seg=kseg)
    w = np.asarray(qm)[..., None]
    np.testing.assert_allclose(np.asarray(got) * w, np.asarray(ref) * w,
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2 * qm[..., None])
        return f

    g_ref = jax.grad(
        loss(lambda q, k, v: cross_attention(q, k, v, qm, km, q_seg=qseg,
                                             k_seg=kseg)),
        argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(
        loss(lambda q, k, v: cross_attention_fused(q, k, v, qm, km, True,
                                                   q_seg=qseg, k_seg=kseg)),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_packed_model_with_fused_attention(rng):
    """Full packed forward with the fused attention kernel == the packed XLA
    path (seg-restricted attention inside a real collated packed batch)."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import (docking_forward,
                                                  init_docking_model)

    from .test_packing import BUCKETS, POCKET_BUCKETS, _complexes
    from equidock_public_tpu.graph import collate_packed
    from .utils import tiny_config

    cfg = tiny_config()
    cfg_fused = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_fused_attention=True))
    items = _complexes()
    packed = collate_packed(*items, BUCKETS, POCKET_BUCKETS, max_per_slot=2,
                            slot_count_buckets=(2, 4))
    assert packed.n_segs > 1
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    out_ref = jax.jit(lambda b: docking_forward(params, cfg.model, b))(packed)
    out_fus = jax.jit(
        lambda b: docking_forward(params, cfg_fused.model, b))(packed)
    w = np.asarray(packed.lig.node_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(out_fus["ligand_coords"]) * w,
        np.asarray(out_ref["ligand_coords"]) * w, rtol=1e-3, atol=1e-3)


def test_fused_edge_message_matches_xla_layer(rng):
    """Full IEGMN layer with the fused edge-message kernel == the XLA layer
    (same params; the kernel fuses gathers, RBF, both edge MLPs and the
    segment means — reference hot loop rigid_docking_model.py:226-283)."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import (init_docking_model,
                                                  iegmn_layer_forward)
    from .utils import synth_batch, tiny_config

    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    lp = params["original"]["layer0"]
    B, N = 2, 128
    batch = synth_batch(rng, B=B, N_l=N, N_r=N, n_l=N - 5, n_r=N - 9,
                        coord_scale=50.0)
    D = cfg.model.input_node_feats_dim
    h_l = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    h_r = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    def run(mc):
        return iegmn_layer_forward(
            lp, mc, False, False, batch.lig, batch.rec,
            batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
            batch.lig.edge_feat, batch.rec.edge_feat,
            batch.lig.x, batch.rec.x)

    ref = run(cfg.model)
    fused_cfg = dataclasses.replace(cfg.model, fused_edge_message=True)
    got = run(fused_cfg)
    for lbl, a, b in zip(["x_l", "h_l", "x_r", "h_r"], ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4, err_msg=lbl)


def test_fused_edge_bwd_through_layer(rng):
    """Parameter gradients through a full IEGMN layer with the fused edge
    kernel AND its fused Pallas backward == the XLA layer's gradients."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import (init_docking_model,
                                                  iegmn_layer_forward)
    from .utils import synth_batch, tiny_config

    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    B, N = 2, 64
    batch = synth_batch(rng, B=B, N_l=N, N_r=N, n_l=N - 5, n_r=N - 9,
                        coord_scale=50.0)
    D = cfg.model.input_node_feats_dim
    h_l = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    h_r = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    def loss(lp, mc):
        x_l, hh_l, x_r, hh_r = iegmn_layer_forward(
            lp, mc, False, False, batch.lig, batch.rec,
            batch.lig.x, h_l, batch.rec.x, h_r, h_l, h_r,
            batch.lig.edge_feat, batch.rec.edge_feat,
            batch.lig.x, batch.rec.x)
        m_l = batch.lig.node_mask[..., None]
        m_r = batch.rec.node_mask[..., None]
        return (jnp.sum((x_l * m_l) ** 2) + jnp.sum((hh_l * m_l) ** 2)
                + jnp.sum((x_r * m_r) ** 2) + jnp.sum((hh_r * m_r) ** 2))

    lp = params["original"]["layer0"]
    g_ref = jax.grad(loss)(lp, cfg.model)
    fused_cfg = dataclasses.replace(cfg.model, fused_edge_message=True,
                                    fused_edge_bwd=True)
    g_fus = jax.grad(loss)(lp, fused_cfg)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_fus = jax.tree.leaves(g_fus)
    for (path, a), b in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3, err_msg=str(path))


@pytest.mark.parametrize("fused_bwd", [False, True])
@pytest.mark.parametrize("use_ln,use_dist", [(True, True), (False, True),
                                             (True, False)])
def test_fused_edge_message_backward(rng, fused_bwd, use_ln, use_dist):
    """Gradients of the fused kernel == gradients of the pure XLA
    expression, for both backward modes (XLA recompute and the fused
    Pallas backward kernel)."""
    from equidock_public_tpu.ops.pallas.edge_message import (
        _reference, edge_message_aggregate)

    # N=128 > BLOCK_T=64 so the backward's per-block parameter partials are
    # exercised across multiple grid blocks per batch (NB=2)
    B, N, K, D, E = 2, 128, 4, 16, 27
    src = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((B, N, 3 + D)).astype(np.float32))
    he = jnp.asarray(rng.standard_normal((B, N, K, E)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    msk = jnp.asarray((rng.uniform(size=(B, N, K)) > 0.2).astype(np.float32))
    params = dict(
        Wc=rng.standard_normal((E, D)).astype(np.float32) * 0.1,
        Wd=rng.standard_normal((15, D)).astype(np.float32) * 0.1,
        ln_g=np.ones(D, np.float32), ln_b=np.zeros(D, np.float32),
        W2=rng.standard_normal((D, D)).astype(np.float32) * 0.1,
        b2=np.zeros(D, np.float32),
        W1c=rng.standard_normal((D, D)).astype(np.float32) * 0.1,
        b1c=np.zeros(D, np.float32),
        W2c=rng.standard_normal((D, 1)).astype(np.float32) * 0.1,
        b2c=np.zeros(1, np.float32))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    def loss_f(fn):
        def f(src, dst, params):
            a, x = fn(src, dst, params)
            return jnp.sum(a ** 2) + jnp.sum(x ** 2)
        return f

    ref_fn = loss_f(lambda s, d, p: _reference(s, d, he, nbr, msk, p,
                                               0.01, use_ln, use_dist))
    fus_fn = loss_f(lambda s, d, p: edge_message_aggregate(
        s, d, he, nbr, msk, p, slope=0.01, use_ln=use_ln, use_dist=use_dist,
        interpret=True, fused_bwd=fused_bwd))

    v_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(src, dst, params)
    v_fus, g_fus = jax.value_and_grad(fus_fn, argnums=(0, 1, 2))(src, dst, params)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_model_with_fused_attention_matches_xla(rng):
    """Full model forward with the fused kernel == XLA path."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model

    from .utils import synth_batch, tiny_config

    cfg = tiny_config()
    cfg_fused = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_fused_attention=True))
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2, coord_scale=400.0)
    out_ref = jax.jit(lambda p, b: docking_forward(p, cfg.model, b))(params, batch)
    out_fused = jax.jit(
        lambda p, b: docking_forward(p, cfg_fused.model, b))(params, batch)
    w = np.asarray(batch.lig.node_mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(out_fused["ligand_coords"]) * w,
        np.asarray(out_ref["ligand_coords"]) * w, rtol=1e-3, atol=1e-3)


def test_debug_trace_collects_layer_stats(rng):
    from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model

    from .utils import synth_batch, tiny_config

    cfg = tiny_config()
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2)
    out = docking_forward(params, cfg.model, batch, debug=True)
    assert len(out["trace"]) == cfg.model.iegmn_n_lays
    for layer_stats in out["trace"]:
        for key in ("x_now", "h_feat", "x_rel", "msg", "aggr_cross_msg",
                    "x_final", "h_final"):
            assert key in layer_stats
            assert np.isfinite(float(layer_stats[key]))


def test_fused_intersection_loss(rng):
    from equidock_public_tpu.ops.intersection import body_intersection_loss
    from equidock_public_tpu.ops.pallas.softmin_field import (
        body_intersection_loss_fused)

    B, Nl, Nr = 2, 70, 130
    lig = jnp.asarray((rng.standard_normal((B, Nl, 3)) * 5).astype(np.float32))
    rec = jnp.asarray((rng.standard_normal((B, Nr, 3)) * 5).astype(np.float32))
    lm = np.zeros((B, Nl), np.float32); lm[0, :60] = 1; lm[1] = 1
    rm = np.zeros((B, Nr), np.float32); rm[0] = 1; rm[1, :90] = 1
    lm, rm = jnp.asarray(lm), jnp.asarray(rm)
    sigma, ct = 25.0, 10.0

    ref = body_intersection_loss(lig, lm, rec, rm, sigma, ct)
    got = body_intersection_loss_fused(lig, lm, rec, rm, sigma, ct,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # gradients wrt both coordinate sets
    def loss_ref(lig, rec):
        return jnp.sum(body_intersection_loss(lig, lm, rec, rm, sigma, ct))

    def loss_fused(lig, rec):
        return jnp.sum(body_intersection_loss_fused(lig, lm, rec, rm, sigma,
                                                    ct, interpret=True))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(lig, rec)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(lig, rec)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_train_step_with_fused_kernels(rng):
    """Full train_step with BOTH fused kernels enabled (interpret mode):
    finite loss/grads, matches the XLA-path loss closely."""
    import dataclasses

    from equidock_public_tpu.models.iegmn import init_docking_model
    from equidock_public_tpu.train.step import create_train_state, train_step

    from .utils import synth_batch, tiny_config

    cfg = tiny_config()
    cfg_fused = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_fused_attention=True),
        train=dataclasses.replace(cfg.train, use_fused_intersection=True))
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
    batch = synth_batch(rng, B=2)
    key = jax.random.PRNGKey(1)

    # build both states before stepping: train_step donates its state
    # (and s1.params aliases `params`)
    s1 = create_train_state(params, cfg)
    s2 = create_train_state(jax.tree.map(jnp.copy, params), cfg_fused)
    s1, m1 = train_step(s1, batch, key, cfg)
    s2, m2 = train_step(s2, batch, key, cfg_fused)

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]),
                               rtol=1e-2)
