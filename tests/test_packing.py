"""Complex packing: padding-invariance extended to packed batches.

Packing several small complexes into one padded slot (block-diagonal neighbor
tables + seg-masked attention/keypoints/losses) must reproduce the unpacked
per-complex outputs, losses and metering exactly (up to float tolerance) —
the packed analogue of the bucket-padding-invariance guarantee.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equidock_public_tpu.config import bucket_for
from equidock_public_tpu.data.featurize import ProteinGraph
from equidock_public_tpu.data.synth import synth_graph
from equidock_public_tpu.graph import collate, collate_packed, plan_packing
from equidock_public_tpu.models.iegmn import docking_forward, init_docking_model
from equidock_public_tpu.train.losses import total_loss
from equidock_public_tpu.train.meter import RmsdMeter

from .utils import tiny_config

BUCKETS = (32, 64, 128)
POCKET_BUCKETS = (8, 16)


def _graph(rng, n):
    d = synth_graph(rng, n, k=4)
    e = np.zeros(0, np.int32)
    return ProteinGraph(res_id=d["res_id"], x=d["x"], mu_r_norm=d["mu_r_norm"],
                        nbr=d["nbr"], nbr_mask=d["nbr_mask"],
                        edge_feat=d["edge_feat"], src=e, dst=e)


def _complexes(seed=0, sizes=((10, 14), (12, 9), (7, 20), (15, 11))):
    rng = np.random.default_rng(seed)
    ligs, recs, new_xs, gts, pls, prs = [], [], [], [], [], []
    for nl, nr in sizes:
        lig, rec = _graph(rng, nl), _graph(rng, nr)
        ligs.append(lig)
        recs.append(rec)
        new_xs.append(lig.x + rng.standard_normal((nl, 3)).astype(np.float32))
        gts.append(lig.x)
        p = rng.standard_normal((5, 3)).astype(np.float32)
        pls.append(p)
        prs.append(p + 0.5)
    return ligs, recs, new_xs, gts, pls, prs


def test_plan_packing_valid_and_tighter():
    from equidock_public_tpu.graph import _plan_cost

    slot_buckets = tuple(range(1, 21))
    rng = np.random.default_rng(1)
    nl = rng.integers(5, 60, 20).tolist()
    nr = rng.integers(5, 60, 20).tolist()
    slots = plan_packing(nl, nr, BUCKETS, max_per_slot=4,
                         slot_count_buckets=slot_buckets)
    flat = [i for s in slots for i in s]
    assert sorted(flat) == list(range(20))           # complete + disjoint
    assert all(1 <= len(s) <= 4 for s in slots)
    # under the planner's exact cost model (what collate_packed pads to),
    # the chosen plan never loses to the unpacked one-complex-per-slot plan
    packed_cost = _plan_cost(slots, nl, nr, BUCKETS, slot_buckets)
    unpacked = [[i] for i in range(20)]
    unpacked_cost = _plan_cost(unpacked, nl, nr, BUCKETS, slot_buckets)
    assert packed_cost <= unpacked_cost

    # and strictly wins when complexes are small relative to the buckets:
    # 20 complexes of 16 residues pack 4-up into 64-buckets (cost 8 x 128)
    # vs 20 x 64 unpacked
    small = [16] * 20
    tight = plan_packing(small, small, BUCKETS, max_per_slot=4,
                         slot_count_buckets=slot_buckets)
    assert _plan_cost(tight, small, small, BUCKETS, slot_buckets) < \
        _plan_cost(unpacked, small, small, BUCKETS, slot_buckets)
    assert all(len(s) >= 2 for s in tight)   # actually packs multiple per slot


@pytest.mark.parametrize("fine_tune", [False, True])
def test_packed_forward_matches_unpacked(fine_tune):
    cfg = tiny_config(fine_tune=fine_tune)
    items = _complexes()
    unpacked = collate(*items, BUCKETS, POCKET_BUCKETS)
    packed = collate_packed(*items, BUCKETS, POCKET_BUCKETS, max_per_slot=2,
                            slot_count_buckets=(2, 4))
    assert packed.n_segs == 2
    params = init_docking_model(jax.random.PRNGKey(0), cfg.model)

    out_u = jax.jit(lambda b: docking_forward(params, cfg.model, b),
                    static_argnames=())(unpacked)
    out_p = jax.jit(lambda b: docking_forward(params, cfg.model, b))(packed)

    # map each original complex to its packed (slot, seg) location and
    # compare per-node predicted coords + per-complex R/t
    seg_l = np.asarray(packed.lig.seg_id)
    mask_l = np.asarray(packed.lig.node_mask)
    seg_mask = np.asarray(packed.seg_mask)
    coords_u = np.asarray(out_u["ligand_coords"])
    coords_p = np.asarray(out_p["ligand_coords"])
    x_u = np.asarray(unpacked.lig.x)
    x_p = np.asarray(packed.lig.x)

    matched = 0
    for i in range(len(items[0])):
        ni = items[0][i].num_nodes
        xin = np.asarray(items[2][i])
        for b in range(seg_mask.shape[0]):
            for c in range(packed.n_segs):
                if seg_mask[b, c] == 0:
                    continue
                idx = np.where((mask_l[b] > 0) & (seg_l[b] == c))[0]
                if len(idx) != ni or not np.allclose(x_p[b, idx], xin):
                    continue
                np.testing.assert_allclose(coords_p[b, idx],
                                           coords_u[i, :ni], atol=2e-3)
                np.testing.assert_allclose(
                    np.asarray(out_p["R"])[b, c],
                    np.asarray(out_u["R"])[i], atol=2e-3)
                np.testing.assert_allclose(
                    np.asarray(out_p["t"])[b, c],
                    np.asarray(out_u["t"])[i], atol=2e-3)
                matched += 1
    assert matched == len(items[0])
    assert np.allclose(x_u[0, : items[0][0].num_nodes],
                       np.asarray(items[2][0]))  # sanity on the layout


def test_packed_loss_matches_unpacked():
    cfg = tiny_config()
    items = _complexes(seed=3)
    unpacked = collate(*items, BUCKETS, POCKET_BUCKETS)
    packed = collate_packed(*items, BUCKETS, POCKET_BUCKETS, max_per_slot=3,
                            slot_count_buckets=(1, 2, 3, 4))
    params = init_docking_model(jax.random.PRNGKey(1), cfg.model)

    loss_u, m_u = jax.jit(lambda b: total_loss(
        docking_forward(params, cfg.model, b), b, cfg.train))(unpacked)
    loss_p, m_p = jax.jit(lambda b: total_loss(
        docking_forward(params, cfg.model, b), b, cfg.train))(packed)
    np.testing.assert_allclose(float(m_u["ligand_coors_loss"]),
                               float(m_p["ligand_coors_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_u["intersection_loss"]),
                               float(m_p["intersection_loss"]), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(float(m_u["ot_loss"]),
                               float(m_p["ot_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(loss_u), float(loss_p), rtol=1e-3)


def test_packed_meter_matches_unpacked():
    items = _complexes(seed=5)
    unpacked = collate(*items, BUCKETS, POCKET_BUCKETS)
    packed = collate_packed(*items, BUCKETS, POCKET_BUCKETS, max_per_slot=2,
                            slot_count_buckets=(2, 4))
    # meter the INPUT pose (deterministic, model-free)
    mu, mp = RmsdMeter(), RmsdMeter()
    mu.update_batch(unpacked, np.asarray(unpacked.lig.x),
                    meter_interface=True)
    mp.update_batch(packed, np.asarray(packed.lig.x), meter_interface=True)
    assert sorted(np.round(mu.complex, 5)) == sorted(np.round(mp.complex, 5))
    assert sorted(np.round(mu.interface, 5)) == sorted(np.round(mp.interface, 5))


def test_dataset_packed_batches(tmp_path):
    """DockingDataset with pack=True yields packed batches that carry every
    complex exactly once per epoch, and an epoch's packed train metering sees
    the same complexes as unpacked."""
    import dataclasses

    from equidock_public_tpu.config import Config
    from equidock_public_tpu.data.dataset import DockingDataset
    from equidock_public_tpu.data.synth import write_synth_split

    sizes = [(10, 14), (12, 9), (7, 20), (15, 11), (30, 8), (9, 9), (11, 13)]
    cache = write_synth_split(str(tmp_path / "train.npz"), sizes, seed=2, k=4)
    cfg = Config()
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, pack=True, pack_max_per_slot=3,
        node_buckets=(32, 64, 128), pocket_buckets=(8, 16)))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, bs=4))
    ds = DockingDataset(cfg, "train", swap=False, cache_path=cache)
    rng = np.random.default_rng(0)
    total = 0
    for batch in ds.batches(rng, shuffle=True):
        assert batch.n_segs == 3
        assert batch.seg_mask is not None
        total += int(np.asarray(batch.seg_mask).sum())
        # every valid node belongs to a valid seg
        oh = np.asarray(batch.lig.seg_onehot(batch.n_segs))
        assert np.all(oh.sum(-1) == np.asarray(batch.lig.node_mask))
    assert total == len(sizes)


def test_packed_train_step_runs():
    import dataclasses

    from equidock_public_tpu.train.step import create_train_state, train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, pack=True,
                                      pack_max_per_slot=3))
    items = _complexes(seed=7)
    packed = collate_packed(*items, BUCKETS, POCKET_BUCKETS, max_per_slot=3)
    params = init_docking_model(jax.random.PRNGKey(2), cfg.model)
    before = jax.tree.map(np.asarray, params)  # train_step donates the state
    state = create_train_state(params, cfg)
    state2, metrics = train_step(state, packed, jax.random.PRNGKey(3), cfg,
                                 jnp.asarray(1.0))
    assert np.isfinite(float(metrics["loss"]))
    # parameters actually moved
    delta = sum(float(np.abs(np.asarray(a) - b).sum()) for a, b in zip(
        jax.tree.leaves(state2.params), jax.tree.leaves(before)))
    assert delta > 0.0
