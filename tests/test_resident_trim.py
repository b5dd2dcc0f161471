"""Remainder trimming on device-resident epochs (`-trim_remainder`).

The n % bs leftover pairs of each bucket group run as one narrow (1, r)
scan step instead of a bs-wide step with dead slots. These tests pin:
(1) the chunk partition (same membership as the padded schedule, widths
trimmed); (2) exact update-math equivalence of a trimmed step vs the same
step padded with masked slots; (3) the trimmed epoch runner end-to-end and
its streamed twin's parity.
"""

import dataclasses

import jax
import numpy as np
import pytest

from equidock_public_tpu.config import Config, ModelConfig, TrainConfig
from equidock_public_tpu.data.dataset import DockingDataset
from equidock_public_tpu.data.synth import write_synth_split
from equidock_public_tpu.models.iegmn import init_docking_model
from equidock_public_tpu.train.resident import (_group_chunks,
                                                assemble_batch,
                                                build_resident_split,
                                                run_train_epoch_resident,
                                                run_eval_epoch_resident,
                                                run_train_epoch_resident_streamed,
                                                StreamedResidentSplit)
from equidock_public_tpu.train.step import create_train_state, step_body

SIZES = [(10, 14), (12, 15), (9, 11), (13, 8), (11, 12), (8, 10), (9, 9)]


def _cfg(**train_kw):
    tk = dict(bs=3, sinkhorn_iters=40, trim_remainder=True)
    tk.update(train_kw)
    return Config(
        model=ModelConfig(residue_emb_dim=8, iegmn_lay_hid_dim=8,
                          iegmn_n_lays=2, num_att_heads=4),
        train=TrainConfig(**tk))


def _ds(tmp_path, cfg):
    cache = write_synth_split(str(tmp_path / "train.npz"), SIZES, seed=5, k=4)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, node_buckets=(16, 32), pocket_buckets=(8, 16)))
    return DockingDataset(cfg, "train", cache_path=cache), cfg


def test_trim_chunk_partition():
    rng = np.random.default_rng(0)
    m_rng = np.random.default_rng(1)
    chunks, S = _group_chunks(7, 3, rng, m_rng, 0.1, trim=True)
    assert S == 3
    widths = [c[0].shape for c in chunks]
    assert widths[-1] == (1, 1)                      # 7 % 3 == 1, trimmed
    assert all(c[0].shape[1] == 3 for c in chunks[:-1])
    # membership: every pair scheduled exactly once, all slots valid
    seen = np.concatenate([c[0].reshape(-1) for c in chunks])
    assert sorted(seen.tolist()) == list(range(7))
    assert all(np.all(c[1] == 1.0) for c in chunks)
    # exactly one metered (emit) chunk, and it is full-width
    emits = [c for c in chunks if c[2]]
    assert len(emits) == 1 and emits[0][0].shape[1] == 3

    # group smaller than bs: the remainder IS the epoch and is metered
    chunks, S = _group_chunks(2, 3, np.random.default_rng(0),
                              np.random.default_rng(1), 0.1, trim=True)
    assert S == 1 and len(chunks) == 1
    assert chunks[0][0].shape == (1, 2) and chunks[0][2]

    # trim=False reproduces the padded layout: bs-wide steps, padded slots
    chunks, S = _group_chunks(7, 3, np.random.default_rng(0),
                              np.random.default_rng(1), 0.1, trim=False)
    assert S == 3
    assert all(c[0].shape[1] == 3 for c in chunks)
    total_valid = sum(float(c[1].sum()) for c in chunks)
    assert total_valid == 7.0


def test_trimmed_step_matches_padded(tmp_path):
    """One gradient step over a trimmed (r,) batch == the same real pairs in
    a padded (bs,) batch with dead slots, given identical augmentations —
    the invariant that makes `-trim_remainder` a pure compute saving."""
    cfg = _cfg(bs=3)
    ds, cfg = _ds(tmp_path, cfg)
    rs = build_resident_split(ds, cfg)
    b = min(rs.groups)
    store = rs.groups[b]
    r = 2
    key = jax.random.PRNGKey(0)
    rot = jax.numpy.stack([jax.numpy.eye(3)] * 3)
    tr = jax.numpy.zeros((3, 3))
    flag = jax.numpy.zeros((3,), bool)

    idx_pad = jax.numpy.asarray([0, 1, 1], np.int32)
    valid_pad = jax.numpy.asarray([1.0, 1.0, 0.0])
    batch_pad, _ = assemble_batch(store, idx_pad, valid_pad, key, False,
                                  cfg.graph.translation_interval,
                                  rigid=(rot, tr), swap_flag=flag)
    idx_trim = jax.numpy.asarray([0, 1], np.int32)
    valid_trim = jax.numpy.ones((r,))
    batch_trim, _ = assemble_batch(store, idx_trim, valid_trim, key, False,
                                   cfg.graph.translation_interval,
                                   rigid=(rot[:r], tr[:r]),
                                   swap_flag=flag[:r])

    params = init_docking_model(jax.random.PRNGKey(7), cfg.model)
    scale = jax.numpy.asarray(1.0)
    k_step = jax.random.PRNGKey(9)
    st_a = create_train_state(jax.tree.map(jax.numpy.array, params), cfg)
    st_a, m_a = step_body(st_a, batch_pad, k_step, cfg, scale)
    st_b = create_train_state(jax.tree.map(jax.numpy.array, params), cfg)
    st_b, m_b = step_body(st_b, batch_trim, k_step, cfg, scale)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    for pth_a, a, bb in zip(
            [k for k, _ in
             jax.tree_util.tree_flatten_with_path(st_a.params)[0]],
            jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5,
                                   err_msg=str(pth_a))


def test_trimmed_epoch_runner_and_stream_parity(tmp_path):
    cfg = _cfg(bs=3)
    ds, cfg = _ds(tmp_path, cfg)
    rs = build_resident_split(ds, cfg)
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(11)
    params = init_docking_model(jax.random.PRNGKey(1), cfg.model)
    st = create_train_state(jax.tree.map(jax.numpy.array, params), cfg)
    st, tr = run_train_epoch_resident(st, rs, cfg, rng, key, 0,
                                      log=lambda *a, **k: None)
    assert np.isfinite(tr["loss"])
    # 7 pairs over buckets {16, 32}: step count is ceil per group, same as
    # the padded schedule
    expect = sum(-(-len(m.n_lig) // rs.bs) for m in rs.metas.values())
    assert tr["num_batches"] == expect
    assert np.isfinite(tr["complex_rmsd_median"])

    va = run_eval_epoch_resident(st.params, rs, cfg, jax.random.PRNGKey(5),
                                 repeats=2, bn_state=st.bn_state)
    for k in ("loss", "complex_rmsd_median", "interface_rmsd_median"):
        assert np.isfinite(va[k]), k

    # streamed twin: same seeds -> same trajectory (shared _run_group)
    srs = StreamedResidentSplit.build(ds, cfg)
    st2 = create_train_state(jax.tree.map(jax.numpy.array, params), cfg)
    st2, tr2 = run_train_epoch_resident_streamed(
        st2, srs, cfg, np.random.default_rng(3), jax.random.PRNGKey(11), 0,
        log=lambda *a, **k: None)
    np.testing.assert_allclose(tr["loss"], tr2["loss"], rtol=1e-6)
    for a, bb in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-6)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
