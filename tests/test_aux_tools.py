"""Tests for auxiliary tools: DIPS reader, test-set generator, aligner."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from equidock_public_tpu.data.dips import read_dips_pair, residues_from_dataframe
from equidock_public_tpu.data.pdb import ca_coords, read_pdb, write_pdb_renumbered

PDB = "/root/reference/data/benchmark5.5/structures/1A2K_l_b.pdb"


def _fake_dips_frame(n_res=5):
    rows = []
    rng = np.random.default_rng(0)
    aid = 0
    for r in range(n_res):
        for name in ("N", "CA", "C", "O"):
            rows.append(dict(
                chain_id="A", residue_number=r + 1, residue_name="ALA",
                atom_name=name, x_coord=rng.uniform(), y_coord=rng.uniform(),
                z_coord=rng.uniform(), element_symbol=name[0], aid=aid))
            aid += 1
    return pd.DataFrame(rows)


class _FakePair:
    def __init__(self):
        self.df0 = _fake_dips_frame(5)
        self.df1 = _fake_dips_frame(7)


def test_dips_reader(tmp_path):
    path = tmp_path / "pair.dill"
    pd.to_pickle(_FakePair(), path)
    lig, rec = read_dips_pair(str(path))
    assert len(lig) == 5 and len(rec) == 7
    for key, cols in lig:
        assert cols["resname"] == "ALA"
        assert (cols["atom_name"] == "CA").sum() == 1
        assert cols["coords"].shape[1] == 3


def test_testset_generator_db5(tmp_path):
    from equidock_public_tpu.cli.testset_gen import random_transf_pdb

    rng = np.random.default_rng(0)
    out_gt = str(tmp_path / "X_l_b_COMPLEX.pdb")
    out_tr = str(tmp_path / "X_l_b.pdb")
    random_transf_pdb(PDB, out_gt, rng, unchanged=True)
    random_transf_pdb(PDB, out_tr, rng, unchanged=False)

    orig = read_pdb(PDB)
    gt = read_pdb(out_gt)
    tr = read_pdb(out_tr)
    # ground truth: coordinates preserved, ids renumbered from 1
    np.testing.assert_allclose(gt.coords, orig.coords, atol=1e-3)
    assert gt.residue[0] == 1
    assert np.all(np.diff(gt.residue) >= 0)
    # transformed: rigid (pairwise distances preserved), actually moved
    d_orig = np.linalg.norm(orig.coords[0] - orig.coords[-1])
    d_tr = np.linalg.norm(tr.coords[0] - tr.coords[-1])
    np.testing.assert_allclose(d_tr, d_orig, atol=1e-2)
    assert np.linalg.norm(tr.coords - orig.coords) > 0.1


def test_testset_generator_dips_on_synthetic_tree(tmp_path):
    """`testset_gen -dataset dips` end-to-end on a synthetic dill tree:
    family-round-robin sampling (`testset_random_transf.py:66-96`), full-atom
    COMPLEX + randomly-transformed outputs, readable by our PDB pipeline."""
    from equidock_public_tpu.cli.testset_gen import (main_dips,
                                                     sample_dips_round_robin)

    data = tmp_path / "pairs-pruned"
    names = []
    for fi in range(4):
        fam = f"fam{fi}"
        (data / fam).mkdir(parents=True)
        # uneven family sizes: fam0 has 4 pairs, others 1 each
        for pi in range(4 if fi == 0 else 1):
            name = f"{fam}/p{pi}.dill"
            pd.to_pickle(_FakePair(), data / name)
            names.append(name)
    split = tmp_path / "pairs-postprocessed-test.txt"
    split.write_text("\n".join(names) + "\n")

    # sampler: round-robin draws one per family per cycle, skips exhausted
    # families, and stops early when the split runs out
    import random as pyrandom
    sel = sample_dips_round_robin(str(split), 6, pyrandom.Random(0).shuffle)
    assert len(sel) == 6 and len(set(sel)) == 6
    assert [s.split("/")[0] for s in sel[:4]] == ["fam0", "fam1", "fam2", "fam3"]
    assert all(s.startswith("fam0/") for s in sel[4:])  # others exhausted
    assert sample_dips_round_robin(str(split), 100,
                                   pyrandom.Random(0).shuffle) == \
        sample_dips_round_robin(str(split), 100, pyrandom.Random(0).shuffle)

    out = tmp_path / "out"
    rng = np.random.default_rng(3)
    main_dips(str(data), str(split), str(out), rng, num_complexes=3, seed=1)
    written = sorted(os.listdir(out))
    assert len(written) == 3 * 4  # l/r x COMPLEX/transformed per pair
    stem = written[0].split("_l_b")[0].split("_r_b")[0]
    gt = read_pdb(str(out / f"{stem}_l_b_COMPLEX.pdb"))
    tr = read_pdb(str(out / f"{stem}_l_b.pdb"))
    assert len(gt) == 20 and len(tr) == 20          # 5 residues x 4 atoms
    assert gt.residue[0] == 1 and gt.residue[-1] == 5  # renumbered from 1
    assert list(gt.atom_name[:4]) == ["N", "CA", "C", "O"]
    # transformed: rigid (pairwise distance preserved) and actually moved
    d_gt = np.linalg.norm(gt.coords[0] - gt.coords[-1])
    d_tr = np.linalg.norm(tr.coords[0] - tr.coords[-1])
    np.testing.assert_allclose(d_tr, d_gt, atol=1e-2)
    assert np.linalg.norm(tr.coords - (gt.coords - gt.coords.mean(0))) > 0.1
    # the generated set feeds straight back into the CA pipeline
    assert ca_coords(gt).shape == (5, 3)


def test_align_receptor_roundtrip(tmp_path):
    """Transform a ligand+receptor pair rigidly, then verify the aligner
    recovers the ground-truth frame."""
    from equidock_public_tpu.data.featurize import (rigid_transform_kabsch,
                                                    uniform_rotation_translation)
    from equidock_public_tpu.data.pdb import write_pdb

    rng = np.random.default_rng(1)
    table = read_pdb(PDB)
    rot, tr = uniform_rotation_translation(rng, 10.0)
    moved = (rot @ table.coords.T).T + tr
    rec_moved_path = str(tmp_path / "rec_moved.pdb")
    write_pdb(rec_moved_path, table, moved.astype(np.float32))

    rec = read_pdb(rec_moved_path).coords
    rec_gt = table.coords
    R, b = rigid_transform_kabsch(rec.T, rec_gt.T)
    back = ((R @ rec.T) + b).T
    assert np.linalg.norm(back - rec_gt) < 1e-1


def test_profiler_trace_produces_artifacts(tmp_path):
    """jax.profiler trace context writes a trace directory (SURVEY §5)."""
    import jax
    import jax.numpy as jnp

    from equidock_public_tpu.utils import profiling

    with profiling.trace(str(tmp_path)):
        y = jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))
        jax.block_until_ready(y)
    entries = list(os.walk(str(tmp_path)))
    files = [f for _, _, fs in entries for f in fs]
    assert files, "no trace files written"


def test_step_timer():
    from equidock_public_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    assert len(t.times) == 3
    assert t.mean() >= 0.0


def test_partition_dips_on_synthetic_pairs(tmp_path, monkeypatch, capsys):
    """`cli.partition_dips` on a synthetic atom3-layout tree: the atom-count
    filter and the family-directory split must follow the reference's rules
    (`partition_dips.py:22-24,45`: keep pairs with BOTH proteins under
    max_atom_count; split by family dir, last 40 shuffled -> 20 val+20 test)."""
    import os
    import sys
    import types

    import pandas as pd

    from equidock_public_tpu.cli.partition_dips import main

    data = tmp_path / "pairs"
    n_fam = 44
    big = {("fam03", "p1"), ("fam17", "p0")}       # these exceed the cap
    expected_kept = []
    for fi in range(n_fam):
        fam = f"fam{fi:02d}"
        (data / fam).mkdir(parents=True)
        for pi in range(2):
            name = f"p{pi}.dill"
            n0 = 60 if (fam, f"p{pi}") in big else 10
            pair = types.SimpleNamespace(
                df0=pd.DataFrame({"x": range(n0)}),
                df1=pd.DataFrame({"x": range(12)}))
            pd.to_pickle(pair, data / fam / name)
            if n0 < 50:
                expected_kept.append(os.path.join(fam, name))

    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "partition_dips", "-data_dir", str(data), "-out_dir", str(out),
        "-max_atom_count", "50", "-seed", "3"])
    main()

    def lines(p):
        return [l for l in (out / p).read_text().splitlines() if l]

    assert sorted(lines("pairs-postprocessed.txt")) == sorted(expected_kept)
    tr = lines("pairs-postprocessed-train.txt")
    va = lines("pairs-postprocessed-val.txt")
    te = lines("pairs-postprocessed-test.txt")
    assert sorted(tr + va + te) == sorted(expected_kept)
    fam = lambda ls: {l.split(os.sep)[0] for l in ls}
    assert not fam(tr) & fam(va) and not fam(tr) & fam(te) \
        and not fam(va) & fam(te)                  # family-disjoint splits
    assert len(fam(va)) == 20 and len(fam(te)) == 20
    assert len(fam(tr)) == n_fam - 40

    # re-run: the existing pairs-postprocessed.txt is reused, not rescanned
    main()
    assert "skipping scan" in capsys.readouterr().out
    assert sorted(lines("pairs-postprocessed.txt")) == sorted(expected_kept)


def test_build_dips_frozen_cache(tmp_path):
    """build_dips_frozen_cache turns *_{l,r}_b_COMPLEX.pdb bound pairs into
    train/val/test shards loadable by the normal DIPS dataset path."""
    import dataclasses
    import shutil

    from equidock_public_tpu.config import Config
    from equidock_public_tpu.data.dataset import DockingDataset
    from equidock_public_tpu.data.dips import build_dips_frozen_cache

    src = "/root/reference/data/benchmark5.5/structures"
    complexes = tmp_path / "complexes"
    complexes.mkdir()
    # 12 bound pairs -> 10 train (i%10<8), 1 val (i%10==8), 1 test (9)
    for i, code in enumerate(["1A2K"] * 12):
        shutil.copy(f"{src}/{code}_l_b.pdb",
                    complexes / f"c{i:02d}_l_b_COMPLEX.pdb")
        shutil.copy(f"{src}/{code}_r_b.pdb",
                    complexes / f"c{i:02d}_r_b_COMPLEX.pdb")

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data="dips",
                                      cache_dir=str(tmp_path / "cache"),
                                      n_jobs=1))
    build_dips_frozen_cache(cfg, str(complexes), log=lambda *a: None)

    counts = {}
    for split in ("train", "val", "test"):
        ds = DockingDataset(cfg, split)
        counts[split] = len(ds.samples)
        for s in ds.samples:
            assert s.pocket.shape[0] > 3          # real pocket extracted
            assert s.lig.x.shape[1] == 3 and s.rec.x.shape[1] == 3
    assert counts == {"train": 10, "val": 1, "test": 1}


def test_sas_residue_depth():
    """SAS surface sampling + residue depth: a residue at the center of a
    dense cluster must be deeper than the peripheral ones, and every depth
    must be >= 0 (distance to the accessible surface)."""
    from equidock_public_tpu.cli.surface_analysis import (
        fibonacci_sphere, sas_residue_depth, sas_surface_points, _atom_radii)

    dirs = fibonacci_sphere(64)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-12)

    # 3x3x3 grid of single-atom "residues" spaced 3 A apart: the center one
    # is fully buried, the corners are exposed.
    rng = np.random.default_rng(0)
    residues = []
    for ix in range(3):
        for iy in range(3):
            for iz in range(3):
                xyz = np.array([[3.0 * ix, 3.0 * iy, 3.0 * iz]])
                xyz = xyz + rng.normal(scale=0.05, size=(1, 3))
                residues.append((("A", len(residues) + 1, "ALA"),
                                 dict(coords=xyz.astype(np.float64),
                                      element=np.array(["C"]),
                                      atom_name=np.array(["CA"]),
                                      resname="ALA")))
    depth = sas_residue_depth(residues, n_sphere=120)
    assert depth.shape == (27,)
    assert np.all(depth >= 0)
    center = 13                      # (1,1,1) in the 3x3x3 enumeration
    corners = [0, 2, 6, 8, 18, 20, 24, 26]
    assert depth[center] > max(depth[c] for c in corners) + 0.5

    # a single isolated atom keeps its whole sphere: depth == its SAS radius
    lone = [(("A", 1, "ALA"), dict(coords=np.zeros((1, 3)),
                                   element=np.array(["C"]),
                                   atom_name=np.array(["CA"]),
                                   resname="ALA"))]
    surf = sas_surface_points(np.zeros((1, 3)),
                              _atom_radii(np.array(["C"])), 120)
    assert len(surf) == 120
    np.testing.assert_allclose(sas_residue_depth(lone, 120), 1.7 + 1.4,
                               atol=1e-6)


def test_db5_small_model_preset_matches_committed_artifact():
    """`Config.db5_small_model()` is the round-2 small-capacity recipe
    (RESULTS.md "Small-model sweep", IRMSD parity at 14K params); pin it to
    the committed checkpoint's sidecar so preset and artifact can't drift."""
    import json

    from equidock_public_tpu.config import Config

    cfg = Config.db5_small_model()
    sidecar = os.path.join(os.path.dirname(__file__), "..",
                           "artifacts", "db5_model_small.config.json")
    if not os.path.exists(sidecar):
        pytest.skip("small-model artifact not committed")
    saved = json.loads(open(sidecar).read())["model"]
    for field in ("residue_emb_dim", "iegmn_lay_hid_dim", "iegmn_n_lays",
                  "shared_layers", "num_att_heads", "dropout", "layer_norm",
                  "skip_weight_h", "fine_tune"):
        assert getattr(cfg.model, field) == saved[field], field
    assert cfg.train.lr == 1e-4 and cfg.train.w_decay == 1e-4
    assert cfg.train.bs == 4 and cfg.train.val_repeats == 6
