"""Golden-output test: score the reference's committed EquiDock prediction
PDBs with our evaluator and compare to the ICLR-2022 paper numbers
(BASELINE.md, recomputed from `test_sets_pdb/*` via
`eval_pdb_outputset.py:21-109`)."""

import os

import numpy as np
import pytest

from equidock_public_tpu.eval.rmsd import evaluate_output_dir

BASE = "/root/reference/test_sets_pdb"

pytestmark = pytest.mark.skipif(not os.path.isdir(BASE),
                                reason="reference test sets not mounted")


@pytest.mark.parametrize("ds,crmsd_median,crmsd_mean,irmsd_median", [
    ("db5", 14.14, 14.73, 11.97),
    ("dips", 13.30, 14.53, 10.19),
])
def test_reference_equidock_outputs_reproduce_paper(ds, crmsd_median,
                                                    crmsd_mean, irmsd_median):
    r = evaluate_output_dir(f"{BASE}/{ds}_equidock_results",
                            f"{BASE}/{ds}_test_random_transformed/complexes",
                            "equidock")
    assert r["num_files"] == (25 if ds == "db5" else 100)
    np.testing.assert_allclose(r["crmsd_median"], crmsd_median, atol=0.01)
    np.testing.assert_allclose(r["crmsd_mean"], crmsd_mean, atol=0.01)
    np.testing.assert_allclose(r["irmsd_median"], irmsd_median, atol=0.01)


@pytest.mark.parametrize("method,crmsd_median,crmsd_mean", [
    ("hdock", 0.30, 5.34),      # own receptor-file convention
    ("attract", 9.55, 10.09),   # own receptor-file convention
    ("cluspro", 3.38, 8.26),
    ("patchdock", 18.26, 18.00),
])
def test_baseline_method_conventions(method, crmsd_median, crmsd_mean):
    r = evaluate_output_dir(f"{BASE}/db5_{method}_results",
                            f"{BASE}/db5_test_random_transformed/complexes",
                            method)
    np.testing.assert_allclose(r["crmsd_median"], crmsd_median, atol=0.01)
    np.testing.assert_allclose(r["crmsd_mean"], crmsd_mean, atol=0.01)
