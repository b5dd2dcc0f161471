"""Serving CLI: end-to-end subprocess test (valid + malformed requests)."""

import json
import os
import subprocess
import sys

import pytest

ARTIFACT = "artifacts/db5_model_best"
LIG = ("/root/reference/test_sets_pdb/db5_test_random_transformed/"
       "random_transformed/7CEI_l_b.pdb")
REC = ("/root/reference/test_sets_pdb/db5_test_random_transformed/"
       "complexes/7CEI_r_b_COMPLEX.pdb")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(ARTIFACT) and os.path.exists(LIG)),
    reason="artifact checkpoint or test data missing")


def test_serve_round_trip(tmp_path):
    out = str(tmp_path / "out.pdb")
    requests = "\n".join([
        json.dumps({"ligand": LIG, "receptor": REC, "output": out}),
        json.dumps({"ligand": "/missing.pdb", "receptor": REC,
                    "output": "/tmp/x.pdb"}),
    ])
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "equidock_public_tpu.cli.serve",
         "-checkpoint", ARTIFACT, "-node_buckets", "512,1024",
         "-pocket_buckets", "256"],
        input=requests, capture_output=True, text=True, timeout=300, env=env)
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert lines[0].get("ready") is True
    ok = [l for l in lines if l.get("ok") is True]
    bad = [l for l in lines if l.get("ok") is False]
    assert len(ok) == 1 and os.path.exists(ok[0]["output"])
    assert len(bad) == 1 and "FileNotFoundError" in bad[0]["error"]
