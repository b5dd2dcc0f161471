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


def test_serve_warmup(tmp_path):
    """-warmup_buckets pre-jits the bucket pairs: the warmed line reports 4
    compiles for 2 buckets, and the warmed request's latency is far below its
    own shape's compile time (it reuses the warmed executable)."""
    out = str(tmp_path / "out.pdb")
    req = json.dumps({"ligand": LIG, "receptor": REC, "output": out})
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "equidock_public_tpu.cli.serve",
         "-checkpoint", ARTIFACT, "-node_buckets", "512,1024",
         "-pocket_buckets", "256", "-warmup_buckets", "512,1024"],
        input=req, capture_output=True, text=True, timeout=600, env=env)
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    warmed = [l for l in lines if "warmed" in l]
    assert warmed and warmed[0]["warmed"] == 4
    ok = [l for l in lines if l.get("ok") is True]
    assert len(ok) == 1 and os.path.exists(ok[0]["output"])
    # 7CEI is 127/87 residues -> (512, 512) buckets, which warmup compiled;
    # the request should run in a fraction of the per-pair warmup time
    per_pair_compile = warmed[0]["seconds"] / 4
    assert ok[0]["seconds"] < max(1.0, 0.5 * per_pair_compile)


def test_serve_batched_requests(tmp_path):
    """-max_batch > 1: several requests (incl. a malformed one) share padded
    forwards; responses keep arrival order and all outputs exist."""
    LIG2 = LIG.replace("7CEI", "1AVX")
    outs = [str(tmp_path / f"out{i}.pdb") for i in range(3)]
    requests = "\n".join([
        json.dumps({"ligand": LIG, "receptor": REC, "output": outs[0]}),
        json.dumps({"ligand": "/missing.pdb", "receptor": REC,
                    "output": "/tmp/x.pdb"}),
        json.dumps({"ligand": LIG2, "receptor": REC.replace("7CEI", "1AVX"),
                    "output": outs[1]}),
        json.dumps({"ligand": LIG, "receptor": REC, "output": outs[2]}),
    ])
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "equidock_public_tpu.cli.serve",
         "-checkpoint", ARTIFACT, "-node_buckets", "512,1024",
         "-pocket_buckets", "256", "-max_batch", "4",
         "-batch_window_ms", "2000"],
        input=requests, capture_output=True, text=True, timeout=600, env=env)
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    assert lines[0].get("ready") is True
    resp = lines[1:]
    assert len(resp) == 4
    # arrival order: ok, error, ok, ok
    assert resp[0]["ok"] and resp[2]["ok"] and resp[3]["ok"]
    assert resp[1]["ok"] is False and "FileNotFoundError" in resp[1]["error"]
    assert all(os.path.exists(o) for o in outs)
    # the valid requests actually shared a batch
    assert resp[0].get("batched", 0) >= 2
