"""Evaluate every trained checkpoint on the frozen DB5 test set (CPU):
runs the inference CLI + evaluator per checkpoint dir and emits one JSON
line each -> results/trial_table.jsonl. The hyper-search trial table of
RESULTS.md is built from this.

    JAX_PLATFORMS=cpu python scripts/eval_all_trials.py [glob ...]
"""

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TS = "/root/reference/test_sets_pdb/db5_test_random_transformed"


def eval_ckpt(ckpt_dir: str, out_path: str) -> dict:
    outdir = f"/tmp/trial_eval/{abs(hash(ckpt_dir))}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "equidock_public_tpu.cli.inference",
         "-checkpoint", ckpt_dir,
         "-input_dir", f"{TS}/random_transformed",
         "-ground_truth_dir", f"{TS}/complexes",
         "-output_dir", outdir], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        return {"checkpoint": ckpt_dir, "error": r.stderr[-400:]}
    r = subprocess.run(
        [sys.executable, "-m", "equidock_public_tpu.cli.eval_outputs",
         "-input_dir", outdir, "-ground_truth_dir", f"{TS}/complexes",
         "-method", "EQUIDOCK_TPU"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            return {"checkpoint": ckpt_dir, **json.loads(line)}
    return {"checkpoint": ckpt_dir, "error": r.stdout[-400:] + r.stderr[-200:]}


def main():
    pats = sys.argv[1:] or [os.path.join(REPO, "checkpts", "*", "db5_model_best")]
    out_path = os.path.join(REPO, "results", "trial_table.jsonl")
    seen = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    seen.add(json.loads(line)["checkpoint"])
                except Exception:
                    pass
    with open(out_path, "a") as f:
        for pat in pats:
            for ckpt in sorted(glob.glob(pat)):
                if ckpt in seen or not os.path.isdir(ckpt):
                    continue
                print("evaluating", ckpt, flush=True)
                row = eval_ckpt(ckpt, out_path)
                f.write(json.dumps(row) + "\n")
                f.flush()
                print("  ->", {k: v for k, v in row.items()
                               if k != "checkpoint"}, flush=True)


if __name__ == "__main__":
    main()
