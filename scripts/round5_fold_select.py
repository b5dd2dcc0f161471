"""Round-5 fold-twin selection (executes results/ROUND5_PROTOCOL.md).

Modes:

  collect -fold F   Generate the fold's two pose draws (cli.testset_gen,
                    seeds 501/502 — fixed in the protocol), compute the three
                    fold twins' rigids once per (draw, complex), cache to
                    results/round5_queue/foldF_rigids.npz. CPU-only; safe to
                    run while the TPU queue trains the next fold.

  select            Pool every collected fold, sweep the 3-family weight
                    simplex (step 1/8 -> 45 points), bootstrap P(both bars)
                    (B=2000, rng 20260820), apply the pre-registered primary/
                    fallback selection rule, write
                    results/round5_fold_select.json and print the single
                    registered-shot command (family weights expanded to pool
                    member weights by the fixed val-only inclusion rule).

Selection reads ONLY fold data + training-log val values; the frozen test is
touched exactly once, by the printed shot command (ledgered REGISTERED).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
from itertools import product

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ensemble_weight_search import (BAR_C, BAR_I, collect_rigids,  # noqa: E402
                                    per_complex_metrics)

Q = "results/round5_queue"
POSE_SEEDS = (501, 502)  # protocol-fixed
BOOT_B = 2000
BOOT_SEED = 20260820
STEP = 8  # simplex resolution over the 3 families -> 45 weightings

# Pool families (protocol "Member pool"): A gains round-5 finals whose
# training-log best val crmsd (val_repeats 6, cv_0 val) is <= 14.5.
POOL_B = ["artifacts/db5_model_small", "artifacts/db5_model_small_s2"]
POOL_C = ["artifacts/db5_model_small_l3"]
A_BASE = ["artifacts/db5_model_best"]
A_VAL_BAR = 14.5


def best_ckpt(name: str) -> str:
    """Newest db5_model_best under checkpts_r5/<name>* (mirrors the queue's
    best_ckpt, including _tryN retry dirs)."""
    hits = glob.glob(f"./checkpts_r5/{name}*/*/db5_model_best")
    hits.sort(key=os.path.getmtime, reverse=True)
    return hits[0] if hits else ""


def fold_twins(f: int) -> dict:
    return {fam: best_ckpt(f"r5_fold{f}_{fam}") for fam in "ABC"}


def pose_dir(f: int, seed: int) -> str:
    return f"results/round5_foldsets/fold{f}_s{seed}"


def ensure_pose_sets(f: int, log=print) -> list:
    dirs = []
    for seed in POSE_SEEDS:
        d = pose_dir(f, seed)
        if not glob.glob(os.path.join(d, "*_l_b.pdb")):
            log(f"generating pose set {d}")
            subprocess.run(
                [sys.executable, "-m", "equidock_public_tpu.cli.testset_gen",
                 "-dataset", "db5",
                 "-split_file", f"data_splits/cv_fold{f}/test.txt",
                 "-out_dir", d, "-seed", str(seed)],
                check=True, stdout=subprocess.DEVNULL)
        dirs.append(d)
    return dirs


def collect_fold(f: int, log=print) -> str:
    twins = fold_twins(f)
    missing = [fam for fam, c in twins.items() if not c]
    if missing:
        raise SystemExit(f"fold{f}: missing twin checkpoints {missing} — "
                         "per protocol the fold is dropped whole")
    dirs = ensure_pose_sets(f, log)
    cache = f"{Q}/fold{f}_rigids.npz"
    # member order A, B, C == family order everywhere below
    collect_rigids([twins[fam] for fam in "ABC"], dirs, cache, log=log)
    log(f"fold{f} collected -> {cache} (twins: {twins})")
    return cache


def load_pooled() -> tuple:
    """Merge every collected fold's rigid cache, normalizing the draw axis to
    's501'/'s502' so complexes pool across folds. Returns (data, folds)."""
    data, folds = {}, []
    for f in range(4):
        cache = f"{Q}/fold{f}_rigids.npz"
        if not os.path.exists(cache):
            continue
        z = np.load(cache, allow_pickle=True)
        d = z["data"].item()
        for (vd, stem), rec in d.items():
            m = re.search(r"_s(\d+)$", vd.rstrip("/"))
            data[(f"s{m.group(1)}", stem)] = rec
        folds.append(f)
    return data, folds


def score_all(data) -> list:
    draws = [f"s{s}" for s in POSE_SEEDS]
    stems = sorted({s for (_, s) in data})
    n_complex = len(stems)
    rng = np.random.default_rng(BOOT_SEED)
    boot_idx = rng.integers(0, n_complex, (BOOT_B, n_complex))
    rows = []
    grid = [k for k in product(range(STEP + 1), repeat=3) if sum(k) == STEP]
    for k in grid:
        w = np.asarray(k, np.float64) / STEP
        cr, ir = per_complex_metrics(data, w, draws)
        cmed = float(np.mean(np.median(cr, axis=0)))
        imed = float(np.mean(np.median(ir, axis=0)))
        cm = np.median(cr[boot_idx], axis=1).mean(axis=1)  # (B,)
        im = np.median(ir[boot_idx], axis=1).mean(axis=1)
        rows.append({
            "w": list(w),
            "crmsd_med": round(cmed, 4), "irmsd_med": round(imed, 4),
            "point_bar": round(max(cmed - BAR_C, imed - BAR_I), 4),
            "p_both": round(float(np.mean((cm <= BAR_C) & (im <= BAR_I))), 4),
            "boot_bar_mean": round(float(np.mean(
                np.maximum(cm - BAR_C, im - BAR_I))), 4),
        })
    return rows


def select_rule(rows: list) -> tuple:
    """Pre-registered rule: argmax P(both); fallback argmin boot_bar_mean if
    fewer than 3 weightings reach P(both) >= 0.15. Ties: smaller point bar
    violation, then smaller point CRMSD."""
    viable = [r for r in rows if r["p_both"] >= 0.15]
    if len(viable) >= 3:
        rule = "primary_argmax_p_both"
        key = lambda r: (-r["p_both"], r["point_bar"], r["crmsd_med"])  # noqa: E731
    else:
        rule = "fallback_argmin_boot_bar_mean"
        key = lambda r: (r["boot_bar_mean"], r["point_bar"], r["crmsd_med"])  # noqa: E731
    return sorted(rows, key=key)[0], rule


def family_a_pool(log=print) -> list:
    """A_BASE plus each round-5 64-dim final whose training-log best val
    crmsd is <= A_VAL_BAR (val-only inclusion rule, fixed in the protocol)."""
    pool = list(A_BASE)
    for seed in (70, 71):
        name = f"r5_final64_s{seed}"
        ckpt = best_ckpt(name)
        logf = f"{Q}/{name}.log"
        if not ckpt or not os.path.exists(logf):
            continue
        vals = re.findall(r"\[BEST\] epoch \d+ val crmsd ([0-9.]+)",
                          open(logf, errors="replace").read())
        if not vals:
            continue
        v = float(vals[-1])
        log(f"{name}: final best val crmsd {v} "
            f"({'IN' if v <= A_VAL_BAR else 'OUT'} at bar {A_VAL_BAR})")
        if v <= A_VAL_BAR:
            pool.append(ckpt)
    return pool


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["collect", "select"])
    p.add_argument("-fold", type=int, default=None)
    a = p.parse_args()

    if a.mode == "collect":
        assert a.fold is not None
        collect_fold(a.fold)
        return

    data, folds = load_pooled()
    stems = sorted({s for (_, s) in data})
    if len(folds) < 2:
        raise SystemExit(f"only {len(folds)} folds collected — protocol "
                         "requires >= 2; no selection, no shot")
    print(f"folds pooled: {folds} ({len(stems)} complexes)")
    rows = score_all(data)
    best, rule = select_rule(rows)
    print(f"rule: {rule}")
    print(f"selected: {json.dumps(best)}")

    pool_a = family_a_pool()
    fam_w = best["w"]
    members, weights = [], []
    for fam_pool, wf in zip((pool_a, POOL_B, POOL_C), fam_w):
        for m in fam_pool:
            members.append(m)
            weights.append(wf / len(fam_pool))
    out = {
        "protocol": "results/ROUND5_PROTOCOL.md",
        "folds": folds, "n_complex": len(stems),
        "fold_twins": {f: fold_twins(f) for f in folds},
        "bootstrap": {"B": BOOT_B, "seed": BOOT_SEED},
        "rule": rule, "selected": best,
        "rows": sorted(rows, key=lambda r: (-r["p_both"], r["point_bar"])),
        "pool": {"A": pool_a, "B": POOL_B, "C": POOL_C},
        "shot_members": members, "shot_weights": weights,
    }
    with open("results/round5_fold_select.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/round5_fold_select.json")
    print("\nREGISTERED shot command (run exactly once):")
    print("  python -m equidock_public_tpu.cli.ensemble_inference \\\n"
          f"    -checkpoints {','.join(members)} \\\n"
          f"    -weights {','.join(f'{w:.6f}' for w in weights)} \\\n"
          "    -input_dir /root/reference/test_sets_pdb/"
          "db5_test_random_transformed/random_transformed \\\n"
          "    -ground_truth_dir /root/reference/test_sets_pdb/"
          "db5_test_random_transformed/complexes \\\n"
          "    -output_dir results/db5_r5_registered_shot "
          "-node_buckets 512,1024,2048,3072 -pocket_buckets 256")


if __name__ == "__main__":
    main()
