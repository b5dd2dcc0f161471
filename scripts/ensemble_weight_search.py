"""Ensemble weight search on VALIDATION pose draws (round 4).

Honest-selection protocol for the rigid ensemble (eval/ensemble.py): member
rigids are computed ONCE per (member, val complex, pose draw); the weight
simplex is then swept in pure numpy (the ensemble rigid + CA-level
CRMSD/IRMSD need no further forwards). Weights are chosen by the dual-parity
'bar' objective on VAL ONLY (cv_0 val, 25 complexes x N pose draws — the
same selection well every trial uses); the winner is evaluated ONCE on the
frozen test set by the caller. Never tune on test.

    python scripts/ensemble_weight_search.py \
        -members artifacts/db5_model_small_l3,artifacts/db5_model_small,... \
        -val_dirs results/valsets/cv0val_transformed,results/valsets/cv0val_s1,... \
        -step 8
"""

import argparse
import json
import os
import sys
from itertools import product

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from equidock_public_tpu.config import Config  # noqa: E402
from equidock_public_tpu.data.featurize import (alpha_carbon_array,  # noqa: E402
                                                build_protein_graph,
                                                filter_residues)
from equidock_public_tpu.data.pdb import group_residues, read_pdb  # noqa: E402
from equidock_public_tpu.eval.ensemble import Member, ensemble_rigid  # noqa: E402
from equidock_public_tpu.train.meter import complex_rmsd  # noqa: E402

BAR_C, BAR_I = 14.2, 12.1


def collect_rigids(members, val_dirs, cache_path, log=print):
    """-> dict with per (draw, complex): member Rs/ts, input lig CA + centroid,
    gt lig/rec CA, gt interface index pairs."""
    key = json.dumps({"members": list(members), "val_dirs": list(val_dirs)})
    if os.path.exists(cache_path):
        z = np.load(cache_path, allow_pickle=True)
        if "key" in z and str(z["key"]) == key:
            log(f"rigid cache hit: {cache_path}")
            return z["data"].item()
        log(f"rigid cache STALE (different members/val_dirs) — rebuilding")
    import dataclasses

    base_cfg = Config.db5_paper_model()
    base_cfg = dataclasses.replace(
        base_cfg, data=dataclasses.replace(
            base_cfg.data, node_buckets=(512, 1024, 2048, 3072),
            pocket_buckets=(256,)))
    ms = [Member(m, base_cfg) for m in members]
    data = {}
    for vd in val_dirs:
        for f in sorted(os.listdir(vd)):
            if not f.endswith("_l_b.pdb"):
                continue
            stem = f[: -len("_l_b.pdb")]
            lig_res = filter_residues(group_residues(
                read_pdb(os.path.join(vd, f))))
            rec_res = filter_residues(group_residues(
                read_pdb(os.path.join(vd, f"{stem}_r_b_COMPLEX.pdb"))))
            gt_lig = alpha_carbon_array(filter_residues(group_residues(
                read_pdb(os.path.join(vd, f"{stem}_l_b_COMPLEX.pdb")))))
            lig_ca = alpha_carbon_array(lig_res)
            rec_ca = alpha_carbon_array(rec_res)
            gc = base_cfg.graph
            lig_g = build_protein_graph(lig_res, gc.graph_cutoff,
                                        gc.graph_max_neighbor)
            rec_g = build_protein_graph(rec_res, gc.graph_cutoff,
                                        gc.graph_max_neighbor)
            rig = [m.predict_rigid(lig_g, rec_g, lig_ca) for m in ms]
            d = np.linalg.norm(gt_lig[:, None] - rec_ca[None, :], axis=-1)
            ai, aj = np.where(d < 8.0)
            data[(vd, stem)] = dict(
                Rs=np.stack([r for r, _ in rig]),
                ts=np.stack([t for _, t in rig]),
                x=lig_g.x, gt_lig=gt_lig, gt_rec=rec_ca,
                iface=(ai.astype(np.int32), aj.astype(np.int32)))
        log(f"collected {vd}")
    np.savez_compressed(cache_path, data=np.array(data, dtype=object),
                        key=key)
    return data


def per_complex_metrics(data, w, val_dirs):
    """-> (C, D) crmsd and irmsd arrays (complex x draw), complexes ordered
    by stem so rows align across draws."""
    stems = sorted({s for (_, s) in data})
    cr = np.zeros((len(stems), len(val_dirs)))
    ir = np.zeros((len(stems), len(val_dirs)))
    for di, vd in enumerate(val_dirs):
        for si, stem in enumerate(stems):
            rec = data[(vd, stem)]
            R, t = ensemble_rigid(rec["Rs"], rec["ts"],
                                  rec["x"].mean(axis=0), w)
            pred = (R @ rec["x"].T).T + t
            _, _, c = complex_rmsd(pred, rec["gt_rec"], rec["gt_lig"],
                                   rec["gt_rec"])
            ai, aj = rec["iface"]
            _, _, i = complex_rmsd(pred[ai], rec["gt_rec"][aj],
                                   rec["gt_lig"][ai], rec["gt_rec"][aj])
            cr[si, di] = c
            ir[si, di] = i
    return cr, ir


def score_weights(data, w, val_dirs, boot_idx=None):
    """Point medians (mean over draws of within-draw medians) + bootstrap
    P(both bars) over complex resamples."""
    cr, ir = per_complex_metrics(data, w, val_dirs)
    cmed = float(np.mean(np.median(cr, axis=0)))
    imed = float(np.mean(np.median(ir, axis=0)))
    p_bar = None
    if boot_idx is not None:
        cm = np.median(cr[boot_idx], axis=1).mean(axis=1)   # (B,)
        im = np.median(ir[boot_idx], axis=1).mean(axis=1)
        p_bar = float(np.mean((cm <= BAR_C) & (im <= BAR_I)))
    return cmed, imed, max(cmed - BAR_C, imed - BAR_I), p_bar


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-members", required=True)
    p.add_argument("-val_dirs", required=True)
    p.add_argument("-step", type=int, default=8,
                   help="simplex resolution (weights in k/step)")
    p.add_argument("-cache", default="results/ens_rigids_val.npz")
    p.add_argument("-out", default="results/ens_weight_search.json")
    p.add_argument("-bootstrap", type=int, default=400,
                   help="complex-resample count for P(both bars)")
    a = p.parse_args()
    members = [m for m in a.members.split(",") if m]
    val_dirs = [v for v in a.val_dirs.split(",") if v]
    data = collect_rigids(members, val_dirs, a.cache)

    n = len(members)
    rows = []
    grid = [k for k in product(range(a.step + 1), repeat=n)
            if sum(k) == a.step]
    n_complex = len({s for (_, s) in data})
    brng = np.random.default_rng(12345)
    boot_idx = brng.integers(0, n_complex, (a.bootstrap, n_complex))
    for k in grid:
        w = np.asarray(k, np.float64) / a.step
        if w.sum() == 0:
            continue
        c, i, bar, p = score_weights(data, w, val_dirs, boot_idx)
        rows.append({"w": list(w), "val_crmsd_med": round(c, 4),
                     "val_irmsd_med": round(i, 4), "val_bar": round(bar, 4),
                     "p_both_bars": round(p, 4)})
    # primary selection: highest bootstrap P(both bars); tie-break point bar
    rows.sort(key=lambda r: (-r["p_both_bars"], r["val_bar"]))
    for r in rows[:12]:
        print(json.dumps(r))
    with open(a.out, "w") as f:
        json.dump({"members": members, "val_dirs": val_dirs,
                   "n_complex": n_complex, "bootstrap": a.bootstrap,
                   "top": rows[:50]}, f, indent=1)
    print(f"wrote {a.out}; best: {json.dumps(rows[0])}")


if __name__ == "__main__":
    main()
