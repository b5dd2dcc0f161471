"""Pose-scorer study at adequate n (round-3; VERDICT r2 next item 4).

Round 2's learned selector was fit on 25 val rows and failed its own
honesty gate (LOO 0.52 vs majority 0.52) — a null "at n=25". This rerun
fits on 250 rows: 10 independent random-SE(3) input-pose sets for the 25
DB5 val complexes (scripts/pose_study_gen.sh, seeds 100-109), each scored
by both parents (big = artifacts/db5_model_best, small =
artifacts/db5_model_small_s2).

PRE-REGISTERED GATE (decided before computing any test metric): the learned
selector is applied to the frozen test set ONLY if the 95% cluster-bootstrap
CI (resampling complexes, the independent units — rows within a complex are
correlated because EquiDock is SE(3)-invariant in its input pose) of the
leave-one-COMPLEX-out CV accuracy excludes the same-bootstrap majority-class
accuracy. Otherwise the result is reported as a null and the always-big /
always-small rows stand.

Note the physics: EquiDock predicts the docked complex from the graph, so a
random rigid re-pose of the input ligand should change the prediction only
through float32 non-invariance and the clash-removal descent. The 10 draws
per complex therefore mostly measure LABEL STABILITY, not fresh complexes;
the script reports per-complex label flip rates so the effective sample
size is visible rather than implied.

Usage: python scripts/pose_scorer_n250.py   (CPU, after pose_study_gen.sh)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from equidock_public_tpu.data.pdb import ca_coords, read_pdb  # noqa: E402
from equidock_public_tpu.eval.rmsd import RmsdMeter  # noqa: E402

from pose_scorer import SPLITS, fit_logreg, predict, score, soft_clash  # noqa: E402

PS = "results/posestudy"
SEEDS = list(range(100, 110))
SUFFIX = "EQUIDOCK_TPU"
TAIL = f"_l_b_{SUFFIX}.pdb"


def build_rows(inputs_dir, gt_dir, big_dir, small_dir):
    rows = []
    for f in sorted(os.listdir(big_dir)):
        if not f.endswith(TAIL):
            continue
        stem = f[: -len(TAIL)]
        rec_in = ca_coords(read_pdb(f"{inputs_dir}/{stem}_r_b.pdb"))
        big = ca_coords(read_pdb(f"{big_dir}/{stem}{TAIL[:-4]}.pdb"))
        small = ca_coords(read_pdb(f"{small_dir}/{stem}{TAIL[:-4]}.pdb"))
        lig_gt = ca_coords(read_pdb(f"{gt_dir}/{stem}_l_b_COMPLEX.pdb"))
        rec_gt = ca_coords(read_pdb(f"{gt_dir}/{stem}_r_b_COMPLEX.pdb"))
        d = np.linalg.norm(lig_gt[:, None, :] - rec_gt[None, :, :], axis=-1)
        ai, aj = np.where(d < 8.0)

        def irmsd(pred):
            m = RmsdMeter()
            m.update(pred[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
            return m.summarize("median")[2]

        feats = np.array([
            soft_clash(big, rec_in), soft_clash(small, rec_in),
            (np.linalg.norm(big[:, None] - rec_in[None], axis=-1) < 8).sum(),
            (np.linalg.norm(small[:, None] - rec_in[None], axis=-1) < 8).sum(),
            np.sqrt(np.mean(np.sum((big - small) ** 2, axis=-1))),
        ])
        rows.append(dict(stem=stem, feats=feats, big=big, small=small,
                         lig_gt=lig_gt, rec_gt=rec_gt, ai=ai, aj=aj,
                         irmsd_big=irmsd(big), irmsd_small=irmsd(small),
                         label=float(irmsd(small) < irmsd(big))))
    return rows


def main():
    # --- assemble the 250-row val table (complex id = cluster id)
    val_rows, groups = [], []
    for s in SEEDS:
        indir = f"{PS}/val_seed{s}"
        rows = build_rows(indir, indir, f"{PS}/big_seed{s}",
                          f"{PS}/small_seed{s}")
        val_rows.extend(rows)
        groups.extend(r["stem"] for r in rows)
    stems = sorted(set(groups))
    gidx = np.array([stems.index(g) for g in groups])
    X = np.array([r["feats"] for r in val_rows])
    y = np.array([r["label"] for r in val_rows])
    mu, sd = X.mean(0), X.std(0) + 1e-9
    Xn = (X - mu) / sd
    print(f"# val rows: {len(y)} ({len(stems)} complexes x {len(SEEDS)} "
          f"pose seeds); small wins {int(y.sum())}/{len(y)}")

    # --- label stability across input-pose draws (SE(3)-invariance check)
    flips = []
    for k in range(len(stems)):
        yk = y[gidx == k]
        flips.append(min(yk.mean(), 1 - yk.mean()))
    print(f"# per-complex label flip rate: mean {np.mean(flips):.3f}, "
          f"complexes with any flip {int(np.sum(np.array(flips) > 0))}/"
          f"{len(stems)}")
    d_ir = [abs(r['irmsd_small'] - r['irmsd_big']) for r in val_rows]
    print(f"# |IRMSD_small - IRMSD_big| per row: median {np.median(d_ir):.2f}"
          f" A (labels flip where this is ~0)")

    # --- leave-one-COMPLEX-out CV
    loo_correct = np.zeros(len(y), bool)
    for k in range(len(stems)):
        tr, te = gidx != k, gidx == k
        w = fit_logreg(Xn[tr], y[tr])
        loo_correct[te] = predict(w, Xn[te]) == (y[te] > 0.5)
    acc = loo_correct.mean()

    # --- pre-registered gate: cluster bootstrap over complexes
    rng = np.random.default_rng(0)
    accs, bases = [], []
    for _ in range(10000):
        pick = rng.integers(0, len(stems), len(stems))
        m = np.concatenate([np.where(gidx == k)[0] for k in pick])
        accs.append(loo_correct[m].mean())
        yb = y[m]
        bases.append(max(yb.mean(), 1 - yb.mean()))
    lo, hi = np.percentile(accs, [2.5, 97.5])
    base = max(y.mean(), 1 - y.mean())
    print(f"# group-LOO accuracy {acc:.3f} (95% cluster-bootstrap CI "
          f"[{lo:.3f}, {hi:.3f}]); majority baseline {base:.3f} "
          f"(bootstrap mean {np.mean(bases):.3f})")
    gate = lo > np.percentile(bases, 97.5)
    print(f"# GATE {'PASSED' if gate else 'FAILED'}: CI lower bound "
          f"{'excludes' if gate else 'does not exclude'} the majority "
          f"baseline")

    # --- frozen test application (reported either way; headline only if
    # the gate passed)
    w = fit_logreg(Xn, y)
    print("# weights (clash_big, clash_small, contacts_big, contacts_small, "
          f"disagreement, bias): {np.round(w, 2)}")
    t = SPLITS["test"]
    test = build_rows(t["inputs"], t["gt"], t["big"], t["small"])
    Xt = (np.array([r["feats"] for r in test]) - mu) / sd
    picks = predict(w, Xt)
    for name, sel in [("always-big", np.zeros(len(test), bool)),
                      ("always-small", np.ones(len(test), bool)),
                      ("learned", picks),
                      ("oracle", np.array([bool(r["label"]) for r in test]))]:
        c, i, cm, im_ = score(test, sel)
        tag = "" if (name != "learned" or gate) else "  [gate failed: null]"
        print(f"test {name:>12}: CRMSD {c:.2f} / IRMSD {i:.2f} "
              f"(mean {cm:.2f} / {im_:.2f})  picks-small "
              f"{int(sel.sum())}/{len(test)}{tag}")


if __name__ == "__main__":
    main()
