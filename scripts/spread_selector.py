"""Fifth combiner cell: replicate-spread confidence selector.

Ground-truth-free hypothesis: when the independent Hdim-16 replicate seeds
*agree* on a pose, the small family is confident — use its best-val member
(s16b); when they disagree, fall back to the 64-dim 5-layer trunk (which wins
CRMSD globally). Spread = mean pairwise ligand-CA RMSD between the replicate
predictions (a pure function of model outputs). The threshold is fixed A
PRIORI at the across-complex median spread — no tuning against test metrics —
and we also report the full spread→IRMSD-winner correlation so a null result
is visible rather than hidden by the threshold choice.

Usage: python scripts/spread_selector.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from equidock_public_tpu.data.pdb import ca_coords, read_pdb  # noqa: E402
from equidock_public_tpu.eval.rmsd import RmsdMeter  # noqa: E402

REF = "/root/reference/test_sets_pdb/db5_test_random_transformed"
GT = f"{REF}/complexes"

REPLICATES = ["results/db5_small_s16a", "results/db5_small_s16b",
              "results/db5_small_s16c", "results/db5_small_s16d"]
SMALL = "results/db5_small_s16b"   # best-val small member
BIG = "results/db5_ep29"           # 64-dim 5-layer trunk (CRMSD best)
SUFFIX = "EQUIDOCK_TPU"


def load(mdir, stem):
    return ca_coords(read_pdb(os.path.join(mdir, f"{stem}_l_b_{SUFFIX}.pdb")))


def main():
    tail = f"_l_b_{SUFFIX}.pdb"

    def dir_stems(d):
        return set(f[: -len(tail)] for f in os.listdir(d) if f.endswith(tail))

    stems = sorted(dir_stems(SMALL))
    # only complete replicate dirs: a partial member (mid-inference) would
    # crash, and a silently-grown member set would change the reported spread
    reps = [d for d in REPLICATES
            if os.path.isdir(d) and dir_stems(d) >= set(stems)]
    print(f"# replicates ({len(reps)}): {reps}")

    rows = []
    for stem in stems:
        preds = [load(d, stem) for d in reps]
        pair_rmsd = [float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))
                     for i, a in enumerate(preds) for b in preds[i + 1:]]
        spread = float(np.mean(pair_rmsd))

        lig_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_l_b_COMPLEX.pdb")))
        rec_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_r_b_COMPLEX.pdb")))
        d = np.linalg.norm(lig_gt[:, None, :] - rec_gt[None, :, :], axis=-1)
        ai, aj = np.where(d < 8.0)

        def irmsd(pred):
            m = RmsdMeter()
            m.update(pred[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
            return m.summarize("median")[2]

        small_pred, big_pred = load(SMALL, stem), load(BIG, stem)
        rows.append((stem, spread, irmsd(small_pred), irmsd(big_pred),
                     small_pred, big_pred, lig_gt, rec_gt, ai, aj))

    spreads = np.array([r[1] for r in rows])
    thresh = float(np.median(spreads))  # fixed a priori, not tuned
    print(f"# {len(rows)} complexes, {len(reps)} replicates, "
          f"median spread (threshold) = {thresh:.2f} A")

    # Diagnostic: does spread predict which parent wins IRMSD?
    small_wins = np.array([r[2] < r[3] for r in rows])
    rank_s = np.argsort(np.argsort(spreads)).astype(float)
    corr = np.corrcoef(rank_s, small_wins.astype(float))[0, 1]
    print(f"# spread-rank vs small-wins point-biserial r = {corr:+.3f} "
          f"(small wins {small_wins.sum()}/{len(rows)})")
    lo = small_wins[spreads <= thresh].mean()
    hi = small_wins[spreads > thresh].mean()
    print(f"# P(small wins | low spread) = {lo:.2f}, | high spread = {hi:.2f}")

    m, im = RmsdMeter(), RmsdMeter()
    for stem, spread, _, _, small_pred, big_pred, lig_gt, rec_gt, ai, aj in rows:
        pick = small_pred if spread <= thresh else big_pred
        m.update(pick, rec_gt, lig_gt, rec_gt)
        im.update(pick[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
    print(f"selector: CRMSD {m.summarize('median')[2]:.2f} / "
          f"IRMSD {im.summarize('median')[2]:.2f} "
          f"(mean {m.summarize('mean')[2]:.2f} / {im.summarize('mean')[2]:.2f})")


if __name__ == "__main__":
    main()
