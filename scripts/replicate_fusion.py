"""Same-shape replicate fusion study (round-2 open thread: unify the
CRMSD/IRMSD bests).

Prior combiner attempts (RESULTS.md) mixed *capacities* (64-dim trunk +
small model) and were selection- or pairwise-fusion-shaped; all three landed
mid-pack. This study tests a different hypothesis: **variance reduction
within one family** — fuse the predicted SE(3) transforms of the independent
replicate seeds of the winning Hdim-16 2-layer shape by the chordal mean
(project the averaged rotation matrix back onto SO(3) via SVD; average the
translations), then score the fused pose. Unlike a medoid this produces a
new pose; unlike the 2-model fusion it never mixes regimes.

Ground-truth-free: the fused transform uses only the unbound input and the
models' own outputs. CPU-only; evaluator math == `eval/rmsd.py` ==
reference `eval_pdb_outputset.py`.

Usage: python scripts/replicate_fusion.py [dir:suffix ...]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from equidock_public_tpu.data.featurize import rigid_transform_kabsch  # noqa: E402
from equidock_public_tpu.data.pdb import ca_coords, read_pdb  # noqa: E402
from equidock_public_tpu.eval.rmsd import RmsdMeter  # noqa: E402

REF = "/root/reference/test_sets_pdb/db5_test_random_transformed"
GT = f"{REF}/complexes"
INPUT = f"{REF}/random_transformed"

DEFAULT = [
    ("results/db5_small_s16a", "EQUIDOCK_TPU"),
    ("results/db5_small_s16b", "EQUIDOCK_TPU"),
    ("results/db5_small_s16c", "EQUIDOCK_TPU"),
    ("results/db5_small_s16d", "EQUIDOCK_TPU"),  # skipped if absent (stage 14)
]


def project_so3(M: np.ndarray) -> np.ndarray:
    """Nearest rotation to M in Frobenius norm (chordal mean projection)."""
    U, _, Vt = np.linalg.svd(M)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
    return R


def stems(input_dir, suffix):
    tail = f"_l_b_{suffix}.pdb"
    return sorted(f[: -len(tail)] for f in os.listdir(input_dir) if f.endswith(tail))


def main():
    members = DEFAULT
    if len(sys.argv) > 1:
        members = [tuple(a.split(":")) for a in sys.argv[1:]]
    members = [(d, s) for d, s in members
               if os.path.isdir(d) and stems(d, s)]
    # drop members whose stem set is incomplete (e.g. a replicate dir still
    # being written): a partial member would otherwise crash mid-loop or
    # silently change which members the reported numbers average over
    full = max(len(stems(d, s)) for d, s in members)
    members = [(d, s) for d, s in members if len(stems(d, s)) == full]
    print(f"# fusing {len(members)} members ({full} stems each): "
          f"{[d for d, _ in members]}")

    meter, imeter = RmsdMeter(), RmsdMeter()
    per_member = [(RmsdMeter(), RmsdMeter()) for _ in members]
    n = 0
    for stem in stems(*members[0]):
        lig_in = ca_coords(read_pdb(os.path.join(INPUT, f"{stem}_l_b.pdb")))
        lig_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_l_b_COMPLEX.pdb")))
        rec_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_r_b_COMPLEX.pdb")))
        d = np.linalg.norm(lig_gt[:, None, :] - rec_gt[None, :, :], axis=-1)
        ai, aj = np.where(d < 8.0)

        Rs, ts = [], []
        for k, (mdir, suffix) in enumerate(members):
            pred = ca_coords(read_pdb(
                os.path.join(mdir, f"{stem}_l_b_{suffix}.pdb")))
            R, t = rigid_transform_kabsch(lig_in.T, pred.T)
            Rs.append(R)
            ts.append(t)
            mm, mi = per_member[k]
            mm.update(pred, rec_gt, lig_gt, rec_gt)
            mi.update(pred[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
        R_f = project_so3(np.mean(Rs, axis=0))
        t_f = np.mean(ts, axis=0)
        fused = (R_f @ lig_in.T + t_f).T

        meter.update(fused, rec_gt, lig_gt, rec_gt)
        imeter.update(fused[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
        n += 1

    for k, (mdir, _) in enumerate(members):
        mm, mi = per_member[k]
        print(f"{os.path.basename(mdir):>16}: CRMSD {mm.summarize('median')[2]:.2f}"
              f" / IRMSD {mi.summarize('median')[2]:.2f}"
              f"  (mean {mm.summarize('mean')[2]:.2f} / {mi.summarize('mean')[2]:.2f})")
    print(f"{'chordal fusion':>16}: CRMSD {meter.summarize('median')[2]:.2f}"
          f" / IRMSD {imeter.summarize('median')[2]:.2f}"
          f"  (mean {meter.summarize('mean')[2]:.2f} / {imeter.summarize('mean')[2]:.2f})"
          f"  over {n} complexes")


if __name__ == "__main__":
    main()
