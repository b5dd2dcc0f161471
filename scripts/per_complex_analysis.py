"""Per-complex CRMSD/IRMSD comparison vs the reference's committed outputs,
broken down by the DB5.5 difficulty classes (`data/benchmark5.5/{rigid,
medium,difficult}.txt`). CPU-only; uses the same evaluator math as
`eval/rmsd.py` (which reproduces the reference's numbers exactly).

Usage: python scripts/per_complex_analysis.py METHOD_DIR:METHOD_SUFFIX ...
Defaults compare the reference EquiDock committed outputs with our
5-layer best and the small-capacity parity model.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from equidock_public_tpu.data.pdb import ca_coords, read_pdb  # noqa: E402
from equidock_public_tpu.eval.rmsd import RmsdMeter  # noqa: E402

REF = "/root/reference"
GT = f"{REF}/test_sets_pdb/db5_test_random_transformed/complexes"

DEFAULT = [
    (f"{REF}/test_sets_pdb/db5_equidock_results", "EQUIDOCK", "reference"),
    ("results/db5_ep29", "EQUIDOCK_TPU", "ours-64d5L"),
    ("results/db5_small_s16b", "EQUIDOCK_TPU", "ours-small"),
]


def difficulty_map():
    out = {}
    for klass in ("rigid", "medium", "difficult"):
        path = f"{REF}/data/benchmark5.5/{klass}.txt"
        for line in open(path):
            line = line.strip()
            if line:
                out[line.split("_")[0]] = klass
    return out


def per_complex(input_dir, suffix):
    rows = {}
    tail = f"_l_b_{suffix}.pdb"
    for file in sorted(os.listdir(input_dir)):
        if not file.endswith(tail):
            continue
        stem = file[: -len(tail)]
        lig_model = ca_coords(read_pdb(os.path.join(input_dir, file)))
        lig_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_l_b_COMPLEX.pdb")))
        rec_gt = ca_coords(read_pdb(os.path.join(GT, f"{stem}_r_b_COMPLEX.pdb")))
        d = np.linalg.norm(lig_gt[:, None, :] - rec_gt[None, :, :], axis=-1)
        ai, aj = np.where(d < 8.0)
        m, im = RmsdMeter(), RmsdMeter()
        m.update(lig_model, rec_gt, lig_gt, rec_gt)
        im.update(lig_model[ai], rec_gt[aj], lig_gt[ai], rec_gt[aj])
        rows[stem] = (m.summarize("median")[2], im.summarize("median")[2])
    return rows


def main():
    methods = DEFAULT
    diff = difficulty_map()
    tables = {label: per_complex(d, s) for d, s, label in methods}
    stems = sorted(set.intersection(*(set(t) for t in tables.values())))
    if "--jsonl" in sys.argv:
        import json
        out = sys.argv[sys.argv.index("--jsonl") + 1]
        with open(out, "w") as f:
            for stem in stems:
                row = {"complex": stem, "class": diff.get(stem, "?")}
                for label in tables:
                    row[f"{label}_crmsd"], row[f"{label}_irmsd"] = tables[label][stem]
                f.write(json.dumps(row) + "\n")
        print(f"wrote {out}")
    print(f"{'complex':8s} {'class':9s} " +
          " ".join(f"{label:>20s}" for label in tables))
    print(" " * 18 + " ".join(f"{'crmsd':>10s}{'irmsd':>10s}" for _ in tables))
    for stem in stems:
        klass = diff.get(stem, "?")
        cells = "".join(f"{tables[l][stem][0]:10.2f}{tables[l][stem][1]:10.2f}"
                        for l in tables)
        print(f"{stem:8s} {klass:9s}{cells}")
    print()
    for klass in ("rigid", "medium", "difficult"):
        ks = [s for s in stems if diff.get(s) == klass]
        if not ks:
            continue
        line = f"median over {klass:9s} (n={len(ks):2d}):"
        for label in tables:
            c = np.median([tables[label][s][0] for s in ks])
            i = np.median([tables[label][s][1] for s in ks])
            line += f"  {label} {c:.2f}/{i:.2f}"
        print(line)
    for label in tables:
        if label == "reference":
            continue
        wins = sum(tables[label][s][1] < tables["reference"][s][1] for s in stems)
        print(f"{label}: beats reference IRMSD on {wins}/{len(stems)} complexes")


if __name__ == "__main__":
    main()
