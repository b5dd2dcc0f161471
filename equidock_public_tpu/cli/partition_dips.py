"""DIPS dataset partitioner (replaces `src/utils/partition_dips.py:18-106`):
scan a directory tree of `*.dill` pair files, keep pairs where both proteins
have < max_atom_count atoms, and split train/val/test by FAMILY DIRECTORY
(last 40 shuffled dirs -> 20 val + 20 test) so homologous structures never
straddle splits.

    python -m equidock_public_tpu.cli.partition_dips -data_dir DIR [-out_dir DIR]
"""

import argparse
import os
import random
from pathlib import Path


def count_atoms_ok(dill_path: str, max_atom_count: int) -> bool:
    import pandas as pd

    try:
        pair = pd.read_pickle(dill_path)
        return len(pair.df0) < max_atom_count and len(pair.df1) < max_atom_count
    except Exception:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-data_dir", required=True,
                   help="root dir with <family>/<pair>.dill files")
    p.add_argument("-out_dir", default=None)
    p.add_argument("-max_atom_count", type=int, default=10000)
    p.add_argument("-no_filter", action="store_true")
    p.add_argument("-seed", type=int, default=0)
    a = p.parse_args()
    out_dir = a.out_dir or a.data_dir
    os.makedirs(out_dir, exist_ok=True)

    all_path = os.path.join(out_dir, "pairs-postprocessed.txt")
    if os.path.exists(all_path):
        print("pairs-postprocessed.txt exists, skipping scan")
        with open(all_path) as f:
            kept = [l.strip() for l in f if l.strip()]
    else:
        kept = []
        for dill in sorted(Path(a.data_dir).rglob("*.dill")):
            rel = os.path.join(dill.parent.name, dill.name)
            if a.no_filter or count_atoms_ok(str(dill), a.max_atom_count):
                kept.append(rel)
        with open(all_path, "w") as f:
            f.write("\n".join(kept) + "\n")
    print(f"{len(kept)} pairs pass the atom-count filter")

    families = sorted({name.split(os.sep)[0] for name in kept})
    rng = random.Random(a.seed)
    rng.shuffle(families)
    train_fams = set(families[:-40])
    val_fams = set(families[-40:-20])
    test_fams = set(families[-20:])

    splits = {"train": train_fams, "val": val_fams, "test": test_fams}
    for split, fams in splits.items():
        names = [n for n in kept if n.split(os.sep)[0] in fams]
        path = os.path.join(out_dir, f"pairs-postprocessed-{split}.txt")
        with open(path, "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"{split}: {len(names)} pairs ({len(fams)} families) -> {path}")


if __name__ == "__main__":
    main()
