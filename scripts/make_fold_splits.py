"""Create the round-5 CV-fold splits for honest ensemble-weight selection.

Partitions the cv_0 TRAIN complexes (203) into 4 deterministic folds
(seed 555). Fold f's split dir `data_splits/cv_fold{f}`:

    train.txt = cv_0 train minus fold f   (~152 pairs)
    val.txt   = cv_0 val                  (25; early-stopping set, disjoint
                                           from every fold by construction)
    test.txt  = fold f                    (the trainer's final-test print then
                                           reports held-out-fold metrics and
                                           the frozen DB5.5 test is never
                                           touched by fold runs)

Selection-set rationale (VERDICT r4 item 1): members retrained without a
fold are CLEAN on that fold's complexes — neither trained nor early-stopped
on them — so pooling all folds yields a 203-complex honest selection set
without shrinking the final members' 203-pair training data. See
results/ROUND5_PROTOCOL.md (pre-registered before any fold run started).
"""

import os

import numpy as np

CV0 = "/root/reference/data/benchmark5.5/cv/cv_0"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data_splits")
K = 4
SEED = 555


def read_codes(path):
    with open(path) as f:
        return sorted({ln.strip() for ln in f if ln.strip()})


def main():
    train = read_codes(os.path.join(CV0, "train.txt"))
    val = read_codes(os.path.join(CV0, "val.txt"))
    rng = np.random.default_rng(SEED)
    order = rng.permutation(len(train))
    folds = [sorted(train[i] for i in order[f::K]) for f in range(K)]
    for f, fold in enumerate(folds):
        d = os.path.join(OUT, f"cv_fold{f}")
        os.makedirs(d, exist_ok=True)
        keep = sorted(set(train) - set(fold))
        for name, codes in (("train", keep), ("val", val), ("test", fold)):
            with open(os.path.join(d, name + ".txt"), "w") as fh:
                fh.write("\n".join(codes) + "\n")
        print(f"cv_fold{f}: train {len(keep)} val {len(val)} test {len(fold)}")
    assert sorted(c for f in folds for c in f) == train


if __name__ == "__main__":
    main()
