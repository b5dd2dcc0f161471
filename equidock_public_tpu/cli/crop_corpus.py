"""Crop-corpus CLI: build a DIPS-scale pretraining corpus of interface crops
from the DB5.5 train complexes (data/crops.py; VERDICT r3 missing-item 2 —
the corpus-size-vs-realism study the unmounted 42K DIPS corpus blocks).

    python -m equidock_public_tpu.cli.crop_corpus -n_pairs 16384 \
        -cache_dir ./cache -n_jobs 8

Writes DIPS-layout shards (train split from cv_0 train parents, val split
from val parents) into the derived dips cache path, so training runs with
`-data dips [-stream_dips]` against the same -cache_dir. DB5 test parents
are never cropped (leakage discipline; see data/crops.py docstring).
"""

import argparse
import dataclasses
import os

from ..config import Config, reference_root
from ..data.crops import generate_crop_shards
from ..data.synth import dips_testset_sizes
from ._common import add_config_args, config_from_args


def main():
    p = argparse.ArgumentParser(description="Build interface-crop corpus")
    add_config_args(p)
    p.add_argument("-n_pairs", type=int, default=16384)
    p.add_argument("-n_val_pairs", type=int, default=512)
    p.add_argument("-max_side", type=int, default=256)
    p.add_argument("-crop_seed", type=int, default=0)
    p.add_argument("-db5_raw", default=None,
                   help="DB5 structures dir (default: the db5 config's "
                        "raw_data_path)")
    p.add_argument("-dips_sizes_dir",
                   default=reference_root(
                       "test_sets_pdb/dips_test_random_transformed"),
                   help="frozen DIPS test dir for the size distribution "
                        "(default derives from EQUIDOCK_REFERENCE_ROOT)")
    a = p.parse_args()

    db5_cfg = Config.db5_paper_model()
    raw = a.db5_raw or db5_cfg.data.raw_data_path
    cfg = config_from_args(a)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data="dips"))

    def split_codes(split):
        path = os.path.join(db5_cfg.data.split_files_path, f"{split}.txt")
        with open(path) as f:
            codes = sorted({line.strip() for line in f if line.strip()})
        files = set(os.listdir(raw))
        return [c for c in codes
                if f"{c}_l_b.pdb" in files and f"{c}_r_b.pdb" in files]

    sizes = dips_testset_sizes(a.dips_sizes_dir)
    print(f"size distribution: {len(sizes)} (n_l, n_r) draws, "
          f"median {sorted(nl for nl, _ in sizes)[len(sizes) // 2]} residues")
    generate_crop_shards(cfg, "train", split_codes("train"), raw, a.n_pairs,
                         a.crop_seed, sizes, a.max_side, cfg.data.n_jobs)
    # val crops come from DB5 VAL parents: disjoint from train parents, and
    # DB5 test parents are never cropped
    generate_crop_shards(cfg, "val", split_codes("val"), raw, a.n_val_pairs,
                         a.crop_seed + 1, sizes, a.max_side, cfg.data.n_jobs)
    # NOTE (ADVICE r4): the crop 'test' split is drawn from the SAME val
    # parents as the crop val split (only the seed differs) — it exists so
    # `-data dips` runs have a final-test print, NOT as an independent
    # evaluation. Never base claims on crop-test numbers; real evaluation is
    # the frozen DB5/DIPS test sets.
    generate_crop_shards(cfg, "test", split_codes("val"), raw,
                         max(64, a.n_val_pairs // 4), a.crop_seed + 2, sizes,
                         a.max_side, cfg.data.n_jobs)


if __name__ == "__main__":
    main()
