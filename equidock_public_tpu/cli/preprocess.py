"""Preprocess CLI: build the graph caches (replaces
`src/preprocess_raw_data.py:7-42`).

    python -m equidock_public_tpu.cli.preprocess [-data db5] [splits...]
"""

import argparse

from ..data.dataset import build_cache
from ._common import add_config_args, config_from_args


def main():
    p = argparse.ArgumentParser(description="Build graph caches")
    add_config_args(p)
    p.add_argument("-dips_frozen_complexes", default=None,
                   help="Directory of *_{l,r}_b_COMPLEX.pdb bound pairs "
                        "(the frozen DIPS test complexes). Builds a REAL-"
                        "structure DIPS cache from them instead of the "
                        "unmounted 42K-pair corpus; see "
                        "data/dips.py:build_dips_frozen_cache for the "
                        "leakage caveat.")
    p.add_argument("splits", nargs="*", default=["val", "test", "train"])
    a = p.parse_args()
    cfg = config_from_args(a)
    if a.dips_frozen_complexes:
        from ..data.dips import build_dips_frozen_cache
        build_dips_frozen_cache(cfg, a.dips_frozen_complexes)
        return
    for split in (a.splits or ["val", "test", "train"]):
        build_cache(cfg, split)


if __name__ == "__main__":
    main()
