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
    p.add_argument("splits", nargs="*", default=["val", "test", "train"])
    a = p.parse_args()
    cfg = config_from_args(a)
    for split in (a.splits or ["val", "test", "train"]):
        build_cache(cfg, split)


if __name__ == "__main__":
    main()
