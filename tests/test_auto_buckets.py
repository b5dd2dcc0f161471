"""auto_node_buckets: exact-DP bucket-ladder optimizer (`-node_buckets auto`)."""

from itertools import combinations

import numpy as np
import pytest

from equidock_public_tpu.config import auto_node_buckets, bucket_for


def _cost(sizes, ladder, quad_at=640):
    return sum((lambda b: b + b * b / quad_at)(bucket_for(s, ladder))
               for s in sizes)


def test_covers_and_aligned():
    sizes = [69, 120, 331, 500, 1500, 77, 640, 1024]
    ladder = auto_node_buckets(sizes, max_groups=4, align=64)
    assert len(ladder) <= 4
    assert all(b % 64 == 0 for b in ladder)
    assert max(ladder) >= max(sizes)          # every pair fits a real bucket
    assert list(ladder) == sorted(set(ladder))


def test_matches_bruteforce_optimum():
    rng = np.random.default_rng(0)
    sizes = rng.integers(50, 900, 40).tolist()
    align = 64
    cand = sorted({-(-s // align) * align for s in sizes})
    got = auto_node_buckets(sizes, max_groups=3, align=align)
    best = min(
        (c
         for r in range(1, 4)
         for c in combinations(cand, r)
         if max(c) == cand[-1]),
        key=lambda c: _cost(sizes, c))
    assert abs(_cost(sizes, got) - _cost(sizes, best)) < 1e-6


def test_single_group_degenerate():
    assert auto_node_buckets([100, 100, 100], max_groups=5) == (128,)
    with pytest.raises(ValueError):
        auto_node_buckets([], max_groups=3)


def test_db5_scale_beats_coarse_ladder():
    """On a DB5-shaped distribution the auto ladder's padded cost beats the
    r4 hand ladder by a wide margin (the PERF.md round-5 motivation)."""
    rng = np.random.default_rng(1)
    sizes = np.concatenate([
        rng.integers(70, 520, 160),           # bulk of DB5 pairs
        rng.integers(520, 900, 35),
        rng.integers(1200, 1550, 8),
    ]).tolist()
    auto = auto_node_buckets(sizes, max_groups=12)
    coarse = (512, 1024, 2048, 3072)
    assert _cost(sizes, auto) < 0.75 * _cost(sizes, coarse)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
