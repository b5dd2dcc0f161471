"""Padding-waste accounting for the bucketed batching policy.

SURVEY §7.3 calls bucketing "the central systems trade-off": coarse buckets
waste MXU FLOPs and HBM on padded rows, fine buckets multiply XLA
recompilations. This module measures the trade-off instead of guessing:
`waste_report` replays the EXACT chunking policy of
`data.dataset.DockingDataset.batches` (size-sorted chunks of bs, per-chunk
bucket pick via `graph.bucket_for`) over a set of complex sizes and reports
padded-vs-real node/edge counts per bucket plus the number of distinct
compiled shapes. `compare_policies` scores candidate bucket sets on the same
sizes so the configured `DataConfig.node_buckets` is a justified choice
(PERF.md "padding waste" section).

The reference has no counterpart: DGL batches exact-size graphs on GPU
(`train_utils.py:87-100`) and pays instead with per-batch kernel relaunch and
zero shape reuse.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..graph import bucket_for


def simulate_chunks(sizes_lr: Sequence[Tuple[int, int]], bs: int
                    ) -> List[List[Tuple[int, int]]]:
    """Chunking of `DockingDataset.batches(sort_by_size=True)`: order by
    max(n_lig, n_rec), fixed-size chunks (last chunk padded to bs with a
    duplicate complex). Shuffle order does not change the chunk contents'
    size profile, so it is omitted."""
    sizes = list(sizes_lr)
    order = np.argsort([max(l, r) for l, r in sizes], kind="stable")
    chunks = []
    for i in range(0, len(sizes), bs):
        idx = order[i:i + bs]
        chunk = [sizes[j] for j in idx]
        while len(chunk) < bs:            # duplicate-pad the ragged tail
            chunk.append(chunk[-1])
        chunks.append(chunk)
    return chunks


def waste_report(sizes_lr: Sequence[Tuple[int, int]],
                 node_buckets: Sequence[int], bs: int) -> Dict:
    """Padded vs real node counts under the batching policy.

    Returns dict with total `real_nodes`, `padded_nodes`, `waste_pct`
    (fraction of padded node slots holding no real residue — the same
    fraction of wasted edge slots, since E = N*K with fixed K), per-bucket
    rows and `distinct_shapes` (unique (n_l_bucket, n_r_bucket) pairs = XLA
    compilations of the train step this epoch shape-set causes)."""
    per_bucket: Dict[int, Dict[str, float]] = {}
    shapes = set()
    real_total = 0
    padded_total = 0
    for chunk in simulate_chunks(sizes_lr, bs):
        n_l = bucket_for(max(l for l, _ in chunk), tuple(node_buckets))
        n_r = bucket_for(max(r for _, r in chunk), tuple(node_buckets))
        shapes.add((n_l, n_r))
        real = sum(l + r for l, r in chunk)
        padded = len(chunk) * (n_l + n_r)
        real_total += real
        padded_total += padded
        for b in (n_l, n_r):
            per_bucket.setdefault(b, {"batches": 0, "real": 0, "padded": 0})
        per_bucket[n_l]["batches"] += 1
        per_bucket[n_l]["real"] += sum(l for l, _ in chunk)
        per_bucket[n_l]["padded"] += len(chunk) * n_l
        per_bucket[n_r]["batches"] += 1
        per_bucket[n_r]["real"] += sum(r for _, r in chunk)
        per_bucket[n_r]["padded"] += len(chunk) * n_r
    for b, row in per_bucket.items():
        row["waste_pct"] = 100.0 * (1.0 - row["real"] / max(row["padded"], 1))
    return {
        "real_nodes": real_total,
        "padded_nodes": padded_total,
        "waste_pct": 100.0 * (1.0 - real_total / max(padded_total, 1)),
        "distinct_shapes": len(shapes),
        "per_bucket": dict(sorted(per_bucket.items())),
    }


def compare_policies(sizes_lr: Sequence[Tuple[int, int]], bs: int,
                     policies: Dict[str, Sequence[int]]) -> Dict[str, Dict]:
    """`waste_report` for each named bucket policy on the same sizes."""
    return {name: waste_report(sizes_lr, buckets, bs)
            for name, buckets in policies.items()}


def waste_report_packed(sizes_lr: Sequence[Tuple[int, int]],
                        node_buckets: Sequence[int], bs: int,
                        max_per_slot: int,
                        slot_count_buckets: Sequence[int] = (1, 2, 3, 4, 5,
                                                             6, 7, 8, 9, 10)
                        ) -> Dict:
    """Padded vs real node counts with complex packing enabled: replays the
    exact packed-collate policy (size-sorted chunks of bs, `plan_packing`
    first-fit-decreasing into slots, slot-count bucketing with fully-masked
    padding slots)."""
    from ..graph import packed_shape, plan_packing

    shapes = set()
    real_total = 0
    padded_total = 0
    slot_total = 0
    for chunk in simulate_chunks(sizes_lr, bs):
        nl = [l for l, _ in chunk]
        nr = [r for _, r in chunk]
        slots = plan_packing(nl, nr, tuple(node_buckets), max_per_slot,
                             tuple(slot_count_buckets))
        B, b_l, b_r = packed_shape(slots, nl, nr, tuple(node_buckets),
                                   tuple(slot_count_buckets))
        shapes.add((B, b_l, b_r))
        real_total += sum(nl) + sum(nr)
        padded_total += B * (b_l + b_r)
        slot_total += B
    return {
        "real_nodes": real_total,
        "padded_nodes": padded_total,
        "waste_pct": 100.0 * (1.0 - real_total / max(padded_total, 1)),
        "slots": slot_total,
        "distinct_shapes": len(shapes),
    }
