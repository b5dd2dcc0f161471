"""Multi-host input pipeline (SURVEY §2.2 component 4).

Each host feeds only its shard of the global batch, but every host must
produce identically-SHAPED padded arrays each step (all chips execute the
same compiled program). The scheme:

  1. all hosts hold the full sample index list and the same seeded RNG;
  2. every epoch, all hosts compute the SAME global batch schedule
     (shuffle -> size-sort -> chunk -> shuffle chunks) and the SAME padded
     bucket shape per batch (from global per-batch maxima);
  3. host h collates only rows [h*B/H, (h+1)*B/H) of each global batch and
     places them on its local devices via
     `jax.make_array_from_process_local_data`.

Because the schedule and bucket choice derive only from the shared RNG and
the (static) sample sizes, hosts agree on shapes without communication.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import jax
import numpy as np

from ..config import Config, bucket_for
from ..data.dataset import DockingDataset
from ..graph import PairBatch, ProteinBatch, collate


def global_batch_schedule(
    ds: DockingDataset, rng: np.random.Generator, bs: int,
    shuffle: bool = True, sort_by_size: bool = True,
) -> List[Tuple[np.ndarray, Tuple[int, int, int]]]:
    """Deterministic schedule: list of (global sample indices, (N_l, N_r, P))
    bucket shapes — identical on every host given the same rng state.

    Note: the train-time ligand/receptor swap is sampled from the SAME rng
    stream inside `DockingDataset.sample`, so it must be driven by a
    schedule-independent rng; here bucket shapes use max(lig, rec) per sample,
    which is swap-invariant."""
    order = np.arange(len(ds))
    if shuffle:
        rng.shuffle(order)
    if sort_by_size:
        # size accessors work on both materialized and streaming
        # (DipsShardIndex-backed) datasets without touching sample data
        sizes = np.array([ds.pair_max_nodes(int(i)) for i in order])
        order = order[np.argsort(sizes, kind="stable")]
    chunks = [order[i:i + bs] for i in range(0, len(order), bs)]
    if shuffle:
        rng.shuffle(chunks)

    out = []
    nb = ds.cfg.data.node_buckets
    pb = ds.cfg.data.pocket_buckets
    for chunk in chunks:
        n_max = max(ds.pair_max_nodes(int(i)) for i in chunk)
        p_max = max(ds.pocket_size(int(i)) for i in chunk)
        shape = (bucket_for(n_max, nb), bucket_for(n_max, nb),
                 bucket_for(p_max, pb))
        out.append((chunk, shape))
    return out


def host_sharded_batches(
    ds: DockingDataset, rng: np.random.Generator,
    global_bs: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    aug_seed: int = 1234,
) -> Iterator[PairBatch]:
    """Yield this host's local slice of each global batch, padded to the
    globally-agreed bucket shape. Augmentation uses a per-sample seeded rng so
    it is schedule- and host-independent."""
    h = process_index if process_index is not None else jax.process_index()
    H = process_count if process_count is not None else jax.process_count()
    assert global_bs % H == 0, (global_bs, H)
    local_bs = global_bs // H

    schedule = global_batch_schedule(ds, rng, global_bs)
    for step, (chunk, (n_l, n_r, P)) in enumerate(schedule):
        local_idx = chunk[h * local_bs:(h + 1) * local_bs]
        if len(local_idx) == 0:
            local_idx = chunk[:1]  # degenerate tail; masked out
        items = []
        for i in local_idx:
            srng = np.random.default_rng((aug_seed, step, int(i)))
            items.append(ds.sample(int(i), srng))
        ligs, recs, new_xs, gts, pls, prs = zip(*items)
        # force the globally-agreed shape via explicit buckets
        yield collate(ligs, recs, new_xs, gts, pls, prs,
                      (max(n_l, n_r),), (P,), batch_size=local_bs)
