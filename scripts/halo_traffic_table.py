"""Halo shipped-bytes table (PERF.md conventions): per-chip per-layer
RECEIVED KB at D=64, bs=10, over real cached DB5 train batches and synthetic
DIPS-sized batches, for gp in {2, 4} — now including the round-3 RAGGED ring
transport (per-(element, owner) exact widths; `halo._pack_ring`).

Columns: actual demand / padded shipped (round-2 scheme) / ragged shipped
(round-3) / full-gather (round-1 demo), plus the ratios PERF.md tracks.

Usage: JAX_PLATFORMS=cpu python scripts/halo_traffic_table.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from equidock_public_tpu.config import Config, DataConfig  # noqa: E402
from equidock_public_tpu.data.dataset import DockingDataset  # noqa: E402
from equidock_public_tpu.parallel.halo import build_halo_batch  # noqa: E402

D = 64
BS = 10


def batches_db5():
    cfg = Config(data=DataConfig(node_buckets=(512, 1024, 2048, 3072),
                                 pocket_buckets=(256,)))
    ds = DockingDataset(cfg, "train", swap=False)
    rng = np.random.default_rng(0)
    return list(ds.batches(rng, shuffle=False, batch_size=BS))


def batches_dips_synth(tmp="/tmp/halo_traffic_dips"):
    from equidock_public_tpu.data.synth import (dips_testset_sizes,
                                                write_synth_split)

    sizes = dips_testset_sizes(
        "/root/reference/test_sets_pdb/dips_test_random_transformed")
    rng = np.random.default_rng(1)
    draw = [tuple(sizes[i]) for i in rng.integers(0, len(sizes), 200)]
    path = os.path.join(tmp, "synth.npz")
    if not os.path.exists(path):
        write_synth_split(path, draw, seed=1)
    cfg = Config(data=DataConfig(node_buckets=(512, 1024, 2048, 3072),
                                 pocket_buckets=(256,)))
    ds = DockingDataset(cfg, "train", swap=False, cache_path=path)
    return list(ds.batches(np.random.default_rng(2), shuffle=False,
                           batch_size=BS))


def main():
    rows = []
    for name, batches in (("DB5", batches_db5()),
                          ("DIPS", batches_dips_synth())):
        for gp in (2, 4):
            dp = 2  # bs=10 must divide dp (same constraint as dp-sharding)
            acc = dict(actual=0, padded=0, ragged=0, full=0)
            for batch in batches:
                _, st_p, _, _ = build_halo_batch(batch, gp=gp)
                _, st_r, _, _ = build_halo_batch(batch, gp=gp, ragged=True,
                                                 dp=dp)
                n_l = batch.lig.x.shape[1]
                n_r = batch.rec.x.shape[1]
                # per-chip fairness at the SAME dp: every accounting uses
                # the B/dp per-chip batch share (HaloStats.dp; the padded
                # plan is dp-independent so its stats just adopt dp)
                st_p.dp = dp
                acc["actual"] += st_p.bytes_per_layer(D, padded=False)
                acc["padded"] += st_p.bytes_per_layer(D, padded=True)
                acc["ragged"] += st_r.bytes_per_layer(D, padded=True)
                acc["full"] += st_p.full_gather_bytes_per_layer(
                    D, n_l, n_r, batch.pair_mask.shape[0]) // dp
            n = len(batches)
            kb = {k: v / n / 1024 for k, v in acc.items()}
            rows.append((name, gp, kb))
            print(f"| {name} | {gp} | {kb['actual']:.0f} KB | "
                  f"{kb['padded']:.0f} KB | {kb['ragged']:.0f} KB | "
                  f"{kb['full']:.0f} KB | {kb['full']/kb['padded']:.1f}x | "
                  f"{kb['full']/kb['ragged']:.1f}x | "
                  f"{kb['full']/kb['actual']:.1f}x |")
    return rows


if __name__ == "__main__":
    print("| dataset | gp | actual | padded (r2) | ragged (r3) | "
          "full-gather | padded vs FG | ragged vs FG | actual vs FG |")
    print("|---|---|---|---|---|---|---|---|---|")
    main()
