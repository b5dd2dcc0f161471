"""OT evidence part 1 (VERDICT item 7): Sinkhorn vs exact-EMD objective gap
over a FULL val epoch of REAL cost matrices from a trained checkpoint.

The reference solves the pocket OT loss with POT's exact network simplex on
CPU (`ot_utils.py:22-29`); we replace it with an on-device log-domain
Sinkhorn. Because the plan is detached in both cases, a small objective gap
on real trained geometry is the whole story for training equivalence. This
script forwards every val complex (several random SE(3) poses each), builds
the model's actual pocket/keypoint cost matrices, and solves both ways.

    JAX_PLATFORMS=cpu python scripts/ot_gap_study.py <checkpoint_dir> [reps]
"""

import json
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from equidock_public_tpu.data.dataset import DockingDataset  # noqa: E402
from equidock_public_tpu.models.iegmn import docking_forward  # noqa: E402
from equidock_public_tpu.ops.sinkhorn import (exact_emd_plan_host,  # noqa: E402
                                              sinkhorn_log, sq_dist_mat)
from equidock_public_tpu.train.checkpoint import load_checkpoint  # noqa: E402


def main():
    ckpt = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    payload, cfg, _ = load_checkpoint(ckpt)
    params = payload["params"]
    tc = cfg.train

    ds = DockingDataset(cfg, "val", swap=False)
    fwd = jax.jit(lambda p, b: docking_forward(p, cfg.model, b))
    plan_fn = jax.jit(lambda c, m: sinkhorn_log(
        c, m, epsilon=tc.sinkhorn_epsilon, iters=tc.sinkhorn_iters))

    gaps, sink_objs, exact_objs, sizes = [], [], [], []
    for rep in range(reps):
        rng = np.random.default_rng(100 + rep)
        for batch in ds.batches(rng, shuffle=False):
            out = fwd(params, batch)
            cost = np.asarray(
                sq_dist_mat(batch.pocket_lig, out["keypts_lig"])
                + sq_dist_mat(batch.pocket_rec, out["keypts_rec"]),
                np.float64)
            mask = np.asarray(batch.pocket_mask)
            pair = np.asarray(batch.pair_mask)
            plan_s = np.asarray(plan_fn(cost.astype(np.float32), mask),
                                np.float64)
            plan_e = np.asarray(exact_emd_plan_host(cost, mask), np.float64)
            for b in range(cost.shape[0]):
                if pair[b] == 0:
                    continue
                s = float((plan_s[b] * cost[b]).sum())
                e = float((plan_e[b] * cost[b]).sum())
                gaps.append((s - e) / max(abs(e), 1e-9))
                sink_objs.append(s)
                exact_objs.append(e)
                sizes.append(int(mask[b].sum()))

    gaps = np.asarray(gaps)
    print(json.dumps({
        "checkpoint": ckpt,
        "n_instances": int(gaps.size),
        "n_complexes": len(ds),
        "reps": reps,
        "pocket_size_min_max": [int(min(sizes)), int(max(sizes))],
        "gap_pct_mean": round(100 * float(gaps.mean()), 3),
        "gap_pct_median": round(100 * float(np.median(gaps)), 3),
        "gap_pct_p95": round(100 * float(np.percentile(gaps, 95)), 3),
        "gap_pct_max": round(100 * float(gaps.max()), 3),
        "gap_pct_min": round(100 * float(gaps.min()), 3),
        "sinkhorn_obj_mean": round(float(np.mean(sink_objs)), 3),
        "exact_obj_mean": round(float(np.mean(exact_objs)), 3),
    }))


if __name__ == "__main__":
    main()
