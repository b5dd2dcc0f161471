"""Long-running docking server: load the model once, dock on demand.

Protocol: one JSON object per stdin line
    {"ligand": "path/l.pdb", "receptor": "path/r.pdb", "output": "out.pdb",
     "remove_clashes": false}
-> one JSON response per stdout line
    {"output": "...", "seconds": 0.12, "num_lig_res": 172, "ok": true}

    python -m equidock_public_tpu.cli.serve -checkpoint DIR
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

from ..eval.inference import dock_one
from ..models.iegmn import docking_forward, init_docking_model
from ..train.checkpoint import load_checkpoint
from ._common import add_config_args, config_from_args


def _warmup_batch(cfg, n_lig: int, n_rec: int):
    """Synthetic one-complex batch at exactly (n_lig, n_rec) padded nodes —
    the same shapes `dock_one` produces for proteins in those buckets."""
    from ..data.featurize import ProteinGraph
    from ..data.synth import synth_graph
    from ..graph import collate

    rng = np.random.default_rng(0)

    def graph(n):
        d = synth_graph(rng, n, k=cfg.graph.graph_max_neighbor)
        e = np.zeros(0, np.int32)
        return ProteinGraph(res_id=d["res_id"], x=d["x"],
                            mu_r_norm=d["mu_r_norm"], nbr=d["nbr"],
                            nbr_mask=d["nbr_mask"], edge_feat=d["edge_feat"],
                            src=e, dst=e)

    lg, rg = graph(n_lig), graph(n_rec)
    # graphs are sized exactly to their buckets, so bucket_for resolves each
    # side to its own size (buckets must be ascending)
    buckets = tuple(sorted({n_lig, n_rec}))
    return collate([lg], [rg], [lg.x], [lg.x],
                   [np.zeros((4, 3), np.float32)],
                   [np.zeros((4, 3), np.float32)],
                   buckets, cfg.data.pocket_buckets)


def main():
    p = argparse.ArgumentParser(description="EquiDock-TPU docking server")
    add_config_args(p)
    p.add_argument("-checkpoint", default="")
    p.add_argument("-warmup_buckets", default="",
                   help="comma-separated node bucket sizes to pre-jit at "
                        "startup (all ligand x receptor pairs), so the first "
                        "request per shape doesn't pay compile latency")
    a = p.parse_args()
    cfg = config_from_args(a)
    if a.checkpoint:
        import dataclasses

        payload, cfg_ckpt, _ = load_checkpoint(a.checkpoint)
        params = payload["params"]
        bn_state = payload.get("bn_state")
        cfg = dataclasses.replace(cfg, model=cfg_ckpt.model)
    else:
        print(json.dumps({"warning": "random init (no checkpoint)"}),
              flush=True)
        params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
        from ..models.iegmn import init_bn_state, uses_batch_norm

        bn_state = (init_bn_state(cfg.model)
                    if uses_batch_norm(cfg.model) else None)

    forward_fn = jax.jit(
        lambda p, b: docking_forward(p, cfg.model, b, bn_state=bn_state))

    if a.warmup_buckets:
        # Pre-jit every (ligand, receptor) bucket-pair shape the server may
        # see so no request pays first-compile latency. One synthetic batch
        # per pair; compiles land in the persistent jax compilation cache.
        sizes = tuple(int(x) for x in a.warmup_buckets.split(","))
        t0 = time.time()
        n_warmed = 0
        for bl in sizes:
            for br in sizes:
                batch = _warmup_batch(cfg, bl, br)
                jax.block_until_ready(forward_fn(params, batch))
                n_warmed += 1
        print(json.dumps({"warmed": n_warmed,
                          "seconds": round(time.time() - t0, 2)}), flush=True)

    print(json.dumps({"ready": True}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            r = dock_one(params, cfg, req["ligand"], req["receptor"],
                         req["output"],
                         remove_clashes=req.get("remove_clashes", False),
                         forward_fn=forward_fn)
            print(json.dumps({"output": r.out_path,
                              "seconds": round(r.seconds, 4),
                              "num_lig_res": r.num_lig_res,
                              "num_rec_res": r.num_rec_res,
                              "ok": True}), flush=True)
        except Exception as e:  # keep serving
            print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
