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

import jax

from ..eval.inference import dock_one
from ..models.iegmn import docking_forward, init_docking_model
from ..train.checkpoint import load_checkpoint
from ._common import add_config_args, config_from_args


def main():
    p = argparse.ArgumentParser(description="EquiDock-TPU docking server")
    add_config_args(p)
    p.add_argument("-checkpoint", default="")
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
