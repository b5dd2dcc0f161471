"""Inference CLI (replaces `python -m src.inference_rigid`).

    python -m equidock_public_tpu.cli.inference -checkpoint <dir> \
        -input_dir .../random_transformed -ground_truth_dir .../complexes \
        -output_dir out/ [-remove_clashes]

When -checkpoint is given, model hyperparameters are restored from the
checkpoint's sidecar config (self-describing checkpoints, the analogue of
`inference_rigid.py:102-103`).
"""

import argparse

import jax

from ..models.iegmn import (init_bn_state, init_docking_model,
                            uses_batch_norm)
from ..train.checkpoint import load_checkpoint
from ..eval.inference import run_inference_dir
from ._common import add_config_args, config_from_args


def main():
    p = argparse.ArgumentParser(description="EquiDock-TPU rigid inference")
    add_config_args(p)
    p.add_argument("-checkpoint", default="",
                   help="checkpoint dir saved by train (orbax)")
    p.add_argument("-input_dir", required=True)
    p.add_argument("-ground_truth_dir", required=True)
    p.add_argument("-output_dir", required=True)
    p.add_argument("-method_name", default="equidock_tpu")
    p.add_argument("-remove_clashes", action="store_true")
    p.add_argument("-batched", action="store_true",
                   help="run the whole set in padded batches on one chip")
    p.add_argument("-batch_size", type=int, default=5)
    a = p.parse_args()
    cfg = config_from_args(a)

    if a.checkpoint:
        payload, cfg_ckpt, _ = load_checkpoint(a.checkpoint)
        params = payload["params"]
        bn_state = payload.get("bn_state")
        # adopt the checkpoint's model config
        import dataclasses

        cfg = dataclasses.replace(cfg, model=cfg_ckpt.model)
    else:
        print("WARNING: no checkpoint given - running with random init")
        params = init_docking_model(jax.random.PRNGKey(0), cfg.model)
        bn_state = (init_bn_state(cfg.model)
                    if uses_batch_norm(cfg.model) else None)

    if cfg.data.auto_buckets_max:
        # `-node_buckets auto[:G]` at inference: derive the ladder from the
        # input set itself (one cheap PDB-parse prescan; the same files are
        # re-read with featurization during inference proper).
        import dataclasses
        import os

        from ..config import auto_node_buckets
        from ..data.featurize import filter_residues
        from ..data.pdb import group_residues, read_pdb

        sizes = []
        for f in sorted(os.listdir(a.input_dir)):
            if not f.endswith("_l_b.pdb"):
                continue
            stem = f[: -len("_l_b.pdb")]
            rec = os.path.join(a.ground_truth_dir, f"{stem}_r_b_COMPLEX.pdb")
            for path in (os.path.join(a.input_dir, f), rec):
                if os.path.exists(path):
                    sizes.append(len(filter_residues(group_residues(
                        read_pdb(path)))))
        ladder = auto_node_buckets(sizes, cfg.data.auto_buckets_max)
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, node_buckets=ladder, auto_buckets_max=0))
        print(f"auto node buckets ({len(ladder)} steps): {ladder}")

    method = a.method_name + ("_no_clashes" if a.remove_clashes else "")
    if a.batched:
        from ..eval.batch_inference import run_batched_inference

        assert not a.remove_clashes, "clash removal is per-complex only"
        run_batched_inference(params, cfg, a.input_dir, a.ground_truth_dir,
                              a.output_dir, method_name=method,
                              batch_size=a.batch_size, bn_state=bn_state)
    else:
        run_inference_dir(params, cfg, a.input_dir, a.ground_truth_dir,
                          a.output_dir, method_name=method,
                          remove_clashes=a.remove_clashes, bn_state=bn_state)


if __name__ == "__main__":
    main()
