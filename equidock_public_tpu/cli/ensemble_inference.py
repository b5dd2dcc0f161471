"""Rigid-ensemble inference CLI (round 4; eval/ensemble.py).

    python -m equidock_public_tpu.cli.ensemble_inference \
        -checkpoints artifacts/db5_model_small_l3,artifacts/db5_model_small \
        -input_dir .../random_transformed -ground_truth_dir .../complexes \
        -output_dir out/

Averages the member checkpoints' predicted rigid motions (chordal rotation
mean + centroid-consistent translation) — a training-free variance reducer
over independently trained models. Score the output dir with
`cli.eval_outputs` as usual.
"""

import argparse

from ..eval.ensemble import Member, run_ensemble_dir
from ._common import add_config_args, config_from_args


def main():
    p = argparse.ArgumentParser(description="EquiDock-TPU rigid-ensemble "
                                            "inference")
    add_config_args(p)
    p.add_argument("-checkpoints", required=True,
                   help="comma-separated checkpoint dirs (each orbax + "
                        "sidecar config)")
    p.add_argument("-input_dir", required=True)
    p.add_argument("-ground_truth_dir", required=True)
    p.add_argument("-output_dir", required=True)
    p.add_argument("-method_name", default="equidock_tpu_ens")
    p.add_argument("-weights", default="",
                   help="comma-separated member weights (default uniform); "
                        "select on VAL, never on test")
    a = p.parse_args()
    base_cfg = config_from_args(a)
    members = [Member(c.strip(), base_cfg)
               for c in a.checkpoints.split(",") if c.strip()]
    weights = ([float(x) for x in a.weights.split(",")] if a.weights
               else None)
    assert weights is None or len(weights) == len(members)
    print(f"ensemble of {len(members)} members (weights {weights}):")
    for m in members:
        print(f"  {m.name}")
    run_ensemble_dir(members, a.input_dir, a.ground_truth_dir, a.output_dir,
                     method_name=a.method_name, weights=weights)


if __name__ == "__main__":
    main()
