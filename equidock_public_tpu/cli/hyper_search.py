"""Random hyperparameter search (replaces the reference's hyper-search block,
`src/utils/args.py:218-287`): sample a config from the same distributions,
skip configurations whose banner log file already exists, train.

    python -m equidock_public_tpu.cli.hyper_search [-num_trials N] [flags...]
"""

import argparse
import dataclasses
import os
import random

from ..config import Config, ModelConfig, TrainConfig
from ..train.loop import fit, make_logger
from ._common import add_config_args, config_from_args


def sample_config(base: Config, rng: random.Random) -> Config:
    """Sampling distributions from `args.py:239-280`."""
    model = dataclasses.replace(
        base.model,
        dropout=rng.choices([0.0, 0.25], weights=(0.5, 0.5), k=1)[0],
        iegmn_lay_hid_dim=64,
        residue_emb_dim=64,
        iegmn_n_lays=rng.choice([5, 8]),
        shared_layers=rng.choice([True, False]),
        skip_weight_h=rng.choice([0.75, 0.5]),
        x_connection_init=rng.choices([0.0, 0.25], weights=(10, 1), k=1)[0],
        cross_msgs=True, use_dist_in_layers=True,
        use_edge_features_in_gmn=True, use_mean_node_features=True,
        layer_norm="LN", layer_norm_coors="0", final_h_layer_norm="0",
        num_att_heads=50, leakyrelu_neg_slope=0.01,
    )
    train = dataclasses.replace(
        base.train,
        clip=100.0,
        w_decay=rng.choice([1e-4, 1e-3]),
        intersection_loss_weight=rng.choices([10.0, 1.0], weights=(0.6, 0.6), k=1)[0],
        intersection_sigma=25.0, intersection_surface_ct=10.0,
        pocket_ot_loss_weight=rng.choices([10.0, 1.0], weights=(0.3, 0.3), k=1)[0],
    )
    return dataclasses.replace(base, model=model, train=train)


def main():
    p = argparse.ArgumentParser(description="Random hyperparameter search")
    add_config_args(p)
    p.add_argument("-num_trials", type=int, default=5)
    p.add_argument("-max_epochs", type=int, default=None)
    p.add_argument("-max_seconds", type=float, default=None,
                   help="wall-clock budget per trial")
    p.add_argument("-compile_cache", default="./jax_cache")
    a = p.parse_args()
    if a.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(a.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    base = config_from_args(a)
    rng = random.Random(a.random_seed)

    for trial in range(a.num_trials):
        cfg = None
        for _ in range(100):
            cand = sample_config(base, rng)
            log_file = os.path.join(cand.log_dir, cand.banner() + ".txt")
            if not os.path.exists(log_file):
                cfg = cand
                break
        if cfg is None:
            print("No hyperparams available !! Exiting ...")
            return
        log = make_logger(cfg)
        log(f"=== hyper-search trial {trial}: {cfg.banner()}")
        fit(cfg, max_epochs=a.max_epochs, log=log, max_seconds=a.max_seconds)


if __name__ == "__main__":
    main()
