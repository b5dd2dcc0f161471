"""Training CLI (replaces `python -m src.train`, `src/train.py:239-421`).

    python -m equidock_public_tpu.cli.train [-toy] [flags...]

`-toy` trains DB5 only; otherwise the DIPS->DB5 curriculum runs (DIPS cache
must exist).
"""

import argparse
import os

import jax

from ..train.loop import curriculum, fit, make_logger
from ._common import add_config_args, config_from_args


def main():
    # multi-host bring-up must precede any backend touch (parallel/train.py
    # docstring); a no-op single-process
    from ..parallel.train import distributed_initialize_if_needed

    distributed_initialize_if_needed()
    p = argparse.ArgumentParser(description="Train EquiDock-TPU")
    add_config_args(p)
    p.add_argument("-toy", action="store_true",
                   help="train only on DB5.5 (args.py:113)")
    p.add_argument("-max_epochs", type=int, default=None)
    p.add_argument("-max_seconds", type=float, default=None)
    p.add_argument("-compile_cache", default="./jax_cache")
    p.add_argument("-continue_train_model", default="",
                   help="checkpoint dir to resume from; its config is adopted "
                        "(args.py:131-138)")
    p.add_argument("-fine_tune_from", default="",
                   help="stage-1 checkpoint dir: adopt its trunk as the "
                        "'original' stage of a -fine_tune model (args.py:110) "
                        "and train with a fresh 2-layer refinement stage")
    p.add_argument("-freeze_original", action="store_true",
                   help="with -fine_tune_from: train only the refinement "
                        "stage, stage-1 trunk frozen")
    p.add_argument("-fine_tune_init", default="random",
                   choices=["random", "copy"],
                   help="refinement-stage init: fresh random, or copy the "
                        "stage-1 trunk's matching leaves (the fine-tune "
                        "layers' extra ft_att_* stay random) so stage 2 "
                        "starts as 're-dock the stage-1 pose' instead of a "
                        "random perturbation of it")
    a = p.parse_args()
    assert not (a.continue_train_model and a.fine_tune_from), \
        "-continue_train_model and -fine_tune_from are mutually exclusive"
    if a.compile_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(a.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = config_from_args(a)

    state = None
    if a.fine_tune_from:
        import dataclasses

        import jax.numpy as jnp  # noqa: F401

        from ..models.iegmn import init_docking_model
        from ..train.checkpoint import load_checkpoint
        from ..train.step import create_train_state

        _, cfg_ckpt, epoch = load_checkpoint(a.fine_tune_from)
        # adopt the stage-1 architecture, add the 2-layer refinement stage;
        # keep CLI kernel/numerics flags (same policy as continue_train)
        model_cfg = dataclasses.replace(
            cfg_ckpt.model, fine_tune=True,
            use_fused_attention=cfg.model.use_fused_attention,
            factored_edge_mlp=cfg.model.factored_edge_mlp,
            remat=cfg.model.remat, dtype=cfg.model.dtype)
        cfg = dataclasses.replace(cfg, model=model_cfg)
        # restore stage-1 params against their own (fine_tune=False) template
        tmpl = create_train_state(
            init_docking_model(jax.random.PRNGKey(0), cfg_ckpt.model),
            cfg_ckpt)
        payload, _, _ = load_checkpoint(a.fine_tune_from, tmpl)
        fresh = init_docking_model(
            jax.random.PRNGKey(cfg.train.random_seed), cfg.model)
        finetune = fresh["finetune"]
        if a.fine_tune_init == "copy":
            def merge_common(dst, src):
                if isinstance(dst, dict):
                    return {k: (merge_common(dst[k], src[k]) if k in src
                                else dst[k]) for k in dst}
                if (src is not None and dst is not None
                        and getattr(src, "shape", None) == dst.shape):
                    # materialize a distinct buffer: the train step donates
                    # state, and aliasing original/finetune leaves trips
                    # "Attempt to donate the same buffer twice in Execute()"
                    # (opaque INVALID_ARGUMENT on the TPU backend)
                    return jnp.array(src)
                return dst

            finetune = merge_common(finetune, payload["params"]["original"])
        params = {"original": payload["params"]["original"],
                  "finetune": finetune}
        state = create_train_state(params, cfg)
        print(f"Fine-tuning from {a.fine_tune_from} (stage-1 best epoch "
              f"{epoch}); original stage "
              f"{'FROZEN' if cfg.train.freeze_original else 'trainable'}")
    if a.continue_train_model:
        import dataclasses

        from ..models.iegmn import init_docking_model
        from ..train.checkpoint import load_checkpoint
        from ..train.step import TrainState, create_train_state

        # read the sidecar config first, then restore against a structured
        # template so the optax state keeps its named-tuple types (a
        # template-less restore yields plain dicts)
        _, cfg_ckpt, _ = load_checkpoint(a.continue_train_model)
        # adopt the checkpoint's architecture, keep CLI kernel/numerics flags
        model_cfg = dataclasses.replace(
            cfg_ckpt.model,
            use_fused_attention=cfg.model.use_fused_attention,
            factored_edge_mlp=cfg.model.factored_edge_mlp,
            remat=cfg.model.remat, dtype=cfg.model.dtype)
        cfg = dataclasses.replace(cfg, model=model_cfg)
        tmpl = create_train_state(
            init_docking_model(jax.random.PRNGKey(0), cfg.model), cfg)
        payload, _, epoch = load_checkpoint(a.continue_train_model, tmpl)
        state = TrainState(payload["params"], payload["opt_state"],
                           payload["step"], payload.get("bn_state", ()))
        print(f"Continuing from {a.continue_train_model} (epoch {epoch})")

    log = make_logger(cfg)
    log("Model name ===> ", cfg.banner())
    from ..models.iegmn import kernel_path_report

    log("Kernel paths ===> ", kernel_path_report(
        cfg.model, packed=cfg.data.pack and cfg.data.pack_max_per_slot > 1))
    if a.max_epochs is not None or a.max_seconds is not None:
        fit(cfg, state=state, max_epochs=a.max_epochs, log=log,
            max_seconds=a.max_seconds)
    else:
        curriculum(cfg, toy=a.toy, log=log)


if __name__ == "__main__":
    main()
