"""Self-describing checkpoints (params + optimizer state + config + epoch).

Replaces `src/utils/early_stop.py:106-204` (torch.save of
{epoch, state_dict, optimizer, args}) with orbax — atomic, async-safe,
multi-host-aware saves, the preemption-safe pattern TPU pods need
(SURVEY §5 failure-detection note).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config
from .step import TrainState


def _config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def config_from_json(s: str) -> Config:
    from ..config import (DataConfig, GraphConfig, ModelConfig, ParallelConfig,
                          TrainConfig)

    d = json.loads(s)
    for k in ("node_buckets", "pocket_buckets"):
        if k in d.get("data", {}):
            d["data"][k] = tuple(d["data"][k])
    if "mesh_axis_names" in d.get("parallel", {}):
        d["parallel"]["mesh_axis_names"] = tuple(d["parallel"]["mesh_axis_names"])
    return Config(
        model=ModelConfig(**d["model"]), graph=GraphConfig(**d["graph"]),
        train=TrainConfig(**d["train"]), data=DataConfig(**d["data"]),
        parallel=ParallelConfig(**d["parallel"]),
        debug=d.get("debug", False),
        checkpoint_dir=d.get("checkpoint_dir", "./checkpts"),
        log_dir=d.get("log_dir", "./stdouterr"),
    )


def save_checkpoint(path: str, state: TrainState, cfg: Config, epoch: int) -> None:
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int32),
    }
    if state.bn_state:
        payload["bn_state"] = state.bn_state
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckpt.save(path, payload)
    ckpt.wait_until_finished()
    with open(path + ".config.json", "w") as f:
        f.write(_config_to_json(cfg))


def load_checkpoint(path: str, template: Optional[TrainState] = None
                    ) -> Tuple[Any, Config, int]:
    """Returns (payload dict, Config, epoch). The checkpoint is
    self-describing: Config is restored from the sidecar JSON (the analogue of
    the reference adopting `checkpoint['args']`, `inference_rigid.py:102-103`).
    """
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        tmpl = {
            "params": template.params, "opt_state": template.opt_state,
            "step": template.step, "epoch": np.asarray(0, np.int32),
        }
        if template.bn_state:
            tmpl["bn_state"] = template.bn_state
        payload = ckpt.restore(path, tmpl)
    else:
        # Device-agnostic restore: the checkpoint may have been written on a
        # different topology (e.g. saved on TPU, restored on CPU for
        # inference); rebuild an abstract template with local shardings from
        # the stored metadata instead of trusting the recorded devices.
        from jax.sharding import SingleDeviceSharding

        meta = ckpt.metadata(path)
        tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
        dev = jax.local_devices()[0]
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(
                m.shape, m.dtype, sharding=SingleDeviceSharding(dev)),
            tree,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"))
        payload = ckpt.restore(path, abstract)
    with open(path + ".config.json") as f:
        cfg = config_from_json(f.read())
    return payload, cfg, int(payload["epoch"])
