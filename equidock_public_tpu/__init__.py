"""equidock_public_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of EquiDock (octavian-ganea/equidock_public, ICLR 2022):
rigid protein-protein docking via SE(3)-equivariant graph matching networks.

Built from scratch for TPU: fixed-degree neighbor-table message passing,
bucketed padded batching, batched SVD/Kabsch heads, on-device Sinkhorn OT,
and pjit/shard_map parallelism over device meshes.
"""

__version__ = "0.1.0"

from .config import Config, DataConfig, GraphConfig, ModelConfig, ParallelConfig, TrainConfig  # noqa: F401
