"""Typed configuration for the TPU-native EquiDock framework.

Replaces the reference's global argparse dict (`/root/reference/src/utils/args.py:15-313`)
with an explicit, hashable dataclass that can be closed over by `jax.jit` safely.
Defaults reproduce the reference's paper-model hyperparameters (args.py defaults plus
the hyper-search fixed choices at args.py:272-275).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional, Tuple


def reference_root(*parts: str, must_exist: bool = False) -> str:
    """Root of the reference data checkout (raw structures, frozen test
    sets). Defaults to this environment's mount; override with
    EQUIDOCK_REFERENCE_ROOT when deploying elsewhere (ADVICE r4: tools and
    benches must not hard-couple to one checkout location)."""
    root = os.environ.get("EQUIDOCK_REFERENCE_ROOT", "/root/reference")
    path = os.path.join(root, *parts)
    if must_exist and not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — set EQUIDOCK_REFERENCE_ROOT to your "
            "reference-data checkout (PDB structures / frozen test sets)")
    return path


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """IEGMN + keypoint/Kabsch-head hyperparameters.

    Mirrors the model-relevant entries of the reference args dict
    (`args.py:57-104`); field names follow the reference flags.
    """

    residue_emb_dim: int = 64
    iegmn_lay_hid_dim: int = 64
    iegmn_n_lays: int = 5
    shared_layers: bool = False
    num_att_heads: int = 50          # == number of keypoints K
    nonlin: str = "lkyrelu"          # 'lkyrelu' | 'swish'
    leakyrelu_neg_slope: float = 1e-2
    dropout: float = 0.0
    layer_norm: str = "LN"           # inside edge/node MLPs: '0' | 'BN' | 'LN'
    layer_norm_coors: str = "0"      # inside coors MLP: '0' | 'BN' | 'LN'
    final_h_layer_norm: str = "0"    # after each layer: '0' | 'LN' | 'GN' | 'BN'
    cross_msgs: bool = True
    use_dist_in_layers: bool = True
    use_edge_features_in_gmn: bool = True
    use_mean_node_features: bool = True
    skip_weight_h: float = 0.5
    x_connection_init: float = 0.0
    fine_tune: bool = False
    # Accepted but unused, matching the reference: `-divide_coors_dist` is
    # parsed and printed (`args.py:88`, `inference_rigid.py:115`) but never
    # read by the model.
    divide_coors_dist: bool = False
    # Graph featurization constants (fixed by the reference pipeline).
    num_residue_types: int = 21      # 20 canonical + 1 unknown
    input_edge_feats_dim: int = 27   # 15 RBF + 12 orientation (protein_utils.py:371-390)
    num_dist_sigmas: int = 15        # RBF ladder 1.5**x, x in [0, 15)
    # Numerics.
    dtype: str = "float32"           # compute dtype for MLP/attention matmuls
    param_dtype: str = "float32"
    # Kernels: use the fused Pallas cross-attention (interpret-mode on CPU).
    use_fused_attention: bool = False
    # Decompose the edge-MLP concat into per-term matmuls (gather the h@W
    # products per node instead of h per edge; ~3x fewer edge MACs at K=10).
    # Numerically identical params; differs only in summation order.
    factored_edge_mlp: bool = False
    # Fused Pallas edge-message kernel: gathers + RBF + edge/coors MLPs +
    # segment means in one VMEM-resident kernel (forward path; backward
    # recomputes through the XLA expression). Same params.
    fused_edge_message: bool = False
    # Backward of the fused edge kernel also as a Pallas kernel (VMEM
    # recompute + all cotangents in one pass) instead of the XLA recompute.
    fused_edge_bwd: bool = False
    # Rematerialize each IEGMN layer in the backward pass (trade FLOPs for
    # HBM; lets deep configs / big buckets fit).
    remat: bool = False

    @property
    def input_node_feats_dim(self) -> int:
        d = self.residue_emb_dim
        if self.use_mean_node_features:
            d += 5
        return d


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """kNN-graph construction parameters (`args.py:44-51`)."""

    graph_nodes: str = "residues"
    graph_cutoff: float = 30.0
    graph_max_neighbor: int = 10     # == K, the fixed in-degree of the padded tables
    graph_residue_loc_is_alphaC: bool = True
    pocket_cutoff: float = 8.0
    translation_interval: float = 5.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / loop parameters (`args.py:32-40, 63-70`)."""

    lr: float = 2e-4
    w_decay: float = 1e-4
    scheduler: str = "warmup"        # 'warmup' | 'cyclic' | 'ROP'
    warmup: float = 1.0
    patience: int = 50
    num_epochs: int = 10000
    clip: float = 100.0
    bs: int = 10
    pocket_ot_loss_weight: float = 1.0
    intersection_loss_weight: float = 10.0
    intersection_sigma: float = 25.0
    intersection_surface_ct: float = 10.0
    random_seed: int = 8
    # OT solver (replaces POT's exact network simplex, `ot_utils.py:22-29`):
    # the reference detaches the transport plan, so a converged Sinkhorn plan
    # reproduces the gradient semantics. 'exact' routes through a scipy-LP
    # host callback with the reference's true solver semantics — slow; the
    # A/B arm for validating the on-device default (RESULTS.md OT evidence).
    ot_solver: str = "sinkhorn"      # 'sinkhorn' | 'exact'
    sinkhorn_epsilon: float = 0.01
    sinkhorn_iters: int = 200
    # Metering: fraction of train batches whose RMSD is measured (train.py:136).
    train_rmsd_fraction: float = 0.1
    # Fused Pallas softmin-field kernel for the intersection loss.
    use_fused_intersection: bool = False
    # Preemption-safe periodic checkpointing (0 = only on val improvement).
    save_every_epochs: int = 0
    # Validation repeats per epoch: the val metric depends on the random
    # SE(3) pose drawn per complex (db5_data.py:195-204); averaging several
    # draws denoises model selection on small val sets.
    val_repeats: int = 1
    # Two-stage fine-tuning (`-fine_tune_from`): train only the 2-layer
    # finetune branch, stage-1 trunk frozen (grad AND update zeroed so
    # weight decay cannot move it).
    freeze_original: bool = False
    # Early-stopping selection metric: 'crmsd' (the reference's val
    # complex-RMSD-median rule, train.py:372), 'irmsd', or 'sum' (CRMSD +
    # IRMSD medians — targets a checkpoint good at BOTH headline metrics).
    select_metric: str = "crmsd"
    # Device-resident epochs only: run each bucket group's n % bs leftover
    # pairs as one TRIMMED (1, r) scan step instead of padding the last step
    # to bs. Identical update math (dead slots contribute zero to the
    # pm-normalized loss) with the same step membership; at DB5 scale the
    # dead slots are ~15-30% of scheduled compute on fine bucket ladders
    # (PERF.md round-5 table). Adds at most one extra compile per (bucket,
    # r) pair, closed after the first epoch. Applies to the single-device
    # and streamed resident runners; the dp runner ignores it (its per-shard
    # width bs/dp already bounds final-step dead slots at (bs/dp - 1)*dp
    # per group, and a cross-shard trimmed step would need a common width).
    trim_remainder: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data: str = "db5"                # 'db5' | 'dips'
    data_fraction: float = 1.0
    split: int = 0
    n_jobs: int = 4
    raw_data_path: str = reference_root("data/benchmark5.5/structures")
    split_files_path: str = reference_root("data/benchmark5.5/cv/cv_0")
    cache_dir: str = "./cache"
    # Padding buckets for node counts; a batch pads N_lig / N_rec up to the
    # smallest bucket that fits (bounds XLA recompilations; SURVEY §7.3).
    node_buckets: Tuple[int, ...] = (64, 128, 192, 256, 384, 512, 768, 1024, 1536)
    pocket_buckets: Tuple[int, ...] = (32, 64, 128, 256, 512, 1024)
    # `-node_buckets auto[:G]`: derive a cost-optimal <=G-step ladder from
    # the loaded splits' size distribution at fit() time (auto_node_buckets)
    # instead of using the fixed ladder above. 0 = off.
    auto_buckets_max: int = 0
    # `-pocket_buckets auto[:G]` — same, for pocket-midpoint counts (the
    # Sinkhorn cost matrix is K x K, so the quadratic term dominates:
    # quad_at=256, align=32).
    auto_pocket_max: int = 0
    swap_train: bool = True          # 50% ligand/receptor swap (db5_data.py:174-188)
    # Complex packing: bin-pack several small complexes into one padded slot
    # (block-diagonal neighbor tables + seg-masked attention/losses) — kills
    # the smaller-side-pads-to-chunk-max padding floor (PERF.md). The batch
    # still holds `bs` complexes; packing only reduces the padded slots they
    # occupy, so optimizer-step semantics are unchanged.
    pack: bool = False
    pack_max_per_slot: int = 4
    slot_count_buckets: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    # Streaming DIPS epochs: keep at most 2*stream_window shards resident
    # (DipsShardIndex + ShardLRU) instead of materializing the corpus —
    # required at the 42K-pair scale where load_dips_shards costs multi-GB
    # of host RSS. Shuffle granularity becomes the window (reshuffled per
    # epoch); schedule code is otherwise identical.
    stream_dips: bool = False
    stream_window: int = 4
    # Byte budget for the padded-static-field collation cache (graph.py::
    # PadCache, LRU-evicting). 4 GB holds every (graph, bucket) pair DB5
    # meets with ~10x headroom; at DIPS scale the weak keying already frees
    # entries with evicted shards, so this is a backstop, not a tuning knob.
    pad_cache_gb: float = 4.0
    # Device-resident epochs (train/resident.py): upload the padded split to
    # HBM once; per epoch only a (S, bs) int32 schedule + PRNG key cross the
    # host->device boundary and each bucket group's steps run as ONE
    # lax.scan dispatch. Kills both the tunnel-transport RSS leak (host RSS
    # grows with bytes transferred; scripts/rss_probe.py) and the
    # host-collate bottleneck of cached epochs. Materialized datasets only
    # (db5 / non-streaming dips), single-chip, unpacked.
    device_resident: bool = False
    # Pose distillation (round 3, VERDICT item-1 avenue b): blend a teacher
    # model's predicted train poses into the coordinate target,
    # gt <- (1-a)*gt + a*teacher. Gradient-identical to adding a*MSE(pred,
    # teacher) next to (1-a)*MSE(pred, gt) (the cross terms are
    # pred-independent), so no loss-code change is needed. Train split only;
    # canonical ligand side only (the swap-augmented side has no teacher).
    distill_dir: str = ""
    distill_alpha: float = 0.5


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. The reference is single-GPU (SURVEY §2.2); all of
    this is new, TPU-first design."""

    dp: int = 1                      # data-parallel (batch of complexes)
    gp: int = 1                      # graph-parallel (node/edge partition axis)
    mesh_axis_names: Tuple[str, ...] = ("data", "graph")
    # Halo ring tier as an explicit Pallas RDMA kernel that overlaps both
    # send directions with the local block copy (parallel/pallas_halo.py),
    # instead of two lax.ppermutes scheduled by XLA. Off by default: at
    # DB5-scale halos the collectives are ~25 us and XLA's latency-hiding
    # scheduler already overlaps them (PERF.md "overlap design").
    pallas_ring_halo: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    debug: bool = False
    checkpoint_dir: str = "./checkpts"
    log_dir: str = "./stdouterr"

    def banner(self) -> str:
        """Model-name string encoding key hyperparameters, the analogue of the
        reference's checkpoint-directory banner (`args.py:143-212`)."""
        m, t = self.model, self.train
        parts = [
            ("drp", m.dropout), ("Wdec", t.w_decay), ("ITS_lw", t.intersection_loss_weight),
            ("Hdim", m.iegmn_lay_hid_dim), ("Nlay", m.iegmn_n_lays),
            ("shrdLay", m.shared_layers), ("SURFfs", m.use_mean_node_features),
            ("ln", m.layer_norm), ("lnX", m.layer_norm_coors), ("Hnrm", m.final_h_layer_norm),
            ("NattH", m.num_att_heads), ("skH", m.skip_weight_h),
            ("xConnI", m.x_connection_init), ("LkySl", m.leakyrelu_neg_slope),
            ("pokOTw", t.pocket_ot_loss_weight),
        ]
        # appended only when set so pre-existing non-ft checkpoint dirs keep
        # their names (the reference banner never encoded -fine_tune)
        if m.fine_tune:
            parts.append(("FT", True))

        def tostr(v):
            if isinstance(v, bool):
                return "T" if v else "F"
            return str(v)

        name = "EQUIDOCK_TPU__" + "#".join(f"{k}_{tostr(v)}" for k, v in parts)
        if len(name) > 200:
            name = name[:160] + hashlib.sha1(name.encode()).hexdigest()[:12]
        return name

    def cache_path(self) -> str:
        """Derived cache directory, same discipline as `args.py:307-309`."""
        g = self.graph
        return (
            f"{self.data.cache_dir}/{self.data.data}_{g.graph_nodes}"
            f"_maxneighbor_{g.graph_max_neighbor}_cutoff_{g.graph_cutoff}"
            f"_pocketCut_{g.pocket_cutoff}/cv_{self.data.split}"
        )

    # -- convenience constructors for the two paper models -------------------

    @staticmethod
    def dips_paper_model() -> "Config":
        """Hyperparameters of the released DIPS checkpoint
        (`inference_rigid.py:90-91`: 8 layers, unshared, skip 0.75, wd 1e-4)."""
        return Config(
            model=ModelConfig(iegmn_n_lays=8, shared_layers=False, skip_weight_h=0.75),
            train=TrainConfig(lr=2e-4, w_decay=1e-4, patience=100),
            data=DataConfig(data="dips"),
        )

    @staticmethod
    def db5_paper_model() -> "Config":
        """Hyperparameters of the released DB5 checkpoint
        (`inference_rigid.py:93-94`: 5 layers, shared, skip 0.5, wd 1e-3)."""
        return Config(
            model=ModelConfig(iegmn_n_lays=5, shared_layers=True, skip_weight_h=0.5),
            train=TrainConfig(lr=1e-4, w_decay=1e-3, patience=500),
            data=DataConfig(data="db5"),
        )

    @staticmethod
    def db5_small_model() -> "Config":
        """The DB5-only small-capacity recipe found in round 2 (RESULTS.md
        "Small-model sweep"): 14K-param trunk (hid/emb 16, 2 unshared layers,
        8 keypoints) at lr 1e-4 / wd 1e-4 / bs 4 with val_repeats-6 denoised
        selection. Matches the reference's DIPS-pretrained interface accuracy
        (IRMSD median 11.94 vs 11.97) with no pretraining corpus — small
        capacity replaces pretraining as the regularizer on 203 train pairs.
        No reference counterpart (the reference never released a small
        model; this recipe is a product of our sweep)."""
        return Config(
            model=ModelConfig(residue_emb_dim=16, iegmn_lay_hid_dim=16,
                              iegmn_n_lays=2, shared_layers=False,
                              num_att_heads=8),
            train=TrainConfig(lr=1e-4, w_decay=1e-4, patience=400, bs=4,
                              val_repeats=6),
            data=DataConfig(data="db5"),
        )


def auto_node_buckets(sizes, max_groups: int = 12, align: int = 64,
                      quad_at: int = 640) -> Tuple[int, ...]:
    """Cost-optimal node-bucket ladder for a KNOWN size distribution.

    Minimizes sum_pairs c(B(s)) with c(B) = B + B^2/quad_at: the linear term
    models the O(N) edge/elementwise work, the quadratic one the O(N^2)
    cross attention; at the paper model's D=64/K=10 the two are equal near
    N=640 (N*K*D^2 == N^2*D). Exact DP over align-rounded candidate
    boundaries, O(n^2 * max_groups) with n = distinct aligned sizes.

    Designed to compose with `-trim_remainder`, where batch-slot padding no
    longer punishes small bucket groups (PERF.md round-5 table). No
    reference counterpart: DGL rebuilds exact per-batch graphs, so the
    reference never pads — and never amortizes an XLA compile either.
    """
    import numpy as _np

    arr = _np.sort(_np.asarray([int(s) for s in sizes]))
    if arr.size == 0:
        raise ValueError("auto_node_buckets: empty size list")
    cand = sorted({-(-int(s) // align) * align for s in arr.tolist()})
    prefix = _np.searchsorted(arr, cand, side="right")   # pairs <= cand[j]
    n = len(cand)
    cost_b = [b + b * b / float(quad_at) for b in cand]
    G = max(1, min(max_groups, n))
    INF = float("inf")
    best = [[INF] * (G + 1) for _ in range(n)]
    back = [[-1] * (G + 1) for _ in range(n)]
    for j in range(n):
        best[j][1] = float(prefix[j]) * cost_b[j]
    for k in range(2, G + 1):
        for j in range(k - 1, n):
            for i in range(k - 2, j):
                c = best[i][k - 1] + float(prefix[j] - prefix[i]) * cost_b[j]
                if c < best[j][k]:
                    best[j][k] = c
                    back[j][k] = i
    k_star = min(range(1, G + 1), key=lambda k: best[n - 1][k])
    out, j, k = [], n - 1, k_star
    while j >= 0 and k >= 1:
        out.append(cand[j])
        j, k = back[j][k], k - 1
    return tuple(sorted(out))


def bucket_for(n: int, buckets: Tuple[int, ...]) -> int:
    """Smallest bucket >= n; falls back to rounding up to the largest bucket's
    granularity for outliers (SURVEY §7.3 drop/split policy: we pad instead)."""
    for b in buckets:
        if n <= b:
            return b
    step = buckets[-1]
    return ((n + step - 1) // step) * step
