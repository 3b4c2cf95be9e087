"""Configuration for TAGAN-TPU.

Frozen (hashable) dataclass so configs can be jit-static arguments.
Field names and defaults mirror the reference ``TAGANConfig``
(`/root/reference/src/tagan/utils/config.py:54-108`) plus TPU-specific
fields (padding buckets, compute path, compat mode, mesh axes).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

VALID_LOSS_TYPES = ("ce", "bce", "mse", "focal", "classification",
                    "multi_class", "multi_label", "regression", "sequence",
                    "huber", "quantile")

VALID_DISTANCE_METRICS = (
    "euclidean", "squared_euclidean", "manhattan", "cosine_similarity",
    "cosine_distance", "dot_product", "scaled_dot_product", "mahalanobis",
    "gaussian_kernel", "rbf_kernel",
)


@dataclass(frozen=True)
class TAGANConfig:
    # Model architecture (config.py:57-60)
    hidden_dim: int = 64
    num_layers: int = 2
    num_heads: int = 4
    temporal_attention_dim: int = 64

    # Feature dimensions (config.py:63-65)
    node_feature_dim: int = 16
    edge_feature_dim: int = 0
    output_dim: int = 2

    # Training parameters (config.py:68-73)
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    dropout: float = 0.1
    memory_decay_factor: float = 0.8
    max_inactivity: int = 5
    gradient_clip_val: float = 1.0
    num_epochs: int = 50

    # Architecture options (config.py:76-82)
    use_layer_norm: bool = True
    edge_importance: bool = True
    gru_bias: bool = True
    leaky_relu_slope: float = 0.2
    use_edge_features: bool = False
    concat_heads: bool = True
    learnable_distance: bool = False
    distance_metric: Optional[str] = None  # None -> reference rule (model.py:80)

    # Temporal propagation options (config.py:85-91)
    time_aware: bool = True
    bidirectional: bool = False
    use_skip_connection: bool = True
    use_gating: bool = True
    temporal_window_size: int = 3
    aggregation_method: str = "mean"
    use_residual: bool = True

    # Temporal attention options (config.py:94-96)
    causal_attention: bool = False
    asymmetric_temporal_bias: bool = True
    window_size: int = 5
    future_discount: float = 0.8
    max_relative_position: int = 32
    time_encoding_type: str = "basis"
    use_time_masks: bool = True
    max_time_diff: float = 10.0
    # Which temporal-attention family aggregates over the time axis:
    # "asymmetric" (the paper's op — reference wiring, model.py:102-111),
    # "standard" (plain pre-LN MHA, temporal_attention.py:309), or
    # "multi_scale" (multi-resolution, temporal_attention.py:1220 — dead
    # in the reference, first-class here).
    temporal_attention_type: str = "asymmetric"
    num_time_scales: int = 3
    scale_fusion: str = "concat"   # concat | sum | weighted_sum | attention

    # Loss parameters (config.py:99-101)
    loss_type: str = "ce"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0

    # Head options (classification.py:756-767)
    pooling_type: str = "attention"
    head_num_layers: int = 2
    # Node -> graph pooling per timestep (forward step 5,
    # model.py:377-427). The reference hardwires mean; "max" and
    # "attention" (learned Linear-tanh-Linear(1) scorer over nodes) are
    # first-class here — needle-in-haystack labels (one active node
    # among ~1K, e.g. the TGN state-change task) die under mean pooling.
    # "logit" skips feature pooling entirely: the head runs PER NODE
    # and the graph logit is the max over node logits (the
    # multiple-instance / noisy-OR readout; also exposes which node
    # fired). On needle tasks both max variants train on most init
    # seeds while mean/attention stall at the base rate; pair with
    # val-based restarts for robustness (bench_tgn.py).
    node_pooling: str = "mean"

    # ---- TPU-native fields (no reference analog) ----
    # Static padded sizes for jit: slots per sequence and max edges per
    # snapshot. Data pipeline buckets sequences into these.
    max_nodes: int = 0          # 0 = infer from data at trace time
    max_edges: int = 0
    # Compute path for per-snapshot attention: "dense" (N x N mask, MXU),
    # "flash" (fused Pallas kernel, scores never in HBM), "csr"
    # (gather/segment SpMM over the edge list — XLA, for very sparse
    # graphs on small chips), or "ring" (edge-partitioned over the mesh
    # graph axis with K/V circulating via ppermute — graphs larger than
    # one chip's HBM; requires TAGAN(mesh=...) and sequences built with
    # SnapshotSequence.with_ring_plan).
    spatial_backend: str = "dense"
    # Compat: "intended" runs the full propagation+memory pipeline
    # (SURVEY.md §7.4 Oracle B wiring); "executed" reproduces the
    # reference's actually-executed path (propagation bypassed — B2,
    # un-timed temporal attention) for end-to-end Oracle A parity.
    compat_mode: str = "intended"
    # Numerics: params/accum stay fp32. bf16_matmul forces single-pass
    # bfloat16 MXU contractions model-wide (jax default_matmul_precision
    # 'bfloat16' on the dense path; the flash kernel's in-kernel bf16
    # casts on the sparse path).
    bf16_matmul: bool = False
    # Rematerialization: recompute per-snapshot attention activations in
    # the backward pass instead of storing them (jax.checkpoint) — trades
    # FLOPs for HBM on long sequences / large graphs.
    remat: bool = False
    # Flash-kernel block geometry overrides (0 = the measured auto rule:
    # block_m 512, dropping to 256 under edge bias or bf16_matmul where
    # the backward walks exceed scoped VMEM; block_n 1024). Set from the
    # measured sweep table in benchmarks/results_block_sweep.json when a
    # config deviates from the defaults.
    flash_block_m: int = 0
    flash_block_n: int = 0

    def __post_init__(self):
        self.validate()

    # -- validation mirrors reference semantics (config.py:191-249) ------
    def validate(self):
        if self.hidden_dim <= 0:
            raise ValueError(f"hidden_dim must be positive, got {self.hidden_dim}")
        if self.num_layers <= 0:
            raise ValueError(f"num_layers must be positive, got {self.num_layers}")
        if self.num_heads <= 0:
            raise ValueError(f"num_heads must be positive, got {self.num_heads}")
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError("hidden_dim must be divisible by num_heads")
        if self.node_feature_dim <= 0:
            raise ValueError("node_feature_dim must be positive")
        if self.edge_feature_dim < 0:
            raise ValueError("edge_feature_dim must be non-negative")
        if self.output_dim <= 0:
            raise ValueError("output_dim must be positive")
        if self.learning_rate <= 0:
            raise ValueError("learning_rate must be positive")
        if not 0 <= self.dropout < 1:
            raise ValueError("dropout must be in [0, 1)")
        if not 0 < self.memory_decay_factor <= 1:
            raise ValueError("memory_decay_factor must be in (0, 1]")
        if self.max_inactivity <= 0:
            raise ValueError("max_inactivity must be positive")
        if self.loss_type not in VALID_LOSS_TYPES:
            raise ValueError(
                f"loss_type must be one of {VALID_LOSS_TYPES}, got {self.loss_type}")
        if self.distance_metric is not None and \
                self.distance_metric not in VALID_DISTANCE_METRICS:
            raise ValueError(f"unknown distance_metric {self.distance_metric}")
        if self.temporal_attention_type not in ("asymmetric", "standard",
                                                "multi_scale"):
            raise ValueError(
                "temporal_attention_type must be 'asymmetric', 'standard',"
                f" or 'multi_scale', got {self.temporal_attention_type}")
        if self.scale_fusion not in ("concat", "sum", "weighted_sum",
                                     "attention"):
            raise ValueError(f"unknown scale_fusion {self.scale_fusion}")
        if self.spatial_backend not in ("dense", "csr", "flash", "ring",
                                        "hybrid"):
            raise ValueError("spatial_backend must be 'dense', 'csr', "
                             "'flash', 'ring', or 'hybrid'")
        if self.compat_mode not in ("intended", "executed"):
            raise ValueError("compat_mode must be 'intended' or 'executed'")
        if self.node_pooling not in ("mean", "max", "attention",
                                     "logit"):
            raise ValueError("node_pooling must be 'mean', 'max', "
                             "'attention', or 'logit', got "
                             f"{self.node_pooling}")

    # -- reference rule for the geometric metric (model.py:80) -----------
    @property
    def effective_distance_metric(self) -> str:
        if self.distance_metric is not None:
            return self.distance_metric
        return "scaled_dot_product" if self.learnable_distance else "euclidean"

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    # -- dict / JSON round trip (config.py:267-339) -----------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TAGANConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "TAGANConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw) -> "TAGANConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ExperimentConfig:
    """Training-run level config (reference TAGANExperimentConfig,
    config.py:353-603)."""
    model: TAGANConfig = field(default_factory=TAGANConfig)
    experiment_name: str = "tagan_experiment"  # config.py:380
    data_path: str = "data/"                   # config.py:381
    output_path: str = "outputs/"              # config.py:382
    batch_size: int = 16
    num_epochs: int = 50
    num_folds: int = 5                     # config.py:386 (used by
                                           # trainer.cross_validate)
    seed: int = 42
    eval_every: int = 1
    early_stopping_patience: int = 10
    early_stopping_metric: str = "f1"      # trainer.py:197-222 stops on val F1
    lr_scheduler: Optional[str] = None     # None | 'cosine' | 'plateau' | 'step'
    lr_scheduler_factor: float = 0.5
    lr_scheduler_patience: int = 5
    lr_scheduler_step_size: int = 10       # epochs per 'step' decay
                                           # (config.py:392 scheduler_step_size)
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 0              # 0 = only best
    log_every: int = 10
    # timestamped training_<ts>.log + console handler when set
    # (reference trainer.py:113-141); "" = module logger only
    log_dir: str = ""
    # dump training_history.png/json into checkpoint_dir at the end of
    # train() (reference trainer.py:591-638)
    plot_history: bool = False
    shuffle: bool = True
    num_workers: int = 0                   # config.py:390 — loader
                                           # prefetch threads (0 = sync)
    # TPU-native: run each training epoch as lax.scan'd device programs
    # (one dispatch per shape bucket instead of one per step). Identical
    # math; removes per-step launch latency. Costs device memory for the
    # stacked epoch batches.
    fused_epochs: bool = False

    def __post_init__(self):
        if self.num_folds <= 0:            # config.py:459-460
            raise ValueError(
                f"Number of folds must be positive, got {self.num_folds}")
        if self.batch_size <= 0:
            raise ValueError(
                f"batch_size must be positive, got {self.batch_size}")

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        d = dict(d)
        if "model" in d and isinstance(d["model"], dict):
            d["model"] = TAGANConfig.from_dict(d["model"])
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)
