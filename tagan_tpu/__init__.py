"""TAGAN-TPU: a TPU-native framework for Temporal Asymmetric Graph
Attention Networks, built from scratch on JAX/XLA/Pallas/pjit.

Capability reference: MaLoskins/Temporal-Asymmetric-Graph-Attention-Network
(analyzed in SURVEY.md). This is a re-design, not a port: per-snapshot
geometric attention runs edge-masked on the MXU (dense) or as Pallas
SDDMM/SpMM kernels (CSR), temporal propagation is a lax.scan with a
functional node memory bank, and multi-chip scaling uses jax.sharding
over an ICI mesh.
"""

from .core.config import TAGANConfig, ExperimentConfig
from .core.graph import (SnapshotSequence, build_sequence, batch_sequences,
                         pad_dims_for)
from .core.memory import (MemoryState, init_memory, memory_update,
                          memory_read, memory_reset, memory_stats,
                          TemporalMemoryState, init_temporal_memory,
                          temporal_memory_append, temporal_memory_interpolate)
from .nn.model import TAGAN, TAGANOutput, batched_forward

__version__ = "0.1.0"

__all__ = [
    "TAGANConfig", "ExperimentConfig", "SnapshotSequence", "build_sequence",
    "batch_sequences", "pad_dims_for", "MemoryState", "init_memory",
    "memory_update", "memory_read", "memory_reset", "memory_stats",
    "TemporalMemoryState", "init_temporal_memory", "temporal_memory_append",
    "temporal_memory_interpolate", "TAGAN", "TAGANOutput", "batched_forward",
]
