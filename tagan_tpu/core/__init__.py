from . import module
from .config import TAGANConfig, ExperimentConfig
from .graph import SnapshotSequence, build_sequence, batch_sequences
from .memory import MemoryState, init_memory, memory_update, memory_read
