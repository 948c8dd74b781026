"""redis_hnsw_tpu: a TPU-native HNSW index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the full capability surface of
zhao-lang/redis_hnsw (a Rust Redis module): index create/inspect/drop, node
add/get/delete with online graph repair, k-NN search, checkpoint/restore --
plus the TPU-side extensions the reference lacks: batched search, batched
construction, Hamming distance, ef_search, and multi-chip sharding.
"""

from .api import HNSW, default_client
from .config import IndexConfig
from .errors import (
    CapacityError,
    DimensionMismatch,
    HNSWError,
    IndexExists,
    IndexNotFound,
    NodeBusy,
    NodeExists,
    NodeNotFound,
)
from .models.flat import FlatIndex
from .models.hnsw import HNSWIndex, SearchResult
from .utils.autotune import tune
from .utils.cache import enable_compilation_cache
from .utils.streaming import run_mixed

# Persistent XLA compilation cache: the jitted engines compile once per
# machine instead of once per process (opt out: REDIS_HNSW_TPU_NO_CACHE=1).
enable_compilation_cache()

__version__ = "0.1.0"

__all__ = [
    "HNSW",
    "default_client",
    "IndexConfig",
    "HNSWIndex",
    "FlatIndex",
    "SearchResult",
    "HNSWError",
    "DimensionMismatch",
    "IndexExists",
    "IndexNotFound",
    "NodeExists",
    "NodeNotFound",
    "NodeBusy",
    "CapacityError",
    "tune",
    "run_mixed",
    "enable_compilation_cache",
    "__version__",
]
