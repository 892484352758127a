"""hnsw_tpu — a TPU-native approximate-nearest-neighbor framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of hnswlib-rs (HNSW graphs
per Malkov & Yashunin 2016/2018). The reference's prelude re-exports (reference
``src/prelude.rs:1-11``) map to this module's public surface.
"""

from .models.hnsw import Hnsw, Neighbour, PointIdWithOrder, NB_LAYER_MAX
from .models.flatten import FlatPoint, FlatNeighborhood
from .models.brute import BruteForceIndex
from .models.auto import AutoIndex
from .models.ivf import IvfFlatIndex
from .ops.distances import DISTANCES, Metric, UserMetric, get_metric, l2_normalize
from .filter import FilterT, SortedIdFilter, CallableFilter
from .api import AnnT
from .io.hnswio import (HnswIo, ReloadOptions, Description, load_description,
                        file_dump, save_native, load_native)
from .io.datamap import DataMap
from .utils.profiling import enable_profiling, profiling_report, PROFILER
from .ffi import NativeHnsw, init_native_log  # binds lazily; .so builds on first use
from .parallel.sharded import ShardedHnsw
from .utils.logging import init_logging

__version__ = "0.1.0"

__all__ = [
    "Hnsw", "Neighbour", "NB_LAYER_MAX", "FlatPoint", "FlatNeighborhood",
    "BruteForceIndex", "AutoIndex", "IvfFlatIndex", "NativeHnsw", "ShardedHnsw",
    "DISTANCES", "Metric", "UserMetric", "get_metric", "l2_normalize",
    "FilterT", "SortedIdFilter", "CallableFilter", "AnnT",
    "HnswIo", "ReloadOptions", "Description", "load_description", "file_dump",
    "save_native", "load_native", "DataMap", "init_logging", "init_native_log",
]
