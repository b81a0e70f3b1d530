from python_async_sample_spark.incremental.pipeline import (
    CHUNK,
    MAX_ITER,
    IncrementalRunner,
    IncrementalStage,
)
from python_async_sample_spark.incremental.sink import overwrite_window, read_target
from python_async_sample_spark.incremental.state import WatermarkStore

__all__ = [
    "CHUNK",
    "MAX_ITER",
    "IncrementalRunner",
    "IncrementalStage",
    "WatermarkStore",
    "overwrite_window",
    "read_target",
]
