"""PySpark-native analytics engine with the capability surface of
``chairco/python_async_sample`` (reference at /root/reference, read-only).

The reference is an incremental Oracle→PostgreSQL ETL + concurrent
scatter-gather query client + R least-squares analytics stage. This package
re-expresses that entire surface — scans, filters, five join shapes,
aggregations, pivot/unpivot, watermark-driven incremental windows, the ROT
shift-and-rotate numeric kernel, and validation side-outputs — as idiomatic
Spark DataFrame pipelines, then extends it with the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) the 100 TB posture requires.

Nothing here is a port: the reference's SQL strings, thread/process pools and
Rscript subprocess hops all collapse into declarative Spark plans that
Catalyst optimizes (predicate pushdown, broadcast joins, AQE).
"""

from python_async_sample_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
