"""Query plan layer: the declared query inventory (SURVEY.md §2) plus the
registry the driver contract (__spark_entry__.py) is generated from."""

from python_async_sample_spark.plans.registry import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
