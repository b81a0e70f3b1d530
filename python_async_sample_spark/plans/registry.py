"""Registry mapping SURVEY.md §2 operator inventory → runnable queries.

Each entry pairs a Spark DataFrame program with (where SQL-expressible) an
ANSI-SQL oracle that DuckDB runs on the same parquet tables. The driver
compares row counts, schemas and order-insensitive value hashes, so:

* every computed column is aliased identically on both sides;
* floating-point aggregates are rounded identically on both sides (summation
  order differs between engines, so raw doubles would hash-mismatch);
* raw timestamps are avoided in outputs (ns vs µs precision differs between
  DuckDB and Spark) — they are formatted or truncated instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    ref: str  # SURVEY.md §2 inventory ids this query covers
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, ref: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ref=ref, tags=tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    # Imports are for their registration side effects.
    from python_async_sample_spark.plans import (  # noqa: F401
        analytics,
        dedup_queries,
        extended_queries,
        incremental_queries,
        multimodal_queries,
        pipeline_queries,
        relational,
        similarity_queries,
        streaming_queries,
        text_queries,
    )

    return QUERIES
