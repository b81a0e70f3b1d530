"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``python_async_sample_spark``; this module only
adapts the registry to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_async_sample_spark.plans.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}


def query_metadata() -> dict[str, dict]:
    """Per-query bookkeeping for readers of CORRECTNESS_r{N}.json.

    Every query omitted from :func:`oracle_sql` is approximate-or-
    engine-defined BY DESIGN (``rows_only: True``) and names the oracled
    ``certified_twin`` that hash-certifies the same kernel, so a
    ``no_oracle`` driver row is self-explaining — the registry enforces
    the pairing at load (plans/registry.ROWS_ONLY_TWINS).
    """
    from python_async_sample_spark.plans.registry import ROWS_ONLY_TWINS

    return {
        name: {
            "rows_only": spec.oracle is None,
            "certified_twin": ROWS_ONLY_TWINS.get(name),
            "ref": spec.ref,
            "tags": list(spec.tags),
        }
        for name, spec in load_all().items()
    }
