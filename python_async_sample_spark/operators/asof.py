"""Distributed as-of join — match each left row to the latest right row at
or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the composition below is
the scalable pattern: tag both sides, union, and run ONE window pass per key
ordered by (ts, side) carrying the last-seen right payload forward
(``last(..., ignorenulls=True)``). Cost = one shuffle on the key + a
per-partition sort — same as any windowed aggregation; no range self-join,
no per-row lookups. Right-side rows at exactly the left timestamp match
(``<=`` semantics), which the sort encodes by ordering the right tag first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SIDE = "__side"  # 0 = right (build), 1 = left (probe); sorts right first


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-renamed payload
    columns from the latest right row with ``right_ts <= left_ts`` on the
    same keys (NULL when no such row exists)."""
    lcols = left.columns
    l = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in payload_cols:
        l = l.withColumn(f"{prefix}{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.unionByName(r.select(*l.columns))

    # Tiebreak beyond (__ts, side): when several right rows share a (key, ts),
    # the payload columns pin WHICH one the carry-forward keeps (the max by
    # payload order) — without this the carried row is partition-order
    # nondeterministic.
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", _SIDE, *[f"{prefix}{c}" for c in payload_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned
    for c in payload_cols:
        carried = carried.withColumn(
            f"{prefix}{c}", F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        )
    return carried.where(F.col(_SIDE) == 1).drop(_SIDE, "__ts")
