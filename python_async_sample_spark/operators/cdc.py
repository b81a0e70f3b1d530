"""Snapshot differencing: change capture between two table versions.

The reference captures change by timestamp interval (SURVEY §2.9 I2);
snapshot diff is the complementary verb when the upstream can't emit
timestamps: given yesterday's and today's table, classify every key as
added / removed / changed / unchanged. One full outer join on the key plus
a content-hash comparison — no per-row Python, and the hash collapses
arbitrarily wide rows into one comparable column so the join carries two
narrow columns per side regardless of schema width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns (key, change_type) with ``change_type`` in
    added / removed / changed (and unchanged when requested). Comparison is
    an md5 over the named columns (default: all non-key columns present in
    BOTH snapshots), concatenated with a non-ambiguous unit separator and a
    null sentinel so (null, "x") never collides with ("x", null).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c != key_col and c in new.columns
        ]
    sig = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in compare_cols]
        )
    )
    o = old.select(F.col(key_col), sig.alias("__old_sig"))
    n = new.select(F.col(key_col), sig.alias("__new_sig"))
    diff = o.join(n, key_col, "full_outer").select(
        key_col,
        F.when(F.col("__old_sig").isNull(), F.lit("added"))
        .when(F.col("__new_sig").isNull(), F.lit("removed"))
        .when(F.col("__old_sig") != F.col("__new_sig"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    if not include_unchanged:
        diff = diff.where(F.col("change_type") != "unchanged")
    return diff


def apply_diff(old: DataFrame, new: DataFrame, diff: DataFrame, key_col: str) -> DataFrame:
    """Reconstruct the new snapshot from the old one plus a diff: drop
    removed/changed keys from ``old``, then union the changed/added rows
    (payloads taken from ``new``). One anti join + one semi join — the
    incremental-apply path when shipping full snapshots is unaffordable and
    the diff is small."""
    drop = diff.where(F.col("change_type").isin("removed", "changed")).select(key_col)
    take = diff.where(F.col("change_type").isin("added", "changed")).select(key_col)
    kept = old.join(drop, key_col, "left_anti")
    incoming = new.join(take, key_col, "left_semi")
    return kept.unionByName(incoming)


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event stream into a Type-2 slowly-changing-dimension
    history: one row per (key, consecutive state run) with
    ``valid_from_us`` / ``valid_to_us`` epoch-microsecond bounds
    (``valid_to_us`` NULL = current) and a per-key ``version`` counter.

    Classic lag/lead construction: order each key's events by (ts,
    tiebreak), keep rows where the state differs from its predecessor
    (change points), then lead() supplies each change's end bound. Two
    window passes over the SAME (key × order) partitioning — Spark plans
    one shuffle and one sort, reused; state per key is bounded by its
    change count, never its event count."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .where(F.col("__prev").isNull() | (F.col(state_col) != F.col("__prev")))
        .drop("__prev")
    )
    w2 = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        key_col,
        state_col,
        F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w2)).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )


def table_checksum(
    df: DataFrame, group_cols: list[str], content_cols: list[str]
) -> DataFrame:
    """Order-insensitive per-group content checksum — the reconciliation
    verb for engine migrations and replica validation (this repo's own
    Spark↔DuckDB parity gate, packaged as an operator).

    Each row folds to a 32-bit-ish integer (first 8 md5 hex digits of the
    unit-separated, null-sentineled content columns — the ``snapshot_diff``
    signature convention) and the group checksum is the SUM of row
    signatures IN THE MOD-2³² RING, so it is independent of row order and
    partitioning and additive across splits (checksum(A ∪ B) =
    (checksum(A) + checksum(B)) mod 2³² for disjoint parts — mergeable the
    way a 100 TB scan needs).  The modular form matters: a plain int64 SUM
    of uniform 32-bit signatures overflows (ANSI-mode abort) once a group
    holds ~2³¹ rows — exactly the scale the verb exists for — so the two
    16-bit halves are summed separately (overflow-free to ~10¹⁴ rows per
    group) and recombined mod 2³².  Doubles must be normalized to
    fixed-scale DECIMAL by the caller; raw double→string rendering is
    engine-specific."""
    sig = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in content_cols
                    ],
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    m32 = F.lit(4294967296)
    sum_lo = F.sum(sig.bitwiseAND(F.lit(65535)))
    sum_hi = F.sum(F.shiftright(sig, 16))
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.pmod(F.pmod(sum_hi, m32) * 65536 + F.pmod(sum_lo, m32), m32)
        .cast("bigint")
        .alias("checksum"),
    )
