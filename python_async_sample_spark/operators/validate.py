"""Validation split with coded error side-outputs (S10/P9).

Reference: the R stage never aborts on bad rows — it logs them to
``tlcd_nikon_rot_log_ht`` with flag codes (−1 missing values, −2 no design
values, −3 bad grid, −4 optimizer error; ``R/tlcd_nikonrot.R:147,178,205,263``)
and continues with the clean subset. The Spark analog is a single-pass
predicate split: good rows flow on, rejects become a side-output DataFrame
(dead-letter pattern) — per-row errors must never become task failures.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FLAG_OK = 1


@dataclass(frozen=True)
class Check:
    """One sequential validation rule: rows matching ``predicate`` are
    rejected with ``flag``/``descr`` (first matching rule wins, like the
    reference's ordered check_* calls)."""

    flag: int
    descr: str
    predicate: Column  # True → reject


def flag_column(checks: list[Check]) -> Column:
    """CASE expression assigning the first matching reject flag, else 1."""
    expr = F.lit(FLAG_OK)
    for c in reversed(checks):
        expr = F.when(c.predicate, F.lit(c.flag)).otherwise(expr)
    return expr


def descr_column(checks: list[Check]) -> Column:
    expr = F.lit(None).cast("string")
    for c in reversed(checks):
        expr = F.when(c.predicate, F.lit(c.descr)).otherwise(expr)
    return expr


def validate_split(df: DataFrame, checks: list[Check]) -> tuple[DataFrame, DataFrame]:
    """Return (good, rejects). ``rejects`` carries ``flag`` and ``descr``.

    One flag/descr expression evaluated once; both outputs are filters over
    the same annotated plan, so the source scans once per consumed branch and
    no shuffle is introduced.
    """
    annotated = df.withColumn("flag", flag_column(checks)).withColumn(
        "descr", descr_column(checks)
    )
    good = annotated.where(F.col("flag") == FLAG_OK).drop("flag", "descr")
    rejects = annotated.where(F.col("flag") != FLAG_OK)
    return good, rejects


def drop_missing_with_rejects(
    df: DataFrame, subset: list[str], flag: int = -1, descr: str = "missing values"
) -> tuple[DataFrame, DataFrame]:
    """The reference's check_missingvalue (R/tlcd_nikonrot.R:168-196):
    rows with NULL/NaN in any measurement column are side-output, not dropped
    silently."""
    any_null = None
    for c in subset:
        cond = F.col(c).isNull() | F.isnan(F.col(c))
        any_null = cond if any_null is None else (any_null | cond)
    return validate_split(df, [Check(flag=flag, descr=descr, predicate=any_null)])


def observed(df: DataFrame, name: str, exprs: dict[str, Column]):
    """Attach in-flight data-quality metrics to a DataFrame without a second
    scan: Spark's ``Observation`` collects the named aggregates as the plan
    executes, so a 100 TB pipeline gets its row counts / null rates /
    value bounds for FREE on the write it was already doing (the
    alternative — a separate ``df.agg(...)`` action — doubles the scan).

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action has consumed ``df``. Metrics ride
    the task results, never a shuffle."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in exprs.items()]), obs
