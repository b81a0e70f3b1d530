"""Table-level data-quality expectations — the Deequ/dbt-test staple.

Where ``operators.validate`` flags individual ROWS into side outputs (the
reference's −1..−4 error-row contract, nikon_ETL.py), this module answers
the TABLE-level question a pipeline gate asks before publishing: how many
rows violate each declared constraint, and did the batch pass?

Scale shape by construction:

* ``not_null`` / ``in_range`` / ``accepted_values`` compile into ONE
  expression-only aggregate scan over the table — conditional sums,
  map-side combinable, no shuffle beyond the single global aggregate;
* ``unique`` is one groupBy on the key columns (count>1 groups are the
  violations — their EXCESS rows are counted, matching "rows that would
  have to be dropped to make the key unique");
* ``foreign_key`` is one left-anti join against the (broadcastable)
  dimension's key projection — orphan rows are the violations.

Every rule reports (rule, kind, n_checked, n_violations, passed); the
report is a handful of rows regardless of table size, and ``fail_on``
lets a pipeline poison its own plan when a must-pass rule breaks.

Reference tie-in: the reference hard-codes its four validity flags inside
the ETL (nikon_ETL.py error rows); this is the declarative, table-level
generalization a warehouse gate needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True, eq=False)
class Rule:
    # eq=False: the dataclass-generated __eq__ would compare the Column /
    # DataFrame fields with ==, which in Spark builds an expression (and
    # truth-testing it raises) — identity comparison is the sane semantic

    name: str
    kind: str  # not_null | in_range | accepted_values | unique | foreign_key
    predicate: Column | None = None  # row-level violation predicate (agg rules)
    key_cols: tuple[str, ...] = ()  # unique
    fk_col: str | None = None  # foreign_key
    dim: DataFrame | None = None  # foreign_key
    dim_col: str | None = None  # foreign_key


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null({col})", "not_null", F.col(col).isNull())


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    """Violation = value outside [lo, hi]. NULLs are not range violations —
    declare ``not_null`` separately so each rule reports one failure mode."""
    c = F.col(col)
    return Rule(
        name or f"in_range({col})",
        "in_range",
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
    )


def accepted_values(col: str, values: list, name: str | None = None) -> Rule:
    c = F.col(col)
    return Rule(
        name or f"accepted_values({col})",
        "accepted_values",
        c.isNotNull() & ~c.isin(values),
    )


def unique(cols: list[str], name: str | None = None) -> Rule:
    return Rule(
        name or f"unique({','.join(cols)})", "unique", key_cols=tuple(cols)
    )


def foreign_key(
    fk_col: str, dim: DataFrame, dim_col: str, name: str | None = None
) -> Rule:
    """Violation = a non-NULL fk value with no matching dimension key
    (SQL FK semantics: NULL references are not orphans)."""
    return Rule(
        name or f"foreign_key({fk_col})",
        "foreign_key",
        fk_col=fk_col,
        dim=dim,
        dim_col=dim_col,
    )


def run_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One report row per rule: (rule, kind, n_checked, n_violations,
    passed).  All predicate rules share ONE aggregate scan; each unique
    rule adds one groupBy; each FK rule one anti-join — nothing is
    table-sized on the driver, and the report is len(rules) rows."""
    if not rules:
        raise ValueError("run_expectations requires at least one rule")
    reports: list[DataFrame] = []

    pred_rules = [r for r in rules if r.predicate is not None]
    if pred_rules:
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            *[
                F.sum(F.when(r.predicate, 1).otherwise(0))
                .cast("bigint")
                .alias(f"__v{i}")
                for i, r in enumerate(pred_rules)
            ],
        )
        for i, r in enumerate(pred_rules):
            reports.append(
                agg.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.col("__n").alias("n_checked"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
            )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.key_cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(F.sum(F.col("__c")), F.lit(0))
                    .cast("bigint")
                    .alias("n_checked"),
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c") - 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("n_violations"),
                )
            )
            reports.append(
                dup.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    "n_checked",
                    "n_violations",
                )
            )
        elif r.kind == "foreign_key":
            # ONE pass over the fact side: left join against the distinct
            # dimension keys, count rows and unmatched rows in the same
            # aggregate (a separate anti-join would scan the fact twice)
            fk = df.select(F.col(r.fk_col).alias("__fk")).where(
                F.col("__fk").isNotNull()
            )
            dim_keys = (
                r.dim.select(F.col(r.dim_col).alias("__fk"))
                .distinct()
                .withColumn("__hit", F.lit(1))
            )
            rep = fk.join(dim_keys, "__fk", "left").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
                F.coalesce(F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
            reports.append(
                rep.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    "n_checked",
                    "n_violations",
                )
            )

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("n_violations") == 0)


def fail_on(report: DataFrame, must_pass: list[str]) -> DataFrame:
    """Poison the report's plan when any must-pass rule has violations —
    the publish gate.  Rides the union-poison shape (fires under count/
    collect/hash alike; see plans.similarity_queries._union_poison_guard).

    A must-pass name that matches NO report rule also poisons: a typo'd
    or renamed rule would otherwise silently disable the gate forever —
    the worst failure mode a publish gate can have."""
    from python_async_sample_spark.plans.similarity_queries import (
        _union_poison_guard,
    )

    names = sorted(set(must_pass))
    matched = report.where(F.col("rule").isin(names)).agg(
        F.countDistinct("rule").alias("__m")
    )
    missing = matched.where(F.col("__m") < len(names)).limit(1)
    report = _union_poison_guard(
        report,
        missing,
        f"fail_on: some must-pass rule names match no report rule: {names}",
    )
    violation = report.where(
        F.col("rule").isin(names) & (F.col("n_violations") > 0)
    ).limit(1)
    return _union_poison_guard(
        report, violation, f"data expectation failed among must-pass rules {names}"
    )
