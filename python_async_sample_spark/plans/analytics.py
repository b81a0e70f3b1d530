"""ROT analytics pipeline queries (§2.8) under the DuckDB-oracle gate.

The kernel inputs are synthesized deterministically from lineitem (the
testdata has no metrology tables): each supplier plays the role of a glass,
(l_discount·100, l_tax·100) the measured-vs-design differences, and
(l_partkey % 50, l_orderkey % 50) the design coordinates. Both the Spark
query and the SQL oracle derive them with the same expressions, so the
closed-form fit is checked value-for-value against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from python_async_sample_spark.kernels.rot import (
    apply_rot,
    fit_rot,
    fit_rot_pandas,
    grid_stats,
    label_positions,
)
from python_async_sample_spark.operators.validate import Check, validate_split
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table

# (x, y, dx, dy) synthesis shared by Spark and the oracle.
_SITES_SQL = """
    SELECT l_suppkey AS glass, l_orderkey, l_linenumber,
           l_discount * 100.0        AS x,
           l_tax * 100.0             AS y,
           CAST(l_partkey % 50 AS DOUBLE)  AS dx,
           CAST(l_orderkey % 50 AS DOUBLE) AS dy
    FROM lineitem
"""

_FIT_SQL = f"""
    WITH sites AS ({_SITES_SQL}),
    agg AS (
      SELECT glass,
             covar_pop(x, dy) AS cxdy, covar_pop(y, dx) AS cydx,
             var_pop(dx) AS vdx, var_pop(dy) AS vdy,
             avg(x) AS mx, avg(y) AS my, avg(dx) AS mdx, avg(dy) AS mdy,
             count(*) AS n_sites
      FROM sites GROUP BY glass
    ),
    fit AS (
      SELECT glass, n_sites,
             CASE WHEN vdx + vdy > 0 THEN (cxdy - cydx) / (vdx + vdy) ELSE 0.0 END AS t,
             mx, my, mdx, mdy
      FROM agg
    )
    SELECT glass,
           round(t * mdy - mx, 6)      AS shift_x,
           round(-my - t * mdx, 6)     AS shift_y,
           round(atan(t) * 1e6, 4)     AS theta_urad,
           n_sites
    FROM fit
"""


def _sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("glass"),
        "l_orderkey",
        "l_linenumber",
        (F.col("l_discount") * 100.0).alias("x"),
        (F.col("l_tax") * 100.0).alias("y"),
        (F.col("l_partkey") % 50).cast("double").alias("dx"),
        (F.col("l_orderkey") % 50).cast("double").alias("dy"),
    )


def _rounded_fit(fits: DataFrame) -> DataFrame:
    return fits.select(
        "glass",
        F.round("shift_x", 6).alias("shift_x"),
        F.round("shift_y", 6).alias("shift_y"),
        F.round("theta_urad", 4).alias("theta_urad"),
        "n_sites",
    ).orderBy("glass")


@query(
    "q20_rot_fit_closed_form",
    oracle=_FIT_SQL + " ORDER BY glass",
    ref="A7,§2.8",
    tags=("analytics", "kernel"),
)
def q20_rot_fit_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-glass least-squares fit via built-in aggregates (no UDF)."""
    return _rounded_fit(fit_rot(_sites(spark, sf_dir), ["glass"]))


@query(
    "q21_rot_apply_affine",
    oracle=f"""
    WITH sites AS ({_SITES_SQL}),
    agg AS (
      SELECT glass,
             covar_pop(x, dy) AS cxdy, covar_pop(y, dx) AS cydx,
             var_pop(dx) AS vdx, var_pop(dy) AS vdy,
             avg(x) AS mx, avg(y) AS my, avg(dx) AS mdx, avg(dy) AS mdy
      FROM sites GROUP BY glass
    ),
    fit AS (
      SELECT glass,
             CASE WHEN vdx + vdy > 0 THEN (cxdy - cydx) / (vdx + vdy) ELSE 0.0 END AS t,
             mx, my, mdx, mdy
      FROM agg
    )
    SELECT s.glass, s.l_orderkey, s.l_linenumber,
           round(s.x + (f.t * f.mdy - f.mx) - s.dy * f.t, 6) AS x_rot,
           round(s.y + (-f.my - f.t * f.mdx) + s.dx * f.t, 6) AS y_rot
    FROM sites s JOIN fit f USING (glass)
    WHERE s.l_orderkey % 200 = 0
    ORDER BY s.glass, s.l_orderkey, s.l_linenumber
    """,
    ref="§2.8,R4",
    tags=("analytics", "kernel"),
)
def q21_rot_apply_affine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affine correction applied per site row; fit params broadcast-joined."""
    sites = _sites(spark, sf_dir)
    fits = fit_rot(sites, ["glass"])
    out = apply_rot(sites, fits, ["glass"])
    return (
        out.where(F.col("l_orderkey") % 200 == 0)
        .select(
            "glass",
            "l_orderkey",
            "l_linenumber",
            F.round("x_rot", 6).alias("x_rot"),
            F.round("y_rot", 6).alias("y_rot"),
        )
        .orderBy("glass", "l_orderkey", "l_linenumber")
    )


@query(
    "q22_rot_fit_pandas_udf",
    oracle=_FIT_SQL + " ORDER BY glass",
    ref="§2.8,X4",
    tags=("analytics", "kernel", "pandas-udf"),
)
def q22_rot_fit_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fit via Arrow applyInPandas + numpy lstsq — the UDF escape hatch
    the R optim port would use; must match the closed form (and the oracle)."""
    return _rounded_fit(fit_rot_pandas(_sites(spark, sf_dir), ["glass"]))


@query(
    "q23_grid_validation",
    oracle="""
    SELECT l_suppkey AS glass,
           count(DISTINCT l_linenumber)  AS n_x,
           count(DISTINCT l_returnflag)  AS n_y,
           count(*)                      AS n_rows,
           count(DISTINCT l_linenumber) * count(DISTINCT l_returnflag) = count(*) AS grid_ok
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY glass
    """,
    ref="J10,O5,§2.8",
    tags=("analytics", "kernel"),
)
def q23_grid_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coord_checking's validity predicate per group (R/basic_fun.R:47)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("glass"),
        F.col("l_linenumber").alias("x"),
        F.col("l_returnflag").alias("y"),
    )
    return grid_stats(li, ["glass"]).orderBy("glass")


@query(
    "q24_position_labeling",
    oracle="""
    WITH sites AS (
      SELECT l_suppkey AS glass,
             l_orderkey, l_linenumber,
             CAST(l_partkey % 10 AS DOUBLE) AS x,
             CAST(l_orderkey * 10 + l_linenumber AS DOUBLE) AS y
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    SELECT glass, l_orderkey, l_linenumber,
           CAST((dense_rank() OVER (PARTITION BY glass ORDER BY x) - 1) * 6
                + row_number() OVER (PARTITION BY glass, x ORDER BY y) AS BIGINT) AS item_id
    FROM sites
    ORDER BY glass, item_id
    """,
    ref="O5,§2.8",
    tags=("analytics", "kernel"),
)
def q24_position_labeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mea_label_new_id's item_id assignment (R/basic_fun.R:83-97) as
    deterministic window functions."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 100 == 0)
        .select(
            F.col("l_suppkey").alias("glass"),
            "l_orderkey",
            "l_linenumber",
            (F.col("l_partkey") % 10).cast("double").alias("x"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("double").alias("y"),
        )
    )
    return label_positions(li, ["glass"]).select(
        "glass", "l_orderkey", "l_linenumber", "item_id"
    ).orderBy("glass", "item_id")


@query(
    "q25_validation_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars < 120 THEN -1
                WHEN lang NOT IN ('en', 'de', 'fr') THEN -2 END AS flag,
           CASE WHEN n_chars < 120 THEN 'too short'
                WHEN lang NOT IN ('en', 'de', 'fr') THEN 'unsupported lang' END AS descr
    FROM documents
    WHERE n_chars < 120 OR lang NOT IN ('en', 'de', 'fr')
    ORDER BY doc_id
    """,
    ref="S10,P9,X3",
    tags=("analytics", "validation"),
)
def q25_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error side-output with coded flags (dead-letter pattern,
    R/pg_db.R:114-139): the rejects table, first matching rule wins."""
    docs = load_table(spark, sf_dir, "documents")
    checks = [
        Check(flag=-1, descr="too short", predicate=F.col("n_chars") < 120),
        Check(flag=-2, descr="unsupported lang", predicate=~F.col("lang").isin("en", "de", "fr")),
    ]
    _good, rejects = validate_split(docs, checks)
    return rejects.select("doc_id", "flag", "descr").orderBy("doc_id")
