"""Pipeline-level queries (driver gate): the scatter-gather query API, the
end-to-end ROT pipeline, and the summary-MV recompute.

These exercise composed surfaces, not single operators: q26 runs the
reference's ``Queryteg.glass_raw_data`` flow (CSV key list → history semi-join
→ existence filter → raw results) as one plan; q27/q28 run the whole ROT
dataflow (validation side-outputs → closed-form fit → affine → melt) and
check the header and detail sinks value-for-value; q29 is the S13
materialized-view recompute (write + read-back of the summary table).
"""

from __future__ import annotations

import csv
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.api.scatter_gather import KeyedQuery
from python_async_sample_spark.pipelines.rot_pipeline import run_rot
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table, read_jsonl, read_keys_csv


# The reference reads its keys from an external sample.csv
# (eda_query.py:236-238); manufacture that external-key-file shape from the
# customer table ONCE per sf_dir, outside the timed query body, so the gate /
# bench measure the join pipeline rather than fixture file I/O.
_KEYS_CSV: dict[str, str] = {}


def _keys_csv_path(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _KEYS_CSV:
        keys = [
            r[0]
            for r in load_table(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % 50 == 0)
            .select("c_custkey")
            .collect()
        ]
        tmp = tempfile.mkdtemp(prefix="spark_graft_keys_")
        path = os.path.join(tmp, "keys.csv")
        with open(path, "w", newline="") as f:
            csv.writer(f).writerows([[k] for k in keys])
        _KEYS_CSV[sf_dir] = path
    return _KEYS_CSV[sf_dir]


@query(
    "q26_scatter_gather_lookup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_custkey % 50 = 0))
      AND l_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45)
    ORDER BY l_orderkey, l_linenumber
    """,
    ref="J5,J6,J7,S6,X1,X2,X3",
    tags=("api", "scatter-gather"),
)
def q26_scatter_gather_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eda_query fan-out (glass_raw_data, eda_query.py:216-231) as one
    declarative plan: CSV key list → history semi-join (stage-1 pool) →
    params-present existence filter (_bind_parm) → raw results. The
    200-thread / 50-process machinery is partition parallelism."""
    keys_df = read_keys_csv(spark, _keys_csv_path(spark, sf_dir), column="c_custkey").select(
        F.col("c_custkey").cast("bigint").alias("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    api = KeyedQuery(
        history=orders.select(
            F.col("o_custkey").alias("c_custkey"), F.col("o_orderkey").alias("l_orderkey")
        ),
        result=lineitem,
        key_col="c_custkey",
        link_cols=["l_orderkey"],
    )
    summary = lineitem.where(F.col("l_quantity") >= 45).select("l_orderkey")
    return (
        api.glass_raw_data(keys_df, summary=summary)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# Shared raw-measurement synthesis for the ROT pipeline gates: lineitem rows
# become sites, l_orderkey % 97 plants deterministic NULLs (missing-value
# path), glasses ≡ 0 (mod 7) have no design values (no-design path).
def _rot_rawdata(spark: SparkSession, sf_dir: str, orderkey_mod: int | None) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    if orderkey_mod is not None:
        li = li.where(F.col("l_orderkey") % orderkey_mod == 0)
    return li.select(
        F.col("l_suppkey").alias("glass"),
        F.concat(
            F.lit("al"),
            F.col("l_orderkey").cast("string"),
            F.lit("_"),
            F.col("l_linenumber").cast("string"),
        ).alias("site_name"),
        F.when(F.col("l_orderkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("l_discount") * 100.0)
        .alias("x"),
        (F.col("l_tax") * 100.0).alias("y"),
        (F.col("l_partkey") % 50).cast("double").alias("dx"),
        (F.col("l_orderkey") % 50).cast("double").alias("dy"),
    )


def _design_glasses(raw: DataFrame) -> DataFrame:
    return raw.select("glass").where(F.col("glass") % 7 != 0).distinct()


@query(
    "q27_rot_pipeline_header",
    oracle="""
    WITH raw AS (
      SELECT l_suppkey AS glass,
             CASE WHEN l_orderkey % 97 = 0 THEN NULL
                  ELSE l_discount * 100.0 END AS x
      FROM lineitem
    ),
    ok AS (
      SELECT glass, CAST(count(*) AS BIGINT) AS n_sites
      FROM raw WHERE glass % 7 <> 0 AND x IS NOT NULL GROUP BY glass
    )
    SELECT glass AS rot_id, 1 AS flag, n_sites, 'ok' AS descr FROM ok
    UNION ALL
    SELECT DISTINCT glass, -2, CAST(0 AS BIGINT), 'no design value'
    FROM raw WHERE glass % 7 = 0
    ORDER BY rot_id, flag
    """,
    ref="S9,S10,J9,P9,§3.2",
    tags=("pipeline", "analytics"),
)
def q27_rot_pipeline_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROT run-log header: ok rows with fitted-site counts plus coded error
    rows (no-design rejects), one table — the reference's
    tlcd_nikon_rot_log_ht."""
    raw = _rot_rawdata(spark, sf_dir, orderkey_mod=None)
    out = run_rot(raw, _design_glasses(raw))
    return out.header.orderBy("rot_id", "flag")


@query(
    "q28_rot_pipeline_detail",
    oracle="""
    WITH raw AS (
      SELECT l_suppkey AS glass,
             'al' || CAST(l_orderkey AS VARCHAR) || '_'
                  || CAST(l_linenumber AS VARCHAR) AS site_name,
             CASE WHEN l_orderkey % 97 = 0 THEN NULL
                  ELSE l_discount * 100.0 END AS x,
             l_tax * 100.0 AS y,
             CAST(l_partkey % 50 AS DOUBLE) AS dx,
             CAST(l_orderkey % 50 AS DOUBLE) AS dy
      FROM lineitem WHERE l_orderkey % 5 = 0
    ),
    clean AS (SELECT * FROM raw WHERE glass % 7 <> 0 AND x IS NOT NULL),
    agg AS (
      SELECT glass, covar_pop(x, dy) AS cxdy, covar_pop(y, dx) AS cydx,
             var_pop(dx) AS vdx, var_pop(dy) AS vdy,
             avg(x) AS mx, avg(y) AS my, avg(dx) AS mdx, avg(dy) AS mdy
      FROM clean GROUP BY glass
    ),
    fit AS (
      SELECT glass,
             CASE WHEN vdx + vdy > 0 THEN (cxdy - cydx) / (vdx + vdy)
                  ELSE 0.0 END AS t,
             mx, my, mdx, mdy
      FROM agg
    ),
    rot AS (
      SELECT c.glass, c.site_name,
             c.x + (f.t * f.mdy - f.mx) - c.dy * f.t AS x_rot,
             c.y + (-f.my - f.t * f.mdx) + c.dx * f.t AS y_rot
      FROM clean c JOIN fit f USING (glass)
      WHERE c.glass % 10 = 0
    )
    SELECT glass AS rot_id, site_name || '_x' AS item_name,
           round(x_rot, 6) AS rot_rs
    FROM rot
    UNION ALL
    SELECT glass, site_name || '_y', round(y_rot, 6) FROM rot
    ORDER BY rot_id, item_name
    """,
    ref="S9,R3,§2.8,§3.2",
    tags=("pipeline", "analytics"),
)
def q28_rot_pipeline_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROT detail sink: melted (rot_id, item_name, rot_rs) rotated values —
    the reference's tlcd_nikon_rot_bt, value-checked end to end."""
    raw = _rot_rawdata(spark, sf_dir, orderkey_mod=5)
    out = run_rot(raw, _design_glasses(raw))
    return (
        out.detail.where(F.col("rot_id") % 10 == 0)
        .select("rot_id", "item_name", F.round("rot_rs", 6).alias("rot_rs"))
        .orderBy("rot_id", "item_name")
    )


@query(
    "q61_wide_tool_table",
    oracle="""
    WITH eav AS (
      SELECT 'TL' || CAST(user_id % 3 AS VARCHAR) AS toolid, user_id, event_type,
             round(sum(value), 4) AS param_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id,
           max(CASE WHEN event_type = 'click'    THEN param_value END) AS click,
           max(CASE WHEN event_type = 'error'    THEN param_value END) AS error,
           max(CASE WHEN event_type = 'purchase' THEN param_value END) AS purchase,
           max(CASE WHEN event_type = 'signup'   THEN param_value END) AS signup,
           max(CASE WHEN event_type = 'view'     THEN param_value END) AS view
    FROM eav WHERE toolid = 'TL0' GROUP BY user_id ORDER BY user_id
    """,
    ref="§1.3,S2,S5,R1,X5",
    tags=("pipeline", "wide-schema"),
)
def q61_wide_tool_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's {toolid}_rawdata shape end-to-end: long EAV core →
    per-tool column discovery → explicit-values pivot → parquet per tool →
    read one tool's wide table back. Column sets are data (§1.3), not DDL."""
    from python_async_sample_spark.sources.wide import (
        materialize_wide_tables,
        read_wide_table,
    )

    events = load_table(spark, sf_dir, "events")
    eav = (
        events.withColumn(
            "toolid", F.concat(F.lit("TL"), (F.col("user_id") % 3).cast("string"))
        )
        .groupBy("toolid", "user_id", "event_type")
        .agg(F.round(F.sum("value"), 4).alias("param_value"))
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_wide_")
    materialize_wide_tables(
        eav, tmp, grain_cols=["user_id"], param_col="event_type"
    )
    return read_wide_table(spark, tmp, "TL0").orderBy("user_id")


@query(
    "q72_mea_pipeline_detail",
    oracle="""
    WITH base AS (
      SELECT l_suppkey AS glass, l_orderkey % 60 AS site_name,
             max(l_discount) * 100 + (l_orderkey % 60)     AS tpx,
             max(l_tax) * 100 + 2 * (l_orderkey % 60)      AS tpy
      FROM lineitem GROUP BY 1, 2
    ),
    labeled AS (
      SELECT *, row_number() OVER (PARTITION BY glass
                                   ORDER BY tpx, tpy, site_name) AS item_id
      FROM base WHERE site_name <= 48
    ),
    diffs AS (
      SELECT glass, item_id,
             tpx - CAST((item_id * 13) % 50 AS DOUBLE) AS x,
             tpy - CAST((item_id * 29) % 50 AS DOUBLE) AS y,
             CAST((item_id * 13) % 50 AS DOUBLE) AS dx,
             CAST((item_id * 29) % 50 AS DOUBLE) AS dy
      FROM labeled
    ),
    agg AS (
      SELECT glass, covar_pop(x, dy) AS cxdy, covar_pop(y, dx) AS cydx,
             var_pop(dx) AS vdx, var_pop(dy) AS vdy,
             avg(x) AS mx, avg(y) AS my, avg(dx) AS mdx, avg(dy) AS mdy
      FROM diffs GROUP BY glass
    ),
    fit AS (
      SELECT glass,
             CASE WHEN vdx + vdy > 0 THEN (cxdy - cydx) / (vdx + vdy)
                  ELSE 0.0 END AS t, mx, my, mdx, mdy
      FROM agg
    ),
    rot AS (
      SELECT d.glass, d.item_id,
             d.x + (f.t * f.mdy - f.mx) - d.dy * f.t AS x_rot,
             d.y + (-f.my - f.t * f.mdx) + d.dx * f.t AS y_rot
      FROM diffs d JOIN fit f USING (glass)
      WHERE d.glass % 10 = 0
    )
    SELECT glass AS rot_id, 'item' || CAST(item_id AS VARCHAR) || '_x' AS item_name,
           round(x_rot, 6) AS rot_rs
    FROM rot
    UNION ALL
    SELECT glass, 'item' || CAST(item_id AS VARCHAR) || '_y', round(y_rot, 6)
    FROM rot
    ORDER BY rot_id, item_name
    """,
    ref="R1,P6,O5,J8,§2.8,§3.2 (tlcd_nikonrot_mea end-to-end)",
    tags=("pipeline", "analytics"),
)
def q72_mea_pipeline_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEA-ROT stage end-to-end: EAV in → pivot (R1) → site ≤ 48 (P6)
    → position labeling (O5) → design join by derived item_id (J8) →
    Diff = measured − design → closed-form fit + affine → melt. The oracle
    replays the whole dataflow in SQL."""
    from python_async_sample_spark.pipelines.mea_pipeline import run_mea_rot

    li = load_table(spark, sf_dir, "lineitem")
    site = (F.col("l_orderkey") % 60).alias("site_name")
    base = li.groupBy(F.col("l_suppkey").alias("glass"), site).agg(
        (F.max("l_discount") * 100 + F.col("site_name")).alias("tpx"),
        (F.max("l_tax") * 100 + 2 * F.col("site_name")).alias("tpy"),
    )
    eav = base.select(
        "glass",
        "site_name",
        F.explode(
            F.array(
                F.struct(F.lit("TP_X").alias("param_name"), F.col("tpx").alias("param_value")),
                F.struct(F.lit("TP_Y").alias("param_name"), F.col("tpy").alias("param_value")),
            )
        ).alias("pv"),
    ).select("glass", "site_name", "pv.param_name", "pv.param_value")
    design = spark.range(1, 61).select(
        F.col("id").alias("item_id"),
        ((F.col("id") * 13) % 50).cast("double").alias("x"),
        ((F.col("id") * 29) % 50).cast("double").alias("y"),
    )
    out = run_mea_rot(eav, design)
    return (
        out.detail.where(F.col("rot_id") % 10 == 0)
        .select("rot_id", "item_name", F.round("rot_rs", 6).alias("rot_rs"))
        .orderBy("rot_id", "item_name")
    )


@query(
    "q230_mea_mismatched_grid_rejects",
    oracle="""
    WITH base AS (
      SELECT l_suppkey AS glass, l_orderkey % 60 AS site_name,
             max(l_discount) * 100 + (l_orderkey % 60)     AS tpx,
             max(l_tax) * 100 + 2 * (l_orderkey % 60)      AS tpy
      FROM lineitem GROUP BY 1, 2
    ),
    kept AS (
      SELECT * FROM base
      WHERE site_name <= 48
        AND NOT (glass % 7 = 3 AND site_name > 20)
    ),
    labeled AS (
      SELECT glass,
             row_number() OVER (PARTITION BY glass
                                ORDER BY tpx, tpy, site_name) AS item_id
      FROM kept
    ),
    design AS (SELECT CAST(range AS BIGINT) AS item_id FROM range(1, 41)),
    glass_design AS (
      SELECT g.glass, d.item_id
      FROM (SELECT DISTINCT glass FROM labeled) g CROSS JOIN design d
    ),
    fj AS (
      SELECT COALESCE(l.glass, gd.glass) AS glass,
             COALESCE(l.item_id, gd.item_id) AS item_id,
             l.item_id AS m_id, gd.item_id AS d_id
      FROM labeled l FULL OUTER JOIN glass_design gd
        ON l.glass = gd.glass AND l.item_id = gd.item_id
    )
    SELECT glass, item_id,
           CAST(CASE WHEN d_id IS NULL THEN -2 ELSE -1 END AS INTEGER) AS flag,
           CASE WHEN d_id IS NULL THEN 'No Design Values'
                ELSE 'Missing Values' END AS descr
    FROM fj
    WHERE m_id IS NULL OR d_id IS NULL
    ORDER BY glass, item_id
    """,
    ref="J8,S10,P9 (R/tlcd_nikonrot_mea.R:131,160,243; R/pg_db.R:128-139)",
    tags=("pipeline", "analytics", "side-output"),
)
def q230_mea_mismatched_grid_rejects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MEA design join under MISMATCHED grids — J8 in anger. Planted
    mismatches: glasses with glass%7==3 lose all sites above 20 (so design
    item_ids beyond their grid go unmeasured → flag -1 'Missing Values',
    the reference's R/tlcd_nikonrot_mea.R:160 error record), while the
    design table stops at item_id 40 (so full-grid glasses derive item_ids
    41..49 with no design row → flag -2 'No Design Values', :131). Both
    sides of the FULL OUTER join flow to the S10 side-output with the
    reference's flag codes; the oracle replays the labeling, the per-glass
    design expansion, and the full-outer mismatch routing in SQL."""
    from python_async_sample_spark.pipelines.mea_pipeline import run_mea_rot

    li = load_table(spark, sf_dir, "lineitem")
    site = (F.col("l_orderkey") % 60).alias("site_name")
    base = li.groupBy(F.col("l_suppkey").alias("glass"), site).agg(
        (F.max("l_discount") * 100 + F.col("site_name")).alias("tpx"),
        (F.max("l_tax") * 100 + 2 * F.col("site_name")).alias("tpy"),
    )
    planted = base.where(
        ~((F.col("glass") % 7 == 3) & (F.col("site_name") > 20))
    )
    eav = planted.select(
        "glass",
        "site_name",
        F.explode(
            F.array(
                F.struct(F.lit("TP_X").alias("param_name"), F.col("tpx").alias("param_value")),
                F.struct(F.lit("TP_Y").alias("param_name"), F.col("tpy").alias("param_value")),
            )
        ).alias("pv"),
    ).select("glass", "site_name", "pv.param_name", "pv.param_value")
    design = spark.range(1, 41).select(
        F.col("id").alias("item_id"),
        ((F.col("id") * 13) % 50).cast("double").alias("x"),
        ((F.col("id") * 29) % 50).cast("double").alias("y"),
    )
    out = run_mea_rot(eav, design)
    return out.rejects.orderBy("glass", "item_id")


@query(
    "q29_summary_mv_recompute",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    ref="S13,A1-A5",
    tags=("pipeline", "incremental"),
)
def q29_summary_mv_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance (REFRESH MATERIALIZED VIEW,
    dbs/nikon.py:188-197): Spark has no incremental MV, so the summary is
    recomputed and overwritten, then served from the stored copy."""
    events = load_table(spark, sf_dir, "events")
    summary = (
        events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_mv_")
    mv_path = f"{tmp}/process_summary_mv"
    summary.write.mode("overwrite").parquet(mv_path)
    return spark.read.parquet(mv_path).orderBy("dt", "event_type")


# JSONL mirror of the documents table, manufactured ONCE per sf_dir outside
# the timed query body (same policy as the q26 key CSV): the gate/bench
# measure the JSON scan + aggregation, not fixture I/O.
_JSONL_DIRS: dict[str, str] = {}


def _documents_jsonl_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _JSONL_DIRS:
        tmp = tempfile.mkdtemp(prefix="spark_graft_jsonl_")
        path = f"{tmp}/documents_jsonl"
        load_table(spark, sf_dir, "documents").write.mode("overwrite").json(path)
        _JSONL_DIRS[sf_dir] = path
    return _JSONL_DIRS[sf_dir]


@query(
    "q84_jsonl_source",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    ref="S6-adjacent: JSON-lines corpus source (beyond reference)",
    tags=("llm-data", "source"),
)
def q84_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats computed from a JSON-lines mirror of the
    documents table — explicit schema (no inference pass over the input)
    and PERMISSIVE corrupt-record routing, checked against the parquet
    oracle: format must not change the answer."""
    docs_schema = load_table(spark, sf_dir, "documents").schema
    docs = read_jsonl(spark, _documents_jsonl_dir(spark, sf_dir), schema=docs_schema)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
        .orderBy("lang")
    )


# ORC mirror of the documents table, manufactured once per sf_dir (same
# fixture policy as the JSONL and key-CSV mirrors).
_ORC_DIRS: dict[str, str] = {}


def _documents_orc_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _ORC_DIRS:
        tmp = tempfile.mkdtemp(prefix="spark_graft_orc_")
        path = f"{tmp}/documents_orc"
        load_table(spark, sf_dir, "documents").write.mode("overwrite").orc(path)
        _ORC_DIRS[sf_dir] = path
    return _ORC_DIRS[sf_dir]


@query(
    "q90_orc_source",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
    ref="columnar-format parity: ORC source (beyond reference)",
    tags=("llm-data", "source"),
)
def q90_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-language stats computed from an ORC mirror of the
    documents table — Spark's second native columnar format, with the same
    pushdown/pruning machinery as parquet; format must not change the
    answer (oracle reads the parquet)."""
    docs = spark.read.orc(_documents_orc_dir(spark, sf_dir))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


_EXPECT_ORACLE = """
    WITH corrupted AS MATERIALIZED (
      SELECT
        o_orderkey,
        CASE WHEN o_orderkey % 501 = 0 THEN NULL
             WHEN o_orderkey % 521 = 0 THEN o_custkey + 10000000
             ELSE o_custkey END AS o_custkey,
        CASE WHEN o_orderkey % 501 <> 0 AND o_orderkey % 521 <> 0
              AND o_orderkey % 503 = 0 THEN -1.0
             ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice,
        CASE WHEN o_orderkey % 501 <> 0 AND o_orderkey % 521 <> 0
              AND o_orderkey % 503 <> 0 AND o_orderkey % 509 = 0 THEN 'Z'
             ELSE o_orderstatus END AS o_orderstatus
      FROM orders
    ),
    t AS MATERIALIZED (
      SELECT * FROM corrupted
      UNION ALL SELECT * FROM corrupted WHERE o_orderkey % 499 = 0
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM t),
    preds AS (
      SELECT 'not_null(o_custkey)' AS rule, 'not_null' AS kind,
             (SELECT n_rows FROM n) AS n_checked,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
      FROM t
      UNION ALL
      SELECT 'in_range(o_totalprice)', 'in_range', (SELECT n_rows FROM n),
             CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND o_totalprice NOT BETWEEN 0 AND 1000000
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM t
      UNION ALL
      SELECT 'accepted_values(o_orderstatus)', 'accepted_values',
             (SELECT n_rows FROM n),
             CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM t
      UNION ALL
      SELECT 'in_range(o_orderkey)', 'in_range', (SELECT n_rows FROM n),
             CAST(sum(CASE WHEN o_orderkey IS NOT NULL
                            AND o_orderkey NOT BETWEEN 0 AND 100000000
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM t
    ),
    uniq AS (
      SELECT 'unique(o_orderkey)' AS rule, 'unique' AS kind,
             CAST(coalesce(sum(c), 0) AS BIGINT) AS n_checked,
             CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0) AS BIGINT)
               AS n_violations
      FROM (SELECT count(*) AS c FROM t GROUP BY o_orderkey)
    ),
    fk AS (
      SELECT 'foreign_key(o_custkey)' AS rule, 'foreign_key' AS kind,
             (SELECT CAST(count(*) AS BIGINT) FROM t WHERE o_custkey IS NOT NULL)
               AS n_checked,
             (SELECT CAST(count(*) AS BIGINT) FROM t
              WHERE o_custkey IS NOT NULL
                AND o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS n_violations
    )
    SELECT rule, kind, n_checked, n_violations, (n_violations = 0) AS passed
    FROM (SELECT * FROM preds UNION ALL SELECT * FROM uniq UNION ALL SELECT * FROM fk)
    ORDER BY rule
"""


@query(
    "q204_data_expectations",
    oracle=_EXPECT_ORACLE,
    ref=(
        "declarative table-level data-quality expectations (beyond "
        "reference; the Deequ/dbt-test staple — operators/expectations.py "
        "generalizes the reference's hard-coded -1..-4 row flags "
        "(nikon_ETL.py) to a declared rule set with one report row per "
        "rule and a must-pass publish gate)"
    ),
    tags=("pipeline", "quality", "scale"),
)
def q204_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five constraint kinds over a deliberately corrupted orders batch —
    NULL keys, FK orphans, out-of-range prices, unaccepted statuses,
    duplicated keys, each planted on its own modular slice so the oracle
    recomputes every violation count exactly.  All predicate rules share
    ONE aggregate scan (conditional sums, map-side combinable); unique
    adds one groupBy, the FK one anti-join against the broadcastable
    customer keys.  The must-pass gate rides in-plan on a rule the batch
    satisfies — the publish-blocking shape, exercised on its clean path
    (the firing path is pinned in tests/test_expectations.py)."""
    from python_async_sample_spark.operators import expectations as E

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    k = F.col("o_orderkey")
    corrupted = orders.select(
        "o_orderkey",
        F.when(k % 501 == 0, F.lit(None).cast("long"))
        .when(k % 521 == 0, F.col("o_custkey") + 10_000_000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(
            (k % 501 != 0) & (k % 521 != 0) & (k % 503 == 0), F.lit(-1.0)
        )
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("o_totalprice"),
        F.when(
            (k % 501 != 0) & (k % 521 != 0) & (k % 503 != 0) & (k % 509 == 0),
            F.lit("Z"),
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    batch = corrupted.unionByName(
        corrupted.where(k % 499 == 0)
    ).localCheckpoint(eager=False)
    rules = [
        E.not_null("o_custkey"),
        E.in_range("o_totalprice", 0, 1_000_000),
        E.accepted_values("o_orderstatus", ["O", "F", "P"]),
        E.in_range("o_orderkey", 0, 100_000_000),  # the must-pass rule
        E.unique(["o_orderkey"]),
        E.foreign_key("o_custkey", customer, "c_custkey"),
    ]
    report = E.run_expectations(batch, rules)
    return E.fail_on(report, ["in_range(o_orderkey)"]).orderBy("rule")
