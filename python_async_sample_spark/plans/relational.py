"""Relational operator inventory (SURVEY.md §2.1–§2.7) as Spark queries.

Every query here maps one or more reference operators (cited by inventory id,
e.g. J3 = semi-join via IN-subquery, ``dbs/nikon.py:86-89``) onto the driver
testdata star schema, with a DuckDB oracle for the correctness gate.

Scale notes are attached per query: which joins broadcast, where the single
shuffle lands, what pushes down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — flagship: scan + pushdown filter + grouped aggregation (TPC-H Q1 shape)
# Reference ops: S1 (interval scan dbs/nikon.py:107-115), P3 (time predicate),
# A5 (grouped agg), O1 (order by). One shuffle (groupBy), filter pushed to scan.
# At 100 TB: partial aggregation map-side, 6 groups → final agg is tiny.
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity      AS DECIMAL(18,2)) AS q,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_discount      AS DECIMAL(4,2))  AS d,
             CAST(l_tax           AS DECIMAL(4,2))  AS x
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(q), 2) AS DOUBLE)                     AS sum_qty,
           CAST(round(sum(p), 2) AS DOUBLE)                     AS sum_base_price,
           CAST(round(sum(p * (1 - d)), 2) AS DOUBLE)           AS sum_disc_price,
           CAST(round(sum(p * (1 - d) * (1 + x)), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(q) AS DOUBLE) / count(*), 4)          AS avg_qty,
           round(CAST(sum(p) AS DOUBLE) / count(*), 4)          AS avg_price,
           round(CAST(sum(d) AS DOUBLE) / count(*), 6)          AS avg_disc,
           count(*)                                             AS count_order
    FROM t
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    ref="S1,P3,A5,O1",
    tags=("relational", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money aggregates run in DECIMAL: a double sum's value depends on
    # partition/add order, and at sf0.1 two groups sit ~1e-5 from a cent
    # rounding boundary — decimal sums are exact and order-independent, so
    # the gate can never flake on summation order. Averages divide the exact
    # sum as a final double op (deterministic given identical inputs).
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(4,2)")
    x = F.col("l_tax").cast("decimal(4,2)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(q), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(p), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(p * (F.lit(1) - d)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(p * (F.lit(1) - d) * (F.lit(1) + x)), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(q).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(p).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(d).cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q02 — LIKE with `_` wildcards + IN literal list (P4 dbs/nikon.py:83,99;
# P5 dbs/nikon.py:269-272). Pure scan query: both predicates push to parquet.
# --------------------------------------------------------------------------
@query(
    "q02_like_in_filter",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size
    FROM part
    WHERE p_brand LIKE 'Brand#1_' AND p_size IN (5, 10, 15)
    ORDER BY p_partkey
    """,
    ref="P2,P4,P5",
    tags=("relational",),
)
def q02_like_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand").like("Brand#1_") & F.col("p_size").isin(5, 10, 15))
        .select("p_partkey", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# q03 — 2-hop equi-join + agg + top-K (J1 3-key join analog dbs/nikon.py:256-283;
# O7 LIMIT). customer is broadcast (small dim); one shuffle for orders⋈lineitem
# on orderkey, one for the groupBy. Deterministic top-K via tiebreak key.
# --------------------------------------------------------------------------
@query(
    "q03_top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    ref="J1,A5,O7",
    tags=("relational", "join"),
)
def q03_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — 6-table star join, revenue per nation (J1/J2 dim joins R/pg_db.R:142-163).
# region/nation/customer/supplier broadcast; lineitem⋈orders is the only big
# shuffle. This is the query shape to check with .explain at scale.
# --------------------------------------------------------------------------
@query(
    "q04_region_nation_revenue",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    ref="J1,J2,A5",
    tags=("relational", "join"),
)
def q04_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (dims.c_nationkey == supp.s_nationkey))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# q05 — left-semi join: IN (subquery) rewrite (J3 dbs/nikon.py:86-89,
# J5 dbs/auto.py:160-185 — the reference repo's namesake "subquery" experiment).
# Catalyst rewrites to a broadcast semi-join; no manual fan-out needed.
# --------------------------------------------------------------------------
@query(
    "q05_semi_join_urgent_buyers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    ref="J3,J5",
    tags=("relational", "join"),
)
def q05_semi_join_urgent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q06 — left-anti join: rejects pattern (J9 R/tlcd_nikonrot.R:50,162 —
# products without design values). Here: customers with no URGENT orders.
# The build side is filtered (priority = 1-URGENT) before the anti join so
# the matched set is non-empty at every test scale factor — the synthetic
# data gives every customer at least one order, and a green row that
# matches on 0 = 0 rows would not catch a bug that empties the query
# (VERDICT r5 "what's wrong" #3).
# --------------------------------------------------------------------------
@query(
    "q06_anti_join_orderless_customers",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    ref="J9,P8",
    tags=("relational", "join"),
)
def q06_anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q07 — full outer join of two aggregates (J8 R/tlcd_nikonrot_mea.R:245)
# with null-fill (§2.7 null handling / P9 analog via coalesce).
# --------------------------------------------------------------------------
@query(
    "q07_full_outer_nation_counts",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
    USING (nationkey)
    ORDER BY nationkey
    """,
    ref="J8,P9",
    tags=("relational", "join"),
)
def q07_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# q08 — cross join + row_number: the coordinate-grid reconstruction pattern
# (J10 R/basic_fun.R:55-57 expand.grid; O5 item_id numbering :95-101).
# --------------------------------------------------------------------------
@query(
    "q08_cross_join_grid",
    oracle="""
    SELECT r_name, o_orderstatus,
           CAST(row_number() OVER (ORDER BY r_name, o_orderstatus) AS BIGINT) AS item_id
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ORDER BY item_id
    """,
    ref="J10,O5,A3",
    tags=("relational", "join"),
)
def q08_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").select("r_name")
    status = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    w = W.orderBy("r_name", "o_orderstatus")
    return (
        region.crossJoin(status)
        .withColumn("item_id", F.row_number().over(w).cast("bigint"))
        .orderBy("item_id")
    )


# --------------------------------------------------------------------------
# q09 — DISTINCT projection (A3: toolids dbs/nikon.py:81, products R/pg_db.R:53-55).
# --------------------------------------------------------------------------
@query(
    "q09_distinct_flags",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
    """,
    ref="A3",
    tags=("relational",),
)
def q09_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q10 — watermark probe: global MAX of the event-time column, formatted
# (A1 dbs/nikon.py:204-217 `to_date(to_char(max(endtime)))` round-trip).
# --------------------------------------------------------------------------
@query(
    "q10_watermark_probe",
    oracle="""
    SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
           count(*) AS n_events
    FROM events
    """,
    ref="A1,A2,O6",
    tags=("relational", "incremental"),
)
def q10_watermark_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q11 — half-open interval extract `(s, e]` — THE incremental change-capture
# filter (P3/I2 dbs/nikon.py:227-229; boundary semantics preserved).
# --------------------------------------------------------------------------
@query(
    "q11_interval_extract",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE date_trunc('microseconds', ts) > TIMESTAMP '2024-01-10 00:00:00'
      AND date_trunc('microseconds', ts) <= TIMESTAMP '2024-01-12 00:00:00'
    ORDER BY event_id
    """,
    ref="S3,P3,I2",
    tags=("relational", "incremental"),
)
def q11_interval_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .where(
            (F.col("ts") > F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") <= F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# q12 — first-row-per-group (A6 eda_query.py:210-212 setdefault-first;
# O5 row_number). Latest order per customer with deterministic tiebreak.
# --------------------------------------------------------------------------
@query(
    "q12_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    ref="A6,O5",
    tags=("relational", "window"),
)
def q12_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# q13 — pivot long→wide (R1 R/tlcd_nikonrot_mea.R:105-106 dcast): EAV-style
# events pivoted to one column per event_type. Explicit value list keeps the
# plan single-pass (no distinct-scan) — the right call at 100 TB too.
# --------------------------------------------------------------------------
@query(
    "q13_pivot_events_wide",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    ref="R1,R2",
    tags=("relational", "reshape"),
)
def q13_pivot_events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    df = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 2))
    )
    return df.orderBy("user_id")


# --------------------------------------------------------------------------
# q14 — unpivot wide→long (R3 melt R/tlcd_nikonrot.R:244-248): part attrs to
# (attr, val) rows. Spark `unpivot` ≡ stack(); values cast to a common type.
# --------------------------------------------------------------------------
@query(
    "q14_unpivot_part",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    ORDER BY p_partkey, attr
    """,
    ref="R3,R4",
    tags=("relational", "reshape"),
)
def q14_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    ).orderBy("p_partkey", "attr")


# --------------------------------------------------------------------------
# q15 — scalar function surface (§2.7: upper/substring/concat nikon_ETL.py:211,
# R/tlcd_nikonrot_mea.R:100; date parts dbs/nikon.py:210; tan R/basic_fun.R:29;
# casts R/tlcd_nikonrot.R:131).
# --------------------------------------------------------------------------
@query(
    "q15_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(substring(o_orderpriority, 3, 6))        AS prio,
           concat('ORD_', CAST(o_orderkey AS VARCHAR))    AS tag,
           CAST(year(o_orderdate) AS INT)                 AS oyear,
           CAST(month(o_orderdate) AS INT)                AS omonth,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 0.1, 2) AS DOUBLE) AS tithe,
           round(tan(o_totalprice / 1000000.0), 6)        AS trig,
           CAST(floor(o_totalprice) AS BIGINT)            AS price_int
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    ref="§2.7",
    tags=("relational", "scalar"),
)
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.upper(F.substring("o_orderpriority", 3, 6)).alias("prio"),
            F.concat(F.lit("ORD_"), F.col("o_orderkey").cast("string")).alias("tag"),
            F.year("o_orderdate").cast("int").alias("oyear"),
            F.month("o_orderdate").cast("int").alias("omonth"),
            # decimal arithmetic: price*0.1 lands on exact .xx5 boundaries
            # where double round diverges between engines (Spark rounds the
            # shortest decimal repr, DuckDB the exact binary value)
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit(0.1).cast("decimal(2,1)"),
                2,
            )
            .cast("double")
            .alias("tithe"),
            F.round(F.tan(F.col("o_totalprice") / 1000000.0), 6).alias("trig"),
            # explicit floor: double→bigint CAST truncates in Spark but
            # rounds in DuckDB, so the cast alone is not portable
            F.floor("o_totalprice").cast("bigint").alias("price_int"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# q16 — grouped count-distinct + HAVING-style threshold (A5 R/tlcd_nikonrot.R
# per-product glass counts; P6 numeric threshold R/tlcd_nikonrot_mea.R:102).
# --------------------------------------------------------------------------
@query(
    "q16_nation_buyer_stats",
    oracle="""
    SELECT c_nationkey,
           count(DISTINCT o_custkey)      AS n_buyers,
           count(*)                       AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    HAVING count(*) > 100
    ORDER BY c_nationkey
    """,
    ref="A5,P6",
    tags=("relational",),
)
def q16_nation_buyer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_spend"),
        )
        .where(F.col("n_orders") > 100)
        .orderBy("c_nationkey")
    )
