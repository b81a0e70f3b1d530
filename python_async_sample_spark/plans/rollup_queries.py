"""Rollup-maintenance and feature-engineering gate queries (beyond reference).

q107 exercises the mergeable-partial-aggregate path end-to-end: day-grain
partials merged to month grain, oracled against the direct month aggregate
from raw — the incremental form of the reference's full MV recompute
(``dbs/nikon.py:188-197``, q29's batch analog).

q109/q110 are the two feature-engineering staples every training pipeline
runs over tabular signals: exact-rank decile binning and per-group z-score
normalization — both pure window/aggregate plans, both exactly
SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from python_async_sample_spark.operators.partial_agg import build_partials, merge_partials
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table

_PARTIAL_MERGE_ORACLE = """
    SELECT l_returnflag,
           strftime(l_shipdate, '%Y-%m') AS month,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(sum(l_quantity) / count(*), 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, strftime(l_shipdate, '%Y-%m')
    ORDER BY l_returnflag, month
"""

_SPECS = [
    ("l_quantity", "sum", "sum_qty"),
    ("l_quantity", "count", "n_rows"),
    ("l_extendedprice", "min", "min_price"),
    ("l_extendedprice", "max", "max_price"),
]


@query(
    "q107_partial_agg_merge",
    oracle=_PARTIAL_MERGE_ORACLE,
    ref="mergeable rollup maintenance (beyond reference; incremental form of S13 dbs/nikon.py:188-197)",
    tags=("rollup", "incremental"),
)
def q107_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain partials merged to month grain. The month result is
    computed WITHOUT touching raw again — the merge's input is the partial
    relation only — and must equal the direct month aggregate (the oracle).
    At 100 TB the partial table is what the watermark pipeline appends to;
    every coarser rollup (month/quarter/year) is a merge over it."""
    li = load_table(spark, sf_dir, "lineitem")
    day = F.date_trunc("day", F.col("l_shipdate")).alias("day")
    partials = build_partials(li, [F.col("l_returnflag"), day], _SPECS)
    month = F.date_format(F.col("day"), "yyyy-MM").alias("month")
    merged = merge_partials(partials, [F.col("l_returnflag"), month], _SPECS)
    return (
        merged.select(
            "l_returnflag",
            "month",
            F.round("sum_qty", 2).alias("sum_qty"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round("min_price", 2).alias("min_price"),
            F.round("max_price", 2).alias("max_price"),
            F.round(F.col("sum_qty") / F.col("n_rows"), 4).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "month")
    )


_ZORDER_ORACLE = """
    WITH q AS (
      -- explicit floor: CAST(double AS INT) truncates in Spark but rounds
      -- in DuckDB
      SELECT event_id, user_id AS x, CAST(floor(value) AS INT) AS y FROM events
    ),
    sx AS (
      -- BIGINT throughout: INTEGER << overflows (DuckDB raises, Spark
      -- wraps negative) once spread bits reach position 30
      SELECT event_id, x, y,
             (CAST(x AS BIGINT) & 65535) AS a0,
             (CAST(y AS BIGINT) & 65535) AS b0
      FROM q
    ),
    sp AS (
      SELECT event_id, x, y,
             (((a0 | (a0 << 8)) & 16711935)) AS a1,
             (((b0 | (b0 << 8)) & 16711935)) AS b1
      FROM sx
    ),
    sp2 AS (
      SELECT event_id, x, y,
             (((a1 | (a1 << 4)) & 252645135)) AS a2,
             (((b1 | (b1 << 4)) & 252645135)) AS b2
      FROM sp
    ),
    sp3 AS (
      SELECT event_id, x, y,
             (((a2 | (a2 << 2)) & 858993459)) AS a3,
             (((b2 | (b2 << 2)) & 858993459)) AS b3
      FROM sp2
    ),
    sp4 AS (
      SELECT event_id, x, y,
             (((a3 | (a3 << 1)) & 1431655765)) AS a4,
             (((b3 | (b3 << 1)) & 1431655765)) AS b4
      FROM sp3
    )
    SELECT event_id, x, y, CAST(a4 | (b4 << 1) AS BIGINT) AS z
    FROM sp4
    ORDER BY z, event_id
    LIMIT 50
"""


@query(
    "q108_zorder_curve",
    oracle=_ZORDER_ORACLE,
    ref="multi-dim z-order clustering key (beyond reference; sources/layout.py zorder_by)",
    tags=("layout",),
)
def q108_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton (Z-curve) clustering key zorder_by sorts files with,
    surfaced as a query so the bit-interleave arithmetic is pinned
    cross-engine: first 50 events along the curve of (user_id, int(value)).
    The curve is what turns two-column box predicates into file-level
    min/max pruning (test_layout proves the pruning; this pins the key)."""
    from python_async_sample_spark.sources.layout import morton2

    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            F.col("user_id").alias("x"),
            F.floor("value").cast("int").alias("y"),
        )
        .withColumn("z", morton2(F.col("x"), F.col("y")))
        .orderBy("z", "event_id")
        .limit(50)
    )


_DECILE_ORACLE = """
    WITH binned AS (
      SELECT o_orderpriority,
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile,
             o_totalprice
      FROM orders
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM binned GROUP BY decile ORDER BY decile
"""


@query(
    "q109_decile_binning",
    oracle=_DECILE_ORACLE,
    ref="feature binning (beyond reference)",
    tags=("feature", "window"),
)
def q109_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rank decile binning of order totals (ntile with a
    deterministic orderkey tiebreak), summarized per bin. The global-order
    window is the EXACT form; at 100 TB the same feature ships via the
    approx-quantile sketch (q91) with this as its small-scale oracle."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    binned = orders.select(
        F.ntile(10).over(w).cast("bigint").alias("decile"),
        "o_totalprice",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


_ZSCORE_ORACLE = """
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sd, 6) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sd > 0 AND e.event_id % 37 = 0
    ORDER BY e.event_id
"""


@query(
    "q110_groupwise_zscore",
    oracle=_ZSCORE_ORACLE,
    ref="per-group normalization (beyond reference; cf. scale() R/basic_fun.R:83)",
    tags=("feature",),
)
def q110_groupwise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score normalization (the reference z-scores
    x-coordinates driver-side at R/basic_fun.R:83; here it is one grouped
    aggregate broadcast back onto the stream — two scans, no window sort,
    the 100 TB-friendly shape). Output filtered to a deterministic sample
    to keep the gate row count bounded."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .where((F.col("sd") > 0) & (F.col("event_id") % 37 == 0))
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        )
        .orderBy("event_id")
    )


_ATTRIBUTION_ORACLE = """
    WITH touches AS (
      SELECT user_id, event_id, epoch_us(date_trunc('microseconds', ts)) AS tus
      FROM events WHERE event_type IN ('click', 'view')
    ),
    conv AS (
      SELECT user_id, event_id AS conv_id,
             epoch_us(date_trunc('microseconds', ts)) AS ctus
      FROM events WHERE event_type = 'purchase'
    ),
    joined AS (
      SELECT c.user_id, c.conv_id, t.event_id AS touch_id, t.tus
      FROM conv c JOIN touches t
        ON c.user_id = t.user_id AND t.tus <= c.ctus
    )
    SELECT user_id, conv_id,
           CAST(min_by(touch_id, tus) AS BIGINT) AS first_touch,
           CAST(max_by(touch_id, tus) AS BIGINT) AS last_touch,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM joined GROUP BY user_id, conv_id ORDER BY user_id, conv_id
"""


@query(
    "q113_touch_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    ref="first/last-touch attribution (beyond reference; asof-family analytics)",
    tags=("feature", "analytics"),
)
def q113_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch attribution: every purchase is credited
    to the earliest and latest click/view at-or-before it for the same
    user.  ONE pass over the per-user event stream: running first/last/
    count of touches via an unbounded-preceding window, then keep the
    purchase rows — no conversion×touch join at all, so a heavy user
    (10^4 touches × 10^2 purchases) costs 10^4 window rows instead of a
    10^6-row join explosion.  Deterministic because (user, ts) is unique
    among touches in this corpus (checked at all scales; a corpus with
    ties would add an id tiebreak); touches sort before purchases at
    equal timestamps so the at-or-before predicate stays inclusive.  One
    shuffle (partitionBy user), per-partition sort, no global sort until
    the gate orderBy."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    tus = F.unix_micros(F.col("ts"))
    stream = events.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "event_id",
        tus.alias("tus"),
        (F.col("event_type") == "purchase").cast("int").alias("is_conv"),
        F.when(F.col("event_type") != "purchase", F.col("event_id")).alias("touch_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", "is_conv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        stream.select(
            "user_id",
            "is_conv",
            F.col("event_id").alias("conv_id"),
            F.first("touch_id", ignorenulls=True).over(w).cast("bigint").alias("first_touch"),
            F.last("touch_id", ignorenulls=True).over(w).cast("bigint").alias("last_touch"),
            F.count("touch_id").over(w).alias("n_touches"),
        )
        .where((F.col("is_conv") == 1) & (F.col("n_touches") > 0))
        .select("user_id", "conv_id", "first_touch", "last_touch", "n_touches")
        .orderBy("user_id", "conv_id")
    )


@query(
    "q191_k_anonymity_ladder",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT CAST(c_mktsegment AS VARCHAR) AS segment,
             CAST(c_nationkey AS VARCHAR) AS nation,
             CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR) AS bal_band
      FROM customer
    ),
    lvl0 AS MATERIALIZED (
      SELECT segment, nation, bal_band, CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2, 3
    ),
    keep0 AS (
      SELECT segment, nation, bal_band, CAST(0 AS INT) AS level, n
      FROM lvl0 WHERE n >= 5
    ),
    lvl1 AS MATERIALIZED (
      SELECT segment, nation, CAST(sum(n) AS BIGINT) AS n
      FROM lvl0 WHERE n < 5 GROUP BY 1, 2
    ),
    keep1 AS (
      SELECT segment, nation, 'ANY' AS bal_band, CAST(1 AS INT) AS level, n
      FROM lvl1 WHERE n >= 5
    ),
    supp AS (
      SELECT 'SUPPRESSED' AS segment, 'SUPPRESSED' AS nation,
             'SUPPRESSED' AS bal_band, CAST(2 AS INT) AS level,
             CAST(sum(n) AS BIGINT) AS n
      FROM lvl1 WHERE n < 5 HAVING sum(n) > 0
    )
    SELECT * FROM keep0 UNION ALL SELECT * FROM keep1 UNION ALL
    SELECT * FROM supp
    ORDER BY level, segment, nation, bal_band
    """,
    ref=(
        "training-data release governance (beyond reference): k-anonymity "
        "audit with two-level local recoding (operators/anonymize.py); the "
        "reference's error-row side-output discipline (nikon_ETL.py) is the "
        "same divert-and-account contract suppression follows"
    ),
    tags=("llm-data", "governance"),
)
def q191_k_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 anonymity over (segment, nation, acctbal-band): full-granularity
    combos that reach k keep level 0, failures coarsen the balance band to
    ANY and re-test at level 1, the remainder collapses into one
    SUPPRESSED row — the suppressed count is part of the output, so rows
    are diverted and accounted, never silently dropped.  Two groupBy
    passes, the second over only the level-0 failures."""
    from python_async_sample_spark.operators.anonymize import k_anonymize_ladder

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    return k_anonymize_ladder(
        cust, ["segment", "nation"], "bal_band", k=5
    ).orderBy("level", "segment", "nation", "bal_band")


@query(
    "q192_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(date_trunc('microseconds', ts)) AS s,
             epoch_us(date_trunc('microseconds', ts)) + 300000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, min(s) AS island_s, max(e) AS island_e
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(island_e - island_s) AS BIGINT) AS covered_us,
           CAST(max(island_e - island_s) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    ORDER BY user_id
    """,
    ref=(
        "interval union / coverage (beyond reference): the gaps-and-islands "
        "running-max coalesce every temporal warehouse needs; q19/q60's "
        "sessionization is the gap<threshold special case of the same "
        "window shape"
    ),
    tags=("window", "temporal"),
)
def q192_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event opens a 5-minute activity interval; per user the
    overlapping intervals coalesce into maximal islands (running-max-end
    window, island id = prefix sum of gap flags), reported as island
    count, total covered microseconds, longest island.  All arithmetic in
    integer microseconds on both engines — no seconds-truncation or float
    drift.  One user-partitioned sort, no self-join, no explosion."""
    events = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts"))
    iv = events.select("user_id", "event_id", s.alias("s"), (s + 300_000_000).alias("e"))
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id", "event_id", "s", "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0).alias("new_island"),
    )
    # same (s, event_id) order key as the flag window: peers under a
    # tie-ambiguous ORDER BY would let the two engines assign tied rows to
    # different islands
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_s"), F.max("e").alias("island_e")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("island_e") - F.col("island_s")).cast("bigint").alias("covered_us"),
            F.max(F.col("island_e") - F.col("island_s")).cast("bigint").alias("longest_us"),
        )
        .orderBy("user_id")
    )
