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
