"""Sketch-aggregate error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.sketches import approx_distinct, approx_quantiles
from python_async_sample_spark.sources.readers import load_table


def test_hll_relative_error(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_distinct
        for r in approx_distinct(events, ["event_type"], "user_id").collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)


def test_quantile_sketch_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = approx_quantiles(li, ["l_returnflag"], "l_extendedprice", [0.5]).collect()
    for r in got:
        flag, est = r.l_returnflag, r.quantiles[0]
        vals = (
            li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .orderBy("l_extendedprice")
            .collect()
        )
        xs = [v[0] for v in vals]
        rank = sum(1 for x in xs if x <= est) / len(xs)
        assert 0.45 <= rank <= 0.55, (flag, est, rank)
