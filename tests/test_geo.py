"""Grid-blocked near-join completeness on hand-built points."""

from __future__ import annotations

from python_async_sample_spark.operators.geo import near_join


def _pts(spark, rows, idc):
    return spark.createDataFrame(rows, f"{idc} long, lat double, lon double")


def test_adjacent_cell_pairs_are_found(spark):
    # point at cell edge, site just across the boundary: different cells,
    # within radius -> the 3x3 explode must find it
    points = _pts(spark, [(1, 4.9, 0.0)], "pid")   # cell (0,0) at r=5
    sites = _pts(spark, [(10, 5.1, 0.0)], "sid")   # cell (1,0)
    out = near_join(points, sites, "pid", "sid", radius=5.0).collect()
    assert len(out) == 1 and out[0]["sid"] == 10
    assert abs(out[0]["dist2"] - 0.04) < 1e-9


def test_outside_radius_excluded_even_in_neighbor_cell(spark):
    points = _pts(spark, [(1, 0.0, 0.0)], "pid")
    sites = _pts(spark, [(10, 4.0, 4.0)], "sid")  # dist2 = 32 > 25
    assert near_join(points, sites, "pid", "sid", radius=5.0).count() == 0


def test_nearest_wins_and_ties_break_on_site_id(spark):
    points = _pts(spark, [(1, 0.0, 0.0)], "pid")
    sites = _pts(
        spark,
        [(20, 1.0, 0.0), (10, 0.0, 1.0), (30, 3.0, 0.0)],  # two at dist2=1
        "sid",
    )
    out = near_join(points, sites, "pid", "sid", radius=5.0).collect()
    assert len(out) == 1
    assert out[0]["sid"] == 10  # tie on dist2 -> lowest site id


def test_negative_coordinates_block_correctly(spark):
    # floor-based cells must stay consistent for negative coords
    points = _pts(spark, [(1, -0.1, -0.1)], "pid")
    sites = _pts(spark, [(10, 0.1, 0.1)], "sid")
    out = near_join(points, sites, "pid", "sid", radius=5.0).collect()
    assert len(out) == 1 and out[0]["sid"] == 10
