"""Grid-blocked spatial near-join.

Beyond the reference's inventory: "find every point within radius r of a
site, and the nearest one" is the spatial sibling of the ANN problem, and
the naive plan is the same all-pairs cross join. The scale-safe plan is
geohash-style grid blocking:

* bucket both sides into square cells of side >= r (``floor(coord / r)``);
* any within-r pair lies in the same or an adjacent cell, so exploding the
  SMALL side (sites) to its 3x3 cell neighborhood and hash-joining on the
  cell id generates a complete candidate set — candidates per point are
  bounded by local density, never by table size;
* verify with the exact distance predicate, then keep the nearest site per
  point with one partitioned window.

Distance here is squared Euclidean in coordinate space (exact and
bit-identical across engines, so the brute-force oracle proves the blocking
lost nothing); swap in haversine for real geodesics — the blocking argument
is unchanged because a degree cell bounds great-circle distance from above
at fixed latitude bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _cell(coord: F.Column, size: float) -> F.Column:
    return F.floor(coord / size).cast("bigint")


def near_join(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    radius: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Each point matched to its nearest site with dist2 <= radius².

    ``sites`` is the small side (exploded 9x and broadcast); points are
    never replicated. Returns (point_id, site_id, dist2)."""
    p = points.select(
        F.col(point_id),
        F.col(lat_col).alias("__plat"),
        F.col(lon_col).alias("__plon"),
        _cell(F.col(lat_col), radius).alias("__cla"),
        _cell(F.col(lon_col), radius).alias("__clo"),
    )
    # explode the site side to its 3x3 neighborhood: any within-radius pair
    # shares one of these cells (cell side == radius)
    offs = ", ".join(
        f"struct({dla}L as dla, {dlo}L as dlo)" for dla in (-1, 0, 1) for dlo in (-1, 0, 1)
    )
    s = (
        sites.select(
            F.col(site_id),
            F.col(lat_col).alias("__slat"),
            F.col(lon_col).alias("__slon"),
            _cell(F.col(lat_col), radius).alias("__sla"),
            _cell(F.col(lon_col), radius).alias("__slo"),
        )
        .select(
            site_id,
            "__slat",
            "__slon",
            "__sla",
            "__slo",
            F.expr(f"explode(array({offs}))").alias("__o"),
        )
        .select(
            site_id,
            "__slat",
            "__slon",
            (F.col("__sla") + F.col("__o.dla")).alias("__cla"),
            (F.col("__slo") + F.col("__o.dlo")).alias("__clo"),
        )
    )
    dist2 = (F.col("__plat") - F.col("__slat")) * (F.col("__plat") - F.col("__slat")) + (
        F.col("__plon") - F.col("__slon")
    ) * (F.col("__plon") - F.col("__slon"))
    cands = (
        p.join(F.broadcast(s), ["__cla", "__clo"])
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= radius * radius)
    )
    w = W.partitionBy(point_id).orderBy("dist2", site_id)
    return (
        cands.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(point_id, site_id, "dist2")
    )
