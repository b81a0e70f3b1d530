"""MEA-ROT pipeline — the reference's second analytics stage
(``R/tlcd_nikonrot_mea.R``) as one DataFrame dataflow.

Reference flow per batch (SURVEY §3.2): long EAV measurement rows
(glass, step, param TP_X/TP_Y, site) → pivot wide with NULL fill
(``:105-106``) → keep sites ≤ 48 (``:102``) → per glass: position labeling
to item_id (cluster + rank, ``R/basic_fun.R:73-104``) → full join measured
vs design coordinates by item_id (``:245``) → Diff = measured − design
(``:246``) → per-glass least-squares fit on the diffs + affine
(``:177-191``) → melt → header/detail insert (``R/pg_db.R:88-111``).

Differences from the plain ROT pipeline (rot_pipeline.py): the input is
EAV (pivot inside the pipeline, R1), positions are *derived* by labeling
rather than given, and the fit runs on measured-minus-design differences
joined by the derived item_id. Per-glass loops are groupBys; the design
table is broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from python_async_sample_spark.kernels.rot import apply_rot, fit_rot

MAX_SITE = 48  # R/tlcd_nikonrot_mea.R:102


@dataclass
class MeaOutput:
    header: DataFrame  # (rot_id, flag, n_sites, descr)
    detail: DataFrame  # (rot_id, item_name, rot_rs)


def pivot_mea(eav: DataFrame, grain: list[str]) -> DataFrame:
    """EAV → wide (TP_X, TP_Y) on the measurement grain, NULL-filled —
    the dcast at R/tlcd_nikonrot_mea.R:105-106."""
    return (
        eav.groupBy(*grain)
        .pivot("param_name", ["TP_X", "TP_Y"])
        .agg(F.first("param_value"))
    )


def label_items(wide: DataFrame, glass_col: str) -> DataFrame:
    """Deterministic item_id per glass: rank sites by (x, y) coordinate —
    the stable equivalent of the Ward-cluster + rank-of-y labeling
    (R/basic_fun.R:83-97; clusters on grid data reduce to coordinate
    order)."""
    w = W.partitionBy(glass_col).orderBy("TP_X", "TP_Y", "site_name")
    return wide.withColumn("item_id", F.row_number().over(w).cast("bigint"))


def run_mea_rot(
    eav: DataFrame,
    design: DataFrame,  # (item_id, x, y) design coordinates — broadcast
    glass_col: str = "glass",
) -> MeaOutput:
    """Run the MEA transform on EAV input. ``design`` plays
    ``tlcd_nikon_mea_dv_ct`` (R/pg_db.R:142-163)."""
    grain = [glass_col, "site_name"]
    wide = pivot_mea(eav, grain)
    clean = wide.where(
        (F.col("site_name") <= MAX_SITE)
        & F.col("TP_X").isNotNull()
        & F.col("TP_Y").isNotNull()
    )
    labeled = label_items(clean, glass_col)
    # measured vs design by derived item_id; Diff = measured − design
    # (full_join in the reference — ids are constructed to match, so inner
    # semantics; unmatched design rows would carry no measurement to fit)
    joined = labeled.join(
        F.broadcast(design.select("item_id", F.col("x").alias("_dvx"), F.col("y").alias("_dvy"))),
        "item_id",
    )
    diffs = joined.select(
        glass_col,
        "site_name",
        "item_id",
        (F.col("TP_X") - F.col("_dvx")).alias("x"),
        (F.col("TP_Y") - F.col("_dvy")).alias("y"),
        F.col("_dvx").alias("dx"),
        F.col("_dvy").alias("dy"),
    )
    fits = fit_rot(diffs, [glass_col])
    rotated = apply_rot(diffs, fits, [glass_col])
    detail = rotated.select(
        F.col(glass_col).alias("rot_id"),
        F.expr(
            "stack(2, concat('item', item_id, '_x'), x_rot,"
            " concat('item', item_id, '_y'), y_rot) AS (item_name, rot_rs)"
        ),
    )
    header = fits.select(
        F.col(glass_col).alias("rot_id"),
        F.lit(1).alias("flag"),
        F.col("n_sites").cast("bigint").alias("n_sites"),
        F.lit("ok").alias("descr"),
    )
    return MeaOutput(header=header, detail=detail)
