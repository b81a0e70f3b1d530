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
    rejects: DataFrame  # (glass, item_id, flag, descr) — S10 side-output


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


def mea_design_rejects(
    labeled: DataFrame, design: DataFrame, glass_col: str = "glass"
) -> DataFrame:
    """Mismatched-grid rejects from the measured-vs-design FULL OUTER join
    (J8 in anger) flowing to the S10 side-output with the reference's flag
    codes: a measured site whose derived item_id has no design row gets
    flag -2 'No Design Values' (R/tlcd_nikonrot_mea.R:131,
    insert_error_mea via R/pg_db.R:128-139), a design row with no
    measurement on that glass gets flag -1 'Missing Values'
    (R/tlcd_nikonrot_mea.R:160). The reference's full_join (:243) lets
    these flow as NULL diffs into the fit; here they are routed out
    *before* the fit so the fit runs on the matched grid only.

    The design grid is per-product (one small table), so per-glass
    coverage is distinct-glasses × design — a broadcast cross join, never
    a shuffle of the measurement fact.
    """
    glasses = labeled.select(glass_col).distinct()
    per_glass_design = glasses.crossJoin(F.broadcast(design.select("item_id")))
    measured = labeled.select(
        glass_col, "item_id", F.lit(True).alias("_measured")
    )
    designed = per_glass_design.withColumn("_designed", F.lit(True))
    fj = measured.join(designed, [glass_col, "item_id"], "full_outer")
    return fj.where(
        F.col("_measured").isNull() | F.col("_designed").isNull()
    ).select(
        glass_col,
        "item_id",
        F.when(F.col("_designed").isNull(), F.lit(-2))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("flag"),
        F.when(F.col("_designed").isNull(), F.lit("No Design Values"))
        .otherwise(F.lit("Missing Values"))
        .alias("descr"),
    )


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
    # measured vs design by derived item_id; Diff = measured − design.
    # The reference full_joins (:243) and lets unmatched rows ride as NULL
    # diffs; here the mismatches are routed to the rejects side-output
    # (S10, flag -1/-2 — see mea_design_rejects) and the fit itself runs
    # on the matched (inner) grid, which is identical when grids align.
    rejects = mea_design_rejects(labeled, design, glass_col)
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
    return MeaOutput(header=header, detail=detail, rejects=rejects)
