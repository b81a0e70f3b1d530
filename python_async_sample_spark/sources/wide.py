"""Dynamic per-tool wide tables — the reference's hallmark schema shape.

Reference: each tool owns a ``{toolid}_rawdata`` table whose column set is
*data* — one column per sensor/alignment parameter, discovered at runtime
from the catalog (``dbs/nikon.py:57-73``), inserted with per-column
placeholder lists (``dbs/nikon.py:160-167``), selected by regex
(``R/tlcd_nikonrot.R:90-93``). SURVEY §1.3/§7.1 sets the engine stance:
keep the LONG (EAV) representation as the core — (grain, param, value) —
and pivot to the wide shape only at the edges, so the dynamic-schema
problem stays a data problem.

This module is that edge: materialize one wide parquet table per tool, with
the column set discovered per tool from the data itself (explicit pivot
values — never the implicit pivot, which would scan twice and cap at
``spark.sql.pivotMaxValues``). The tool list and per-tool param lists are
catalog-sized driver lookups (hundreds), not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def params_per_tool(
    long_df: DataFrame, tool_col: str = "toolid", param_col: str = "param_name"
) -> dict[str, list[str]]:
    """Discover each tool's parameter (→ column) set from the data — the
    analog of the reference's information_schema probe. One distinct over
    (tool, param): catalog-sized result, collected once."""
    rows = long_df.select(tool_col, param_col).distinct().collect()
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r[tool_col], []).append(r[param_col])
    return {t: sorted(ps) for t, ps in out.items()}


def collate_by_char_positions(
    cols: list[str], positions: tuple[int, ...] = (10, 8)
) -> list[str]:
    """Order column names by the characters at fixed 1-indexed positions —
    the reference's custom wide-column collation (O4): ``R/pg_db.R:45`` sorts
    the ROT column list by ``substring(col, 10, 10)`` then
    ``substring(col, 8, 8)`` so paired x/y parameter columns interleave in
    measurement order regardless of their prefixes. Names shorter than a
    position contribute ``''`` for that key (R substring semantics) and sort
    first; the sort is stable, like R ``order``."""
    return sorted(
        cols,
        key=lambda name: tuple(
            name[p - 1] if len(name) >= p else "" for p in positions
        ),
    )


def widen_tool(
    long_df: DataFrame,
    tool: str,
    params: list[str],
    grain_cols: list[str],
    tool_col: str = "toolid",
    param_col: str = "param_name",
    value_col: str = "param_value",
) -> DataFrame:
    """One tool's wide frame: grain columns + one column per parameter.

    Explicit pivot values keep this a single shuffle on the grain; missing
    (grain, param) combinations fill with NULL exactly like the reference's
    ``fill = NA_real_`` pivot (``R/tlcd_nikonrot_mea.R:105-106``)."""
    return (
        long_df.where(F.col(tool_col) == tool)
        .groupBy(*grain_cols)
        .pivot(param_col, params)
        .agg(F.first(value_col))
    )


def materialize_wide_tables(
    long_df: DataFrame,
    out_dir: str,
    grain_cols: list[str],
    tool_col: str = "toolid",
    param_col: str = "param_name",
    value_col: str = "param_value",
) -> dict[str, str]:
    """Write ``{out_dir}/{tool}_rawdata`` per tool; returns tool → path.

    Each tool's write prunes to its own partition of the long table (the
    tool filter pushes into the scan), so tools materialize independently —
    the reference's per-tool loop, but each iteration is a distributed job
    and the schema comes from the data, not a DDL migration.
    """
    per_tool = params_per_tool(long_df, tool_col, param_col)
    paths: dict[str, str] = {}
    # table names follow the reference's lowercase {tool}_rawdata convention;
    # two tool ids differing only in case would clobber each other's table —
    # refuse loudly rather than let the last writer win
    lowered = [t.lower() for t in per_tool]
    if len(set(lowered)) != len(lowered):
        dupes = sorted({t for t in lowered if lowered.count(t) > 1})
        raise ValueError(f"tool ids collide case-insensitively: {dupes}")
    for tool, params in sorted(per_tool.items()):
        path = f"{out_dir.rstrip('/')}/{tool.lower()}_rawdata"
        widen_tool(
            long_df, tool, params, grain_cols, tool_col, param_col, value_col
        ).write.mode("overwrite").parquet(path)
        paths[tool] = path
    return paths


def read_wide_table(spark: SparkSession, out_dir: str, tool: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir.rstrip('/')}/{tool.lower()}_rawdata")
