"""The reference's scalar-function surface (SURVEY §2.7) as named helpers.

Each helper is a thin, documented Column expression — the point is the
catalog of semantics, not abstraction: every format string, wildcard
convention, and derivation rule the reference scatters across SQL strings
and R code lives here once, with its source cited. q15 exercises the whole
set against the DuckDB oracle; these names are the API form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference timestamp format: 'YYYY-MM-DD HH24:MI:SS.FF3' (dbs/nikon.py:111).
TS_FMT_MS = "yyyy-MM-dd HH:mm:ss.SSS"
# R-side second-precision format (R/ora_db.R:29-30, nikon_ETL.py:599-600).
TS_FMT_S = "yyyy-MM-dd HH:mm:ss"


def to_ts_ms(col: Column | str) -> Column:
    """String → timestamp at millisecond precision (to_timestamp FF3)."""
    return F.to_timestamp(col, TS_FMT_MS)


def fmt_ts_s(col: Column | str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (strftime analog)."""
    return F.date_format(col, TS_FMT_S)


def tool_key(col: Column | str) -> Column:
    """Tool id normalization: upper-case first 8 chars — the catalog-derived
    tool key ``upper(substr(relname, 1, 8))`` (dbs/nikon.py:93)."""
    return F.upper(F.substring(col, 1, 8))


def product_from_param_collection(col: Column | str) -> Column:
    """Product derivation ``'TL' + substr(PARAM_COLLECTION, 5)``
    (R/tlcd_nikonrot_mea.R:100)."""
    return F.concat(F.lit("TL"), F.substring(col, 5, 100))


def rot_x(x: Column, dy: Column, shift_x: Column, tan_theta: Column) -> Column:
    """Affine-corrected x: ``x + sx − dy·tanθ`` (R/tlcd_nikonrot.R:241)."""
    return x + shift_x - dy * tan_theta


def rot_y(y: Column, dx: Column, shift_y: Column, tan_theta: Column) -> Column:
    """Affine-corrected y: ``y + sy + dx·tanθ`` (R/tlcd_nikonrot.R:242)."""
    return y + shift_y + dx * tan_theta


def zscore(col: Column, mean: Column, sd: Column) -> Column:
    """``scale(x, mean, sd)`` (R/basic_fun.R:83)."""
    return (col - mean) / sd


def enabled_flag(col: Column | str) -> Column:
    """The reference stores booleans as 'TRUE'/'FALSE' strings
    (dbs/nikon.py:28); this is the typed read."""
    c = col if isinstance(col, Column) else F.col(col)
    return c == F.lit("TRUE")


def theta_urad(tan_theta: Column) -> Column:
    """Rotation in µrad from its tangent: ``atan(t)·1e6`` — the unit the
    reference's optimizer fits (R/basic_fun.R:29-30)."""
    return F.atan(tan_theta) * 1e6
