"""Blocked fuzzy join — entity resolution / record linkage at scale.

A training-data pipeline constantly links dirty feeds against a master
relation on *near*-equal string keys (typo'd titles, OCR'd names, mangled
URLs). The naive form is an all-pairs ``levenshtein`` — O(n·m) and dead at
any real scale. The scale-safe form is the classic blocked
candidate-generation join:

* every row emits a handful of tiny BLOCKING KEYS;
* candidates are pairs sharing a key (an inverted-index equi-join — shuffle
  on the key, never a cartesian);
* the expensive edit-distance verify runs on candidates only, JVM-side
  (``F.levenshtein``, no Python in the hot path).

The blocking here is **provably complete for edit distance ≤ 1** on keys of
length ≥ 6: write the two strings as ``P·u·S`` / ``P·v·S`` with
``|u|,|v| ≤ 1`` (the common-prefix / common-suffix decomposition every
ED ≤ 1 pair admits); then ``|P|+|S| ≥ min_len − 1 ≥ 5``, so ``|P| ≥ 3`` or
``|S| ≥ 3`` — the pair shares its first 3 or last 3 characters exactly.
This is the segment-pigeonhole idea behind PassJoin (Li et al., VLDB'11),
cut down to the ED ≤ 1 case where two fixed segments suffice. q106's
brute-force DuckDB oracle *proves* the completeness claim on every run: a
single missed pair hash-mismatches the gate.

Skew note: natural-language prefixes are Zipf-distributed, so the candidate
join is exactly the shape AQE skew-join handles (session pins it on); the
per-key candidate lists stay bounded because keys are only ever 3 chars of
real text joined against a same-blocked side, never a full-table key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _blocking_keys(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """Emit the ED≤1-complete blocking keys per row: (side, 3-char exact
    segment) for the prefix and the suffix, plus — for strings of length
    ≤ 6 only — a shared short-bucket key. The segment guarantee needs
    ``min_len ≥ 6``; an ED≤1 pair with a shorter member has BOTH members
    ≤ 6 chars (lengths differ by at most 1), so the short bucket catches
    exactly the pairs the segments can miss. It is quadratic only across
    the ≤6-char strings — a tiny, bounded domain at any corpus size."""
    keys = F.array(
        F.struct(
            F.lit("p").alias("side"),
            F.substring(F.col(name_col), 1, 3).alias("seg"),
        ),
        F.struct(
            F.lit("s").alias("side"),
            # negative-start substring == right(, 3), without splicing the
            # column name into a SQL string
            F.substring(F.col(name_col), -3, 3).alias("seg"),
        ),
    )
    keys = F.when(
        F.length(name_col) <= 6,
        F.concat(keys, F.array(F.struct(F.lit("t").alias("side"), F.lit("").alias("seg")))),
    ).otherwise(keys)
    return df.select(
        F.col(id_col),
        F.col(name_col),
        F.explode(keys).alias("bk"),
    ).select(id_col, name_col, "bk.side", "bk.seg")


def fuzzy_join_ed1(
    dirty: DataFrame,
    master: DataFrame,
    dirty_id: str,
    master_id: str,
    name_col: str = "nm",
) -> DataFrame:
    """Link every ``dirty`` row to every ``master`` row within edit
    distance 1 of its ``name_col`` (distance 0 = exact duplicates included).

    Returns (dirty_id, master_id, ed). Complete for ALL name lengths: the
    segment blocks guarantee pairs with both names ≥ 6 chars (module
    docstring), and a short-bucket block covers pairs involving a ≤5-char
    name. The verify step is the only place edit distance is computed, and
    only over key-sharing candidates.

    The verify runs on DISTINCT name pairs, then expands back to id pairs
    with two hash joins — on real corpora names repeat heavily (duplicate
    titles, shared product names), so this shrinks the quadratic-ish verify
    stage from |rows|-scale to |distinct names|-scale; for unique-name data
    it is a no-op. The id-expansion joins produce exactly the output rows,
    never intermediate blowup.
    """
    dn = dirty.select(F.col(name_col).alias("__dn")).distinct()
    mn = master.select(F.col(name_col).alias("__mn")).distinct()
    dk = _blocking_keys(dn.withColumn("__did", F.col("__dn")), "__did", "__dn")
    mk = _blocking_keys(mn.withColumn("__mid", F.col("__mn")), "__mid", "__mn")
    name_pairs = (
        dk.select("side", "seg", "__dn")
        .join(mk.select("side", "seg", "__mn"), ["side", "seg"])
        # a pair sharing both prefix and suffix keys would verify twice
        .select("__dn", "__mn")
        .distinct()
        # ED<=1 bounds the length gap; prune before the verify
        .where(F.abs(F.length("__dn") - F.length("__mn")) <= 1)
        .withColumn("ed", F.levenshtein("__dn", "__mn").cast("bigint"))
        .where(F.col("ed") <= 1)
    )
    d = dirty.select(F.col(dirty_id), F.col(name_col).alias("__d_nm")).alias("__d")
    m = master.select(F.col(master_id), F.col(name_col).alias("__m_nm")).alias("__m")
    return (
        d.join(name_pairs, F.col("__d_nm") == F.col("__dn"))
        .join(m, F.col("__m_nm") == F.col("__mn"))
        .select(dirty_id, master_id, "ed")
    )
