"""Blocked fuzzy join: ED≤1 completeness, exact dups, non-matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_async_sample_spark.operators.linkage import fuzzy_join_ed1


def _df(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} long, nm string")


def test_links_all_single_edit_kinds(spark):
    master = _df(
        spark,
        [
            (1, "spanner"),
            (2, "fabrication"),
            (3, "completely different"),
        ],
        "master_id",
    )
    dirty = _df(
        spark,
        [
            (10, "spanner"),  # exact -> ed 0
            (11, "spannner"),  # insertion in the middle -> ed 1
            (12, "spaner"),  # deletion -> ed 1
            (13, "spanner"[:-1] + "x"),  # substitution at the END (suffix block broken)
            (14, "Xpanner"),  # substitution at the START (prefix block broken)
            (15, "fabrication overflow"),  # ed > 1 from everything
        ],
        "dirty_id",
    )
    got = {
        (r.dirty_id, r.master_id): r.ed
        for r in fuzzy_join_ed1(dirty, master, "dirty_id", "master_id").collect()
    }
    assert got == {
        (10, 1): 0,
        (11, 1): 1,
        (12, 1): 1,
        (13, 1): 1,
        (14, 1): 1,
    }


def test_short_names_still_complete(spark):
    """Pairs with a member under 6 chars can evade the segment blocks
    (prefix3/suffix3 overlap the whole string); the short bucket must catch
    them — including short-vs-6-char pairs."""
    master = _df(spark, [(1, "cat"), (2, "abcde"), (3, "abcdef")], "master_id")
    dirty = _df(
        spark,
        [
            (10, "cot"),  # 3-char substitution in the middle
            (11, "abde"),  # 4-char deletion vs abcde -> breaks BOTH segments
            (12, "abdde"),  # 5-char vs abcde sub, and vs abcdef? ed 2 (no)
            (13, "bbcdef"),  # 6-char vs abcdef: caught by suffix segment
        ],
        "dirty_id",
    )
    got = {
        (r.dirty_id, r.master_id): r.ed
        for r in fuzzy_join_ed1(dirty, master, "dirty_id", "master_id").collect()
    }
    assert got == {
        (10, 1): 1,
        (11, 2): 1,
        (12, 2): 1,
        (13, 3): 1,
    }


def test_blocked_equals_bruteforce_on_fixture(spark, sf_dir):
    """The blocking must lose nothing vs the all-pairs join on real data."""
    from python_async_sample_spark.sources.readers import load_table

    part = load_table(spark, sf_dir, "part")
    master = part.select(F.col("p_partkey").alias("master_id"), F.col("p_name").alias("nm"))
    dirty = part.where(F.col("p_partkey") % 17 == 0).select(
        F.col("p_partkey").alias("dirty_id"), F.col("p_name").alias("nm")
    )
    blocked = fuzzy_join_ed1(dirty, master, "dirty_id", "master_id")
    brute = (
        dirty.withColumnRenamed("nm", "__dn")
        .crossJoin(master.withColumnRenamed("nm", "__mn"))
        .select(
            "dirty_id",
            "master_id",
            F.levenshtein("__dn", "__mn").cast("bigint").alias("ed"),
        )
        .where(F.col("ed") <= 1)
    )
    assert blocked.exceptAll(brute).count() == 0
    assert brute.exceptAll(blocked).count() == 0
    assert brute.count() > 0
