"""Record-linkage / fuzzy-join gate queries (beyond reference).

The reference's scatter-gather query API joins on EXACT glass ids
(``eda_query.py:200-214``); a training-data pipeline additionally needs the
near-equal form — linking dirty feeds to a master relation under small edit
distance. q106 manufactures a deterministic dirty feed from the part table
(one character deleted at a partkey-derived position), links it back with
the blocked ED≤1 join, and is oracled by a BRUTE-FORCE all-pairs DuckDB
levenshtein — so the oracle match proves the blocking scheme's completeness,
not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.operators.linkage import fuzzy_join_ed1
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table

_FUZZY_ORACLE = """
    WITH master AS (
      SELECT p_partkey AS master_id, p_name AS nm FROM part
    ),
    dirty AS (
      SELECT p_partkey AS dirty_id,
             substr(p_name, 1, 3 + (p_partkey % 3))
               || substr(p_name, 5 + (p_partkey % 3)) AS nm
      FROM part WHERE p_partkey % 10 = 0
    )
    SELECT d.dirty_id, m.master_id,
           CAST(levenshtein(d.nm, m.nm) AS BIGINT) AS ed
    FROM dirty d CROSS JOIN master m
    WHERE levenshtein(d.nm, m.nm) <= 1
    ORDER BY dirty_id, master_id
"""


@query(
    "q106_fuzzy_join_ed1",
    oracle=_FUZZY_ORACLE,
    ref="record linkage / blocked fuzzy join (beyond reference; cf. J6/J7 exact lookup join eda_query.py:200-214)",
    tags=("llm-data", "linkage", "join"),
)
def q106_fuzzy_join_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance≤1 linkage of a deterministically-corrupted
    dirty feed against the part master. The Spark side candidate-generates
    via 3-char prefix/suffix blocks (inverted-index join, no all-pairs);
    the oracle IS the all-pairs join — a hash match certifies the blocking
    lost nothing."""
    part = load_table(spark, sf_dir, "part")
    master = part.select(
        F.col("p_partkey").alias("master_id"), F.col("p_name").alias("nm")
    )
    dirty = part.where(F.col("p_partkey") % 10 == 0).select(
        F.col("p_partkey").alias("dirty_id"),
        F.expr(
            "substring(p_name, 1, 3 + cast(p_partkey % 3 as int)) || "
            "substring(p_name, 5 + cast(p_partkey % 3 as int))"
        ).alias("nm"),
    )
    out = fuzzy_join_ed1(dirty, master, "dirty_id", "master_id", "nm")
    return out.orderBy("dirty_id", "master_id")


@query(
    "q112_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 5)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    ref="bloom-pruned semi-join (beyond reference; the runtime-filter pattern as an operator)",
    tags=("join", "scale"),
)
def q112_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join of lineitem against the selective p_size=5 part subset,
    pre-pruned by a hand-built distributed Bloom filter (compact broadcast
    map, k xxhash64 bit tests per probe row) before the exact verify. The
    oracle is the plain IN-subquery semi-join: a hash match proves the
    bloom path has NO false negatives, and the exact verify removed every
    false positive. At 100 TB the filter is built once and persisted;
    probe passes drop non-candidates before any shuffle."""
    from python_async_sample_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 5)
    kept = bloom_semi_join(li, part, "l_partkey", "p_partkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


_GEO_ORACLE = """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 7919 % 12000 AS DOUBLE) / CAST(100 AS DOUBLE)
               - CAST(60 AS DOUBLE) AS lat,
             CAST(c_custkey * 104729 % 36000 AS DOUBLE) / CAST(100 AS DOUBLE)
               - CAST(180 AS DOUBLE) AS lon
      FROM customer
    ),
    st AS (
      SELECT s_suppkey,
             CAST(s_suppkey * 4409 % 12000 AS DOUBLE) / CAST(100 AS DOUBLE)
               - CAST(60 AS DOUBLE) AS lat,
             CAST(s_suppkey * 9973 % 36000 AS DOUBLE) / CAST(100 AS DOUBLE)
               - CAST(180 AS DOUBLE) AS lon
      FROM supplier
    ),
    cand AS (
      SELECT p.c_custkey, s.s_suppkey,
             (p.lat - s.lat) * (p.lat - s.lat)
               + (p.lon - s.lon) * (p.lon - s.lon) AS dist2
      FROM pts p CROSS JOIN st s
    )
    SELECT c_custkey, s_suppkey, round(dist2, 6) AS dist2
    FROM (
      SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY dist2, s_suppkey) AS rk
      FROM cand WHERE dist2 <= 25.0
    ) WHERE rk = 1 ORDER BY c_custkey
"""


@query(
    "q135_geo_near_join",
    oracle=_GEO_ORACLE,
    ref="grid-blocked spatial near-join (beyond reference; the spatial sibling of the ANN candidate-generation problem)",
    tags=("linkage", "join", "scale"),
)
def q135_geo_near_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest site within 5 coordinate units for every customer point
    (deterministic synthetic coordinates derived from the keys, same
    arithmetic both engines). The Spark side candidate-generates via
    radius-sized grid cells with the small side exploded to its 3x3
    neighborhood — candidates bounded by local density, never an
    all-pairs; the oracle IS the all-pairs join, so a hash match certifies
    the blocking lost nothing."""
    from python_async_sample_spark.operators.geo import near_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 7919 % 12000 / F.lit(100.0) - 60.0).alias("lat"),
        (F.col("c_custkey") * 104729 % 36000 / F.lit(100.0) - 180.0).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_suppkey") * 4409 % 12000 / F.lit(100.0) - 60.0).alias("lat"),
        (F.col("s_suppkey") * 9973 % 36000 / F.lit(100.0) - 180.0).alias("lon"),
    )
    out = near_join(cust, supp, "c_custkey", "s_suppkey", radius=5.0)
    return out.select(
        "c_custkey", "s_suppkey", F.round("dist2", 6).alias("dist2")
    ).orderBy("c_custkey")


_FS_ORACLE = """
    WITH dirty AS (
      SELECT c_custkey AS dirty_id,
             substr(c_name, 1, 9 + (c_custkey % 5)) || 'X'
               || substr(c_name, 11 + (c_custkey % 5)) AS d_name,
             c_acctbal + (c_custkey % 9) * 0.01 AS d_bal,
             c_nationkey AS d_nation, c_mktsegment AS d_seg
      FROM customer WHERE c_custkey % 7 = 0
    ),
    scored AS (
      SELECT d.dirty_id, c.c_custkey AS master_id,
             (CASE WHEN levenshtein(d.d_name, c.c_name) <= 1 THEN 4.0 ELSE -2.0 END
              + CASE WHEN d.d_seg = c.c_mktsegment THEN 1.5 ELSE -1.5 END
              + CASE WHEN abs(d.d_bal - c.c_acctbal) <= 0.045 THEN 3.0 ELSE -1.0 END
             ) AS score
      FROM dirty d JOIN customer c ON true
    ),
    best AS (
      SELECT dirty_id, master_id, score,
             row_number() OVER (PARTITION BY dirty_id
                                ORDER BY score DESC, master_id) AS rk
      FROM scored
    )
    SELECT dirty_id, master_id, round(score, 1) AS score,
           CASE WHEN score >= 6 THEN 'match'
                WHEN score >= 2 THEN 'possible'
                ELSE 'nonmatch' END AS match_class
    FROM best WHERE rk = 1 ORDER BY dirty_id
"""


@query(
    "q161_probabilistic_linkage",
    oracle=_FS_ORACLE,
    ref="linkage-fellegi-sunter (beyond reference; multi-field probabilistic match scoring over q106's blocked candidates)",
    tags=("linkage", "llm-data"),
)
def q161_probabilistic_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter-style multi-field linkage: a dirty customer feed
    (one name digit replaced at a key-derived position, balance drifted by
    0–8 cents) is linked back to the master relation by a log-likelihood
    score over three comparators — name edit distance ≤ 1 (+4/−2),
    market-segment equality (+1.5/−1.5), balance within 4.5 cents
    (+3/−1) — classed match / possible / nonmatch at 6 / 2.

    Candidates come from BLOCKING on the 4-char name suffix — an
    equi-join, never all-pairs.  Completeness argument: the corruption
    writes 'X', a character no master contains, so any master within edit
    distance 1 of a dirty name must differ from it exactly at the
    corruption position (10..14) and therefore shares the suffix block;
    masters outside the block score at most −2+1.5+3 = 2.5, strictly below
    the true master's floor of 4+1.5−1 = 4.5 (name always within 1,
    segment always carried, balance at worst drifted), so no out-of-block
    pair can win the argmax.  The oracle is BLIND to the blocking: it
    brute-forces all dirty×master pairs, so a candidate the blocking lost
    would change an argmax and hash-mismatch the gate (an earlier
    nation-restricted blocking failed exactly this way at sf0.1).  Score
    arithmetic is in exact halves; ties break by master id."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.expr(
            "substr(c_name, 1, 9 + (c_custkey % 5)) || 'X' "
            "|| substr(c_name, 11 + (c_custkey % 5))"
        ).alias("d_name"),
        (F.col("c_acctbal") + (F.col("c_custkey") % 9) * 0.01).alias("d_bal"),
        F.col("c_mktsegment").alias("d_seg"),
    )
    master = cust.select(
        F.col("c_custkey").alias("master_id"),
        F.col("c_name").alias("m_name"),
        F.col("c_acctbal").alias("m_bal"),
        F.col("c_mktsegment").alias("m_seg"),
    )
    cand = dirty.join(
        master, F.substring("d_name", -4, 4) == F.substring("m_name", -4, 4)
    )
    score = (
        F.when(F.levenshtein("d_name", "m_name") <= 1, 4.0).otherwise(-2.0)
        + F.when(F.col("d_seg") == F.col("m_seg"), 1.5).otherwise(-1.5)
        + F.when(F.abs(F.col("d_bal") - F.col("m_bal")) <= 0.045, 3.0).otherwise(-1.0)
    )
    from pyspark.sql.window import Window as W

    scored = cand.withColumn("score", score)
    best = scored.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("dirty_id").orderBy(F.desc("score"), F.asc("master_id"))
        ),
    ).where(F.col("rk") == 1)
    return best.select(
        "dirty_id",
        "master_id",
        F.round("score", 1).alias("score"),
        F.when(F.col("score") >= 6, "match")
        .when(F.col("score") >= 2, "possible")
        .otherwise("nonmatch")
        .alias("match_class"),
    ).orderBy("dirty_id")


_GOLDEN_ORACLE = """
    WITH variants AS (
      SELECT c_custkey AS entity, 0 AS v, c_name AS name,
             c_acctbal AS bal, c_mktsegment AS seg, 0 AS recency
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT c_custkey, 1,
             substr(c_name, 1, 9) || 'x' || substr(c_name, 11),
             c_acctbal + 1.0, c_mktsegment, 1
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT c_custkey, 2,
             substr(c_name, 1, 12),
             c_acctbal + 2.0,
             CASE WHEN c_custkey % 2 = 0 THEN 'HOUSEHOLD' ELSE c_mktsegment END,
             2
      FROM customer WHERE c_custkey % 11 = 0
    ),
    name_pick AS (
      SELECT entity, name,
             row_number() OVER (PARTITION BY entity
                                ORDER BY len(name) DESC, name) AS rk
      FROM variants
    ),
    bal_pick AS (
      SELECT entity, bal,
             row_number() OVER (PARTITION BY entity
                                ORDER BY recency DESC, v) AS rk
      FROM variants
    ),
    seg_pick AS (
      SELECT entity, seg,
             row_number() OVER (PARTITION BY entity
                                ORDER BY cnt DESC, seg) AS rk
      FROM (SELECT entity, seg, count(*) AS cnt FROM variants GROUP BY 1, 2)
    )
    SELECT n.entity, CAST(3 AS BIGINT) AS n_sources,
           n.name AS golden_name,
           round(b.bal, 2) AS golden_bal,
           s.seg AS golden_seg
    FROM name_pick n
    JOIN bal_pick b ON b.entity = n.entity AND b.rk = 1
    JOIN seg_pick s ON s.entity = n.entity AND s.rk = 1
    WHERE n.rk = 1 ORDER BY n.entity
"""


@query(
    "q172_golden_record_merge",
    oracle=_GOLDEN_ORACLE,
    ref="linkage-survivorship (beyond reference; the merge phase that completes q161's match phase — MDM golden records)",
    tags=("linkage", "cdc"),
)
def q172_golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: linked duplicate records (three deterministic variants
    per entity — original, then two later-arriving copies (typo'd, truncated)) merge into ONE
    golden record under per-field rules: longest-value wins for name,
    freshest-version wins for balance, majority vote (ties by value) for
    segment — the merge phase of entity resolution that follows q161's
    match phase.

    Each rule is a rank-over-window argmax inside the entity cluster —
    per-cluster work bounded by cluster size, one shuffle on the entity
    key, rules composable per field.  The whole construction is
    SQL-expressible, so the oracle certifies every survivorship decision,
    not just row counts."""
    from pyspark.sql.window import Window as W

    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 11 == 0)
    v0 = cust.select(
        F.col("c_custkey").alias("entity"),
        F.lit(0).alias("v"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(0).alias("recency"),
    )
    v1 = cust.select(
        F.col("c_custkey").alias("entity"),
        F.lit(1).alias("v"),
        F.expr("substr(c_name, 1, 9) || 'x' || substr(c_name, 11)").alias("name"),
        (F.col("c_acctbal") + 1.0).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(1).alias("recency"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("entity"),
        F.lit(2).alias("v"),
        F.expr("substr(c_name, 1, 12)").alias("name"),
        (F.col("c_acctbal") + 2.0).alias("bal"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("HOUSEHOLD"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.lit(2).alias("recency"),
    )
    variants = v0.unionByName(v1).unionByName(v2)
    name_w = W.partitionBy("entity").orderBy(F.length("name").desc(), F.asc("name"))
    bal_w = W.partitionBy("entity").orderBy(F.desc("recency"), F.asc("v"))
    seg_counts = variants.groupBy("entity", "seg").agg(F.count(F.lit(1)).alias("cnt"))
    seg_w = W.partitionBy("entity").orderBy(F.desc("cnt"), F.asc("seg"))
    names = (
        variants.withColumn("rk", F.row_number().over(name_w))
        .where(F.col("rk") == 1)
        .select("entity", F.col("name").alias("golden_name"))
    )
    bals = (
        variants.withColumn("rk", F.row_number().over(bal_w))
        .where(F.col("rk") == 1)
        .select("entity", F.round("bal", 2).alias("golden_bal"))
    )
    segs = (
        seg_counts.withColumn("rk", F.row_number().over(seg_w))
        .where(F.col("rk") == 1)
        .select("entity", F.col("seg").alias("golden_seg"))
    )
    return (
        names.join(bals, "entity")
        .join(segs, "entity")
        .select(
            "entity",
            F.lit(3).cast("bigint").alias("n_sources"),
            "golden_name",
            "golden_bal",
            "golden_seg",
        )
        .orderBy("entity")
    )
