"""Portable-hash sketch queries — the cross-engine-replayable twins.

The xxhash64 sketch family (q63/q91/q142/q155/q164/q165) is verified by
error-band guards and merge-law tests because no independent engine can
recompute xxhash64 values.  The queries below rebuild the same sketch
shapes on a 32-bit xor-shift-multiply mixer (the splitmix/lowbias32
construction: golden-gamma seed per hash index, then two rounds of
``x = ((x XOR x>>16) * 0x45D9F3B) mod 2^32`` and a final xor-fold —
``operators/sketches.portable_hash``; NOT an affine ``a·x+b mod p``
family, which is 2-universal but collapses HLL on sequential keys),
whose exact int64 arithmetic DuckDB
replays verbatim — so every CMS cell, HLL register and Bloom bit is
HASH-MATCHED against the oracle, not just banded.  The xxhash64 variants
stay the production path (better diffusion, JVM-native); these certify the
sketch ALGEBRA — build shapes, estimate formulas, membership semantics —
end to end on an independent engine.

Reference tie-in: the reference validates outputs only by exact SQL
(eda_query.py's aggregate checks); sketches are beyond its surface, so this
module holds them to the same exact-verification bar the relational
queries meet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.operators.bloom import bloom_might_contain, build_bloom
from python_async_sample_spark.operators.sketches import (
    cms_build_portable,
    cms_cell_sql,
    cms_estimate_portable,
    hll_portable_estimate,
    hll_portable_registers,
    hll_portable_sql,
    portable_hash,
    portable_hash_sql,
)
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.plans.similarity_queries import _union_poison_guard
from python_async_sample_spark.sources.readers import load_table

_CMS_DEPTH, _CMS_WIDTH = 4, 256


def _cms_probe_sql(expr: str) -> str:
    return "\n    UNION ALL ".join(
        f"SELECT user_id, {i} AS r, {cms_cell_sql(expr, i, _CMS_WIDTH)} AS col FROM top"
        for i in range(_CMS_DEPTH)
    )


_CMS_ORACLE = f"""
    WITH cells AS (
      SELECT r, col, CAST(count(*) AS BIGINT) AS cnt FROM (
        {"    UNION ALL ".join(
            f"SELECT {i} AS r, {cms_cell_sql('user_id', i, _CMS_WIDTH)} AS col FROM events "
            for i in range(_CMS_DEPTH)
        )}
      ) GROUP BY r, col
    ),
    top AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_count,
             CAST(row_number() OVER (ORDER BY count(*) DESC, user_id) AS INT) AS rank
      FROM events GROUP BY user_id
      QUALIFY rank <= 10
    ),
    probes AS (
      {_cms_probe_sql('user_id')}
    ),
    est AS (
      SELECT p.user_id, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_count
      FROM probes p LEFT JOIN cells c USING (r, col)
      GROUP BY p.user_id
    )
    SELECT t.rank, t.user_id, t.true_count, e.est_count
    FROM top t JOIN est e USING (user_id)
    ORDER BY rank
"""


@query(
    "q180_cms_portable_exact",
    oracle=_CMS_ORACLE,
    ref="count-min sketch, cross-engine hash-matched (beyond reference; the value-oracled twin of q142's xxhash64 build)",
    tags=("sketch", "scale"),
)
def q180_cms_portable_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q142's heavy-hitter report rebuilt on the portable hash family, so
    the ORACLE RECOMPUTES EVERY SKETCH CELL: build (explode + bounded
    groupBy, depth*width cells), point estimates (min over hash rows via a
    broadcast of the bounded cell relation), and the deterministic top-10
    ranking all hash-match DuckDB. The never-underestimate guard stays
    in-plan — belt and suspenders over the value oracle."""
    from python_async_sample_spark.operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build_portable(ev, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    top = skew_report(ev, "user_id", top_k=10).select(
        F.col("rank").cast("int").alias("rank"),
        "user_id",
        F.col("n_rows").alias("true_count"),
    )
    est = cms_estimate_portable(
        top.select("user_id"), sketch, "user_id", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    out = top.join(est, "user_id").select("rank", "user_id", "true_count", "est_count")
    violation = out.where(F.col("est_count") < F.col("true_count")).limit(1)
    return _union_poison_guard(
        out, violation, "portable CMS underestimated a key count — impossible by construction"
    ).orderBy("rank")


_HLL_M = 128

_HLL_ORACLE = f"""
    WITH hll AS ({hll_portable_sql("events", "user_id", _HLL_M)})
    SELECT CAST({_HLL_M} AS INT) AS m,
           v_zero,
           est,
           (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
             AS exact_distinct
    FROM hll
"""


@query(
    "q181_hll_portable_exact",
    oracle=_HLL_ORACLE,
    ref="HyperLogLog distinct estimate, cross-engine hash-matched (beyond reference; the value-oracled twin of q63's HLL++)",
    tags=("sketch", "scale"),
)
def q181_hll_portable_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate from a hand-rolled 128-register HLL on the
    portable hash: register index from the low bits, rho from the leading
    zeros of the remaining 24-bit budget (bit-length via base-2 string on
    both engines), alpha-corrected harmonic mean with the standard
    small-range (linear-counting) switch. DuckDB recomputes every register
    and the estimate itself — the first sketch here whose VALUE, not just
    error band, is the checked artifact. The band guard (±35%: 3 sigma at
    m=128 plus non-ideal-hash slack) still rides in-plan."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_portable_registers(ev, "user_id", m=_HLL_M)
    est = hll_portable_estimate(regs, m=_HLL_M)
    exact = ev.agg(F.countDistinct("user_id").cast("bigint").alias("exact_distinct"))
    out = (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.lit(_HLL_M).cast("int").alias("m"), "v_zero", "est", "exact_distinct"
        )
    )
    violation = out.where(
        (F.col("est") / F.col("exact_distinct") - 1.0).isNull()
        | (F.abs(F.col("est") / F.col("exact_distinct") - 1.0) > 0.35)
    ).limit(1)
    return _union_poison_guard(
        out, violation, "portable HLL estimate outside the 35% contract band"
    )


_BLOOM_M, _BLOOM_K, _BLOOM_THRESHOLD = 2048, 3, 200


def _bloom_pos_sql(expr: str, i: int) -> str:
    return f"({portable_hash_sql(expr, i)} % {_BLOOM_M})"


_BLOOM_ORACLE = f"""
    WITH build AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value > {_BLOOM_THRESHOLD}
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {"    UNION ALL ".join(
            f"SELECT {_bloom_pos_sql('user_id', i)} AS pos FROM build "
            for i in range(_BLOOM_K)
        )}
      )
    ),
    probe_pos AS (
      {"    UNION ALL ".join(
          f"SELECT event_id, {_bloom_pos_sql('user_id', i)} AS pos FROM events "
          for i in range(_BLOOM_K)
      )}
    ),
    hits AS (
      SELECT event_id FROM probe_pos JOIN bits USING (pos)
      GROUP BY event_id HAVING count(*) = {_BLOOM_K}
    ),
    passed AS (SELECT e.event_type FROM events e JOIN hits USING (event_id)),
    truth AS (SELECT e.event_type FROM events e JOIN build USING (user_id)),
    base AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    p AS (SELECT event_type, count(*) AS c FROM passed GROUP BY 1),
    t AS (SELECT event_type, count(*) AS c FROM truth GROUP BY 1)
    SELECT b.event_type, b.n_events,
           CAST(coalesce(p.c, 0) AS BIGINT) AS n_pass,
           CAST(coalesce(t.c, 0) AS BIGINT) AS n_true,
           CAST(coalesce(p.c, 0) - coalesce(t.c, 0) AS BIGINT) AS n_false_pos
    FROM base b LEFT JOIN p USING (event_type) LEFT JOIN t USING (event_type)
    ORDER BY event_type
"""


@query(
    "q182_bloom_portable_exact",
    oracle=_BLOOM_ORACLE,
    ref="Bloom-filter probe pruning, cross-engine hash-matched (beyond reference; oracles the FILTER itself — false positives included — where q112 oracles only the post-verify result)",
    tags=("sketch", "join", "scale"),
)
def q182_bloom_portable_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 2048-bit/3-hash Bloom filter over high-value purchase users
    and probe EVERY event through it, reporting per event type: probe rows,
    bloom passes, true members, and false positives. On the portable hash
    the oracle recomputes each set bit and each probe's membership test, so
    the word/mask bitset path (bit_or build, forall word-mask probe) is
    certified bit-for-bit against relational set semantics — including the
    false-positive count, which q112's post-verify oracle by construction
    cannot see. The no-false-negative contract stays in-plan: any true
    member whose event fails the filter poisons the query."""
    ev = load_table(spark, sf_dir, "events")
    build = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("value") > _BLOOM_THRESHOLD)
        )
        .select("user_id")
        .distinct()
    )
    bloom = build_bloom(build, "user_id", m_bits=_BLOOM_M, k=_BLOOM_K, hash_fn=portable_hash)
    passed = bloom_might_contain(
        ev, bloom, "user_id", m_bits=_BLOOM_M, k=_BLOOM_K, hash_fn=portable_hash
    )
    truth = ev.join(build, "user_id", "left_semi")

    base = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    p = passed.groupBy("event_type").agg(F.count(F.lit(1)).alias("__p"))
    t = truth.groupBy("event_type").agg(F.count(F.lit(1)).alias("__t"))
    out = (
        base.join(p, "event_type", "left")
        .join(t, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.coalesce("__p", F.lit(0)).cast("bigint").alias("n_pass"),
            F.coalesce("__t", F.lit(0)).cast("bigint").alias("n_true"),
            (F.coalesce("__p", F.lit(0)) - F.coalesce("__t", F.lit(0)))
            .cast("bigint")
            .alias("n_false_pos"),
        )
    )
    violation = truth.join(passed.select("event_id"), "event_id", "left_anti").limit(1)
    return _union_poison_guard(
        out, violation, "Bloom filter false negative — impossible by construction"
    ).orderBy("event_type")


# --- q183: Poisson bootstrap on portable-hash randomness -------------------
#
# The online-bootstrap trick (Poisson(1) replicate weights instead of true
# with-replacement resampling) is THE way to bootstrap a distributed table:
# one pass, no resample shuffle, every replicate a weighted aggregate.  With
# the replicate weight drawn from the PORTABLE hash of (row, replicate) the
# whole procedure is deterministic and the oracle replays it exactly —
# normally sampling-based statistics are the least oracle-able thing in an
# engine.  Money math rides integer cents (floor(value*100+0.5)) so every
# sum is exact int64 on both engines and the only doubles are final
# divisions of identical integers.

_BOOT_B = 48
# inverse-CDF thresholds for Poisson(1), as exact int literals on h<2^32:
# P(X<=k) for k=0..5; a hash above the last threshold draws weight 6
_POIS_THRESHOLDS: list[int] = []
_cum = 0.0
for _k in range(6):
    _f = 1
    for _j in range(1, _k + 1):
        _f *= _j
    _cum += 2.718281828459045**-1.0 / _f
    _POIS_THRESHOLDS.append(int(_cum * (1 << 32)))


def _poisson_weight_spark(h):
    w = F.lit(6)
    for k in range(5, -1, -1):
        w = F.when(h < F.lit(_POIS_THRESHOLDS[k]), F.lit(k)).otherwise(w)
    return w


def _poisson_weight_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN ({h}) < {t} THEN {k}" for k, t in enumerate(_POIS_THRESHOLDS)
    )
    return f"(CASE {cases} ELSE 6 END)"


_BOOT_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    pt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(cents) / (100.0 * count(*)), 6) AS mean_value
      FROM ev GROUP BY 1
    ),
    rep AS (
      SELECT event_type, cents,
             {_poisson_weight_sql(portable_hash_sql(f"(event_id * {_BOOT_B} + g.b)", 0))} AS w,
             g.b
      FROM ev, (SELECT unnest(range({_BOOT_B})) AS b) g
    ),
    bm AS (
      SELECT event_type, b,
             sum(w * cents) / (100.0 * sum(w)) AS m
      FROM rep GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    ci AS (
      SELECT event_type,
             round(quantile_cont(m, 0.025), 6) AS ci_lo,
             round(quantile_cont(m, 0.975), 6) AS ci_hi
      FROM bm GROUP BY 1
    )
    SELECT p.event_type, p.n, p.mean_value, c.ci_lo, c.ci_hi
    FROM pt p JOIN ci c USING (event_type)
    ORDER BY p.event_type
"""


@query(
    "q183_bootstrap_ci",
    oracle=_BOOT_ORACLE,
    ref="Poisson-bootstrap confidence intervals (beyond reference; one-pass distributed resampling, deterministic via the portable hash so even SAMPLING is value-oracled)",
    tags=("stats", "sketch", "scale"),
)
def q183_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean event value per event type, from 48
    Poisson(1)-weighted replicates in ONE pass: explode rows x replicates,
    draw each weight by inverse-CDF on the portable hash of
    (event_id, replicate), aggregate weighted means per replicate, take
    exact percentiles across the 48 means. No resampling shuffle, no
    driver-side randomness, map-side-combinable aggregates throughout —
    the online-bootstrap shape that scales to 100 TB, made deterministic
    enough for DuckDB to reproduce every weight and both CI bounds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    point = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("cents") / (100.0 * F.count(F.lit(1))), 6).alias("mean_value"),
    )
    rep = ev.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "event_id",
    )
    h = portable_hash(F.col("event_id") * _BOOT_B + F.col("b"), 0)
    w = _poisson_weight_spark(h)
    bm = (
        rep.select("event_type", "b", w.alias("w"), "cents")
        .groupBy("event_type", "b")
        .agg(F.sum(F.col("w") * F.col("cents")).alias("swx"), F.sum("w").alias("sw"))
        .where(F.col("sw") > 0)
        .select("event_type", (F.col("swx") / (100.0 * F.col("sw"))).alias("m"))
    )
    ci = bm.groupBy("event_type").agg(
        F.round(F.percentile("m", 0.025), 6).alias("ci_lo"),
        F.round(F.percentile("m", 0.975), 6).alias("ci_hi"),
    )
    return point.join(ci, "event_type").select(
        "event_type", "n", "mean_value", "ci_lo", "ci_hi"
    ).orderBy("event_type")
