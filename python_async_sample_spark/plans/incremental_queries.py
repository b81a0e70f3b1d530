"""Incremental-subsystem queries (SURVEY §2.9) for the driver gate.

q17 runs the REAL pipeline — watermark store, chunked catch-up, idempotent
overwrite-window sink, deliberate late re-delivery — into a temp dir, then
returns the sink contents. The oracle is the plain interval SQL the whole
machinery must be equivalent to: that equivalence (including the re-delivery
being a no-op) is exactly the reference's exactly-once-per-window contract.
"""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_async_sample_spark.incremental import (
    IncrementalRunner,
    IncrementalStage,
    WatermarkStore,
    read_target,
)
from python_async_sample_spark.plans.registry import query
from python_async_sample_spark.sources.readers import load_table

WM0 = datetime.fromisoformat("2024-01-24 00:00:00")


@query(
    "q17_incremental_catchup",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt
    FROM events
    WHERE date_trunc('microseconds', ts) > TIMESTAMP '2024-01-24 00:00:00'
    ORDER BY event_id
    """,
    ref="I1,I2,I3,I4,I5,I6,S11,S12",
    tags=("incremental",),
)
def q17_incremental_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="spark_graft_incr_")
    store = WatermarkStore(spark, f"{tmp}/state")
    runner = IncrementalRunner(spark, store)
    stage = IncrementalStage(
        name="EDC_Import",
        source=lambda s: load_table(s, sf_dir, "events"),
        target_path=f"{tmp}/edc",
        ts_col="ts",
    )
    store.put("NIKON", "EDC_Import", WM0)
    runner.run(stage)

    # Deliberate late re-delivery of the last 2 days: the sink must absorb it
    # without duplicates (delete-then-insert semantics, dbs/nikon.py:117-145).
    hi = store.get("NIKON", "EDC_Import")
    store.put("NIKON", "EDC_Import", datetime.fromisoformat("2024-01-28 00:00:00"))
    runner.run(stage)
    assert store.get("NIKON", "EDC_Import") == hi

    return (
        read_target(spark, f"{tmp}/edc")
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .select("event_id", "user_id", "event_type", "value", "dt")
        .orderBy("event_id")
    )


@query(
    "q177_merge_into",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
             CAST(42.42 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 397 = 0
    ),
    merged AS (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    ref="S12+I3 generalized: keyed MERGE INTO (VERDICT r3 item 7; the key-addressed form of the reference's delete-then-insert window, dbs/nikon.py:117-145)",
    tags=("incremental", "sink"),
)
def q177_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE INTO on a parquet table, certified end-to-end: a fresh
    range-clustered copy of ``orders`` receives one CDC-shaped batch —
    updates (keys ≡ 0 mod 97: status→'M', price+1000) plus inserts (fresh
    keys ≡ 0 mod 397 offset past the key space) — through
    ``sources.layout.merge_into``; the batch is **delivered twice** to
    prove re-delivery idempotence, then the merged table's per-status
    rollup must equal DuckDB's from-first-principles reconstruction.

    Scale shape: footer min/max pruning rewrites only files whose key
    range intersects the batch (range-clustered table → a handful), the
    swap is staged-then-move (crash leaves duplicates, never loss), and
    the driver touch is the batch's distinct keys — CDC-sized, never
    table-sized.  Prices ride DECIMAL(18,2) on both sides, so the sums
    are exact, not summation-order-dependent."""
    from python_async_sample_spark.sources.layout import cluster_by, merge_into

    tmp = tempfile.mkdtemp(prefix="spark_graft_merge_")
    target = f"{tmp}/orders"
    cluster_by(spark, f"{sf_dir.rstrip('/')}/orders.parquet", target, ["o_orderkey"], n_files=8)

    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1000.00)).cast("double"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 397 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("o_totalprice", F.lit(42.42))
        )
    )
    merge_into(spark, target, updates, "o_orderkey")
    merge_into(spark, target, updates, "o_orderkey")  # re-delivery: same state

    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q184_versioned_time_travel",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
             CAST(42.42 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 397 = 0
    ),
    merged AS (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    ),
    v0 AS (
      SELECT CAST(0 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders GROUP BY o_orderstatus
    ),
    v2 AS (
      SELECT CAST(2 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM merged GROUP BY o_orderstatus
    )
    SELECT * FROM v0 UNION ALL SELECT * FROM v2
    ORDER BY version, o_orderstatus
    """,
    ref="S11-S13 upgraded to snapshot semantics: manifest-versioned MERGE with atomic visibility + time travel (sources/versioned.py; the whole-table generalization of the reference's watermark interval swap, dbs/nikon.py:107-186)",
    tags=("incremental", "sink", "versioned"),
)
def q184_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q177's MERGE batch against a MANIFEST-VERSIONED table: the same CDC
    batch commits twice (v1, v2 — re-delivery is a new identical-content
    snapshot, not corruption), then ONE output reports the per-status
    rollup of BOTH version 0 and the head. The oracle checks two
    properties at once: the head equals DuckDB's from-first-principles
    merge, and time travel still returns the EXACT pre-merge table — a
    crash-window observer can only ever see one of these two states
    (commits are exclusive-linked manifests; data files are immutable;
    see tests/test_versioned.py for the crash and racing-writer cases)."""
    from python_async_sample_spark.sources.versioned import (
        create_table,
        merge_into_versioned,
        read_version,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_vtq_")
    root = f"{tmp}/orders_v"
    orders = load_table(spark, sf_dir, "orders")
    # range-ordered base so footer min/max pruning has teeth (same reason
    # q177 cluster_by's its copy)
    create_table(spark, root, orders.orderBy("o_orderkey"), n_files=8)

    updates = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1000.00)).cast("double"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 397 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("o_totalprice", F.lit(42.42))
        )
    )
    merge_into_versioned(spark, root, updates, "o_orderkey")
    merge_into_versioned(spark, root, updates, "o_orderkey")  # re-delivery

    def rollup(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        ).select(
            F.lit(version).cast("int").alias("version"),
            "o_orderstatus",
            "n_orders",
            "total_price",
        )

    return (
        rollup(read_version(spark, root, 0), 0)
        .unionByName(rollup(read_version(spark, root), 2))
        .orderBy("version", "o_orderstatus")
    )


@query(
    "q186_versioned_compaction",
    oracle="""
    WITH spine AS (
      SELECT * FROM (VALUES
        (0, 'create', 2), (1, 'append', 3), (2, 'append', 4),
        (3, 'append', 5), (4, 'append', 6), (5, 'append', 7),
        (6, 'append', 8), (7, 'compact', 1)
      ) AS t(version, op_kind, n_files)
    ),
    slice_agg AS (
      SELECT CAST(o_orderkey % 7 AS INT) AS k,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tp
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT s.version,
             CAST(sum(a.n) AS BIGINT) AS n_rows,
             CAST(sum(a.tp) AS DOUBLE) AS total_price
      FROM spine s JOIN slice_agg a ON a.k <= LEAST(s.version, 6)
      GROUP BY s.version
    )
    SELECT CAST(s.version AS INT) AS version, s.op_kind,
           CAST(s.n_files AS INT) AS n_files, c.n_rows, c.total_price
    FROM spine s JOIN cum c USING (version)
    ORDER BY version
    """,
    ref=(
        "S13 + layout maintenance beyond the reference: snapshot-committed "
        "small-file compaction (the OPTIMIZE verb) + manifest-computed "
        "DESCRIBE HISTORY (sources/versioned.py compact/table_history; the "
        "reference's nearest analog is its batched multi-row insert, "
        "dbs/db.py:64-96, which exists to avoid tiny writes for the same "
        "reason)"
    ),
    tags=("incremental", "versioned", "layout"),
)
def q186_versioned_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An append-heavy versioned table (create + 6 single-file appends)
    bin-packed by ``compact()``, audited by ``table_history()``: one row
    per snapshot with the file count, the manifest-stats row count, and
    the per-version total revenue read through time travel.  The oracle
    pins ALL of it from first principles — op sequence, exact file counts
    (8 small files collapse to 1), cumulative row counts (metadata path)
    AND cumulative decimal revenue (data path) — so a compaction that
    lost/duplicated rows, misfiled a manifest, or failed to pack would
    hash-mismatch.  Scale shape: every history row is manifest JSON;
    only the eight per-version rollups touch data."""
    from python_async_sample_spark.sources.versioned import (
        append_versioned,
        compact,
        create_table,
        read_version,
        table_history,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_vcq_")
    root = f"{tmp}/orders_slices"
    orders = load_table(spark, sf_dir, "orders")
    slice_of = lambda k: orders.where(F.col("o_orderkey") % 7 == k)  # noqa: E731
    create_table(spark, root, slice_of(0), n_files=2)
    for k in range(1, 7):
        append_versioned(spark, root, slice_of(k), n_files=1)
    res = compact(spark, root)
    if res["produced"] >= res["compacted"]:  # loud, not silently unpacked
        raise RuntimeError(f"compaction did not reduce file count: {res}")

    rollups = None
    for v in range(8):
        one = read_version(spark, root, v).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price")
        ).select(F.lit(v).cast("int").alias("version"), "total_price")
        rollups = one if rollups is None else rollups.unionByName(one)

    return (
        table_history(spark, root)
        .join(rollups, "version")
        .select("version", "op_kind", "n_files", "n_rows", "total_price")
        .orderBy("version")
    )


@query(
    "q190_versioned_changes",
    oracle="""
    WITH del AS (
      SELECT 'delete' AS change_type, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders WHERE o_orderkey % 97 = 0 GROUP BY o_orderstatus
    ),
    ins_upd AS (
      SELECT 'insert' AS change_type, 'M' AS o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) + 1000.00) AS DOUBLE)
               AS total_price
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    ins_new AS (
      SELECT 'insert' AS change_type, 'N' AS o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) * CAST(42.42 AS DECIMAL(18,2)) AS DOUBLE) AS total_price
      FROM orders WHERE o_orderkey % 397 = 0
    )
    SELECT * FROM del UNION ALL SELECT * FROM ins_upd UNION ALL
    SELECT * FROM ins_new
    ORDER BY change_type, o_orderstatus
    """,
    ref=(
        "S11-S12 generalized to snapshot CDC: row-level changes between two "
        "manifest versions, reading ONLY the files in the manifests' "
        "symmetric difference (sources/versioned.changes_between; the "
        "incremental-read face of the reference's watermark interval "
        "extraction, dbs/nikon.py:107-145)"
    ),
    tags=("incremental", "versioned", "cdc"),
)
def q190_versioned_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q184's MERGE batch, consumed as CDC: ``changes_between(v0, v1)``
    must emit exactly the update keys' delete+insert pairs plus the new
    keys' inserts — rewritten-but-unchanged rows (the rest of each
    affected file) must CANCEL in the multiset diff.  The oracle derives
    every change row from first principles on the source table; the scale
    contract (files shared by both manifests are never read) is pinned in
    test_versioned via inputFiles."""
    from python_async_sample_spark.sources.versioned import (
        changes_between,
        create_table,
        merge_into_versioned,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_cdcq_")
    root = f"{tmp}/orders_cdc"
    orders = load_table(spark, sf_dir, "orders")
    create_table(spark, root, orders.orderBy("o_orderkey"), n_files=8)
    updates = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1000.00)).cast("double"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 397 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("o_totalprice", F.lit(42.42))
        )
    )
    merge_into_versioned(spark, root, updates, "o_orderkey")
    return (
        changes_between(spark, root, 0, 1)
        .groupBy("change_type", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("change_type", "o_orderstatus")
    )


@query(
    "q193_cdc_maintained_rollup",
    oracle="""
    WITH upd1 AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    ins1 AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
             CAST(42.42 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 397 = 0
    ),
    merged1 AS MATERIALIZED (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL SELECT * FROM upd1
      UNION ALL SELECT * FROM ins1
    ),
    upd2 AS (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 500.00 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM merged1 WHERE o_orderkey % 53 = 0
    ),
    merged2 AS MATERIALIZED (
      SELECT * FROM merged1 WHERE o_orderkey % 53 <> 0
      UNION ALL SELECT * FROM upd2
    ),
    r1 AS (
      SELECT CAST(1 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM merged1 GROUP BY o_orderstatus
    ),
    r2 AS (
      SELECT CAST(2 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM merged2 GROUP BY o_orderstatus
    )
    SELECT * FROM r1 UNION ALL SELECT * FROM r2
    ORDER BY version, o_orderstatus
    """,
    ref=(
        "incremental view maintenance over snapshot CDC (beyond "
        "reference): rollup(v_n) = rollup(v_{n-1}) + signed delta of "
        "changes_between — the base table is scanned ONCE at init, every "
        "refresh reads only the manifests' symmetric-difference files "
        "(sources/versioned.changes_between; the algebraic form of the "
        "reference's full MV recompute, dbs/nikon.py:188-197)"
    ),
    tags=("incremental", "versioned", "cdc", "rollup"),
)
def q193_cdc_maintained_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two successive MERGEs against a versioned orders table, with the
    per-status rollup maintained ALGEBRAICALLY: each refresh adds the
    signed CDC delta (insert rows +1/+price, delete rows −1/−price) to
    the previous rollup — the 100 TB base is never rescanned after init,
    and each delta reads only the rewritten files (q190's contract).
    Decimal sums keep the increments exact, so the maintained rollup
    hash-matches DuckDB recomputing both versions from first principles —
    drift between maintained and recomputed state is impossible to hide."""
    from python_async_sample_spark.sources.versioned import (
        changes_between,
        create_table,
        merge_into_versioned,
        read_version,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_ivmq_")
    root = f"{tmp}/orders_ivm"
    orders = load_table(spark, sf_dir, "orders")
    create_table(spark, root, orders.orderBy("o_orderkey"), n_files=8)

    updates1 = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1000.00)).cast("double"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 397 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("o_totalprice", F.lit(42.42))
        )
    )
    merge_into_versioned(spark, root, updates1, "o_orderkey")
    updates2 = (
        read_version(spark, root)
        .where(F.col("o_orderkey") % 53 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(500.00)).cast("double"),
        )
    )
    merge_into_versioned(spark, root, updates2, "o_orderkey")

    def rollup_signed(df: DataFrame, sign_col: F.Column) -> DataFrame:
        return df.select(
            "o_orderstatus",
            sign_col.alias("__w"),
            (F.col("o_totalprice").cast("decimal(18,2)") * sign_col.cast("decimal(3,0)"))
            .alias("__p"),
        )

    # materialize base and the first delta: r1 AND r2 both consume them,
    # and without the lineage cut the union plan re-executes the base scan
    # and the v0->v1 diff twice — breaking the "one base scan" contract
    base = rollup_signed(read_version(spark, root, 0), F.lit(1)).localCheckpoint(
        eager=False
    )  # the ONE base scan

    def delta(v_from: int, v_to: int) -> DataFrame:
        ch = changes_between(spark, root, v_from, v_to)
        return rollup_signed(
            ch, F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        )

    def finish(parts: DataFrame, version: int) -> DataFrame:
        return (
            parts.groupBy("o_orderstatus")
            .agg(
                F.sum("__w").cast("bigint").alias("n_rows"),
                F.sum("__p").cast("double").alias("total_price"),
            )
            .where(F.col("n_rows") != 0)
            .select(
                F.lit(version).cast("int").alias("version"),
                "o_orderstatus", "n_rows", "total_price",
            )
        )

    d1, d2 = delta(0, 1).localCheckpoint(eager=False), delta(1, 2)
    r1 = finish(base.unionByName(d1), 1)
    r2 = finish(base.unionByName(d1).unionByName(d2), 2)
    return r1.unionByName(r2).orderBy("version", "o_orderstatus")


@query(
    "q195_purged_time_travel",
    oracle="""
    WITH victims AS MATERIALIZED (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 211 = 0
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    merged AS MATERIALIZED (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL SELECT * FROM upd
    ),
    v0 AS (
      SELECT CAST(0 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM victims)
      GROUP BY o_orderstatus
    ),
    v1 AS (
      SELECT CAST(1 AS INT) AS version, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM merged WHERE o_orderkey NOT IN (SELECT o_orderkey FROM victims)
      GROUP BY o_orderstatus
    )
    SELECT * FROM v0 UNION ALL SELECT * FROM v1
    ORDER BY version, o_orderstatus
    """,
    ref=(
        "right-to-be-forgotten across snapshot history (beyond reference): "
        "purge_keys rewrites every manifest's affected files atomically so "
        "NO version — time travel included — serves the erased keys "
        "(sources/versioned.purge_keys); the reference's delete-then-insert "
        "idempotency window (dbs/nikon.py:117-145) erases from the present "
        "only, which is exactly what an erasure request forbids"
    ),
    tags=("incremental", "versioned", "governance"),
)
def q195_purged_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A MERGE creates history, then ``purge_keys`` erases the victim keys
    from BOTH snapshots in place; the output rolls up version 0 AND the
    head after the purge, and the oracle recomputes both from first
    principles with the victims excluded — a purge that left a row in
    ANY version (or touched a non-victim row) hash-mismatches.  The
    victim list is driver-sized by contract (an erasure request), and
    each affected file rewrites once across all manifests."""
    from python_async_sample_spark.sources.versioned import (
        create_table,
        merge_into_versioned,
        purge_keys,
        read_version,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_prgq_")
    root = f"{tmp}/orders_purge"
    orders = load_table(spark, sf_dir, "orders")
    create_table(spark, root, orders.orderBy("o_orderkey"), n_files=8)
    updates = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("M"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1000.00)).cast("double"),
        )
    )
    merge_into_versioned(spark, root, updates, "o_orderkey")
    victims = [
        r[0]
        for r in orders.where(F.col("o_orderkey") % 211 == 0)
        .select("o_orderkey")
        .collect()
    ]
    purge_keys(spark, root, "o_orderkey", victims)

    def rollup(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        ).select(
            F.lit(version).cast("int").alias("version"),
            "o_orderstatus", "n_rows", "total_price",
        )

    return (
        rollup(read_version(spark, root, 0), 0)
        .unionByName(rollup(read_version(spark, root, 1), 1))
        .orderBy("version", "o_orderstatus")
    )
