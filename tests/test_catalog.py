"""Atomic multi-table catalog: consistent pins, crash window, races,
multi-table time travel, dangling-pin refusal."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from python_async_sample_spark.sources.catalog import (
    catalog_commit,
    catalog_create,
    catalog_current,
    catalog_read,
    catalog_versions,
)
from python_async_sample_spark.sources.versioned import (
    ConcurrentWriteError,
    create_table,
    merge_into_versioned,
)


@pytest.fixture
def roots():
    tmp = tempfile.mkdtemp(prefix="spark_graft_cat_")
    yield f"{tmp}/hdr", f"{tmp}/det", f"{tmp}/cat"
    shutil.rmtree(tmp, ignore_errors=True)


def _pair(spark, roots):
    hdr_root, det_root, cat_root = roots
    hdr = spark.createDataFrame([(1, "O"), (2, "O")], "k bigint, status string")
    det = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 30.0)], "k bigint, amount double"
    )
    create_table(spark, hdr_root, hdr, n_files=1)
    create_table(spark, det_root, det, n_files=1)
    catalog_create(cat_root, {"header": hdr_root, "detail": det_root})
    return hdr_root, det_root, cat_root


def test_crash_between_table_and_catalog_commit_serves_old_pair(spark, roots):
    """Tables committed, catalog NOT yet flipped: every catalog read still
    sees the old consistent pair; the flip completes the batch later."""
    hdr_root, det_root, cat_root = _pair(spark, roots)
    h1 = merge_into_versioned(
        spark, hdr_root,
        spark.createDataFrame([(1, "M")], "k bigint, status string"), "k",
    )["version"]
    d1 = merge_into_versioned(
        spark, det_root,
        spark.createDataFrame([(1, 99.0)], "k bigint, amount double"), "k",
    )["version"]
    # crash here: both table heads moved, catalog still v0
    assert catalog_read(spark, cat_root, "header").where("status = 'M'").count() == 0
    assert catalog_read(spark, cat_root, "detail").where("amount = 99.0").count() == 0
    # recovery: re-running the writer just flips the catalog
    catalog_commit(cat_root, {"header": h1, "detail": d1})
    assert catalog_read(spark, cat_root, "header").where("status = 'M'").count() == 1
    assert catalog_read(spark, cat_root, "detail").where("amount = 99.0").count() == 1
    # multi-table time travel: catalog v0 still serves the original pair
    assert catalog_read(spark, cat_root, "header", 0).where("status = 'M'").count() == 0


def test_catalog_commit_races_lose_cleanly(spark, roots):
    hdr_root, det_root, cat_root = _pair(spark, roots)
    from python_async_sample_spark.sources import catalog as C

    m = C._read_cat(cat_root, 0)
    C._link_cat(cat_root, {"version": 1, "parent": 0, "pins": m["pins"]}, 1)
    # a second committer that also read v0 must lose
    with pytest.raises(ConcurrentWriteError):
        C._link_cat(cat_root, {"version": 1, "parent": 0, "pins": m["pins"]}, 1)
    assert catalog_versions(cat_root) == [0, 1]


def test_catalog_refuses_dangling_and_unknown_pins(spark, roots):
    hdr_root, det_root, cat_root = _pair(spark, roots)
    with pytest.raises(ValueError, match="never committed or vacuumed"):
        catalog_commit(cat_root, {"header": 5})
    with pytest.raises(ValueError, match="never committed or vacuumed"):
        catalog_commit(cat_root, {"header": -1})
    with pytest.raises(KeyError):
        catalog_commit(cat_root, {"nope": 0})
    assert catalog_current(cat_root) == 0  # nothing committed


def test_decimal_widening_batch_cannot_corrupt_table(spark, roots):
    """Regression: Spark silently widens decimal arithmetic
    (decimal(18,2) + literal → decimal(19,2)); a staged file written at
    the wider type is unreadable under the manifest's pinned schema
    (INT64 vs FIXED_LEN_BYTE_ARRAY). The write verbs must conform batches
    to the manifest schema, so the merged table reads back cleanly."""
    hdr_root, det_root, cat_root = roots
    df = spark.createDataFrame([(1, "10.00"), (2, "20.00")], "k bigint, v string")
    df = df.select("k", F.col("v").cast("decimal(18,2)").alias("v"))
    create_table(spark, hdr_root, df, n_files=1)
    widened = df.where("k = 1").withColumn(
        "v", F.col("v") + F.lit(5).cast("decimal(18,2)")  # decimal(19,2)!
    )
    merge_into_versioned(spark, hdr_root, widened, "k")
    from python_async_sample_spark.sources.versioned import (
        append_versioned,
        read_version,
    )

    append_versioned(spark, hdr_root, widened.withColumn("k", F.lit(3)))
    got = read_version(spark, hdr_root)
    assert got.count() == 3  # readable — no physical-type drift
    assert got.schema["v"].dataType.simpleString() == "decimal(18,2)"


def test_pinned_versions_reports_vacuum_keep_set(spark, roots):
    hdr_root, det_root, cat_root = _pair(spark, roots)
    from python_async_sample_spark.sources.catalog import pinned_versions

    h1 = merge_into_versioned(
        spark, hdr_root,
        spark.createDataFrame([(1, "M")], "k bigint, status string"), "k",
    )["version"]
    catalog_commit(cat_root, {"header": h1})
    # catalog v0 pins header v0; catalog v1 pins header v1 — both retained
    assert pinned_versions(cat_root, "header") == {0, 1}
    assert pinned_versions(cat_root, "detail") == {0}


def test_vacuum_honors_catalog_pins(spark, roots):
    """versioned.vacuum(keep_versions=pinned_versions(...)) must keep a
    version an old catalog snapshot still pins — multi-table time travel
    survives table-level retention; without the keep-set the same vacuum
    would drop it (the failure mode the retention note documents)."""
    from python_async_sample_spark.sources.catalog import pinned_versions
    from python_async_sample_spark.sources.versioned import (
        read_version,
        table_versions,
        vacuum,
    )

    hdr_root, det_root, cat_root = _pair(spark, roots)
    for s in ("A", "B"):
        v = merge_into_versioned(
            spark, hdr_root,
            spark.createDataFrame([(1, s)], "k bigint, status string"), "k",
        )["version"]
        catalog_commit(cat_root, {"header": v})
    # catalog pins header v0, v1, v2; plain keep_last=1 would keep only v2
    pins = pinned_versions(cat_root, "header")
    assert pins == {0, 1, 2}
    res = vacuum(hdr_root, keep_last=1, grace_seconds=0, keep_versions=pins)
    assert table_versions(hdr_root) == [0, 1, 2]  # all pinned → all kept
    # every catalog snapshot still resolves
    for cv in (0, 1, 2):
        assert catalog_read(spark, cat_root, "header", cv).count() == 2
    # drop the oldest catalog snapshot's pin and vacuum again: v0 goes
    res = vacuum(hdr_root, keep_last=1, grace_seconds=0, keep_versions={1, 2})
    assert table_versions(hdr_root) == [1, 2]
    assert read_version(spark, hdr_root, 2).count() == 2


def _state_pair(spark, roots):
    """header/detail tables whose every row carries a batch-state integer;
    a coordinated batch k moves BOTH tables' every key to state k, so any
    snapshot's consistency is checkable as 'one state, same on both'."""
    hdr_root, det_root, cat_root = roots
    hdr = spark.createDataFrame([(1, 0), (2, 0)], "k bigint, state int")
    det = spark.createDataFrame([(1, 0), (2, 0)], "k bigint, state int")
    create_table(spark, hdr_root, hdr, n_files=1)
    create_table(spark, det_root, det, n_files=1)
    catalog_create(cat_root, {"header": hdr_root, "detail": det_root})
    return hdr_root, det_root, cat_root


def _states(spark, cat_root, version=None):
    h = {r["state"] for r in catalog_read(spark, cat_root, "header", version).collect()}
    d = {r["state"] for r in catalog_read(spark, cat_root, "detail", version).collect()}
    return h, d


def _assert_consistent(h, d, where):
    assert len(h) == 1 and h == d, f"torn pair {where}: header={h} detail={d}"


def test_catalog_reader_consistent_at_every_interleaving_point(spark, roots):
    """VERDICT r7 item 8 (deterministic sweep): a reader resolving through
    the catalog must see a consistent header/detail pair at EVERY point of
    the writer protocol — after the header table commits, after the detail
    table commits, and after the flip — across several rounds. The
    pre-flip points are exactly the states a racing reader can land on."""
    hdr_root, det_root, cat_root = _state_pair(spark, roots)
    for k in range(1, 5):
        batch = spark.createDataFrame([(1, k), (2, k)], "k bigint, state int")
        h_v = merge_into_versioned(spark, hdr_root, batch, "k")["version"]
        _assert_consistent(*_states(spark, cat_root), where=f"round {k} after header commit")
        d_v = merge_into_versioned(spark, det_root, batch, "k")["version"]
        _assert_consistent(*_states(spark, cat_root), where=f"round {k} after detail commit")
        # pre-flip, the pair must still be the PREVIOUS round's state
        h, d = _states(spark, cat_root)
        assert h == {k - 1}, f"round {k}: pre-flip reader saw {h}"
        catalog_commit(cat_root, {"header": h_v, "detail": d_v})
        h, d = _states(spark, cat_root)
        _assert_consistent(h, d, where=f"round {k} after flip")
        assert h == {k}
    # and travel: every retained catalog version replays its own pair
    for v in catalog_versions(cat_root):
        h, d = _states(spark, cat_root, v)
        _assert_consistent(h, d, where=f"catalog v{v}")
        assert h == {v}


def test_catalog_racing_reader_thread_never_sees_torn_pair(spark, roots):
    """VERDICT r7 item 8 (live race): a reader thread hammering
    catalog_read(current) while the writer runs coordinated rounds must
    never observe header state != detail state — the S9 analog of the
    round-7 restore-race test. Each observation pins (version, header
    states, detail states); all are asserted after the writer finishes so
    a torn read cannot hide behind thread timing."""
    import threading

    hdr_root, det_root, cat_root = _state_pair(spark, roots)
    observations: list[tuple[int, frozenset, frozenset]] = []
    stop = threading.Event()
    errors: list[BaseException] = []

    def reader():
        try:
            while not stop.is_set():
                v = catalog_current(cat_root)
                h, d = _states(spark, cat_root, v)
                observations.append((v, frozenset(h), frozenset(d)))
        except BaseException as e:  # surface in the main thread
            errors.append(e)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for k in range(1, 4):
            batch = spark.createDataFrame([(1, k), (2, k)], "k bigint, state int")
            h_v = merge_into_versioned(spark, hdr_root, batch, "k")["version"]
            d_v = merge_into_versioned(spark, det_root, batch, "k")["version"]
            catalog_commit(cat_root, {"header": h_v, "detail": d_v})
    finally:
        stop.set()
        t.join(timeout=120)
    assert not errors, errors
    assert observations, "reader thread never completed a read"
    for v, h, d in observations:
        assert len(h) == 1 and h == d, f"torn pair at catalog v{v}: {h} vs {d}"
        assert h == {v}, f"catalog v{v} served state {h}"
