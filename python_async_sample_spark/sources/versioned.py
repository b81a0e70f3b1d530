"""Manifest-versioned parquet tables: atomic snapshots, time travel,
optimistic concurrency — the Iceberg/Delta discipline distilled to its
load-bearing core on plain parquet + POSIX primitives.

The in-place verbs (``layout.delete_keys`` / ``layout.merge_into``) carry a
documented crash window: staged files move IN before originals leave, so a
crash (or a concurrent reader) can observe duplicated rows.  Versioning
removes the window entirely:

* data files are IMMUTABLE once written — a snapshot is a MANIFEST (a JSON
  list of file names + the schema), never the directory listing;
* a commit creates the next manifest with ``os.link`` from a fully-written
  temp file — create-exclusive AND all-or-nothing, so readers can never
  observe a half-written manifest, and two racing writers cannot both win
  the same version (the loser's ``link`` raises and it must rebase);
* nothing is ever deleted at write time; :func:`vacuum` later removes only
  files unreachable from every retained manifest.

A crash at ANY step leaves every committed snapshot intact and readable:
while staging or moving data files the new files are orphans no manifest
references (vacuum reclaims them); before the manifest link lands the
commit simply never happened; after, it fully happened.  Re-running the
interrupted verb is always safe, and readers are never exposed to an
intermediate state — strictly stronger than the in-place verbs'
"duplicates, never loss".

Multiple writers are detected, not assumed away: the exclusive manifest
create is the commit lock on any namespace with atomic link/create
(POSIX, HDFS).  Object stores without an atomic create need a coordination
layer — the same documented porting seam as ``layout._require_local_path``.

Reference tie-in: the reference's watermark table + delete-then-insert
window (dbs/nikon.py:107-186) hand-rolls "readers see either the old or
the new interval"; the manifest generalizes that contract from one
interval to the whole table.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_async_sample_spark.sources.layout import (
    _prune_files_by_key_stats,
    _require_local_path,
)
from python_async_sample_spark.sources.readers import pin_reader_conf

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first — rebase and retry."""


def _manifest_path(root: str, version: int) -> str:
    return f"{root}/{_MANIFEST_DIR}/v{version:07d}.json"


def table_versions(root: str) -> list[int]:
    """All committed versions, ascending. Only fully-committed manifests
    are visible by construction (exclusive-link commit)."""
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(f"{root.rstrip('/')}/{_MANIFEST_DIR}/v*.json")
    )


def current_version(root: str) -> int:
    versions = table_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed manifest under {root!r}")
    return versions[-1]


def _read_manifest(root: str, version: int) -> dict:
    path = _manifest_path(root.rstrip("/"), version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"version {version} of {root!r} does not exist (committed: "
            f"{table_versions(root)}; it may have been vacuumed)"
        )
    with open(path, encoding="ascii") as fh:
        return json.load(fh)


def _stage_files(
    df: DataFrame, root: str, n_files: int, layout_col=None
) -> list[str]:
    """Write ``df`` as ``n_files`` immutable data files and return their
    data-dir-relative names.  Files are moved under ``data/`` with fresh
    uuid names BEFORE any manifest references them, so a crash here leaves
    only unreferenced orphans — invisible to every reader, reclaimed by
    :func:`vacuum`.

    ``layout_col`` clusters the write: range-partitioned and sorted within
    each file on that column, so the per-file [min, max] stats embedded in
    the manifest become DISJOINT ranges and keyed scans/merges prune to a
    handful of files (the plain ``repartition`` default gives every file
    the full key range — correct, but stats-pruning can then never drop
    anything).  A Column EXPRESSION also works (e.g. a Morton code over
    two columns — :func:`rewrite_layout`): the expression orders the
    write but is never stored."""
    stage = f"{root}/.stage-{uuid.uuid4().hex}"
    shaped = (
        df.repartitionByRange(max(1, n_files), layout_col).sortWithinPartitions(layout_col)
        if layout_col is not None
        else df.repartition(max(1, n_files))
    )
    shaped.write.mode("overwrite").parquet(stage)
    os.makedirs(f"{root}/{_DATA_DIR}", exist_ok=True)
    names = []
    for f in sorted(glob.glob(f"{stage}/part-*.parquet")):
        name = f"part-{uuid.uuid4().hex}.parquet"
        shutil.move(f, f"{root}/{_DATA_DIR}/{name}")
        names.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return names


def _collect_file_stats(root: str, names: list[str]) -> dict:
    """Per-file row count + min/max per primitive column, read ONCE from
    the freshly staged local footers and embedded in the manifest.  At
    100 TB this is the difference between planning a keyed MERGE/DELETE
    from the manifest (one small JSON read) and opening every data file's
    footer over the network (Iceberg keeps file stats in manifests for
    exactly this reason).  Columns whose footer lacks statistics in any
    row group, or whose min/max is not a JSON scalar (int/float/str), are
    simply omitted — readers treat a missing column range as
    "conservatively affected", never as "prunable"."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for n in names:
        meta = pq.read_metadata(f"{root}/{_DATA_DIR}/{n}")
        cols: dict[str, list] = {}
        bad: set[str] = set()
        for rg in range(meta.num_row_groups):
            for i in range(meta.num_columns):
                c = meta.row_group(rg).column(i)
                name = c.path_in_schema
                if name in bad or "." in name:  # nested: skip
                    continue
                try:
                    st = c.statistics
                    lo, hi = (None, None) if st is None else (st.min, st.max)
                except Exception:
                    # pyarrow RAISES (ArrowNotImplementedError) for types it
                    # can't summarize (e.g. DECIMAL min/max) rather than
                    # returning None — same contract as missing stats:
                    # unsummarizable, the column range is treated as
                    # conservatively affected
                    lo, hi = None, None
                if (
                    lo is None
                    or hi is None
                    or not isinstance(lo, (int, float, str))
                    or isinstance(lo, bool)
                    # a NaN bound poisons every range comparison (x <= NaN
                    # is False), which would mark the file UNAFFECTED and
                    # silently skip keyed rewrites — unsummarizable instead
                    or (isinstance(lo, float) and lo != lo)
                    or (isinstance(hi, float) and hi != hi)
                ):
                    bad.add(name)
                    cols.pop(name, None)
                    continue
                if name in cols:
                    cols[name][0] = min(cols[name][0], lo)
                    cols[name][1] = max(cols[name][1], hi)
                else:
                    cols[name] = [lo, hi]
        out[n] = {"rows": meta.num_rows, "cols": cols}
    return out


def _carry_stats(manifest: dict, kept: list[str], new_stats: dict) -> dict:
    """Stats for a child manifest: inherited entries for kept files (they
    are immutable, so their stats never change) plus the new files'."""
    parent = manifest.get("stats") or {}
    out = {n: parent[n] for n in kept if n in parent}
    out.update(new_stats)
    return out


def _affected_from_manifest(
    manifest: dict, key_col: str, targets: list
) -> tuple[list[str], int] | None:
    """Manifest-stats twin of ``layout._prune_files_by_key_stats``: the
    file names whose recorded [min, max] range can contain ANY target key,
    plus their total rows — zero footer reads.  ``targets`` must be SORTED:
    each file costs one binary search (O(files · log keys) total driver
    CPU), so a million-key purge list stays sub-second where a linear
    ``any(lo <= k <= hi)`` scan per file was O(files · keys).  Returns
    None when any file lacks a recorded range for ``key_col`` (legacy
    manifest, or a column the footers couldn't summarize) so the caller
    falls back to footers; a partial answer would be unsound, not just
    slow."""
    from bisect import bisect_left

    stats = manifest.get("stats") or {}
    affected, rows = [], 0
    for n in manifest["files"]:
        ent = stats.get(n)
        if ent is not None and ent["rows"] == 0:
            continue  # an empty file contains no keys (it has no column
            # ranges either — zero row groups — so don't mistake that for
            # "stats missing")
        rng = ent["cols"].get(key_col) if ent else None
        if rng is None:
            return None
        lo, hi = rng
        i = bisect_left(targets, lo)
        if i < len(targets) and targets[i] <= hi:
            affected.append(n)
            rows += ent["rows"]
    return affected, rows


def _file_ranges_from_manifest(
    manifest: dict, key_col: str
) -> list[tuple[str, object, object, int]] | None:
    """Per-file ``(name, lo, hi, rows)`` for ``key_col`` from the
    manifest's embedded stats, empty files skipped.  None when any file
    lacks a recorded range (legacy manifest) — the caller falls back to
    parquet footers."""
    stats = manifest.get("stats") or {}
    out = []
    for n in manifest["files"]:
        ent = stats.get(n)
        if ent is not None and ent["rows"] == 0:
            continue
        rng = ent["cols"].get(key_col) if ent else None
        if rng is None:
            return None
        out.append((n, rng[0], rng[1], ent["rows"]))
    return out


# Above this many candidate files, _affected_via_range_join spends one
# cheap min/max action to span-prune ranges before broadcasting them into
# the nested-loop join (cost model in the docstring below).
_RANGE_JOIN_PREFILTER_FILES = 4096


def _affected_via_range_join(
    spark: SparkSession,
    batch: DataFrame,
    key_col: str,
    ranges: list[tuple[str, object, object, int]],
) -> tuple[list[str], int]:
    """Which candidate files contain at least one batch key — computed
    DISTRIBUTEDLY, so the driver never holds the batch's keys.  The file
    ranges (O(files), already driver-resident from the manifest) become a
    small broadcast relation; one join against the batch's keys marks each
    file hit/miss, and only the HIT FILE NAMES come back — O(files
    rewritten) driver rows, however many distinct keys the CDC batch
    carries.  This is the planning path for MERGE-shaped verbs whose key
    set lives in a DataFrame; list-keyed verbs (point DELETE / purge) keep
    the driver-side binary-search prune, where the caller already owns the
    key list.

    COST MODEL: the non-equi range condition executes as a broadcast
    nested-loop join — O(broadcast ranges × batch rows) comparisons,
    executor-side and partition-parallel.  That is the right trade for
    CDC-sized batches against compaction-bounded file counts (the verbs
    that call this also run :func:`compact_versioned`); when the file
    count is large the driver pre-filters the ranges against the batch's
    GLOBAL key span first — one 2-scalar aggregate action, O(files)
    driver work on rows it already holds — so only span-overlapping
    ranges enter the broadcast.  scripts/scale_probe.py pins that the
    driver-resident planning state stays O(files) as data scales."""
    if not ranges:
        return [], 0
    if len(ranges) > _RANGE_JOIN_PREFILTER_FILES:
        kmin, kmax = batch.select(
            F.min(key_col), F.max(key_col)
        ).first()
        if kmin is None:  # all-NULL / empty batch: no file can be hit
            return [], 0
        ranges = [r for r in ranges if not (r[2] < kmin or r[1] > kmax)]
        if not ranges:
            return [], 0
    rows_by_name = {n: r for n, _, _, r in ranges}
    hits = _range_join_hits_plan(spark, batch, key_col, ranges).collect()
    names = sorted(r["__file"] for r in hits)
    return names, sum(rows_by_name[n] for n in names)


def _range_join_hits_plan(
    spark: SparkSession,
    batch: DataFrame,
    key_col: str,
    ranges: list[tuple[str, object, object, int]],
) -> DataFrame:
    """The planning join itself, returned UNCOLLECTED so
    tests/test_plan_quality.py can gate its physical shape: the O(files)
    ranges relation must be the BROADCAST side of the (intentional)
    BroadcastNestedLoopJoin — broadcasting the batch would ship the CDC
    data to every task and cap batch size at the broadcast limit."""
    # Pure-JVM LocalRelation when the bounds have exact SQL literal forms:
    # a createDataFrame over a Python list is a pickled RDD whose broadcast
    # build is a defaultParallelism-task Python job on EVERY plan that
    # references it; a VALUES relation broadcast-collects on the driver with
    # no job at all (same rationale as layout.build_victims_df).
    from python_async_sample_spark.sources.layout import _sql_key_literals

    names_l = _sql_key_literals([n for n, _, _, _ in ranges])
    lo_l = _sql_key_literals([lo for _, lo, _, _ in ranges])
    hi_l = _sql_key_literals([hi for _, _, hi, _ in ranges])
    if names_l is not None and lo_l is not None and hi_l is not None:
        vals = ",".join(f"({n},{lo},{hi})" for n, lo, hi in zip(names_l, lo_l, hi_l))
        rng_df = spark.sql(f"SELECT * FROM VALUES {vals} AS __rng(__file, __lo, __hi)")
    else:
        rng_df = spark.createDataFrame(
            [(n, lo, hi) for n, lo, hi, _ in ranges], ["__file", "__lo", "__hi"]
        )
    return (
        batch.select(F.col(key_col).alias("__k"))
        .where(F.col("__k").isNotNull())
        .join(
            F.broadcast(rng_df),
            (F.col("__k") >= F.col("__lo")) & (F.col("__k") <= F.col("__hi")),
        )
        .select("__file")
        .distinct()
    )


_CARRY_CHECKS = object()  # sentinel: inherit the parent manifest's checks


def _commit(
    root: str,
    files: list[str],
    schema_json: str,
    op: str,
    parent: int | None,
    epochs: dict[str, str] | None = None,
    stats: dict | None = None,
    checks=_CARRY_CHECKS,
    dropped=_CARRY_CHECKS,
) -> int:
    """Atomically publish the next manifest.  The JSON is fully written to
    a temp file first; ``os.link`` then both creates the final name
    EXCLUSIVELY (two writers racing for the same version — one loses with
    :class:`ConcurrentWriteError`) and makes the complete content visible
    in one step (no reader can open a torn manifest).

    ``epochs`` is the exactly-once stream ledger (epoch id → batch
    fingerprint) carried FORWARD into every child manifest, so replay
    detection survives :func:`vacuum` dropping the ancestor manifests that
    originally recorded each epoch."""
    version = 0 if parent is None else parent + 1
    if checks is _CARRY_CHECKS or dropped is _CARRY_CHECKS:
        parent_m = _read_manifest(root, parent) if parent is not None else {}
        if checks is _CARRY_CHECKS:
            # CHECK constraints persist across every verb unless explicitly
            # replaced (set_check_constraints) — same carry contract as the
            # epoch ledger, resolved here so no call site can forget it
            checks = parent_m.get("checks", [])
        if dropped is _CARRY_CHECKS:
            # dropped-column ledger likewise carries forever: add_column
            # consults it to refuse resurrecting a name whose values still
            # live in pre-drop data files (no column-mapping layer here)
            dropped = parent_m.get("dropped", [])
    mdir = f"{root}/{_MANIFEST_DIR}"
    os.makedirs(mdir, exist_ok=True)
    # commit wall-clock, clamped to the parent's so AS-OF-timestamp
    # resolution stays monotone in version order even under clock
    # adjustment (Delta reads file mtimes and carries the same caveat;
    # recording it in the manifest survives copies/backups that reset
    # mtimes)
    committed_at = time.time()
    if parent is not None:
        try:
            committed_at = max(
                committed_at, _read_manifest(root, parent).get("committed_at", 0.0)
            )
        except FileNotFoundError:
            pass  # vacuumed parent: nothing to clamp against
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "schema": schema_json,
        "epochs": dict(epochs or {}),
        "stats": dict(stats or {}),
        "checks": list(checks or []),
        "dropped": sorted(dropped or []),
        "committed_at": committed_at,
    }
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="ascii") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _manifest_path(root, version))
        except FileExistsError as ex:
            raise ConcurrentWriteError(
                f"version {version} of {root!r} was committed by another "
                "writer after this one read its parent snapshot — rebase "
                "on the new current version and retry"
            ) from ex
    finally:
        os.unlink(tmp)
    return version


def _drop_keys(spark: SparkSession, df: DataFrame, key_col: str, targets: list) -> DataFrame:
    """NULL-safe removal of target-key rows — delegates to the single
    shared anti-join helper (``layout._drop_keys_anti``) so the NULL/NaN/
    type-coercion semantics live in exactly one place."""
    from python_async_sample_spark.sources.layout import _drop_keys_anti

    return _drop_keys_anti(spark, df, key_col, targets)


def create_table(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    n_files: int = 4,
    layout_col=None,
) -> int:
    """Materialize ``df`` as version 0 of a new versioned table.
    ``layout_col`` writes the files key-clustered (disjoint per-file
    ranges) so manifest-stats pruning has something to prune — see
    :func:`_stage_files`."""
    _require_local_path(root, "create_table")
    root = root.rstrip("/")
    if table_versions(root):
        raise FileExistsError(f"versioned table already exists at {root!r}")
    os.makedirs(root, exist_ok=True)
    files = _stage_files(df, root, n_files, layout_col=layout_col)
    return _commit(
        root, files, df.schema.json(), "create", parent=None,
        stats=_collect_file_stats(root, files),
    )


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The snapshot AS OF ``version`` (default: current).  Reads exactly
    the manifest's file list — never the directory listing, so concurrent
    commits, orphaned stage files and pending vacuums are all invisible.

    The read is pinned to the MANIFEST's schema, not whatever the files
    carry: a data file written before an :func:`add_column` commit lacks
    the evolved column and surfaces it as NULL (Iceberg's null-fill
    contract), and time travel to a pre-evolution version reads with that
    version's schema — the column does not exist there at all."""
    pin_reader_conf(spark)
    root = root.rstrip("/")
    manifest = _read_manifest(root, current_version(root) if version is None else version)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if not manifest["files"]:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[f"{root}/{_DATA_DIR}/{name}" for name in manifest["files"]]
    )


def prune_files_for_box(
    root: str, preds: dict, version: int | None = None
) -> tuple[list[str], int, int]:
    """Multi-column scan planning off the manifest: the data files whose
    recorded ``[min, max]`` overlaps EVERY column's ``[lo, hi]`` in
    ``preds`` (a conjunctive box predicate), plus the total file count —
    zero footer or data reads.  One dimension is :func:`prune_files_for_range`;
    two dimensions over a :func:`rewrite_layout`-ed (Z-ordered) table is
    the OPTIMIZE-ZORDER payoff: every file covers a small rectangle, so a
    box touching 1/32 of the key area reads ~1/32 of the files.

    Sound, not just fast: a file missing a recorded range for ANY predicate
    column is included (missing evidence can only widen the read set, never
    shrink the result).  Empty files are skipped — they contain no rows.

    Returns ``(picked, total_files, resolved_version)`` — pass the
    resolved version to :func:`read_box` along with ``picked`` so the
    prune and the read pin the SAME snapshot (re-resolving at read time
    would let a concurrent commit land in between and produce a
    mixed-snapshot read)."""
    root = root.rstrip("/")
    version = current_version(root) if version is None else version
    manifest = _read_manifest(root, version)
    stats = manifest.get("stats") or {}
    picked = []
    for n in manifest["files"]:
        ent = stats.get(n)
        if ent is not None and ent["rows"] == 0:
            continue
        keep = True
        for col, (lo, hi) in preds.items():
            rng = ent["cols"].get(col) if ent else None
            if rng is None:
                continue  # no evidence — cannot exclude on this column
            if not (rng[0] <= hi and lo <= rng[1]):
                keep = False
                break
        if keep:
            picked.append(n)
    return picked, len(manifest["files"]), version


def read_box(
    spark: SparkSession,
    root: str,
    preds: dict,
    version: int | None = None,
    picked: list[str] | None = None,
) -> DataFrame:
    """Conjunctive BETWEEN scan planned from the manifest: file pruning via
    :func:`prune_files_for_box`, then the residual filters on the surviving
    files (pruning admits a superset; the filter plus parquet row-group
    pushdown make it exact).  NULL keys never match, matching SQL BETWEEN.

    The version is resolved ONCE and pins both the schema and the prune —
    resolving twice would let a concurrent commit land in between and
    produce a mixed-snapshot read that exists in no committed version.
    ``picked`` short-circuits the prune when the caller already planned
    the file set (e.g. for a pruning-ratio guard) — it must come from
    :func:`prune_files_for_box` at the SAME version, so passing it
    REQUIRES the version that prune resolved (its third return value):
    re-resolving current_version here would let a concurrent commit land
    between the prune and the read and produce a mixed-snapshot read
    (old version's files, new version's schema) that exists in no
    committed snapshot."""
    pin_reader_conf(spark)
    root = root.rstrip("/")
    if picked is not None and version is None:
        raise ValueError(
            "read_box: `picked` requires the version it was pruned at "
            "(prune_files_for_box returns it) — resolving the current "
            "version here could span two snapshots"
        )
    version = current_version(root) if version is None else version
    manifest = _read_manifest(root, version)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if picked is None:
        picked, _total, _v = prune_files_for_box(root, preds, version)
    if not picked:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(
        *[f"{root}/{_DATA_DIR}/{name}" for name in picked]
    )
    for col, (lo, hi) in preds.items():
        df = df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
    return df


def rewrite_layout(
    spark: SparkSession,
    root: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
) -> int:
    """OPTIMIZE ... ZORDER BY (x, y) as a snapshot commit: rewrite the
    current snapshot's rows clustered along the Morton curve of the two
    columns (``layout.morton2`` — the same bit-interleave q108 pins), so
    the manifest's per-file stats become small RECTANGLES in both
    dimensions and :func:`prune_files_for_box` can prune box predicates on
    either or both.  Rows are preserved exactly; old versions stay
    time-travelable until :func:`vacuum`; a concurrent commit surfaces as
    :class:`ConcurrentWriteError` (standard rebase-and-retry).  Columns
    participate in the curve modulo 2^16 — quantize wider domains first,
    as production Z-order implementations do."""
    from python_async_sample_spark.sources.layout import morton2

    root = root.rstrip("/")
    _require_local_path(root, "rewrite_layout")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    df = read_version(spark, root, parent)
    z = morton2(F.col(x_col), F.col(y_col))
    new_names = _stage_files(df, root, n_files, layout_col=z)
    return _commit(
        root,
        new_names,
        manifest["schema"],
        f"zorder:{x_col},{y_col}",
        parent,
        epochs=manifest.get("epochs"),
        stats=_collect_file_stats(root, new_names),
    )


def prune_files_for_range(
    root: str, key_col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int, int]:
    """Scan planning off the manifest alone: the data files whose recorded
    ``[min, max]`` for ``key_col`` overlaps ``[lo, hi]``, plus the total
    file count — ZERO footer or data reads.  This is the read-side twin of
    the keyed MERGE/DELETE pruning (:func:`_affected_from_manifest`), and
    the reason manifests embed per-file column stats at all: at 100 TB a
    keyed range scan that plans from one small JSON touches a handful of
    files instead of opening a million footers over the network.

    Sound, not just fast: any file missing a recorded range for
    ``key_col`` (legacy manifest, unsummarizable column type, all-NULL
    column) is INCLUDED — a skipped maybe-match would silently drop rows.
    Empty files (rows == 0) are skipped; they contain no keys.

    Returns ``(picked, total_files, resolved_version)`` — same contract
    as :func:`prune_files_for_box`."""
    return prune_files_for_box(root, {key_col: (lo, hi)}, version)


def read_keyed_range(
    spark: SparkSession, root: str, key_col: str, lo, hi, version: int | None = None
) -> DataFrame:
    """``SELECT * WHERE key BETWEEN lo AND hi`` planned from the manifest —
    the one-column face of :func:`read_box` (delegates; same single-
    version-resolution snapshot guarantee)."""
    return read_box(spark, root, {key_col: (lo, hi)}, version)


def add_file_blooms(
    spark: SparkSession,
    root: str,
    col: str,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> int:
    """Embed a per-file Bloom filter over ``col`` in the manifest — point-
    lookup file skipping for columns the clustered layout does NOT order
    (min/max ranges on a scattered column cover everything and prune
    nothing; Parquet/Iceberg attach column blooms for exactly this case).
    One distributed pass builds every file's filter (explode k portable
    hashes, bit_or per (file, word)); the driver collects at most
    ``n_files * m_bits/64`` words into the new manifest — metadata-sized,
    independent of row count.  Uses the PORTABLE hash so the driver-side
    probe (:func:`prune_files_for_points`) replays bits exactly.

    Commits a metadata-only snapshot (same files, same schema).  NULL
    values set no bits — point lookups never match NULL anyway."""
    from python_async_sample_spark.operators.bloom import _bit_positions
    from python_async_sample_spark.operators.sketches import portable_hash

    root = root.rstrip("/")
    _require_local_path(root, "add_file_blooms")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if col not in schema.fieldNames():
        raise ValueError(f"column {col!r} not in table schema")
    paths = [f"{root}/{_DATA_DIR}/{n}" for n in manifest["files"]]
    if paths:
        rows = (
            spark.read.schema(schema)
            .parquet(*paths)
            .where(F.col(col).isNotNull())
            .select(
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__f"),
                F.explode(
                    _bit_positions(
                        F.col(col).cast("long"), k, m_bits, hash_fn=portable_hash
                    )
                ).alias("b"),
            )
            .groupBy("__f", F.col("b.word").alias("word"))
            .agg(F.bit_or("b.mask").alias("mask"))
            .collect()
        )
    else:
        rows = []
    by_file: dict[str, dict[str, int]] = {}
    for r in rows:
        by_file.setdefault(r["__f"], {})[str(r["word"])] = r["mask"]
    stats = {n: dict(ent) for n, ent in (manifest.get("stats") or {}).items()}
    # legacy manifests (no embedded stats) get REAL footer stats for the
    # files we touch — a fabricated {"rows": None} placeholder would crash
    # every consumer that sums row counts (table_history)
    missing = [n for n in manifest["files"] if n not in stats]
    if missing:
        stats.update(_collect_file_stats(root, missing))
    for n in manifest["files"]:
        ent = stats[n]
        blooms = dict(ent.get("blooms") or {})
        blooms[col] = {"m": m_bits, "k": k, "words": by_file.get(n, {})}
        ent["blooms"] = blooms
    return _commit(
        root, manifest["files"], manifest["schema"], f"bloom:{col}", parent,
        epochs=manifest.get("epochs"), stats=stats,
    )


# Above this many point-lookup keys the per-needle bloom probe stops paying:
# driver CPU is O(files × needles × k), and with needles ≫ files the
# expected hit fraction F·(1−(1−1/F)^n) approaches every file anyway — the
# blooms can no longer prune.  Past the bound we fall back to min/max range
# pruning (one binary search per file, O(files · log needles) driver CPU).
_BLOOM_PROBE_MAX_KEYS = 512


def prune_files_for_points(
    root: str, col: str, keys: list, version: int | None = None
) -> tuple[list[str], int, int]:
    """The data files whose manifest-embedded Bloom filter for ``col``
    might contain ANY of the point-lookup ``keys`` — planned entirely on
    the driver from the manifest (zero file/footer reads), probing with
    the Python twin of the portable hash.  Sound by the Bloom contract:
    no false negatives (a file truly containing a key always survives);
    false positives only widen the read set and the caller's residual
    filter removes them.  Files without a bloom for ``col`` are included
    conservatively; empty files are skipped.

    The per-needle probe is a POINT-LOOKUP tool: beyond
    ``_BLOOM_PROBE_MAX_KEYS`` needles it degrades to min/max range
    pruning (sorted keys, one binary search per file) — both sound, and
    the range path keeps the driver at O(files · log needles) where the
    bloom loop would be O(files · needles).

    Returns ``(picked, total_files, resolved_version)`` — pass the
    resolved version to :func:`read_keyed_points` with ``picked`` (same
    snapshot-spanning contract as :func:`prune_files_for_box`)."""
    from python_async_sample_spark.operators.sketches import portable_hash_py

    root = root.rstrip("/")
    version = current_version(root) if version is None else version
    manifest = _read_manifest(root, version)
    stats = manifest.get("stats") or {}

    if len(keys) > _BLOOM_PROBE_MAX_KEYS:
        from bisect import bisect_left

        targets = sorted(k for k in keys if k is not None)
        picked = []
        for n in manifest["files"]:
            ent = stats.get(n)
            if ent is not None and ent.get("rows") == 0:
                continue
            rng = ent["cols"].get(col) if ent else None
            if rng is None:
                picked.append(n)  # no evidence — conservatively affected
                continue
            i = bisect_left(targets, rng[0])
            if i < len(targets) and targets[i] <= rng[1]:
                picked.append(n)
        return picked, len(manifest["files"]), version

    picked = []
    for n in manifest["files"]:
        ent = stats.get(n)
        if ent is not None and ent.get("rows") == 0:
            continue
        bloom = (ent or {}).get("blooms", {}).get(col)
        if bloom is None:
            picked.append(n)  # no evidence — conservatively affected
            continue
        m, kk, words = bloom["m"], bloom["k"], bloom["words"]
        hit = False
        for key in keys:
            ok = True
            for i in range(kk):
                pos = portable_hash_py(int(key), i) % m
                w = words.get(str(pos // 64))
                if w is None or not ((w >> (pos % 64)) & 1):
                    ok = False
                    break
            if ok:
                hit = True
                break
        if hit:
            picked.append(n)
    return picked, len(manifest["files"]), version


def read_keyed_points(
    spark: SparkSession,
    root: str,
    col: str,
    keys: list,
    version: int | None = None,
    picked: list[str] | None = None,
) -> DataFrame:
    """``SELECT * WHERE col IN (keys)`` planned from the manifest blooms:
    file skipping via :func:`prune_files_for_points`, then the residual
    IN filter (broadcastable-key-list semi-filter) makes it exact.  The
    version is resolved ONCE for schema and prune alike (same snapshot-
    isolation reasoning as :func:`read_box`) — so passing ``picked``
    REQUIRES the version the prune resolved (its third return value)."""
    pin_reader_conf(spark)
    root = root.rstrip("/")
    if picked is not None and version is None:
        raise ValueError(
            "read_keyed_points: `picked` requires the version it was pruned "
            "at (prune_files_for_points returns it) — resolving the current "
            "version here could span two snapshots"
        )
    version = current_version(root) if version is None else version
    manifest = _read_manifest(root, version)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if picked is None:
        picked, _total, _v = prune_files_for_points(root, col, keys, version)
    if not picked:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*[f"{root}/{_DATA_DIR}/{name}" for name in picked])
        .where(F.col(col).isin([int(k) for k in keys]))
    )


def restore_version(spark: SparkSession, root: str, to_version: int) -> int:
    """Delta-style RESTORE: commit a NEW version whose file list, schema
    and stats are ``to_version``'s snapshot — the table's CURRENT content
    rolls back, but history stays append-only (the bad versions remain
    time-travelable and auditable, nothing is deleted).  Metadata-only:
    O(manifest) driver work, zero data files rewritten or moved.

    Two deliberate carry choices, both about what a restore MUSTN'T undo:

    * the exactly-once EPOCH LEDGER carries forward from the current
      HEAD, not from the restore target — a stream epoch that committed
      between target and head has been delivered; rolling the ledger back
      with the data would let a replay of that epoch double-apply after
      the restore;
    * CHECK CONSTRAINTS likewise stay the head's (``_commit``'s standard
      carry): a restore changes data, not policy.  If the head's checks
      do not ANALYZE against the target's (possibly older, pre-evolution)
      schema, the restore refuses loudly — committing them blind would
      brick every subsequent write verb with AnalysisException, exactly
      what :func:`set_check_constraints`' fail-fast exists to prevent;
      drop or rewrite the constraints first, restore second.

    Fails loudly (nothing committed) if ``to_version``'s manifest or any
    of its data files were already reclaimed by :func:`vacuum` — a
    restore target must be fully intact, partial restores are corruption.
    """
    root = root.rstrip("/")
    _require_local_path(root, "restore_version")
    head = current_version(root)
    if to_version == head:
        return head  # restoring to the head is a no-op, don't burn a version
    try:
        target = _read_manifest(root, to_version)
    except FileNotFoundError:
        raise ValueError(
            f"restore_version: version {to_version} of {root!r} has no "
            "manifest (never existed, or vacuumed) — pick a version from "
            "table_versions()"
        ) from None
    missing = [
        n for n in target["files"]
        if not os.path.exists(f"{root}/{_DATA_DIR}/{n}")
    ]
    if missing:
        raise ValueError(
            f"restore_version: {len(missing)} data file(s) of version "
            f"{to_version} were vacuumed (e.g. {sorted(missing)[:3]}) — "
            "the snapshot is no longer materializable"
        )
    head_manifest = _read_manifest(root, head)
    carried_checks = head_manifest.get("checks", [])
    if carried_checks:
        probe = spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(target["schema"]))
        )
        for c in carried_checks:
            try:
                probe.where(F.expr(c["expr"])).schema
            except Exception as ex:
                raise ValueError(
                    f"restore_version: carried CHECK {c['name']!r} does not "
                    f"analyze against version {to_version}'s schema "
                    f"({c['expr']!r}: {ex}) — replace the constraints "
                    "(set_check_constraints) before restoring"
                ) from ex
    return _commit(
        root,
        list(target["files"]),
        target["schema"],
        f"restore({to_version})",
        parent=head,
        epochs=head_manifest.get("epochs"),
        stats=dict(target.get("stats") or {}),
    )


def add_column(spark: SparkSession, root: str, name: str, ddl_type: str) -> int:
    """Schema evolution as a metadata-only snapshot commit: the new
    (nullable) column joins the manifest schema, NO data file rewrites.
    Readers of this and later versions see NULL for rows in pre-evolution
    files; time travel to earlier versions does not see the column.  At
    100 TB this is the difference between an O(1) commit and a full-table
    rewrite — exactly why manifests carry the schema instead of letting
    the file listing imply it."""
    root = root.rstrip("/")
    _require_local_path(root, "add_column")
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if name in schema.fieldNames():
        raise ValueError(f"column {name!r} already exists in {root!r}")
    if name in manifest.get("dropped", []):
        raise ValueError(
            f"column {name!r} was previously dropped from {root!r}: pre-drop "
            "data files still store its values under this name, and this "
            "engine has no column-mapping layer to keep them hidden — "
            "re-adding would silently resurrect the old values; use a new "
            "column name (Delta/Iceberg solve this with column IDs)"
        )
    new_schema = schema.add(T.StructField(name, _parse_ddl_type(ddl_type), True))
    return _commit(
        root, manifest["files"], new_schema.json(), f"alter-add:{name}", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, manifest["files"], {}),
    )


def drop_column(spark: SparkSession, root: str, name: str) -> int:
    """DROP COLUMN as a metadata-only snapshot commit — the twin of
    :func:`add_column`: the column leaves the manifest schema, NO data
    file rewrites (readers PROJECT by name, so the stored values simply
    stop being read).  Time travel to pre-drop versions still serves the
    column; at 100 TB this is an O(1) commit instead of a full-table
    rewrite.

    The dropped name joins a ledger carried into every child manifest,
    and :func:`add_column` REFUSES names on it: pre-drop files still
    store the old values under that name, so re-adding would silently
    resurrect them (the failure column-mapping layers exist to prevent —
    refusal is the honest contract at this engine's complexity).  CHECK
    constraints referencing the column make the drop refuse loudly
    (policy must be rewritten first, same fail-fast as restore)."""
    root = root.rstrip("/")
    _require_local_path(root, "drop_column")
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if name not in schema.fieldNames():
        raise ValueError(f"column {name!r} not in {root!r}'s head schema")
    if len(schema.fields) == 1:
        raise ValueError(f"cannot drop {name!r}: it is the only column")
    new_schema = T.StructType([f for f in schema.fields if f.name != name])
    probe = spark.createDataFrame([], new_schema)
    for c in manifest.get("checks", []):
        try:
            probe.where(F.expr(c["expr"])).schema
        except Exception as ex:
            raise ValueError(
                f"drop_column: CHECK {c['name']!r} references {name!r} "
                f"({c['expr']!r}) — drop or rewrite the constraint first "
                "(set_check_constraints)"
            ) from ex
    stats = {
        n: {**e, "cols": {k: v for k, v in e.get("cols", {}).items() if k != name}}
        for n, e in manifest.get("stats", {}).items()
    }
    return _commit(
        root, manifest["files"], new_schema.json(), f"alter-drop:{name}", parent,
        epochs=manifest.get("epochs"),
        stats=stats,
        dropped=sorted(set(manifest.get("dropped", [])) | {name}),
    )


def clone_table(
    src_root: str, dst_root: str, version: int | None = None
) -> int:
    """Deep clone at hardlink cost: ``dst_root`` version 0 becomes an
    exact copy of ``src_root@version`` (head by default).  Data files are
    ``os.link``'ed — same inode, zero bytes copied, O(files) driver work
    (cross-filesystem falls back to a real copy) — which makes the clone
    INDEPENDENT of the source's lifecycle where a manifest-only shallow
    clone would not be: vacuuming the source unlinks names but the
    clone's links keep the inodes alive, and every source verb (merge,
    purge, compaction) swaps in NEW file names rather than mutating
    content in place, so linked bytes are immutable by construction.

    The epoch ledger, CHECK constraints and dropped-column ledger carry:
    a clone pointed at the same stream must not re-admit replayed epochs,
    and policy follows data.  NOTE the erasure consequence: a purge on
    the source does NOT reach the clone (independent table, retained
    inodes) — right-to-be-forgotten must be run per table, exactly as
    with any physical copy.  Crash-safe and idempotent: links land before
    the manifest commit, a re-run skips existing links."""
    src_root = src_root.rstrip("/")
    dst_root = dst_root.rstrip("/")
    _require_local_path(src_root, "clone_table")
    _require_local_path(dst_root, "clone_table")
    v = current_version(src_root) if version is None else version
    try:
        manifest = _read_manifest(src_root, v)
    except FileNotFoundError:
        raise ValueError(
            f"clone_table: version {v} of {src_root!r} has no manifest "
            "(never existed, or vacuumed)"
        ) from None
    if table_versions(dst_root):
        raise FileExistsError(f"versioned table already exists at {dst_root!r}")
    missing = [
        n for n in manifest["files"]
        if not os.path.exists(f"{src_root}/{_DATA_DIR}/{n}")
    ]
    if missing:
        raise ValueError(
            f"clone_table: {len(missing)} data file(s) of version {v} were "
            f"vacuumed (e.g. {sorted(missing)[:3]}) — the snapshot is no "
            "longer materializable"
        )
    os.makedirs(f"{dst_root}/{_DATA_DIR}", exist_ok=True)
    for n in manifest["files"]:
        src = f"{src_root}/{_DATA_DIR}/{n}"
        dst = f"{dst_root}/{_DATA_DIR}/{n}"
        if os.path.exists(dst):
            continue  # idempotent re-run after a crash mid-clone
        try:
            os.link(src, dst)
        except OSError:  # cross-device: pay the copy, atomically published
            fd, tmp = tempfile.mkstemp(dir=f"{dst_root}/{_DATA_DIR}")
            os.close(fd)
            shutil.copy2(src, tmp)
            os.replace(tmp, dst)
    return _commit(
        dst_root, list(manifest["files"]), manifest["schema"],
        f"clone:{src_root}@{v}", parent=None,
        epochs=manifest.get("epochs"),
        stats=dict(manifest.get("stats") or {}),
        checks=manifest.get("checks", []),
        dropped=manifest.get("dropped", []),
    )


def _parse_ddl_type(ddl_type: str) -> T.DataType:
    return T.StructType.fromDDL(f"__c {ddl_type}")["__c"].dataType


def set_check_constraints(spark: SparkSession, root: str, checks: list[dict]) -> int:
    """Declare Delta-style CHECK constraints on the table — enforced at
    every subsequent write (merge / append / stream epoch), so a bad batch
    fails ITS OWN commit loudly instead of poisoning the table for every
    reader.  A metadata-only commit; existing data is NOT retro-validated
    (validate first with ``operators.expectations`` if the table must
    already conform).

    Each check is a JSON-able dict: ``{"name": ..., "expr": <SQL boolean
    over the row>}`` — e.g. ``{"name": "price_nonneg", "expr":
    "o_totalprice >= 0"}``.  Rows where the expression is FALSE violate;
    NULL (SQL unknown) does not — declare an IS NOT NULL check separately,
    exactly like SQL CHECK semantics."""
    root = root.rstrip("/")
    _require_local_path(root, "set_check_constraints")
    for c in checks:
        if not isinstance(c.get("name"), str) or not isinstance(c.get("expr"), str):
            raise ValueError(f"check needs string name and expr: {c!r}")
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    # Fail fast on unparseable or unresolvable expressions: a typo'd check
    # would otherwise commit fine and then fail EVERY subsequent write verb
    # with AnalysisException (not CheckConstraintViolation) until replaced.
    # Analysis against an empty relation of the manifest schema costs no
    # data read — .schema forces the analyzer without an action.
    probe = spark.createDataFrame(
        [], T.StructType.fromJson(json.loads(manifest["schema"]))
    )
    for c in checks:
        try:
            probe.where(F.expr(c["expr"])).schema
        except Exception as ex:
            raise ValueError(
                f"check {c['name']!r} does not analyze against the table "
                f"schema: {c['expr']!r} ({ex})"
            ) from ex
    return _commit(
        root, manifest["files"], manifest["schema"],
        f"constrain:{','.join(c['name'] for c in checks)}", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, manifest["files"], {}),
        checks=checks,
    )


class CheckConstraintViolation(ValueError):
    """A write batch violated a declared CHECK constraint."""


def _enforce_checks(df: DataFrame, manifest: dict, verb: str) -> None:
    """ONE aggregate scan over the batch counting violations of every
    declared check; raises :class:`CheckConstraintViolation` naming the
    failing checks and their row counts.  Violation = expression FALSE
    (NULL passes — SQL CHECK semantics)."""
    checks = manifest.get("checks") or []
    if not checks:
        return
    agg = df.agg(
        *[
            F.sum(
                F.when(F.expr(c["expr"]).eqNullSafe(F.lit(False)), 1).otherwise(0)
            ).alias(f"__c{i}")
            for i, c in enumerate(checks)
        ]
    ).first()
    bad = [
        f"{c['name']} ({agg[f'__c{i}']} rows)"
        for i, c in enumerate(checks)
        if (agg[f"__c{i}"] or 0) > 0
    ]
    if bad:
        raise CheckConstraintViolation(
            f"{verb}: batch violates CHECK constraints: {', '.join(bad)}"
        )


def _conform_to_schema(df: DataFrame, schema_json: str) -> DataFrame:
    """Select + CAST a write batch to the manifest schema.  Writers must
    stage files the PINNED schema can read back: Spark widens arithmetic
    results silently (decimal(18,2) + literal → decimal(19,2)), and a
    staged file whose physical type drifted from the manifest corrupts
    every future read of that snapshot (parquet decimal ≤18 digits is
    INT64; 19 becomes FIXED_LEN_BYTE_ARRAY — the reader throws).  Casts
    run under the session's ANSI setting, so a genuinely overflowing
    value fails the WRITE loudly instead of poisoning the table."""
    schema = T.StructType.fromJson(json.loads(schema_json))
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def merge_into_versioned(
    spark: SparkSession, root: str, updates: DataFrame, key_col: str
) -> dict:
    """Keyed MERGE INTO as a snapshot commit: same semantics and ANSI
    guards as ``layout.merge_into`` (update rows replace matching target
    rows, unmatched keys insert; duplicate or NULL update keys raise), but
    the rewrite lands as a NEW manifest — readers switch from the old
    snapshot to the merged one atomically, and the old version stays
    queryable for time travel until vacuumed.

    Scale shape: the driver touch is O(files), never O(batch keys).  The
    batch is localCheckpoint-materialized once (so a non-deterministic
    source can't pass the CHECK scan yet stage different rows, and the
    guard/prune/rewrite actions all read the same bytes); the ANSI
    cardinality/NULL guard is one distributed aggregate that collects at
    most 6 offending keys; file pruning joins the batch's keys against
    the manifest's per-file [min, max] ranges distributedly and collects
    only the HIT FILE NAMES (:func:`_affected_via_range_join`); and the
    matched-row removal anti-joins against the batch's own key column —
    no key list ever materializes on the driver, so a CDC batch with
    millions of distinct keys costs the driver the same as one with
    ten."""
    root = root.rstrip("/")
    _require_local_path(root, "merge_into_versioned")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    schema_json = manifest["schema"]
    target_fields = [
        f["name"] for f in json.loads(schema_json)["fields"]
    ]
    updates = _conform_to_schema(updates, schema_json).localCheckpoint(eager=True)
    _enforce_checks(updates, manifest, "merge_into_versioned")

    # ANSI MERGE cardinality + NULL-key rejection — the guard shared with
    # the in-place verb (layout.ansi_merge_guard): one distributed action,
    # three scalars to the driver, offending keys collected capped only on
    # the failure path.
    from python_async_sample_spark.sources.layout import ansi_merge_guard

    n_updates = ansi_merge_guard(updates, key_col, "merge_into_versioned")
    if n_updates == 0:
        return {
            "version": parent, "rewritten": 0, "untouched": len(manifest["files"]),
            "upserted_rows": 0, "replaced_rows": 0,
        }

    ranges = _file_ranges_from_manifest(manifest, key_col)
    if ranges is None:  # legacy manifest without embedded stats: open footers
        from python_async_sample_spark.sources.layout import _file_key_ranges

        paths = [f"{root}/{_DATA_DIR}/{n}" for n in manifest["files"]]
        ranges = [
            (os.path.basename(p), lo, hi, rows)
            for p, lo, hi, rows in _file_key_ranges(paths, key_col)
        ]
        # stats-less files are conservatively affected: an always-true
        # join range is impossible for arbitrary key types, so they are
        # partitioned out of the join and unconditionally treated as hit
        no_stats = [r for r in ranges if r[1] is None]
        ranges = [r for r in ranges if r[1] is not None]
        forced_names = [n for n, _, _, _ in no_stats]
        forced_rows = sum(r for _, _, _, r in no_stats)
    else:
        forced_names, forced_rows = [], 0
    names_hit, rows_hit = _affected_via_range_join(spark, updates, key_col, ranges)
    names_hit = sorted(set(names_hit) | set(forced_names))
    rows_before = rows_hit + forced_rows
    affected = [f"{root}/{_DATA_DIR}/{n}" for n in names_hit]
    affected_names = set(names_hit)

    if affected:
        # read with the MANIFEST schema: files from before an add_column
        # commit surface the evolved column as NULL, so kept ∪ updates
        # always line up even across schema versions.  Matched rows are
        # removed by anti-joining against the batch's OWN key column — a
        # distributed relation, types already conformed, no driver list.
        kept = (
            spark.read.schema(T.StructType.fromJson(json.loads(schema_json)))
            .parquet(*affected)
            .join(updates.select(key_col), key_col, "left_anti")
            .select(*target_fields)
        )
        staged_df = kept.unionByName(updates)
    else:
        staged_df = updates
    new_names = _stage_files(staged_df, root, max(1, len(affected)))
    new_stats = _collect_file_stats(root, new_names)
    rows_after = sum(new_stats[n]["rows"] for n in new_names)
    kept_names = [n for n in manifest["files"] if n not in affected_names]
    next_files = kept_names + new_names
    version = _commit(
        root, next_files, schema_json, f"merge:{key_col}", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, kept_names, new_stats),
    )
    return {
        "version": version,
        "rewritten": len(affected),
        "untouched": len(manifest["files"]) - len(affected),
        "upserted_rows": n_updates,
        "replaced_rows": rows_before + n_updates - rows_after,
    }


def delete_keys_versioned(
    spark: SparkSession, root: str, key_col: str, keys: list
) -> dict:
    """Keyed deletion as a snapshot commit (the versioned twin of
    ``layout.delete_keys``, NULL-safe the same way: NULL-key rows are
    never deletion targets)."""
    root = root.rstrip("/")
    _require_local_path(root, "delete_keys_versioned")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    targets = sorted(keys)
    pruned = _affected_from_manifest(manifest, key_col, targets)
    if pruned is not None:
        names_hit, rows_before = pruned
        affected = [f"{root}/{_DATA_DIR}/{n}" for n in names_hit]
    else:  # legacy manifest without embedded stats: open footers
        paths = [f"{root}/{_DATA_DIR}/{n}" for n in manifest["files"]]
        affected, rows_before = _prune_files_by_key_stats(paths, key_col, targets)
    if not affected:
        return {"version": parent, "rewritten": 0, "deleted_rows": 0}
    affected_names = {os.path.basename(p) for p in affected}
    keep = _drop_keys(
        spark,
        spark.read.schema(T.StructType.fromJson(json.loads(manifest["schema"])))
        .parquet(*affected),
        key_col,
        targets,
    )
    new_names = _stage_files(keep, root, len(affected))
    new_stats = _collect_file_stats(root, new_names)
    rows_after = sum(new_stats[n]["rows"] for n in new_names)
    kept_names = [n for n in manifest["files"] if n not in affected_names]
    next_files = kept_names + new_names
    version = _commit(
        root, next_files, manifest["schema"], f"delete:{key_col}", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, kept_names, new_stats),
    )
    return {
        "version": version,
        "rewritten": len(affected),
        "deleted_rows": rows_before - rows_after,
    }


def _prepare_victims(
    spark: SparkSession, victims: DataFrame, key_col: str, key_field: T.StructField
) -> DataFrame:
    """Normalize a victim RELATION for anti-join deletion: project the key
    column (or accept a single-column relation), cast to the table's key
    type, drop NULLs (never equi-match — a NULL "victim" targets nothing)
    and NaNs (NaN = NaN is TRUE under join equality — a NaN victim would
    silently erase NaN-key rows nobody targeted), dedup, and materialize
    ONCE (the relation is consumed by the planning range join and then by
    every per-file rewrite)."""
    if key_col in victims.columns:
        src = F.col(key_col)
    elif len(victims.columns) == 1:
        src = F.col(victims.columns[0])
    else:
        raise ValueError(
            f"victims relation must carry {key_col!r} or be single-column; "
            f"got {victims.columns}"
        )
    vic = (
        victims.select(src.cast(key_field.dataType).alias(key_col))
        .where(F.col(key_col).isNotNull())
    )
    if isinstance(key_field.dataType, (T.DoubleType, T.FloatType)):
        vic = vic.where(~F.isnan(key_col))
    return vic.distinct().localCheckpoint(eager=True)


def delete_relation(
    spark: SparkSession, root: str, key_col: str, victims: DataFrame
) -> dict:
    """``DELETE WHERE <relation>`` as a snapshot commit —
    :func:`delete_keys_versioned` with the victim set as a RELATION, the
    head-only sibling of :func:`purge_relation` (delete removes rows from
    the NEW head while time travel keeps serving history; purge is the
    erasure verb that rewrites history).  The reference's delete is
    predicate-shaped (``dbs/nikon.py:117-136``) — at 100 TB the victims
    are a relation, not a key list, so planning rides the same distributed
    range join as MERGE and the rewrite is one broadcast anti join: victim
    keys never reach the driver, driver state is O(files)."""
    root = root.rstrip("/")
    _require_local_path(root, "delete_relation")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if key_col not in schema.fieldNames():
        raise ValueError(f"column {key_col!r} not in {root!r}'s head schema")
    vic = _prepare_victims(spark, victims, key_col, schema[key_col])

    ranges = _file_ranges_from_manifest(manifest, key_col)
    if ranges is None:  # legacy manifest without embedded stats
        from python_async_sample_spark.sources.layout import _file_key_ranges

        paths = [f"{root}/{_DATA_DIR}/{n}" for n in manifest["files"]]
        ranges = [
            (os.path.basename(p), lo, hi, rows)
            for p, lo, hi, rows in _file_key_ranges(paths, key_col)
        ]
    forced = [(n, r) for n, lo, _, r in ranges if lo is None]
    ranged = [(n, lo, hi, r) for n, lo, hi, r in ranges if lo is not None]
    names_hit, rows_hit = _affected_via_range_join(spark, vic, key_col, ranged)
    affected_names = sorted(set(names_hit) | {n for n, _ in forced})
    rows_before = rows_hit + sum(r for _, r in forced)
    if not affected_names:
        return {"version": parent, "rewritten": 0, "deleted_rows": 0}

    keep = (
        spark.read.schema(schema)
        .parquet(*[f"{root}/{_DATA_DIR}/{n}" for n in affected_names])
        .join(F.broadcast(vic), key_col, "left_anti")
        .select(*schema.fieldNames())
    )
    new_names = _stage_files(keep, root, len(affected_names))
    new_stats = _collect_file_stats(root, new_names)
    rows_after = sum(new_stats[n]["rows"] for n in new_names)
    kept_names = [n for n in manifest["files"] if n not in set(affected_names)]
    version = _commit(
        root, kept_names + new_names, manifest["schema"],
        f"delete-rel:{key_col}", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, kept_names, new_stats),
    )
    return {
        "version": version,
        "rewritten": len(affected_names),
        "deleted_rows": rows_before - rows_after,
    }


def commit_stream_epoch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    epoch_id: int,
    fingerprint: str,
    n_files: int = 1,
) -> int | None:
    """Exactly-once APPEND of a streaming micro-batch as a snapshot commit.

    Epoch identity is ``(epoch_id, content fingerprint)`` recorded in the
    manifest's ``epochs`` ledger — a dict carried FORWARD into every child
    manifest by every verb, so replay detection survives :func:`vacuum`
    dropping the ancestor manifest that first recorded an epoch.  (The
    ``op`` string still names the epoch for humans, but it is no longer
    the source of truth: before the ledger existed, a vacuumed epoch
    manifest silently re-admitted its replay as duplicate rows.)
    Idempotence needs no sidecar files and inherits the manifest's
    atomicity:

    * a replay whose (id, fingerprint) pair already appears in a committed
      manifest is SKIPPED — even across checkpoint lifetimes, because the
      fingerprint, not the checkpoint, is the identity;
    * the same epoch id with a DIFFERENT fingerprint refuses loudly — a
      fresh checkpoint pointed at an old table would otherwise silently
      drop or double its first batches (the ``drain_mv_merge`` lesson,
      streaming/jobs.py);
    * a crash after staging but before the manifest link leaves the table
      exactly at its previous snapshot, and the engine's replay of the
      epoch commits it cleanly (orphans go to :func:`vacuum`).

    Returns the committed version, or ``None`` when the replay was skipped.
    """
    root = root.rstrip("/")
    _require_local_path(root, "commit_stream_epoch")
    parent = current_version(root)
    op_prefix = f"append-epoch:{epoch_id}:"
    op = op_prefix + fingerprint
    manifest = _read_manifest(root, parent)
    # primary check: the carried-forward ledger in the CURRENT manifest —
    # survives vacuum of every ancestor manifest
    ledger = dict(manifest.get("epochs", {}))
    key = str(epoch_id)
    prior_fp = ledger.get(key)
    if prior_fp is None:
        # legacy fallback: tables whose manifests predate the ledger field
        # recorded epochs only in the ``op`` string — scan whatever
        # manifests remain (vacuum refuses to drop un-ledgered epoch
        # manifests, so this scan stays complete for legacy tables too).
        # Fold EVERY discovered legacy epoch into the ledger we are about
        # to commit, not just the one being checked: that is what finally
        # lets vacuum release the legacy manifests (its retention
        # condition is "epoch already in the newest retained ledger")
        for v in table_versions(root):
            legacy = _read_manifest(root, v)
            if "epochs" in legacy:
                continue  # ledgered manifests were already consulted above
            legacy_op = legacy["op"]
            if legacy_op.startswith("append-epoch:"):
                _, eid, fp = legacy_op.split(":", 2)
                ledger.setdefault(eid, fp)
        prior_fp = ledger.get(key)
    if prior_fp == fingerprint:
        return None  # durably committed — genuine replay
    if prior_fp is not None:
        raise RuntimeError(
            f"epoch {epoch_id} was already committed to {root!r} with a "
            f"different batch fingerprint ({prior_fp!r} vs {fingerprint!r}) "
            "— this is a fresh checkpoint reusing epoch ids against an old "
            "table, not a replay; refusing to guess which batch is real"
        )
    epoch_batch = _conform_to_schema(batch_df, manifest["schema"])
    if manifest.get("checks"):
        # pin the batch bytes: without this, a non-deterministic source
        # could pass the CHECK scan yet stage different (violating) rows
        # in the second evaluation — the 'a bad batch fails its own
        # commit' guarantee must span both actions
        epoch_batch = epoch_batch.localCheckpoint(eager=True)
    _enforce_checks(epoch_batch, manifest, "commit_stream_epoch")
    new_names = _stage_files(epoch_batch, root, n_files)
    ledger[key] = fingerprint
    return _commit(
        root, manifest["files"] + new_names, manifest["schema"], op, parent,
        epochs=ledger,
        stats=_carry_stats(manifest, manifest["files"], _collect_file_stats(root, new_names)),
    )


def append_versioned(
    spark: SparkSession, root: str, df: DataFrame, n_files: int = 1
) -> int:
    """Plain INSERT INTO as a snapshot commit: the batch's files join the
    current manifest, nothing rewrites.  The cheapest write verb — O(batch)
    data, O(1) metadata — and the one a 100 TB ingest loop lives on."""
    root = root.rstrip("/")
    _require_local_path(root, "append_versioned")
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    batch = _conform_to_schema(df, manifest["schema"])
    if manifest.get("checks"):
        # same CHECK-vs-stage determinism pin as commit_stream_epoch
        batch = batch.localCheckpoint(eager=True)
    _enforce_checks(batch, manifest, "append_versioned")
    new_names = _stage_files(batch, root, n_files)
    return _commit(
        root, manifest["files"] + new_names, manifest["schema"], "append", parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, manifest["files"], _collect_file_stats(root, new_names)),
    )


def compact(
    spark: SparkSession,
    root: str,
    small_file_bytes: int = 32 << 20,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Bin-pack small data files into target-sized ones as a snapshot
    commit — the OPTIMIZE verb.  An append-heavy table accretes one file
    per commit; at 100 TB that is millions of tiny files, and every scan
    pays per-file open/seek and per-task scheduling overhead.  Compaction
    rewrites ONLY the files under ``small_file_bytes`` (large files are
    left untouched — no full-table rewrite), packing their combined bytes
    into ``ceil(total/target_file_bytes)`` outputs.

    Content is preserved exactly (same rows, same schema; row order within
    the table is not part of the snapshot contract).  Crash-safety is the
    standard commit discipline: staged files are orphans until the
    manifest links, old files are never touched (time travel to
    pre-compaction versions keeps working until :func:`vacuum`), and a
    concurrent writer conflict surfaces as :class:`ConcurrentWriteError` —
    rerun on the new head."""
    root = root.rstrip("/")
    _require_local_path(root, "compact")
    pin_reader_conf(spark)
    parent = current_version(root)
    manifest = _read_manifest(root, parent)
    small, kept = [], []
    total = 0
    for n in manifest["files"]:
        size = os.path.getsize(f"{root}/{_DATA_DIR}/{n}")
        if size < small_file_bytes:
            small.append(n)
            total += size
        else:
            kept.append(n)
    if len(small) <= 1:
        return {"version": parent, "compacted": 0, "produced": 0, "untouched": len(manifest["files"])}
    n_out = max(1, -(-total // target_file_bytes))
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    packed = spark.read.schema(schema).parquet(
        *[f"{root}/{_DATA_DIR}/{n}" for n in small]
    )
    new_names = _stage_files(packed, root, n_out)
    version = _commit(
        root, kept + new_names, manifest["schema"], f"compact:{len(small)}->{len(new_names)}",
        parent,
        epochs=manifest.get("epochs"),
        stats=_carry_stats(manifest, kept, _collect_file_stats(root, new_names)),
    )
    return {
        "version": version,
        "compacted": len(small),
        "produced": len(new_names),
        "untouched": len(kept),
    }


def changes_between(
    spark: SparkSession, root: str, from_version: int, to_version: int
) -> DataFrame:
    """Row-level CDC between two snapshots: the multiset difference of the
    two versions, tagged ``change_type`` = 'insert' (in ``to`` but not
    ``from``) / 'delete' (in ``from`` but not ``to``); an updated row
    appears as its delete+insert pair.

    The scale lever is FILE pruning from the manifests alone: data files
    are immutable, so any file present in BOTH manifests contributes
    nothing to the diff and is never read.  A CDC consumer of a 100 TB
    table whose merge touched 3 files reads exactly the 3 rewritten files
    plus their replacements — the manifest diff is the incremental-read
    contract (the same reason :func:`merge_into_versioned` prunes by
    manifest stats).  Compaction rewrites files without changing content;
    its diff computes (over the repacked files) and is empty.

    Rows are compared on the FROM version's schema columns (a column added
    between the versions would otherwise tag every row as changed; callers
    diffing across an evolution compare the common prefix — the Iceberg
    convention)."""
    pin_reader_conf(spark)
    root = root.rstrip("/")
    if from_version == to_version:
        raise ValueError("changes_between: versions must differ")
    m_from = _read_manifest(root, from_version)
    m_to = _read_manifest(root, to_version)
    schema = T.StructType.fromJson(json.loads(m_from["schema"]))
    cols = schema.fieldNames()
    from_set, to_set = set(m_from["files"]), set(m_to["files"])
    only_from = [n for n in m_from["files"] if n not in to_set]
    only_to = [n for n in m_to["files"] if n not in from_set]

    def _read(names: list[str]) -> DataFrame:
        if not names:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[f"{root}/{_DATA_DIR}/{n}" for n in names]
        ).select(*cols)

    removed, added = _read(only_from), _read(only_to)
    return (
        added.exceptAll(removed).select(F.lit("insert").alias("change_type"), *cols)
        .unionByName(
            removed.exceptAll(added).select(F.lit("delete").alias("change_type"), *cols)
        )
    )


def table_history(spark: SparkSession, root: str) -> DataFrame:
    """One row per committed snapshot — (version, op_kind, n_files,
    n_rows) — computed ENTIRELY from manifests (their embedded row-count
    stats; a footer read only for legacy manifests without stats).  The
    DESCRIBE HISTORY face of the table: a 100 TB audit costs kilobytes of
    JSON, no data I/O."""
    root = root.rstrip("/")
    rows = []
    for v in table_versions(root):
        m = _read_manifest(root, v)
        stats = m.get("stats") or {}
        n_rows = 0
        for n in m["files"]:
            ent = stats.get(n)
            if ent is not None:
                n_rows += ent["rows"]
            else:
                import pyarrow.parquet as pq

                try:
                    n_rows += pq.read_metadata(
                        f"{root}/{_DATA_DIR}/{n}").num_rows
                except FileNotFoundError:
                    # a manifest retained past its data files' vacuum (the
                    # legacy-epoch bookkeeping case): the history row stays
                    # but its row count is honestly UNKNOWN, not 0
                    n_rows = None
                    break
        rows.append((v, m["op"].split(":", 1)[0], len(m["files"]), n_rows))
    return spark.createDataFrame(
        rows, "version int, op_kind string, n_files int, n_rows bigint"
    )


def version_as_of(root: str, ts: float) -> int:
    """``AS OF TIMESTAMP`` resolution: the latest version whose commit
    wall-clock is ≤ ``ts`` (epoch seconds).  Commit times are recorded in
    the manifests (clamped monotone along the parent chain at commit, so
    this binary-searchable mapping can never invert under clock
    adjustment); a purge preserves them — rewritten history keeps its
    original timeline.  Raises if ``ts`` predates the oldest retained
    version (vacuum may have dropped earlier ones — same contract as
    Delta's timestamp travel)."""
    root = root.rstrip("/")
    best = None
    for v in table_versions(root):
        at = _read_manifest(root, v).get("committed_at")
        if at is not None and at <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"no version of {root!r} existed at ts={ts} (oldest retained "
            "version is newer, or the table predates commit timestamps)"
        )
    return best


def read_as_of(spark: SparkSession, root: str, ts: float) -> DataFrame:
    """Time travel by wall-clock: ``read_version`` at
    :func:`version_as_of`'s resolution."""
    return read_version(spark, root, version_as_of(root, ts))


def verify_table(root: str, deep: bool = False) -> dict:
    """fsck for a versioned table: walk every retained manifest and
    report — never raise — what a reader would hit.  Checks: manifest
    JSON parses, schema parses, the parent chain is contiguous over the
    retained range, commit timestamps are monotone, every referenced
    data file exists, and (``deep=True``) each file's footer row count
    matches its manifest stats entry (a stats/data divergence would
    silently corrupt MERGE/DELETE planning, which trusts the manifest).
    O(manifests) shallow; deep adds one local footer read per referenced
    file.  Returns ``{"ok": bool, "versions": int, "problems": [str]}``
    — the operational pre-flight before vacuum/purge maintenance."""
    root = root.rstrip("/")
    problems: list[str] = []
    versions = table_versions(root)
    if not versions:
        return {"ok": False, "versions": 0, "problems": ["no manifests found"]}
    prev_v = None
    prev_ts = None
    for v in versions:
        try:
            m = _read_manifest(root, v)
        except (json.JSONDecodeError, OSError) as ex:
            problems.append(f"v{v}: manifest unreadable ({ex})")
            continue
        try:
            T.StructType.fromJson(json.loads(m["schema"]))
        except Exception as ex:  # noqa: BLE001
            problems.append(f"v{v}: schema unparseable ({ex})")
        if prev_v is not None:
            if v != prev_v + 1:
                problems.append(f"v{prev_v}->v{v}: version gap (vacuum keeps a "
                                "contiguous recent range; a hole inside it is damage)")
            elif m.get("parent") != prev_v:
                problems.append(f"v{v}: parent={m.get('parent')} != {prev_v}")
        at = m.get("committed_at")
        if at is not None and prev_ts is not None and at < prev_ts:
            problems.append(f"v{v}: committed_at regressed ({at} < {prev_ts})")
        prev_ts = at if at is not None else prev_ts
        prev_v = v
        stats = m.get("stats") or {}
        for n in m["files"]:
            p = f"{root}/{_DATA_DIR}/{n}"
            if not os.path.exists(p):
                if m.get("epochs") and v != versions[-1]:
                    # vacuum-retained legacy epoch manifest: documented state
                    continue
                problems.append(f"v{v}: data file missing: {n}")
            elif deep and n in stats:
                import pyarrow.parquet as pq

                actual = pq.read_metadata(p).num_rows
                if actual != stats[n]["rows"]:
                    problems.append(
                        f"v{v}: {n} footer rows {actual} != manifest stats "
                        f"{stats[n]['rows']}"
                    )
    return {"ok": not problems, "versions": len(versions), "problems": problems}


def purge_keys(
    spark: SparkSession, root: str, key_col: str, keys: list
) -> dict:
    """Erase the given keys from EVERY committed snapshot — the
    right-to-be-forgotten verb, and deliberately the ONE operation that
    rewrites history: ``delete_keys_versioned`` removes rows from the
    head while time travel keeps serving them from older snapshots,
    which is exactly what an erasure request forbids.

    Mechanics per affected data file (manifest-stats pruned, same as
    MERGE): write a purged replacement under a fresh immutable name, then
    atomically REPLACE (``os.replace``) every manifest that referenced
    the old file with one referencing the new name — version numbers,
    ops, the epoch ledger and all other rows are preserved; only the
    purged rows disappear from every version at once.  Readers see each
    manifest either before or after its single atomic replace, and both
    states are complete, valid snapshots (the old data file is not
    removed here — :func:`vacuum` reclaims it once no manifest references
    it), so a crash mid-purge leaves every version readable and the purge
    re-runnable.  NULL keys are never purge targets (same NULL-safety as
    the delete verbs).

    Unlike every snapshot verb, purge is NOT safe against concurrent
    writers: a writer that read its parent manifest before the replace
    commits a child referencing the un-purged file names, resurrecting
    the rows.  MULTI-VERSION readers need the same window: each manifest
    flips atomically, but a ``changes_between`` call racing the purge can
    observe one version flipped and the other not and report the victim
    rows as phantom inserts/deletes (single-version ``read_version``
    always sees a complete, valid snapshot).  Run it in a maintenance
    window (the same exclusive contract every history-rewriting tool
    carries — git filter-branch, pg VACUUM FULL).  A crash mid-purge is
    safe: each manifest flips atomically and independently, and
    re-running finishes the rest.

    Returns per-version rows removed plus rewrite counts.  Scale shape:
    one pruned rewrite per affected file ACROSS all retained manifests
    (shared files rewrite once), manifest updates are metadata-only."""
    root = root.rstrip("/")
    _require_local_path(root, "purge_keys")
    pin_reader_conf(spark)
    targets = sorted(k for k in keys if k is not None)
    versions = table_versions(root)
    if not targets or not versions:
        return {"files_rewritten": 0, "manifests_updated": 0, "rows_removed": {}}

    manifests = {v: _read_manifest(root, v) for v in versions}
    # union of affected files across every version (a file shared by many
    # manifests is rewritten exactly once).  Manifests whose schema lacks
    # the key column (it was added by a later add_column) cannot contain
    # victim values — their files null-fill the column — so they are
    # unaffected by construction.  Files that no longer exist on disk
    # (a vacuum-retained legacy epoch manifest whose data files were
    # reclaimed) have no reader to protect and are skipped.
    affected: set[str] = set()
    for m in manifests.values():
        fields = {f["name"] for f in json.loads(m["schema"])["fields"]}
        if key_col not in fields:
            continue
        pruned = _affected_from_manifest(m, key_col, targets)
        if pruned is not None:
            names_hit = pruned[0]
        else:
            paths = [
                p for n in m["files"]
                if os.path.exists(p := f"{root}/{_DATA_DIR}/{n}")
            ]
            hit, _ = _prune_files_by_key_stats(paths, key_col, targets)
            names_hit = [os.path.basename(p) for p in hit]
        affected.update(n for n in names_hit
                        if os.path.exists(f"{root}/{_DATA_DIR}/{n}"))

    # victims as ONE broadcast anti-join relation (layout.build_victims_df
    # carries the isin-compatible type coercion + NaN exclusion): an isin()
    # with hundreds of literal children makes every per-file plan pay
    # seconds of driver-side analysis (measured 8s for 16 files x 711
    # keys); the anti join analyzes in milliseconds and keeps NULL-key
    # rows exactly like the NULL-guarded isin (NULL never equi-matches)
    from python_async_sample_spark.sources.layout import (
        _drop_keys_anti,
        build_victims_df,
    )

    key_field = _newest_key_field(manifests, key_col, root)
    vic_df = build_victims_df(spark, key_field, targets)

    def drop_victims(df: DataFrame) -> DataFrame:
        return _drop_keys_anti(spark, df, key_col, targets, vic_df=vic_df)

    return _purge_rewrite_and_flip(
        spark, root, manifests, versions, affected, drop_victims,
        purged_entries={str(k) for k in targets},
    )


def _newest_key_field(manifests: dict, key_col: str, root: str) -> T.StructField:
    """The NEWEST schema's field for ``key_col``: reading an older file
    with an evolved schema null-fills added columns (never the reverse
    KeyError), and a file rewritten under it stays readable by every
    manifest."""
    for m in reversed(list(manifests.values())):
        sch = T.StructType.fromJson(json.loads(m["schema"]))
        if key_col in sch.fieldNames():
            return sch[key_col]
    raise ValueError(f"column {key_col!r} exists in no version of {root!r}")


def _purge_rewrite_and_flip(
    spark: SparkSession,
    root: str,
    manifests: dict,
    versions: list[int],
    affected: set[str],
    drop_victims,
    purged_entries: set[str],
) -> dict:
    """The history-rewriting core shared by both purge faces: rewrite each
    affected data file without its victim rows (``drop_victims``: a
    DataFrame → DataFrame filter, anti-join-shaped on both call sites),
    then atomically re-point every manifest at the replacements.
    ``purged_entries`` lands in each touched manifest's audit ledger —
    the list face records the keys themselves, the relation face a
    count+checksum fingerprint (the keys never reach the driver)."""
    replacement: dict[str, str | None] = {}  # old -> new (None: emptied)
    new_stats: dict[str, dict] = {}
    removed_per_file: dict[str, int] = {}

    def _rewrite_one(old: str) -> tuple[str, str | None, dict | None, int]:
        # newest manifest referencing the file: the most-evolved schema
        # that can read it (older files null-fill newer columns)
        schema_owner = next(
            m for m in reversed(list(manifests.values())) if old in m["files"]
        )
        schema = T.StructType.fromJson(json.loads(schema_owner["schema"]))
        kept = drop_victims(
            spark.read.schema(schema).parquet(f"{root}/{_DATA_DIR}/{old}")
        ).select(*schema.fieldNames())
        names = _stage_files(kept, root, 1)
        stats = _collect_file_stats(root, names)
        import pyarrow.parquet as pq

        rows_before = pq.read_metadata(f"{root}/{_DATA_DIR}/{old}").num_rows
        rows_after = stats[names[0]]["rows"]
        if rows_after == 0:
            os.remove(f"{root}/{_DATA_DIR}/{names[0]}")
            return old, None, None, rows_before
        return old, names[0], stats[names[0]], rows_before - rows_after

    # one small Spark job per affected file; submit them CONCURRENTLY
    # (Spark's scheduler interleaves jobs from multiple threads) — a
    # sequential loop pays per-job latency x files, ~8x slower here
    from concurrent.futures import ThreadPoolExecutor

    if affected:
        with ThreadPoolExecutor(max_workers=min(8, len(affected))) as pool:
            for old, new, st, removed in pool.map(_rewrite_one, sorted(affected)):
                replacement[old] = new
                removed_per_file[old] = removed
                if new is not None:
                    new_stats[new] = st

    rows_removed: dict[int, int] = {}
    updated = 0
    for v in versions:
        m = manifests[v]
        hit = [n for n in m["files"] if n in replacement]
        rows_removed[v] = sum(removed_per_file[n] for n in hit)
        if not hit:
            continue
        next_files = [
            replacement.get(n, n) for n in m["files"]
            if replacement.get(n, n) is not None
        ]
        stats = {
            n: s for n, s in _carry_stats(m, m["files"], new_stats).items()
            if n in set(next_files)
        }
        next_m = dict(
            m, files=sorted(next_files), stats=stats,
            purged=sorted(set(m.get("purged", [])) | purged_entries),
        )
        fd, tmp = tempfile.mkstemp(dir=f"{root}/{_MANIFEST_DIR}", suffix=".tmp")
        with os.fdopen(fd, "w", encoding="ascii") as fh:
            json.dump(next_m, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, _manifest_path(root, v))  # atomic swap
        updated += 1
    return {
        # emptied files count as rewritten: their content was re-examined
        # and their manifest entries dropped
        "files_rewritten": len(replacement),
        "manifests_updated": updated,
        "rows_removed": rows_removed,
    }


def purge_relation(
    spark: SparkSession, root: str, key_col: str, victims: DataFrame
) -> dict:
    """:func:`purge_keys` with the victim set as a RELATION — the
    right-to-be-forgotten face for erasure requests that arrive as a
    predicate or a table (``DELETE WHERE o_orderkey % 211 = 0`` over
    100 TB is not a key list), mirroring the reference's predicate-shaped
    delete (``dbs/nikon.py:117-136``) across snapshot history.

    The victim keys NEVER reach the driver: planning rides the same
    distributed range join as MERGE (:func:`_affected_via_range_join` —
    manifest file ranges broadcast against the victim relation, only hit
    file NAMES return), and each affected file's rewrite is a broadcast
    anti join against the victim relation.  Driver-resident state is
    O(files), independent of victim count — the scale contract
    scripts/scale_probe.py pins.

    ``victims`` must carry ``key_col`` (or be a single-column relation);
    keys are cast to the table's key type, NULLs and NaNs are dropped
    (NULL/NaN are never purge targets — same safety as the list face).
    Same exclusive maintenance-window contract as :func:`purge_keys`.
    Returns the same counters, plus ``victim_keys`` (distinct purge
    targets).  The manifest audit ledger records a ``relation:`` entry
    with the victim count + an order-insensitive mod-2³² checksum, not
    the keys themselves."""
    root = root.rstrip("/")
    _require_local_path(root, "purge_relation")
    pin_reader_conf(spark)
    versions = table_versions(root)
    empty = {
        "files_rewritten": 0, "manifests_updated": 0,
        "rows_removed": {}, "victim_keys": 0,
    }
    if not versions:
        return empty
    manifests = {v: _read_manifest(root, v) for v in versions}
    key_field = _newest_key_field(manifests, key_col, root)
    vic = _prepare_victims(spark, victims, key_col, key_field)

    # one scalar action covers emptiness, the audit fingerprint, and the
    # returned victim count (order-insensitive: sum of 32-bit row
    # signatures in the mod-2^32 ring via overflow-free half sums)
    sig = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("bigint")
    n_vic, fp = vic.agg(
        F.count(F.lit(1)),
        (
            (F.sum(sig % F.lit(65536)) + (F.sum(F.floor(sig / F.lit(65536))) % F.lit(65536)) * F.lit(65536))
            % F.lit(4294967296)
        ),
    ).first()
    if n_vic == 0:
        return empty

    # union of per-file ranges across every version: files are immutable
    # and uniquely named, so a file shared by many manifests contributes
    # ONE range and the planning join runs ONCE, not per version.
    # Manifests whose schema lacks the key column cannot contain victim
    # values (their files null-fill it); vanished files (vacuum-retained
    # legacy epoch manifests) have no reader to protect.
    ranged: dict[str, tuple] = {}
    forced: set[str] = set()
    for m in manifests.values():
        fields = {f["name"] for f in json.loads(m["schema"])["fields"]}
        if key_col not in fields:
            continue
        ranges = _file_ranges_from_manifest(m, key_col)
        if ranges is None:  # legacy manifest without embedded stats
            from python_async_sample_spark.sources.layout import _file_key_ranges

            paths = [
                p for n in m["files"]
                if os.path.exists(p := f"{root}/{_DATA_DIR}/{n}")
            ]
            ranges = [
                (os.path.basename(p), lo, hi, rows)
                for p, lo, hi, rows in _file_key_ranges(paths, key_col)
            ]
        for n, lo, hi, rows in ranges:
            if not os.path.exists(f"{root}/{_DATA_DIR}/{n}"):
                continue
            if lo is None:  # stats-less: conservatively affected
                forced.add(n)
            else:
                ranged[n] = (n, lo, hi, rows)
    names_hit, _ = _affected_via_range_join(
        spark, vic, key_col, [r for n, r in sorted(ranged.items())]
    )
    affected = set(names_hit) | forced

    def drop_victims(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(vic), key_col, "left_anti")

    out = _purge_rewrite_and_flip(
        spark, root, manifests, versions, affected, drop_victims,
        purged_entries={f"relation:{key_col}:n={n_vic}:ck={int(fp):08x}"},
    )
    return {**out, "victim_keys": int(n_vic)}


def vacuum(
    root: str,
    keep_last: int = 2,
    grace_seconds: float = 600.0,
    keep_versions: set[int] | frozenset[int] | None = None,
    dry_run: bool = False,
    keep_newer_than_ts: float | None = None,
) -> dict:
    """Remove data files unreachable from the ``keep_last`` most recent
    manifests, and the older manifests themselves.

    ``keep_versions`` pins EXTRA versions beyond the recency window — the
    coordination hook for the multi-table catalog: pass
    ``catalog.pinned_versions(cat_root, name)`` so no retained catalog
    snapshot ever dangles (see catalog.py's retention note).

    Safe to run (and crash) at any time, INCLUDING concurrently with
    writers, because of two guards:

    * **Orphan age threshold** (Iceberg-style): an unreferenced data file
      or stage dir younger than ``grace_seconds`` is SKIPPED.  Writers
      move staged files under ``data/`` BEFORE their manifest commits, so
      a zero-grace vacuum racing an in-flight commit would delete freshly
      staged files and let the writer commit a manifest referencing
      missing files — a corrupted committed snapshot.  The grace window
      must exceed the longest stage→commit gap (default 10 min; raise it
      for huge batch writes, or pass ``0`` only when no writer can be
      in flight).
    * **Epoch-ledger protection**: manifests written before the ``epochs``
      ledger existed carry their exactly-once epoch identity only in the
      ``op`` string; dropping one would re-admit a replayed epoch as
      duplicate rows.  Such legacy epoch manifests are retained until the
      epoch also appears in the newest retained manifest's ledger.

    With those guards, it deletes only what no retained snapshot (and no
    possibly-in-flight commit) references, so every surviving version
    stays exactly readable; an interrupted vacuum just leaves some garbage
    for the next one."""
    import time

    root = root.rstrip("/")
    versions = table_versions(root)
    if not versions:
        return {"data_files_removed": 0, "manifests_removed": 0}
    recent = versions[-keep_last:] if keep_last > 0 else versions[-1:]
    by_age: set[int] = set()
    if keep_newer_than_ts is not None:
        # age-based retention (Delta's retention-period face) rides the
        # manifest commit stamps: every version committed at-or-after the
        # cutoff is retained IN ADDITION to the keep_last window, so
        # AS-OF-timestamp travel stays answerable across the period.
        # Pre-stamp legacy manifests have no committed_at and are
        # conservatively retained by the age rule.
        for v in versions:
            at = _read_manifest(root, v).get("committed_at")
            if at is None or at >= keep_newer_than_ts:
                by_age.add(v)
    retained = sorted(
        set(recent) | by_age
        | {v for v in (keep_versions or ()) if v in set(versions)}
    )
    live: set[str] = set()
    for v in retained:
        live.update(_read_manifest(root, v)["files"])
    newest_ledger = _read_manifest(root, retained[-1]).get("epochs", {})
    now = time.time()
    removed = skipped_young = 0
    for path in glob.glob(f"{root}/{_DATA_DIR}/part-*.parquet"):
        if os.path.basename(path) in live:
            continue
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue  # already gone (concurrent vacuum)
        if age < grace_seconds:
            skipped_young += 1  # possibly staged by an in-flight commit
            continue
        if not dry_run:
            try:
                os.remove(path)
            except FileNotFoundError:
                continue  # concurrent vacuum won the race
        removed += 1
    dropped = kept_epoch = 0
    for v in versions:
        if v in retained:
            continue
        try:
            m = _read_manifest(root, v)
        except FileNotFoundError:
            continue  # concurrent vacuum already dropped it
        if "epochs" not in m and m["op"].startswith("append-epoch:"):
            # legacy epoch manifest: its op string is the only durable
            # record of the epoch unless the ledger now covers it (the
            # next commit_stream_epoch folds legacy epochs forward, which
            # is what eventually releases these manifests)
            eid = m["op"].split(":", 2)[1]
            if eid not in newest_ledger:
                kept_epoch += 1
                continue
        if not dry_run:
            try:
                os.remove(_manifest_path(root, v))
            except FileNotFoundError:
                continue  # concurrent vacuum won the race
        dropped += 1
    # stale stage dirs from crashed writers are unreferenced by definition,
    # but young ones may belong to a LIVE writer mid-stage — same grace
    for stale in glob.glob(f"{root}/.stage-*"):
        try:
            if now - os.path.getmtime(stale) < grace_seconds:
                continue
        except OSError:
            continue
        if not dry_run:
            shutil.rmtree(stale, ignore_errors=True)
    out = {
        "data_files_removed": removed,
        "manifests_removed": dropped,
        "young_orphans_skipped": skipped_young,
        "legacy_epoch_manifests_kept": kept_epoch,
    }
    # ``dry_run=True`` REPORTS the same counters a real run would act on
    # and touches NOTHING — the operational what-if before a maintenance
    # window (pairs with verify_table's fsck)
    if dry_run:
        out["dry_run"] = True
    return out
