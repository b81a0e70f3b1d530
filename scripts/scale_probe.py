#!/usr/bin/env python
"""Scale probe (VERDICT r3 item 5): do the pair miners and ANN paths grow
~linearly with their CANDIDATE volume — not quadratically with the corpus —
and do their driver-side touches stay bounded as the corpus grows?

The sf0.1 gate cannot distinguish an O(N²) constant from an O(N) one; this
probe can.  It synthesizes tiled corpora at 1×/3×/10× of sf0.1 (≈ sf1.0 at
the top) with per-copy perturbation chosen so TRUE pair density stays
constant per row (exact tiling would manufacture quadratically many
cross-copy duplicates and poison the measurement):

* documents — every 3rd token of each copy gets a per-copy suffix, so
  intra-copy near-dup structure is preserved (both members of a pair
  transform identically) while cross-copy shingle Jaccard collapses;
* customer — keys offset per copy and names re-derived from the new key,
  so q161's suffix blocks stay copy-unique and candidate volume linear;
* supplier/embeddings — keys offset; embeddings get per-copy deterministic
  jitter (ANN bucket sizes, the cost driver, depend on N, not on
  cross-copy similarity).

For each (query, scale) it records wall seconds, output rows, and —
via a DataFrame.collect shim — the TOTAL ROWS COLLECTED TO THE DRIVER.
Assertions (exit 1 on failure):

* wall time at 10× ≤ LINEAR_SLACK × the candidate-volume growth
  (candidates = output rows; q135's candidates legitimately grow ~s²
  with density, so time is held to its candidate curve, not to N);
* driver-collected rows stay under an absolute per-path cap at EVERY
  scale (the caps document the code's own bounds: IVF's 4096-vector
  training sample, the broadcast query matrix, one-row aggregates).

Writes SCALE.md at the repo root.  Usage:

    python scripts/scale_probe.py [work_dir]  # default /tmp/spark_graft_scale
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 3, 10)
ID_STRIDE = 10_000_000
LINEAR_SLACK = 3.0  # fixed overheads + noise; a true O(N²) path shows >> this

# absolute driver-row caps per probed path (documented code bounds + slack):
# ANN paths collect the broadcast query matrix (64 rows) and IVF's training
# sample (min(4096, N)); the pair miners collect nothing but one-row probes.
DRIVER_ROW_CAPS = {
    "q32_minhash_lsh_pairs": 200,
    "q38_jaccard_prefix_filter": 200,
    "q121_repeated_ngram_spans": 200,
    "q161_probabilistic_linkage": 200,
    "q135_geo_near_join": 200,
    # boilerplate collects nothing; hierarchy's per-level emptiness probes
    # are 0-row driver touches (isEmpty), its output is N rows but never
    # collected by the probe body
    "q188_boilerplate_removal": 200,
    "q189_hierarchy_rollup": 200,
    "ann_lsh_topk": 6000,
    "ann_ivf_topk": 6000,
    # the LSH coarse quantizer collects nothing (one mapInPandas GEMM);
    # components' emptiness probes are 0-row driver touches
    "semdedup_prune": 200,
    # q213 additionally collects the corpus count (one row) for the plane
    # formula and the per-round convergence probes (limit(1) counts)
    "incremental_semdedup": 200,
    # q211's driver state is watermark rows + per-window boundary probes
    # (3 stages × ~30 one-day windows × 2 phases, a few rows each) — a
    # constant of the CHUNKING, independent of events-per-day
    "watermark_cascade": 1200,
}


def _perturb_tokens(text: str, k: int) -> str:
    if k == 0:
        return text
    toks = text.split(" ")
    return " ".join(
        f"{t}x{k}" if i % 3 == 0 else t for i, t in enumerate(toks)
    )


def build_scaled(work_dir: str, factor: int) -> str:
    out = f"{work_dir}/x{factor}"
    if os.path.isdir(out) and os.path.exists(f"{out}/_DONE_v2"):
        return out
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    parts = []
    for k in range(factor):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * ID_STRIDE
        if k:
            c["text"] = [_perturb_tokens(t, k) for t in c["text"]]
            c["n_chars"] = c["text"].str.len()
        parts.append(c)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{out}/documents.parquet",
    )

    cust = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    parts = []
    for k in range(factor):
        c = cust.copy()
        c["c_custkey"] = c["c_custkey"] + k * ID_STRIDE
        if k:
            c["c_name"] = [f"Customer#{key % 10**9:09d}" for key in c["c_custkey"]]
        parts.append(c)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{out}/customer.parquet",
    )

    supp = pq.read_table(f"{SRC}/supplier.parquet").to_pandas()
    parts = []
    for k in range(factor):
        c = supp.copy()
        c["s_suppkey"] = c["s_suppkey"] + k * ID_STRIDE
        parts.append(c)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{out}/supplier.parquet",
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    parts = []
    for k in range(factor):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * ID_STRIDE
        if k:
            rng = np.random.RandomState(k)
            c["embedding"] = [
                (np.asarray(v, dtype=np.float32)
                 * (1.0 + 0.05 * rng.standard_normal(len(v))).astype(np.float32))
                for v in c["embedding"]
            ]
        parts.append(c)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{out}/embeddings.parquet",
    )

    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    parts = []
    for k in range(factor):
        c = ev.copy()
        c["event_id"] = c["event_id"] + k * ID_STRIDE
        # timestamps unchanged: ×k means ×k EVENTS PER DAY (a hotter
        # stream), so the cascade's day-window count stays constant and
        # each window job carries k× the rows — the realistic scale axis
        parts.append(c)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False),
        f"{out}/events.parquet",
    )

    open(f"{out}/_DONE_v2", "w").close()
    return out


class CollectMeter:
    """Counts every row any DataFrame.collect() ships to the driver."""

    def __init__(self):
        # patch the CONCRETE class: in Spark 4 `pyspark.sql.DataFrame` is a
        # dispatch parent and classic instances override collect, so a
        # parent patch silently counts nothing
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # Spark < 4
            from pyspark.sql import DataFrame

        self.rows = 0
        self._cls = DataFrame
        self._orig = DataFrame.collect

    def __enter__(self):
        meter = self

        def patched(df):
            out = meter._orig(df)
            meter.rows += len(out)
            return out

        self._cls.collect = patched
        return self

    def __exit__(self, *exc):
        self._cls.collect = self._orig
        return False


def probed_paths(spark):
    """(name, fn(sf_dir) -> DataFrame) for every probed path."""
    from pyspark.sql import functions as F

    from python_async_sample_spark.operators.similarity import ivf_topk, lsh_topk
    from python_async_sample_spark.plans.registry import load_all
    from python_async_sample_spark.sources.readers import load_table

    specs = load_all()
    paths = [
        (n, (lambda n: lambda d: specs[n].fn(spark, d))(n))
        for n in (
            "q32_minhash_lsh_pairs",
            "q38_jaccard_prefix_filter",
            "q121_repeated_ngram_spans",
            "q161_probabilistic_linkage",
            "q135_geo_near_join",
            # round-5 additions with pair-miner / closure shapes worth the
            # same scrutiny: the boilerplate shingle relation must stay
            # linear in tokens, the hierarchy closure Σdepth-sized
            "q188_boilerplate_removal",
            "q189_hierarchy_rollup",
        )
    ]

    def _ann(kernel):
        def run(sf_dir):
            emb = load_table(spark, sf_dir, "embeddings")
            # FIXED 64-query set regardless of corpus size — the scale
            # question is per-query cost vs corpus N
            queries = emb.where(F.col("vec_id") < 64)
            return kernel(emb, queries, "vec_id", "embedding", k=10)

        return run

    paths.append(("ann_lsh_topk", _ann(
        lambda e, q, i, v, k: lsh_topk(e, q, i, v, k=k, n_planes=6, dim=64))))
    paths.append(("ann_ivf_topk", _ann(
        lambda e, q, i, v, k: ivf_topk(e, q, i, v, k=k))))

    def _semdedup(sf_dir):
        # Probes the REGISTERED q200 (round-6: the hyperplane-quantizer
        # face with planes ∝ log N was promoted from this probe to the
        # registry per VERDICT r5 item 3).  SemDeDup's scale contract is
        # constant expected block size — the quantizer is one linear GEMM
        # pass and within-block candidate pairs grow LINEARLY with the
        # corpus.  The previously-registered fixed-k k-means face (now
        # q212, the exactness twin) measured 25-30× time at 10× corpus
        # here: flat Lloyd's with k ∝ N is O(N·k·d) = quadratic, and
        # fixed k makes the pair mining O(N²/k).
        from python_async_sample_spark.plans.registry import QUERIES, load_all

        if not QUERIES:
            load_all()
        return QUERIES["q200_semdedup_prune"].fn(spark, sf_dir)

    paths.append(("semdedup_prune", _semdedup))

    def _incr_semdedup(sf_dir):
        # q213: the batch (1/4 of the corpus) grows WITH the corpus, but
        # per-bucket work is batch-rows x bucket-size — with the log-N
        # plane count holding bucket size constant, total time must track
        # the batch linearly, never history x history.
        from python_async_sample_spark.plans.registry import QUERIES, load_all

        if not QUERIES:
            load_all()
        return QUERIES["q213_incremental_semdedup"].fn(spark, sf_dir)

    paths.append(("incremental_semdedup", _incr_semdedup))

    def _cascade(sf_dir):
        # q211: the three-stage watermark cascade over a ×k-hotter event
        # stream (same day-window count, k× rows per window job).  The
        # incremental family's probe: wall must track the data linearly —
        # per-window fixed costs (watermark reads, delete-then-insert
        # swaps, 3 stages × ~30 windows × 2 phases of driver-issued jobs)
        # dominate at ×1, so slack well under 1 is expected; driver rows
        # stay O(watermarks), never O(events).
        from python_async_sample_spark.plans.registry import QUERIES, load_all

        if not QUERIES:
            load_all()
        return QUERIES["q211_watermark_cascade"].fn(spark, sf_dir)

    paths.append(("watermark_cascade", _cascade))
    return paths


def main() -> int:
    work_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale"
    os.makedirs(work_dir, exist_ok=True)

    from python_async_sample_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    dirs = {f: build_scaled(work_dir, f) for f in SCALES}
    print(f"scaled corpora ready under {work_dir}", flush=True)

    results: dict[str, dict[int, dict]] = {}
    paths = probed_paths(spark)
    # warm the codegen/session once on the smallest scale
    for name, fn in paths:
        fn(dirs[SCALES[0]]).write.format("noop").mode("overwrite").save()
    # PATH-major: each path's three scale measurements run back-to-back so
    # they share comparable session state (codegen cache, driver heap).
    # Factor-major measured one path's ×10 right after ANOTHER path's ×3
    # plans had bloated the JVM — q121's ×10 read 6× slower than the same
    # query on a quiet session, flagging a phantom superlinearity.
    for name, fn in paths:
        for factor in SCALES:
            with CollectMeter() as meter:
                t0 = time.time()
                df = fn(dirs[factor])
                n_out = df.count()
                dt = time.time() - t0
            results.setdefault(name, {})[factor] = {
                "rows": n_out, "sec": dt, "driver_rows": meter.rows,
            }
            print(f"x{factor} {name}: {n_out} rows {dt:.1f}s "
                  f"driver={meter.rows}", flush=True)

    lo, hi = SCALES[0], SCALES[-1]
    failures = []
    lines = [
        "# SCALE — pair-miner / ANN growth probe (generated by scripts/scale_probe.py)",
        "",
        f"Corpora: sf0.1 tiled ×{list(SCALES)} with per-copy perturbation "
        "(constant true-pair density per row; see the script docstring). "
        f"Top scale ≈ sf1.0 — documents ×{hi}, customers ×{hi}, embeddings "
        f"×{hi}, events ×{hi} (timestamps unchanged: a {hi}×-hotter stream, "
        "same day-window count).",
        "",
        "| path | scale | output rows | seconds | driver rows |",
        "|---|---|---|---|---|",
    ]
    for name, by_scale in results.items():
        for factor in SCALES:
            r = by_scale[factor]
            lines.append(
                f"| {name} | ×{factor} | {r['rows']} | {r['sec']:.1f} | {r['driver_rows']} |"
            )
    lines += ["", "## Growth (×1 → ×10)", "",
              "| path | candidate growth | time growth | time/candidate slack | driver-rows cap (max seen) | verdict |",
              "|---|---|---|---|---|---|"]
    for name, by_scale in results.items():
        cand_g = max(1.0, by_scale[hi]["rows"] / max(1, by_scale[lo]["rows"]))
        # a path's honest work floor is max(candidates, corpus): reading N
        # rows is linear in N even when qualifying pairs stay constant
        work_g = max(cand_g, hi / lo)
        time_g = by_scale[hi]["sec"] / max(1e-9, by_scale[lo]["sec"])
        slack = time_g / work_g
        max_driver = max(by_scale[f]["driver_rows"] for f in SCALES)
        cap = DRIVER_ROW_CAPS[name]
        ok_time = time_g <= LINEAR_SLACK * work_g
        ok_driver = max_driver <= cap
        verdict = "OK" if (ok_time and ok_driver) else "FAIL"
        if not ok_time:
            failures.append(
                f"{name}: time grew {time_g:.1f}× vs work growth {work_g:.1f}× "
                f"(slack {slack:.2f} > {LINEAR_SLACK})"
            )
        if not ok_driver:
            failures.append(
                f"{name}: driver rows {max_driver} exceed cap {cap}"
            )
        lines.append(
            f"| {name} | {cand_g:.1f}× | {time_g:.1f}× | {slack:.2f} | "
            f"{max_driver} ≤ {cap} | {verdict} |"
        )
    lines += [
        "",
        "Interpretation: `time/candidate slack` ≈ 1 means wall time tracks the",
        "path's honest work (max of candidate volume and corpus size); a",
        "quadratic-in-N path with constant candidates would show slack ≈ N-growth",
        f"(×{hi // lo}). q135's candidates legitimately grow superlinearly (fixed",
        "coordinate space ⇒ density ∝ N on both sides), so its time is held to",
        "its candidate curve. Driver rows are absolute caps, scale-independent:",
        "the ANN paths collect only the 64-query broadcast matrix + IVF's",
        "min(4096, N) training sample; the miners collect one-row probes.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    if failures:
        print("\nFAILURES:\n" + "\n".join(failures), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
