"""Property tests: the distributed operators equal pure-Python references
on arbitrary inputs (hypothesis generates the corpora, Python computes the
ground truth, Spark must match exactly).

Few examples per property — each example is a full Spark job — but the
inputs are adversarial in exactly the spots fixture data never covers:
equal timestamps, gap boundaries, zero-token docs, self-loop-free random
graphs with long chains.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from python_async_sample_spark.operators.cluster import dedup_clusters
from python_async_sample_spark.operators.packing import pack_sequences
from python_async_sample_spark.operators.sessionize import sessionize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP_US = 30 * 60 * 1_000_000
BASE = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=0, max_value=3))
        # offsets cluster around the 30-min boundary to hit the edge cases,
        # including exact-equal timestamps within a user
        off = draw(
            st.one_of(
                st.integers(min_value=0, max_value=5 * GAP_US),
                st.sampled_from([0, GAP_US - 1, GAP_US, GAP_US + 1, 2 * GAP_US]),
            )
        )
        rows.append((i, user, BASE + off))
    return rows


def _sessions_reference(rows):
    """Pure-Python sessionizer: per user, order by (ts, event_id), new
    session when gap > 30 min."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, user, tus in rows:
        by_user.setdefault(user, []).append((tus, eid))
    for user, evs in by_user.items():
        evs.sort()
        sess, prev = 0, None
        for tus, eid in evs:
            if prev is None or tus - prev > GAP_US:
                sess += 1
            out[eid] = (user, sess)
            prev = tus
    return out


@given(event_sets())
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(eid, user, datetime.fromtimestamp(tus / 1e6, tz=timezone.utc)) for eid, user, tus in rows],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_no"])
        for r in sessionize(df).collect()
    }
    assert got == _sessions_reference(rows)


@st.composite
def edge_lists(draw):
    n_nodes = draw(st.integers(min_value=1, max_value=20))
    n_edges = draw(st.integers(min_value=0, max_value=30))
    edges = [
        tuple(
            sorted(
                (
                    draw(st.integers(min_value=0, max_value=n_nodes - 1)),
                    draw(st.integers(min_value=0, max_value=n_nodes - 1)),
                )
            )
        )
        for _ in range(n_edges)
    ]
    return n_nodes, [(a, b) for a, b in edges if a != b]


def _components_reference(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


@given(edge_lists())
@settings(**_SETTINGS)
def test_dedup_clusters_match_union_find(spark, graph):
    n_nodes, edges = graph
    docs = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(edges or [(0, 0)], "d1 long, d2 long")
    if not edges:
        pairs = pairs.where(F.lit(False))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs, "doc_id").collect()
    }
    assert got == _components_reference(n_nodes, edges)


@st.composite
def token_streams(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    return [draw(st.integers(min_value=0, max_value=40)) for _ in range(n)]


@given(token_streams(), st.integers(min_value=1, max_value=16))
@settings(**_SETTINGS)
def test_packing_matches_running_sum(spark, toks, budget):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    df1 = df.withColumn("stream", F.lit(1))
    packed = {
        r["doc_id"]: (r["cum_before"], r["pack_id"], r["pack_offset"], r["pack_end"])
        for r in pack_sequences(df1, ["stream"], "doc_id", "n_tokens", budget)
        .collect()
    }
    cum = 0
    for i, t in enumerate(toks):
        pack_id, off = divmod(cum, budget)
        end = (cum + max(t, 1) - 1) // budget
        assert packed[i] == (cum, pack_id, off, end), f"doc {i}"
        cum += t


@given(
    st.lists(st.integers(min_value=0, max_value=16), min_size=1, max_size=30),
    st.integers(min_value=2, max_value=5),
)
@settings(**_SETTINGS)
def test_shard_assignment_structural_guarantees(spark, toks, n_shards):
    """Docs are pre-chunked to <= budget (the operator's documented
    precondition). The operator's HARD guarantees are structural — chunk
    counts per shard within one, shard = pack % n for every doc, no doc
    split across shards. Token-sum balance is statistical only: a periodic
    stream (15,16,1 against budget 16, 2 shards) legitimately skews token
    sums linearly, which is why no constant-spread assertion appears here
    (hypothesis found the counterexample; see assign_shards' docstring)."""
    from python_async_sample_spark.operators.packing import assign_shards

    budget = 16
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    ).withColumn("stream", F.lit(1))
    packed = pack_sequences(df, ["stream"], "doc_id", "n_tokens", budget)
    sharded = assign_shards(packed, n_shards)
    rows = sharded.collect()
    assert {r["shard_id"] for r in rows} <= set(range(n_shards))
    # every document follows its first token's chunk: shard = pack_id % n
    for r in rows:
        assert r["shard_id"] == r["pack_id"] % n_shards
    # chunk-count balance: round-robin puts within-one chunk counts on
    # every shard over the OCCUPIED chunk range
    packs = sorted({r["pack_id"] for r in rows})
    if packs:
        full_range = range(min(packs), max(packs) + 1)
        counts = [sum(1 for p in full_range if p % n_shards == s) for s in range(n_shards)]
        assert max(counts) - min(counts) <= 1
    # chunk starting mass < 2 budgets (docs <= budget by precondition)
    per_pack: dict[int, int] = {}
    for r in rows:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(m < 2 * budget for m in per_pack.values()), per_pack


def test_hash_sharding_collapses_periodic_adversary(spark):
    """Round-8 mode for round 7's hypothesis counterexample: sizes 15,16,1
    repeating against budget 16 and 2 shards put every heavy chunk (31
    tokens) on one residue class — round-robin spread grows LINEARLY in
    stream length (3000 tokens here). ``shard_key="hash"`` decorrelates
    shard from residue: the same stream's spread must collapse while the
    structural guarantees (doc follows its first token's chunk, chunk
    never split across shards, shard ids in range, deterministic) hold."""
    from python_async_sample_spark.operators.packing import assign_shards

    budget, n_shards = 16, 2
    toks = [15, 16, 1] * 100  # 200 packs: evens carry 31 tokens, odds 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    ).withColumn("stream", F.lit(1))
    packed = pack_sequences(df, ["stream"], "doc_id", "n_tokens", budget)

    def token_spread(mode: str) -> int:
        per = {
            r["shard_id"]: r["toks"]
            for r in assign_shards(packed, n_shards, shard_key=mode)
            .groupBy("shard_id")
            .agg(F.sum("n_tokens").alias("toks"))
            .collect()
        }
        return max(per.values()) - (min(per.values()) if len(per) == n_shards else 0)

    s_pack = token_spread("pack")
    assert s_pack == 100 * 31 - 100 * 1  # the adversary really is linear
    s_hash = token_spread("hash")
    assert s_hash <= s_pack / 4, (s_hash, s_pack)

    rows = assign_shards(packed, n_shards, shard_key="hash").collect()
    # structural: every row of a pack lands on ONE shard (never split),
    # ids in range, and the assignment is a pure function of pack_id
    by_pack: dict[int, set[int]] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], set()).add(r["shard_id"])
        assert 0 <= r["shard_id"] < n_shards
    assert all(len(s) == 1 for s in by_pack.values())
    again = assign_shards(packed, n_shards, shard_key="hash").collect()
    assert {(r["doc_id"], r["shard_id"]) for r in rows} == {
        (r["doc_id"], r["shard_id"]) for r in again
    }
    with pytest.raises(ValueError, match="shard_key"):
        assign_shards(packed, n_shards, shard_key="greedy")


def test_shard_assignment_balances_uniform_stream(spark):
    """The statistical balance claim on a benign (uniform-ish) stream:
    200 docs of sizes cycling 1..13 against budget 16 — no residue-class
    resonance, so token sums land within a few budgets across 4 shards."""
    from python_async_sample_spark.operators.packing import assign_shards

    budget, n_shards = 16, 4
    toks = [(i % 13) + 1 for i in range(200)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    ).withColumn("stream", F.lit(1))
    packed = pack_sequences(df, ["stream"], "doc_id", "n_tokens", budget)
    per_shard = {
        r["shard_id"]: r["toks"]
        for r in assign_shards(packed, n_shards)
        .groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    assert len(per_shard) == n_shards
    spread = max(per_shard.values()) - min(per_shard.values())
    assert spread <= 3 * budget, per_shard


@st.composite
def asof_frames(draw):
    n_left = draw(st.integers(min_value=1, max_value=15))
    n_right = draw(st.integers(min_value=0, max_value=15))
    # coarse timestamps force plenty of exact ties across and within sides
    t = lambda: draw(st.integers(min_value=0, max_value=8)) * 1_000_000
    k = lambda: draw(st.integers(min_value=0, max_value=2))
    left = [(i, k(), BASE + t()) for i in range(n_left)]
    right = [(100 + i, k(), BASE + t(), float(i)) for i in range(n_right)]
    return left, right


@given(asof_frames())
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, frames):
    import pandas as pd

    from python_async_sample_spark.operators.asof import asof_join

    left, right = frames
    ldf = spark.createDataFrame(
        [(i, u, datetime.fromtimestamp(t / 1e6, tz=timezone.utc)) for i, u, t in left],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, u, datetime.fromtimestamp(t / 1e6, tz=timezone.utc), v) for i, u, t, v in right],
        "rid long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            ldf, rdf, ["user_id"], "ts", "ts", payload_cols=["rid", "value"]
        ).collect()
    }

    if not right:
        assert all(v is None for v in got.values())
        return
    lpd = pd.DataFrame(left, columns=["event_id", "user_id", "tus"]).sort_values(
        ["tus", "event_id"], kind="stable"
    )
    # pandas keeps the LAST right row on ties; the operator breaks payload
    # ties deterministically by the payload sort key — sort right so the
    # last row per (key, ts) is the max (rid, value), matching the operator
    rpd = pd.DataFrame(right, columns=["rid", "user_id", "tus", "value"]).sort_values(
        ["tus", "rid", "value"], kind="stable"
    )
    want_df = pd.merge_asof(
        lpd, rpd, on="tus", by="user_id", direction="backward"
    )
    want = dict(zip(want_df["event_id"], want_df["value"]))
    for eid in got:
        w = want[eid]
        if got[eid] is None:
            assert pd.isna(w)
        else:
            assert got[eid] == w


@given(event_sets())
@settings(**_SETTINGS)
def test_resample_ffill_matches_reference(spark, rows):
    from python_async_sample_spark.operators.resample import resample_ffill

    df = spark.createDataFrame(
        [
            (eid, user, datetime.fromtimestamp(tus / 1e6, tz=timezone.utc), float(eid))
            for eid, user, tus in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["bucket"]): (r["n_events"], r["value"])
        for r in resample_ffill(
            df, "user_id", "ts", "value", "event_id", interval_s=3600
        ).collect()
    }

    by_user: dict[int, list] = {}
    for eid, user, tus in rows:
        by_user.setdefault(user, []).append((tus, eid))
    want = {}
    for user, evs in by_user.items():
        buckets: dict[int, list] = {}
        for tus, eid in evs:
            buckets.setdefault(tus // 3_600_000_000, []).append((tus, eid))
        lo, hi = min(buckets), max(buckets)
        last = None
        for b in range(lo, hi + 1):
            if b in buckets:
                # last observation in bucket: max (ts, event_id); value = eid
                last = float(max(buckets[b])[1])
                want[(user, b)] = (len(buckets[b]), last)
            else:
                want[(user, b)] = (0, last)
    assert got == want


# ---------------------------------------------------------------------------
# Round-5 operators vs pure-Python references
# ---------------------------------------------------------------------------


@st.composite
def boilerplate_corpora(draw):
    """Small corpora with a shared template planted in a random subset —
    adversarial at the threshold boundary and at overlapping shingles."""
    n_docs = draw(st.integers(min_value=1, max_value=12))
    vocab = ["a", "b", "c", "d", "e"]
    tpl = ["t1", "t2", "t3", "t4", "t5"]
    rows = []
    for i in range(n_docs):
        body_len = draw(st.integers(min_value=0, max_value=12))
        body = [draw(st.sampled_from(vocab)) for _ in range(body_len)]
        with_tpl = draw(st.booleans())
        toks = (tpl + body) if with_tpl else body
        rows.append((i, "s", " ".join(toks)))
    return rows


def _boilerplate_reference(rows, n=5, num=3, den=10):
    docs = {i: text.split(" ") if text else [""] for i, _, text in rows}
    n_docs = len(docs)
    from collections import defaultdict

    df_docs = defaultdict(set)
    for i, toks in docs.items():
        for p in range(len(toks) - n + 1):
            df_docs[tuple(toks[p:p + n])].add(i)
    boiler = {sh for sh, ds in df_docs.items() if len(ds) * den >= num * n_docs}
    out = {}
    for i, toks in docs.items():
        covered = set()
        for p in range(len(toks) - n + 1):
            if tuple(toks[p:p + n]) in boiler:
                covered.update(range(p, p + n))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@given(boilerplate_corpora())
@settings(**_SETTINGS)
def test_boilerplate_clean_matches_reference(spark, rows):
    from python_async_sample_spark.operators.text import shingle_boilerplate_clean

    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in shingle_boilerplate_clean(df).collect()
    }
    assert got == _boilerplate_reference(rows)


@st.composite
def interval_sets(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=0, max_value=2))
        # cluster starts around the 300s span boundary, ties included
        off = draw(
            st.one_of(
                st.integers(min_value=0, max_value=1200),
                st.sampled_from([0, 299, 300, 301, 600]),
            )
        )
        rows.append((i, user, off * 1_000_000))
    return rows


def _coalesce_reference(rows, span=300_000_000):
    from collections import defaultdict

    by_user = defaultdict(list)
    for _, u, s in rows:
        by_user[u].append((s, s + span))
    out = {}
    for u, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        lens = [e - s for s, e in islands]
        out[u] = (len(islands), sum(lens), max(lens))
    return out


@given(interval_sets())
@settings(**_SETTINGS)
def test_interval_coalesce_matches_reference(spark, rows):
    """The q192 window program (flag + prefix-sum islands) must equal the
    obvious sequential merge on arbitrary inputs — including exact-touch
    (s == prev_e) and tied starts."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(rows, "event_id int, user_id int, s long")
    iv = df.select("user_id", "event_id", "s", (F.col("s") + 300_000_000).alias("e"))
    w_prev = (
        W.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id", "event_id", "s", "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0).alias("f"),
    )
    w_run = (
        W.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.select("user_id", "s", "e", F.sum("f").over(w_run).alias("i"))
    merged = islands.groupBy("user_id", "i").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    got = {
        r["user_id"]: (r["n"], r["cov"], r["lg"])
        for r in merged.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ie") - F.col("is_")).alias("cov"),
            F.max(F.col("ie") - F.col("is_")).alias("lg"),
        ).collect()
    }
    assert got == _coalesce_reference(rows)


@st.composite
def forests(draw):
    """Random parent assignments where parent id < own id — guaranteed
    acyclic, arbitrary fan-out/depth, several roots."""
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        parent = None if (i == 0 or draw(st.booleans()) and i < 3) else draw(
            st.integers(min_value=0, max_value=i - 1)
        )
        rows.append((i, parent, draw(st.integers(min_value=0, max_value=9))))
    return rows


def _hierarchy_reference(rows):
    parent = {i: p for i, p, _ in rows}
    val = {i: v for i, _, v in rows}
    out = {}
    for i in parent:
        path, node = [], i
        while node is not None:
            path.append(node)
            node = parent[node]
        out[i] = (len(path) - 1, path[-1], "/".join(str(x) for x in reversed(path)))
    sub = {}
    for i in parent:
        node, chain = i, []
        while node is not None:
            chain.append(node)
            node = parent[node]
        for anc in chain:
            n, s = sub.get(anc, (0, 0))
            sub[anc] = (n + 1, s + val[i])
    return out, sub


@given(forests())
@settings(**_SETTINGS)
def test_hierarchy_matches_reference(spark, rows):
    from python_async_sample_spark.operators.hierarchy import (
        flatten_hierarchy,
        subtree_rollup,
    )

    df = spark.createDataFrame(rows, "id long, parent long, v long")
    want_tree, want_sub = _hierarchy_reference(rows)
    got_tree = {
        r["id"]: (r["level"], r["root_id"], r["path"])
        for r in flatten_hierarchy(df, "id", "parent").collect()
    }
    assert got_tree == want_tree
    got_sub = {
        r["id"]: (r["n"], r["s"])
        for r in subtree_rollup(
            df, "id", "parent",
            {"n": F.count(F.lit(1)).cast("bigint"), "s": F.sum("v").cast("bigint")},
        ).collect()
    }
    assert got_sub == want_sub


def test_bm25_deduplicates_query_terms(spark, sf_dir):
    """Review pin: a repeated query term must score once (classic BM25 over
    DISTINCT terms — the pre-rewrite isin+groupBy shape collapsed
    duplicates implicitly; per-occurrence columns would silently double a
    term's contribution)."""
    from python_async_sample_spark.operators.text import bm25_scores
    from python_async_sample_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    once = {r["doc_id"]: r["score"]
            for r in bm25_scores(docs, "doc_id", "text", ["the", "data"]).collect()}
    twice = {r["doc_id"]: r["score"]
             for r in bm25_scores(docs, "doc_id", "text", ["the", "data", "the"]).collect()}
    assert once and once == twice


def test_isotonic_minimax_equals_sequential_pava(spark, sf_dir):
    """q215 computes the isotonic fit via cal[k] = max_{i<=k} min_{j>=k}
    avg(i..j); pin that identity against a reference SEQUENTIAL PAVA
    (pool-adjacent-violators with weighted means) on the same bins, plus
    monotonicity and the weighted-mean-preservation invariant."""
    from python_async_sample_spark.plans.registry import load_all

    rows = load_all()["q215_isotonic_calibration"].fn(spark, sf_dir).collect()
    bins = [(r["bin"], r["n"], r["sum_pos"]) for r in rows]
    got = [r["calibrated"] for r in rows]

    # reference PAVA: pools as (sum, n) so means are exact
    pools = []  # [sum_pos, n]
    for _, n, sy in bins:
        pools.append([sy, n])
        while len(pools) > 1 and pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]:
            s2, n2 = pools.pop()
            pools[-1][0] += s2
            pools[-1][1] += n2
    # expand pooled means back over their member bins
    ref, idx = [], 0
    for s, n in pools:
        members = 0
        while members < n:
            members += bins[idx][1]
            ref.append(round(s / n, 9))
            idx += 1
    assert got == ref
    assert got == sorted(got)  # monotone
    # weighted mean preserved: sum(cal*n) == sum(sum_pos)
    assert abs(sum(c * n for c, (_, n, _) in zip(got, bins))
               - sum(sy for _, _, sy in bins)) < 1e-6


def _bfd_reference(items, budget):
    """Pure-Python best-fit-decreasing: items = [(shard, id0, id1, need)];
    returns {(shard, id0, id1): bin} with 1-based creation-order bins."""
    out = {}
    for sh in {i[0] for i in items}:
        its = sorted((i for i in items if i[0] == sh),
                     key=lambda r: (-r[3], r[1], r[2]))
        rem = []
        for _, a, b, need in its:
            fits = [ix for ix, r in enumerate(rem) if r >= need]
            if fits:
                best = min(fits, key=lambda ix: (rem[ix], ix))
                rem[best] -= need
                out[(sh, a, b)] = best + 1
            else:
                rem.append(budget - need)
                out[(sh, a, b)] = len(rem)
    return out


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=1, max_value=16), min_size=1, max_size=60),
    st.integers(min_value=16, max_value=24),
)
def test_best_fit_pack_matches_reference(spark, lens, budget):
    """best_fit_pack equals the pure-Python BFD on arbitrary instances
    (adversarial near-boundary sizes, duplicate lengths exercising the
    lowest-index tie-break), and satisfies the any-fit validity bound."""
    from python_async_sample_spark.operators.packing import best_fit_pack

    rows = [(i % 3, i, 0, lens[i]) for i in range(len(lens))]
    df = spark.createDataFrame(
        rows, "shard: bigint, doc_id: bigint, chunk_no: bigint, need: bigint"
    )
    got = {
        (r["shard"], r["doc_id"], r["chunk_no"]): r["bin"]
        for r in best_fit_pack(df, "shard", "need", ["doc_id", "chunk_no"], budget).collect()
    }
    assert got == _bfd_reference(rows, budget)
    # validity: no bin over budget; any-fit bound per shard (at most one
    # open bin can end at <= half-full, so bins <= ceil(2*total/budget)+1)
    for sh in {r[0] for r in rows}:
        loads: dict[int, int] = {}
        for (s, a, b), bin_ in got.items():
            if s == sh:
                loads[bin_] = loads.get(bin_, 0) + dict(
                    ((r[0], r[1], r[2]), r[3]) for r in rows
                )[(s, a, b)]
        assert all(v <= budget for v in loads.values())
        total = sum(loads.values())
        assert len(loads) <= -(-2 * total // budget) + 1


def test_best_fit_pack_rejects_oversized_items(spark):
    """An item longer than the budget must fail loudly, never silently
    truncate or open an over-full bin."""
    from python_async_sample_spark.operators.packing import best_fit_pack

    df = spark.createDataFrame(
        [(0, 1, 0, 65)], "shard: bigint, doc_id: bigint, chunk_no: bigint, need: bigint"
    )
    with pytest.raises(Exception, match="budget"):
        best_fit_pack(df, "shard", "need", ["doc_id", "chunk_no"], 64).collect()


def test_best_fit_waste_beats_next_fit_at_three_scales(spark):
    """The VERDICT r9 item-6 measurement: on the documents corpus at
    sf0.001/0.01/0.1, BFD's total padding waste must be at most the
    next-fit arrival-order baseline's (measured ~13x lower at sf0.01:
    675 vs 9123 padding tokens)."""
    from python_async_sample_spark.operators.packing import (
        best_fit_pack, next_fit_pack,
    )
    from python_async_sample_spark.operators.sketches import portable_hash
    from python_async_sample_spark.sources.readers import load_table

    budget, n_shards = 64, 8
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = load_table(spark, f"/root/testdata/{sf}", "documents").select(
            "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")
        )
        nch = F.expr(f"(n + {budget - 1}) div {budget}")
        items = (
            t.select(
                "doc_id", "n", nch.alias("nch"),
                F.explode(F.sequence(F.lit(0).cast("bigint"), nch - 1)).alias("chunk_no"),
            )
            .select(
                "doc_id", "chunk_no",
                F.when(F.col("chunk_no") < F.col("nch") - 1, F.lit(budget))
                .otherwise(F.col("n") - (F.col("nch") - 1) * budget)
                .cast("bigint").alias("need"),
                (portable_hash(F.col("doc_id"), 0) % n_shards).cast("bigint").alias("shard"),
            )
        )

        def waste(df):
            bins = df.groupBy("shard", "bin").agg(F.sum("need").alias("u"))
            return bins.agg(
                F.sum(F.lit(budget) - F.col("u")).cast("bigint")
            ).first()[0]

        w_bfd = waste(best_fit_pack(items, "shard", "need", ["doc_id", "chunk_no"], budget))
        w_nf = waste(next_fit_pack(items, "shard", "need", ["doc_id", "chunk_no"], budget))
        assert w_bfd <= w_nf, (sf, w_bfd, w_nf)
        # the reduction is decisive on real text, not marginal
        assert w_bfd < w_nf // 2, (sf, w_bfd, w_nf)
