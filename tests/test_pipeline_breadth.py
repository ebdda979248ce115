"""Property tests for the round-5 pipeline-breadth operators
(zoom_spark/queries/pipeline_breadth.py). The oracle gate pins
cross-engine parity; these pin the ALGORITHMIC claims: alignment
invariance, sketch overestimate bounds, BFS correctness vs a python
referee, MAD robustness to injected outliers."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _dup_hits(spark, texts, fn):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import importlib
    from unittest.mock import patch

    mod = importlib.import_module(fn.__module__)
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        return fn(spark, SF_DIR).count()


def test_invariant_detects_misaligned_copy_where_stride_misses(spark):
    """The motivating case from the r4 advice: a >=31-char span
    duplicated at offsets NOT congruent mod 8. The stride-8 detector
    (duplicate_spans) misses it; the invariant detector must not."""
    span = "the quick brown fox jumps over lazy dog once"  # 44 chars
    # doc A: span at offset 0 (position 1); doc B: span at offset 3
    # (position 4) -> 4 % 8 != 1 % 8, a misaligned placement
    doc_a = span + " padding words here to extend"
    doc_b = "xy " + span + " other trailing content xx"
    from zoom_spark.queries.pipeline_breadth import duplicate_spans_invariant
    from zoom_spark.queries.text_analysis import duplicate_spans

    assert _dup_hits(spark, [doc_a, doc_b], duplicate_spans_invariant) > 0
    assert _dup_hits(spark, [doc_a, doc_b], duplicate_spans) == 0


def test_invariant_no_false_positives_on_disjoint_texts(spark):
    from zoom_spark.queries.pipeline_breadth import duplicate_spans_invariant

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
    ]
    assert _dup_hits(spark, texts, duplicate_spans_invariant) == 0


def test_countmin_overestimates_and_bounds(spark):
    """CMS point estimates never under-count, and the sf0.001 corpus
    has few enough distinct tokens that collisions stay bounded."""
    from zoom_spark.queries.pipeline_breadth import countmin_token_freq

    rows = countmin_token_freq(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["cms_est"] >= r["true_freq"], r


@settings(max_examples=20, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=30),
        min_size=1,
        max_size=25,
    )
)
def test_countmin_overestimate_property(counts):
    """Pure-python mirror of the sketch hash layout: for ANY
    multiset, min-over-rows of bucket counts >= true count."""
    import hashlib

    D, W = 4, 64

    def bucket(j, tok):
        return int(hashlib.md5(f"{j}|{tok}".encode()).hexdigest()[:8], 16) % W

    cells: dict = {}
    for tok, c in counts.items():
        for j in range(D):
            key = (j, bucket(j, tok))
            cells[key] = cells.get(key, 0) + c
    for tok, c in counts.items():
        est = min(cells[(j, bucket(j, tok))] for j in range(D))
        assert est >= c


def test_bfs_hops_match_python_referee(spark):
    """min-hops per node from the seed set, checked against a pure
    python BFS over the same co-purchase edges at sf0.001."""
    from zoom_spark.queries.pipeline_breadth import (
        BFS_HOPS,
        bfs_reachable_parts,
    )
    from zoom_spark.io import load_table
    from collections import defaultdict, deque

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    adj[u].add(v)
    seeds = {r["l_partkey"] for r in li if r["l_partkey"] % 1000 == 0}
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= BFS_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    expect: dict = {}
    for d in dist.values():
        expect[d] = expect.get(d, 0) + 1
    got = {
        r["hops"]: r["n_nodes"] for r in bfs_reachable_parts(spark, SF_DIR).collect()
    }
    assert got == expect


def test_mad_threshold_robust_to_injected_outliers(spark):
    """Swap 1% of one event type's values for enormous outliers: the
    MAD threshold must stay put (median/MAD have 50% breakdown),
    i.e. med and mad change by < 10% — unlike mean/std which the
    z-score variant would see explode."""
    from unittest.mock import patch

    import zoom_spark.queries.pipeline_breadth as pb
    from zoom_spark.io import load_table

    base = load_table(spark, SF_DIR, "events")
    before = {
        r["event_type"]: (r["med"], r["mad"])
        for r in pb.mad_robust_anomaly(spark, SF_DIR).collect()
    }
    poisoned = base.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "click") & (F.col("event_id") % 100 == 0),
            F.lit(1.0e9),
        ).otherwise(F.col("value")),
    )
    with patch.object(pb, "load_table", lambda spark, sf, t: poisoned):
        after = {
            r["event_type"]: (r["med"], r["mad"])
            for r in pb.mad_robust_anomaly(spark, SF_DIR).collect()
        }
    med0, mad0 = before["click"]
    med1, mad1 = after["click"]
    assert abs(med1 - med0) <= 0.1 * abs(med0) + 1e-9
    assert abs(mad1 - mad0) <= 0.1 * abs(mad0) + 1e-9


def test_touch_attribution_counts_consistent(spark):
    """Every attributed purchase had at least one preceding touch;
    totals equal the number of purchases with an earlier view/click
    (python referee at sf0.001)."""
    from zoom_spark.io import load_table
    from zoom_spark.queries.pipeline_breadth import touch_attribution

    ev = load_table(spark, SF_DIR, "events").collect()
    touches = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in ev
            if r["event_type"] in ("view", "click")
        ),
    )
    purchases = [
        (r["user_id"], r["ts"]) for r in ev if r["event_type"] == "purchase"
    ]
    expect_n = 0
    for u, ts in purchases:
        if any(tu == u and tts < ts for tu, tts, _, _ in touches):
            expect_n += 1
    got = touch_attribution(spark, SF_DIR).collect()
    assert sum(r["n_purchases"] for r in got) == expect_n
    assert set(r["touch_type"] for r in got) <= {"view", "click"}
