"""Property tests for warehouse-ops patterns: the sketch estimates
the oracle can't value-check, and the write-side Z-order layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zoom_spark.io import load_table


def test_hll_estimates_within_sketch_error(spark):
    """Per-type HLL estimates land within the sketch's error bound of
    the exact distinct count, and the UNIONED global sketch agrees
    with the exact global distinct — merging sketches loses nothing
    beyond the configured precision (~1.6% at default lgK=12; assert
    5% for slack)."""
    from zoom_spark.queries.warehouse_ops import hll_distinct_users

    res = hll_distinct_users(spark, SF_DIR).collect()
    per_type = [r for r in res if r.event_type != "__all__"]
    assert per_type, "no per-type rows"
    for r in per_type:
        assert abs(r.est_users - r.exact_users) <= max(2, 0.05 * r.exact_users), (
            f"{r.event_type}: est {r.est_users} vs exact {r.exact_users}"
        )
    global_exact = (
        load_table(spark, SF_DIR, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    (global_row,) = [r for r in res if r.event_type == "__all__"]
    assert abs(global_row.est_users - global_exact) <= max(2, 0.05 * global_exact)


def test_hll_sketch_merge_equals_direct_build(spark):
    """Union-of-partial-sketches == sketch built in one pass: the
    re-aggregation property that makes HLL rollups storable (build
    per day/source, merge at query time)."""
    ev = load_table(spark, SF_DIR, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert direct == merged


def test_zorder_write_layout_prunes_both_dimensions(spark, tmp_path):
    """Writing range-partitioned + sorted by zkey actually co-locates
    BOTH dimensions: a filter on either xk or yk alone touches only a
    strict subset of the output files (multi-dim data skipping), and
    the re-read data is byte-identical to the input."""
    from zoom_spark.queries.warehouse_ops import zorder_keyed_orders

    df = zorder_keyed_orders(spark, SF_DIR)
    out = str(tmp_path / "zordered")
    (
        df.repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # per-file min/max of xk and yk: pruning-effective iff the value
    # ranges don't all span the full domain
    stats = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("xk"), F.max("xk"), F.min("yk"), F.max("yk"))
        .collect()
    )
    assert len(stats) > 1
    x_spans = [(r[1], r[2]) for r in stats]
    # at least one file's x-range must exclude some other file's
    # x-values (i.e., not every file covers the whole x domain)
    lo = min(s[0] for s in x_spans)
    hi = max(s[1] for s in x_spans)
    assert any(s[0] > lo or s[1] < hi for s in x_spans)


def test_kll_sketch_quantiles_near_exact(spark):
    """KLL p50/p90/p99 must sit within tight rank error of the exact
    order statistics (KLL default k -> ~1.7% rank error at 99%
    confidence; we allow 3% rank slack)."""
    from zoom_spark.queries.warehouse_ops import kll_quantile_sketch_prices
    import duckdb

    rows = kll_quantile_sketch_prices(spark, SF_DIR).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    prices = [r[0] for r in con.execute(
        "SELECT o_totalprice FROM orders ORDER BY o_totalprice"
    ).fetchall()]
    by_status = {r["o_orderstatus"]: r for r in rows}
    assert "ALL" in by_status
    n = len(prices)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        got = by_status["ALL"][col]
        # rank of the sketch answer in the exact sorted data
        import bisect
        rank = bisect.bisect_left(prices, got) / n
        assert abs(rank - q) < 0.03, (q, got, rank)


def test_theta_sketch_overlap_matches_exact_disjoint_and_union(spark):
    """Market segments partition customers: every pairwise
    intersection is exactly 0 and every union is n_a + n_b; the theta
    estimates must agree within 2% relative error."""
    from zoom_spark.queries.warehouse_ops import theta_sketch_segment_overlap

    rows = theta_sketch_segment_overlap(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) segment pairs
    for r in rows:
        exact_union = r["n_a"] + r["n_b"]
        assert abs(r["est_union"] - exact_union) <= max(2, 0.02 * exact_union)
        assert r["est_intersection"] <= max(2, 0.02 * exact_union)


def test_kmv_distinct_estimate_referee_and_error_bound(spark):
    """approx_distinct_parts (r10: portable KMV bottom-64 sketch).
    A pure-Python md5 KMV referee must reproduce the estimate
    EXACTLY (it is a deterministic order statistic), and the estimate
    must sit within ~4/sqrt(K-2) relative error of the exact count."""
    import hashlib

    from zoom_spark.io import load_table
    from zoom_spark.queries.analytics import KMV_K, approx_distinct_parts

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_partkey"
    ).toPandas()
    got = {
        r["l_returnflag"]: r["n_parts_approx"]
        for r in approx_distinct_parts(spark, SF_DIR).collect()
    }
    import math

    for flag, grp in li.groupby("l_returnflag"):
        vals = set(grp["l_partkey"])
        hashes = sorted(
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in vals
        )
        bottom = hashes[:KMV_K]
        if len(bottom) < KMV_K:
            want = float(len(bottom))
        else:
            want = (
                math.floor((KMV_K - 1) * float(1 << 60) / bottom[-1] * 1e4 + 0.5)
                / 1e4
            )
        assert got[flag] == want, (flag, got[flag], want)
        # statistical sanity: within ~4 standard errors of exact
        exact = len(vals)
        assert abs(got[flag] - exact) <= 4 / math.sqrt(KMV_K - 2) * exact + 2
