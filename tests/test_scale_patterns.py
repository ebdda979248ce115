"""Scale-pattern operators: salted skew joins must be result-identical
to plain joins while widening the key space, and bucketed tables must
join without a shuffle (SURVEY.md §4.3; pyspark_guide bucketing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zoom_spark.io import load_table
from zoom_spark.operators.skew import salted_join

pytestmark = pytest.mark.usefixtures("spark")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    pt = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    dim = pt.withColumnRenamed("p_partkey", "l_partkey")

    plain = li.join(dim, on="l_partkey").groupBy("p_brand").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    salted = salted_join(li, dim, on="l_partkey", n_salts=8).groupBy(
        "p_brand"
    ).agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0


def test_salted_join_outer_preserves_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "av"])
    b = spark.createDataFrame([(1, "p"), (9, "q")], ["k", "bv"])
    got = {
        (r["k"], r["av"], r["bv"])
        for r in salted_join(a, b, on="k", n_salts=4, how="left").collect()
    }
    assert got == {(1, "x", "p"), (2, "y", None), (3, "z", None)}


def test_salt_spreads_hot_key(spark):
    from zoom_spark.operators.skew import SALT_COL, salt_fact

    hot = spark.range(0, 10000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    n_salts = (
        salt_fact(hot, 8).select(SALT_COL).distinct().count()
    )
    assert n_salts == 8, "hot key not spread across all salt values"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed-by-key tables sort-merge join without an Exchange —
    the co-located-join layout for repeated fact-fact joins at scale."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    for name, df, key in [
        ("t_orders_b", o, "o_orderkey"),
        ("t_lineitem_b", li, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    # sf0.001 tables fit the broadcast threshold; disable it so the
    # join takes the sort-merge path bucketing is designed for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffled"
        # and the join is correct
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_interval_join_matches_naive_theta_join(spark):
    """Bucketed interval join must equal the naive range join for
    intervals spanning multiple buckets, sub-bucket intervals, and
    end-exclusive boundaries."""
    import datetime as dt

    from pyspark.sql import functions as F

    from zoom_spark.operators.interval import empty_intervals, interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    points = spark.createDataFrame(
        [(i, ts(h), "k%d" % (i % 2)) for i, h in enumerate(
            [0, 1, 23, 24, 25, 47, 48, 50, 100, 119, 120]
        )],
        "pid int, ts timestamp, k string",
    )
    intervals = spark.createDataFrame(
        [
            (0, ts(0), ts(24), "k0"),    # exactly one bucket
            (1, ts(12), ts(60), "k1"),   # spans 3 buckets
            (2, ts(47), ts(48), "k0"),   # sub-bucket sliver (hour-47
            # point carries k1, so this interval stays empty)
            (3, ts(200), ts(240), "k1"), # empty
            (4, ts(96), ts(121), "k0"),  # end-exclusive boundary at 120
        ],
        "iid int, s timestamp, e timestamp, ik string",
    )
    got = interval_join(
        points, intervals,
        point_col="ts", start_col="s", end_col="e",
        keys=[("k", "ik")], bucket_seconds=86400,
    ).select("pid", "iid")
    naive = points.join(
        intervals,
        (F.col("k") == F.col("ik"))
        & (F.col("ts") >= F.col("s"))
        & (F.col("ts") < F.col("e")),
    ).select("pid", "iid")
    assert got.subtract(naive).count() == 0
    assert naive.subtract(got).count() == 0
    assert naive.count() > 0

    gaps = empty_intervals(
        points, intervals,
        point_col="ts", start_col="s", end_col="e",
        keys=[("k", "ik")], bucket_seconds=86400,
    )
    assert sorted(r.iid for r in gaps.select("iid").collect()) == [2, 3]


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level filtering: with a selective filter on the
    build side of a shuffle join, Spark injects a bloom filter that
    pre-prunes the probe side before the exchange — the runtime
    analog of partition pruning, and the knob that matters when both
    join sides are fact-sized at 100 TB. Results must be identical
    with and without the rewrite."""
    from pyspark.sql import functions as F

    from zoom_spark.io import load_table

    sf = SF_DIR
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def build():
        o = load_table(spark, sf, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load_table(spark, sf, "lineitem")
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = build()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan
        with_bloom = {(r.o_orderpriority, r.n) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    baseline = {(r.o_orderpriority, r.n) for r in build().collect()}
    assert with_bloom == baseline and len(baseline) == 1


def test_prefix_sum_multi_column_matches_chained_calls(spark):
    """N running sums over one order key in ONE two-phase scan must be
    bit-identical to N chained single-column prefix_sum calls (r13:
    the rank-statistics family merges its 2-3 chained calls)."""
    from pyspark.sql import functions as F

    from zoom_spark.operators.prefix import prefix_sum

    df = spark.range(0, 500).select(
        F.col("id").alias("v"),
        ((F.col("id") * 13) % 7 + 1).alias("na"),
        ((F.col("id") * 29) % 5 + 1).alias("nb"),
        ((F.col("id") % 3) * 0.25 + 0.5).alias("fx"),
    )
    merged = prefix_sum(
        df, "v", ["na", "nb", "fx"], out_col=["ca", "cb", "cf"],
        num_partitions=16,
    )
    chained = prefix_sum(df, "v", "na", out_col="ca", num_partitions=16)
    chained = prefix_sum(chained, "v", "nb", out_col="cb", num_partitions=16)
    chained = prefix_sum(chained, "v", "fx", out_col="cf", num_partitions=16)
    assert merged.subtract(chained).count() == 0
    assert chained.subtract(merged).count() == 0
    # offset typing: integer columns stay bigint-exact, float stays double
    sch = dict((f.name, f.dataType.simpleString()) for f in merged.schema)
    assert sch["ca"] == "bigint" and sch["cb"] == "bigint"
    assert sch["cf"] == "double"


def test_global_dense_rank_matches_single_partition_window(spark):
    """One-shuffle global_dense_rank == the single-task dense_rank()
    window, including heavy tie groups that straddle range-partition
    boundaries (r14: the suffix-array doubling rounds re-rank with it
    instead of distinct + row_number + join-back)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zoom_spark.operators.prefix import global_dense_rank

    # key space deliberately tiny (23 classes over 1000 rows across 16
    # range partitions) so several partitions hold ONE class and many
    # boundaries split a tie group.
    df = spark.range(0, 1000).select(
        F.col("id").alias("rowid"),
        ((F.col("id") * 37) % 23).alias("a"),
        ((F.col("id") * 11) % 3).alias("b"),
    )
    got = global_dense_rank(df, ["a", "b"], out_col="dr", num_partitions=16)
    ref = df.withColumn("dr", F.dense_rank().over(Window.orderBy("a", "b")))
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0
    # count_out reports the exact class count, driver-side and free
    out: list = []
    global_dense_rank(df, ["a", "b"], count_out=out, num_partitions=16)
    assert out == [df.select("a", "b").distinct().count()]
    # single giant tie group spanning every partition
    one = spark.range(0, 400).select(F.lit(7).alias("a"), F.col("id").alias("rowid"))
    got_one = global_dense_rank(one, ["a"], out_col="dr", num_partitions=8)
    assert got_one.where(F.col("dr") != 1).count() == 0


def test_prefix_sum_known_range_matches_sampled_range(spark):
    """known_range literal-bucket prefix_sum == the sampled-range path
    == the single-task window, for integer sums (exact) — r14: the
    ln-factorial grids switch to it (one hash exchange, no sampling
    pass, no ENSURE_REQUIREMENTS second shuffle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zoom_spark.operators.prefix import prefix_sum

    df = spark.range(1, 2001).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 91 + 1).alias("w")
    )
    got = prefix_sum(
        df, "k", "w", out_col="cum", num_partitions=16,
        known_range=(1, 2000),
    )
    ref = df.withColumn(
        "cum",
        F.sum("w").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0
    # helper columns must not leak
    assert set(got.columns) == {"k", "w", "cum"}


def test_prefix_sum_matches_single_partition_window(spark):
    """Two-phase distributed prefix sum == the single-task global
    window, including across many range partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zoom_spark.operators.prefix import pack_by_budget, prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 91 + 1).alias("w")
    )
    got = prefix_sum(df, "k", "w", out_col="cum", num_partitions=16)
    ref = df.withColumn(
        "cum", F.sum("w").over(Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0))
    )
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0

    packed = pack_by_budget(df, "k", "w", budget=500, num_partitions=16)
    # shards are contiguous in k and non-decreasing
    rows = packed.orderBy("k").collect()
    shards = [r.shard_id for r in rows]
    assert shards == sorted(shards)
    assert shards[0] == 0
    # no shard exceeds budget unless one of its items alone does
    from collections import defaultdict

    tot = defaultdict(int)
    for r in rows:
        tot[r.shard_id] += r.w
    for sid, t in tot.items():
        items = [r.w for r in rows if r.shard_id == sid]
        assert t <= 500 + max(items)


def test_money_sums_invariant_to_shuffle_partitioning(spark):
    """The decimal-cast money sums must produce IDENTICAL results
    under different shuffle partition counts (different partial-agg
    groupings and arrival orders) — the property that makes the
    oracle hash stable and the answer trustworthy on any cluster
    layout."""
    from zoom_spark.queries.tpch_like import tpch_q1_pricing

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = {tuple(r) for r in tpch_q1_pricing(spark, SF_DIR).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = {tuple(r) for r in tpch_q1_pricing(spark, SF_DIR).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b


def test_broadcast_queries_identical_under_sortmergejoin(spark):
    """Correctness must not be broadcast-shaped: the queries the plan
    audit asserts BroadcastHashJoin for must produce byte-identical
    results when broadcasting is disabled entirely (forcing
    SortMergeJoin / shuffled hash) — the regime a 100 TB cluster hits
    whenever a 'small' side outgrows the driver hint."""
    from zoom_spark.queries import QUERIES

    names = [
        "tpch_q3_shipping",
        "tpch_q5_local_revenue",
        "join_enrich",
        "exists_heavy_lineitem",
        "in_subquery_parts",
        "correlated_scalar_vs_cust_avg",
        "not_exists_quiet_customers",
        "flagship_delta",  # LeftAnti broadcast + 1-row scalar join
    ]
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for name in names:
        fn = QUERIES[name]
        with_bc = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            without_bc_df = fn(spark, SF_DIR)
            plan = without_bc_df._jdf.queryExecution().executedPlan().toString()
            without_bc = {tuple(r) for r in without_bc_df.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        assert with_bc == without_bc, f"{name} differs under SMJ"
        # the toggle actually changed the physical strategy for the
        # queries whose broadcast came from the THRESHOLD (Catalyst
        # subquery decorrelation); explicit broadcast() hints (tpch
        # dims, join_enrich, flagship's 1-row watermark) legitimately
        # survive -1 and are covered by the result-parity check above
        if name in (
            "exists_heavy_lineitem",
            "in_subquery_parts",
            "correlated_scalar_vs_cust_avg",
            "not_exists_quiet_customers",
        ):
            assert "BroadcastHashJoin" not in plan, f"{name} still broadcast"


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling is the no-code-change
    counterpart to salted_join: with a 90%-hot key and thresholds
    scaled to fixture size, the final adaptive plan must mark the
    sort-merge join skew-handled (skew=true) and the result must be
    byte-identical to the plain (non-adaptive) join."""
    import pyspark.sql.functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        # the downstream groupBy shares the join's partitioning; without
        # force, AQE declines to split (split would add a reshuffle)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k) for k in conf}
    # 90% of fact rows hit key 7; dim has 100 keys
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dval")
    )
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # bare join: skew split applies directly (reading the plan off
        # the SAME DataFrame object AFTER its action — a fresh
        # queryExecution would show isFinalPlan=false)
        joined = fact.join(dim, on="k")
        skew_rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the join skew-handled"
        assert "skewed" in plan, "no skewed AQEShuffleRead in final plan"
        skew_result = {tuple(r) for r in skew_rows}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    plain = {tuple(r) for r in fact.join(dim, on="k").collect()}
    assert skew_result == plain


def test_bucketed_table_prunes_buckets_on_point_lookup(spark, tmp_path):
    """Bucket pruning: an equality filter on the bucketing key must
    scan ONE bucket, not the table (SelectedBucketsCount 1 out of N
    in the scan node) — the point-lookup path that makes a bucketed
    100 TB fact table answer key probes without a full scan."""
    import pyspark.sql.functions as F

    name = "bp_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(name)
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved_auto = spark.conf.get(auto)
    try:
        # a bare filter has no distribution requirement, so the planner
        # would silently fall back to a plain scan; force the bucketed
        # read to exercise the pruning path a point-lookup service uses
        spark.conf.set(auto, "false")
        probe = spark.table(name).where(F.col("o_custkey") == 42)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:600]
        # and the pruned read returns exactly the right rows
        expect = (
            load_table(spark, SF_DIR, "orders")
            .where(F.col("o_custkey") == 42)
            .count()
        )
        assert probe.count() == expect
    finally:
        spark.conf.set(auto, saved_auto)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_hive_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Disk-layout partition pruning: a filter on the partitioning
    column must reach the scan as a PartitionFilter (directories are
    skipped at planning time, zero I/O for other partitions) — with
    bucket pruning and the runtime bloom filter this completes the
    pruning ladder a 100 TB table relies on."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "orders_by_status")
    load_table(spark, SF_DIR, "orders").write.partitionBy(
        "o_orderstatus"
    ).parquet(out)
    probe = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = _plan(probe)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:500]
    expect = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "F")
        .count()
    )
    assert probe.count() == expect and expect > 0


def test_grouped_rank_matches_plain_window(spark):
    """grouped_rank (two-phase, no single-group window task) must be
    result-identical to the plain PARTITION BY window — including tie
    groups that straddle range-partition boundaries (many ties per
    (group, value) with num_partitions >> distinct values)."""
    from pyspark.sql import Window

    from zoom_spark.operators.prefix import grouped_rank

    rows = [
        (i, ["A", "B", "C"][i % 3], float((i * 7) % 10))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id int, grp string, v double")

    got = (
        grouped_rank(
            df,
            group_cols=["grp"],
            order_col="v",
            descending=True,
            rank_col="r",
            dense_rank_col="dr",
            num_partitions=16,
        )
        .select("id", "r", "dr")
        .collect()
    )
    w = Window.partitionBy("grp").orderBy(F.col("v").desc())
    exp = df.select(
        "id",
        F.rank().over(w).cast("bigint").alias("r"),
        F.dense_rank().over(w).cast("bigint").alias("dr"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_grouped_rank_ascending_no_dense(spark):
    from pyspark.sql import Window

    from zoom_spark.operators.prefix import grouped_rank

    rows = [(i, "g" + str(i % 2), i % 25) for i in range(300)]
    df = spark.createDataFrame(rows, "id int, grp string, v int")
    got = (
        grouped_rank(df, ["grp"], "v", rank_col="r", num_partitions=8)
        .select("id", "r")
        .collect()
    )
    w = Window.partitionBy("grp").orderBy("v")
    exp = df.select(
        "id", F.rank().over(w).cast("bigint").alias("r")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_grouped_rank_null_and_boolean_group_keys(spark):
    """Round-7 ADVICE regression: the offset join must use native-typed
    null-safe key equality — str()-cast round-trips silently dropped
    rows with NULL group keys (NULL == 'None' is NULL) and ALL rows
    with boolean group keys (str(True)='True' vs Spark cast 'true')."""
    from pyspark.sql import Window

    from zoom_spark.operators.prefix import grouped_rank

    rows = [
        (i, None if i % 5 == 0 else ["A", "B"][i % 2], float(i % 7))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, grp string, v double")
    got = (
        grouped_rank(df, ["grp"], "v", rank_col="r", num_partitions=8)
        .select("id", "r")
        .collect()
    )
    assert len(got) == 200  # NULL-keyed rows are NOT dropped
    w = Window.partitionBy("grp").orderBy("v")
    exp = df.select("id", F.rank().over(w).cast("bigint").alias("r")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))

    brows = [(i, i % 3 == 0, float((i * 3) % 11)) for i in range(150)]
    bdf = spark.createDataFrame(brows, "id int, grp boolean, v double")
    bgot = (
        grouped_rank(bdf, ["grp"], "v", rank_col="r", num_partitions=8)
        .select("id", "r")
        .collect()
    )
    assert len(bgot) == 150  # boolean keys all match
    bexp = bdf.select(
        "id", F.rank().over(w).cast("bigint").alias("r")
    ).collect()
    assert sorted(map(tuple, bgot)) == sorted(map(tuple, bexp))


def test_grouped_rank_null_order_values_dense(spark):
    """Round-7 ADVICE regression: dense-rank offsets must count NULL as
    a rank value (dense_rank() does; countDistinct excludes it), else
    every value after an earlier-partition NULL is off by one."""
    from pyspark.sql import Window

    from zoom_spark.operators.prefix import grouped_rank

    rows = [
        (i, "g", None if i < 40 else float(i % 6)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id int, grp string, v double")
    got = (
        grouped_rank(
            df,
            ["grp"],
            "v",
            rank_col="r",
            dense_rank_col="dr",
            num_partitions=16,
        )
        .select("id", "r", "dr")
        .collect()
    )
    w = Window.partitionBy("grp").orderBy("v")
    exp = df.select(
        "id",
        F.rank().over(w).cast("bigint").alias("r"),
        F.dense_rank().over(w).cast("bigint").alias("dr"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_prefix_sum_decimal_values_exact(spark):
    """Round-7 ADVICE regression: a Decimal value column must keep
    exact decimal offsets (int() on a Decimal partition total silently
    truncated fractional offsets)."""
    import decimal

    from pyspark.sql import Window

    from zoom_spark.operators.prefix import prefix_sum

    rows = [
        (i, decimal.Decimal(f"{(i % 9) + 1}.{i % 100:02d}"))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k int, w decimal(10,2)")
    got = {
        r["k"]: r["cum"]
        for r in prefix_sum(
            df, "k", "w", out_col="cum", num_partitions=8
        ).collect()
    }
    w = Window.orderBy("k")
    exp = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w)).collect()
    }
    assert len(got) == 300
    for k, v in exp.items():
        assert decimal.Decimal(got[k]) == decimal.Decimal(v), k
