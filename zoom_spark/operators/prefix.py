"""Distributed prefix sum (running total in a global order) — the
building block for sequence packing, shard assignment, and offset
indexing in training-data pipelines.

The naive Spark spelling — ``sum().over(Window.orderBy(k))`` with no
partitionBy — collapses the whole dataset into ONE task (Spark must
see every row in order), which is exactly what dies at 100 TB. The
scale-correct shape is the classic two-phase scan:

  1. range-partition by the order key (partition i holds keys below
     partition i+1 — the range partitioner is order-preserving across
     partition ids);
  2. local running sums per partition (window within partition);
  3. per-partition totals (P tiny rows) → exclusive offsets on the
     driver → broadcast-joined back and added.

Total cost: one range shuffle + one P-row collect. The only driver
state is P numbers (a model-artifact-sized object, like broadcast
join keys)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `out_col` = inclusive running sum of `value_col` in
    ascending `order_col` order. `order_col` values must be unique
    (they define the global order)."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(p, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    # MATERIALIZE before fanning out to two consumers (the totals
    # collect and the final join): repartitionByRange samples its
    # boundaries per execution, so re-evaluating `local` in each
    # consumer can yield two DIFFERENT partitionings — offsets from
    # one applied to the other corrupt the prefix. localCheckpoint
    # freezes one partitioning for both reads (at warehouse scale:
    # persist(DISK_ONLY) or a checkpoint dir).
    local = ranged.withColumn(
        "_local_cum", F.sum(value_col).over(w)
    ).localCheckpoint()
    totals = (
        local.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    )
    # exclusive offsets in partition-id order (range partitions are
    # ordered by construction)
    offsets, running = {}, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        running += r["_tot"] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset bigint"
    )
    return (
        local.join(F.broadcast(off_df), on="_pid")
        .withColumn(out_col, (F.col("_local_cum") + F.col("_offset")))
        .drop("_pid", "_local_cum", "_offset")
    )


def prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "run_max",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `out_col` = running MAX of `value_col` (a BIGINT column) in
    ascending `order_col` order — the max-monoid sibling of
    :func:`prefix_sum`, with the same two-phase scan shape (range
    shuffle + local window + O(P) driver offsets) instead of the
    single-task global window. With ``exclusive=True`` the running max
    covers strictly-preceding rows only (NULL for the global first
    row), which is the shape dominance-style filters (skyline, record
    tracking) need. `order_col` values must be unique."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(p, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    upper = -1 if exclusive else 0
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    # Same double-consumer hazard as prefix_sum: freeze ONE range
    # partitioning before the totals collect and the final join.
    local = ranged.withColumn(
        "_local_mx", F.max(value_col).over(w)
    ).localCheckpoint()
    totals = (
        local.groupBy("_pid").agg(F.max(value_col).alias("_tot")).collect()
    )
    offsets: dict[int, int | None] = {}
    running: int | None = None
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        if r["_tot"] is not None:
            running = r["_tot"] if running is None else max(running, r["_tot"])
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset bigint"
    )
    # greatest() skips NULLs, so a NULL local-exclusive-max (first row
    # of a partition) falls back to the prior-partition offset and the
    # global first row stays NULL — exactly exclusive-scan semantics.
    return (
        local.join(F.broadcast(off_df), on="_pid")
        .withColumn(out_col, F.greatest("_local_mx", "_offset"))
        .drop("_pid", "_local_mx", "_offset")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number in ascending `order_cols` order
    WITHOUT the single-task global window: range-partition on the
    order key, local row_number per partition, then add each
    partition's exclusive count offset (O(P) driver exchange — same
    two-phase scan as prefix_sum). The combined order key must be
    unique (use a unique id as the last column)."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(p, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn(
        "_local_rn", F.row_number().over(w)
    ).localCheckpoint()
    totals = local.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    offsets, running = {}, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        running += r["_n"]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset bigint"
    )
    return (
        local.join(F.broadcast(off_df), on="_pid")
        .withColumn(
            out_col, (F.col("_local_rn") + F.col("_offset")).cast("bigint")
        )
        .drop("_pid", "_local_rn", "_offset")
    )


def pack_by_budget(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows (in `order_col` order) to consecutive shards of at
    most ~`budget` total weight: shard = floor(exclusive_prefix /
    budget). Contiguous, deterministic, single extra column — the
    sequence-packing step of a training pipeline (items larger than
    the budget get their own shard rather than splitting)."""
    with_cum = prefix_sum(
        df, order_col, weight_col, out_col="_cum", num_partitions=num_partitions
    )
    return with_cum.withColumn(
        shard_col,
        F.floor((F.col("_cum") - F.col(weight_col)) / F.lit(budget)).cast("bigint"),
    ).drop("_cum")
