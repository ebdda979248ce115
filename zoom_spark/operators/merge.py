"""MERGE/upsert and table-maintenance operators (SURVEY.md §1.5,
§4.1 row 3 — the idempotent-sink semantics the reference lacks).

Without a transactional table format in the container (Delta/Iceberg
ship MERGE natively and this module's signatures match that shape),
upsert over parquet is expressed relationally: keep every existing
row whose key is absent from the updates (left_anti), union the
updates, rewrite. At scale the rewrite is bounded by partitioning:
merge_upsert_partitioned only rewrites partitions the updates touch
(read-side partition pruning + dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame, updates: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Upsert result: updates win on key collision, existing rows
    without a matching update survive, brand-new keys append.
    (MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.)"""
    k = [keys] if isinstance(keys, str) else list(keys)
    survivors = existing.join(updates, on=k, how="left_anti")
    return survivors.unionByName(updates)


def merge_upsert_to_path(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str] | str,
) -> None:
    """Full-table merge rewrite for unpartitioned sinks (bootstrap
    when the sink does not exist yet).

    Existence is probed through the Hadoop FileSystem API, not
    ``os.path`` — the sink is an HDFS/S3 URI on a real cluster, where
    a local-FS check would silently report "absent" and the merge
    would DROP the whole existing table into a bootstrap overwrite.
    After the final write the path's cached file listing is refreshed
    so a reader in the same session can never serve the pre-merge
    snapshot (same-session read-after-overwrite staleness surfaced as
    a load flake in the crash-recovery e2e, round 11)."""
    jvm = spark._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(hpath):
        existing = spark.read.parquet(path)
        merged = merge_upsert(existing, updates, keys)
    else:
        merged = updates
    # rewrite via a staging path: the merge plan reads the live sink,
    # so overwriting it in place would race the scan
    staging = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    final = spark.read.parquet(staging)
    final.write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files. Streaming sinks and
    per-page appends (the reference's load pattern) accrete small
    files that throttle scan parallelism at scale; compaction restores
    scan-sized splits. Returns the output file count."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact"
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    compacted = spark.read.parquet(staging)
    compacted.write.mode("overwrite").parquet(path)
    shutil.rmtree(staging, ignore_errors=True)
    return n_out


def scd2_close_and_insert(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    *,
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the currently-open row
    of each updated key (valid_to = update ts) and insert the update
    as the new open row. Pure relational form of the warehouse
    history-tracking MERGE."""
    upd = updates.select(
        F.col(key),
        F.col(ts_col).alias("valid_from"),
        F.lit(open_end).cast("date").alias("valid_to"),
        *[c for c in updates.columns if c not in (key, ts_col)],
    )
    new_ts = updates.select(
        F.col(key).alias("__k"), F.col(ts_col).alias("__new_from")
    )
    closed = (
        existing.join(new_ts, existing[key] == F.col("__k"), "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("__k").isNotNull()
                & (F.col("valid_to") == F.lit(open_end).cast("date")),
                F.col("__new_from").cast("date"),
            ).otherwise(F.col("valid_to")),
        )
        .drop("__k", "__new_from")
    )
    return closed.unionByName(upd.select(*existing.columns))
