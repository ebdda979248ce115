"""Offline tests for the distributed paginated fetcher (S1–S4,
S13–S15) and the write-back sink (S11) — SURVEY.md §7 Phase 2."""

from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from zoom_spark.sources.paginated import (
    DomainSkipError,
    MockPagedClient,
    fetch_paginated,
)
from zoom_spark.sources.writeback import post_rows

RESULT_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("value", DoubleType()),
        StructField("key", StringType()),
    ]
)


def expected_rows(client: MockPagedClient, keys: list[str]) -> int:
    return sum(
        client.pages_for(k) * client.page_size
        for k in keys
        if k not in client.missing
    )


def test_fetcher_lands_all_pages_with_retries_and_skips(spark):
    keys = [str(i) for i in range(40)]
    client = MockPagedClient(missing=frozenset({"13", "26"}))
    keys_df = spark.createDataFrame([(k,) for k in keys], "key string")
    out = fetch_paginated(
        keys_df, client.fetch_page, RESULT_SCHEMA, max_concurrency=4
    ).cache()
    # every non-missing key contributes exactly pages*page_size rows
    assert out.count() == expected_rows(client, keys)
    # missing keys (domain error 3001 analog) contribute nothing
    assert out.where(F.col("key").isin("13", "26")).count() == 0
    # every row is tagged with its key (P6) and ids are key-scoped
    bad_tag = out.where(
        (F.col("item_id") / 1000).cast("long") != F.col("key").cast("long")
    )
    assert bad_tag.count() == 0
    # keys that throw a transient error on first call still land fully
    k7 = out.where(F.col("key") == "7").count()
    assert k7 == client.pages_for("7") * client.page_size


def test_fetcher_empty_keyset(spark):
    client = MockPagedClient()
    keys_df = spark.createDataFrame([], "key string")
    out = fetch_paginated(keys_df, client.fetch_page, RESULT_SCHEMA)
    assert out.count() == 0
    assert out.columns == ["item_id", "value", "key"]


def test_writeback_per_row_isolation(spark):
    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(
            [(i, f"user{i}@x.org") for i in range(20)], "id long, email string"
        ).repartition(4)

        def post(d):
            if d["id"] % 5 == 0:
                raise ValueError(f"reject {d['id']}")
            path = os.path.join(tmp, f"posted-{d['id']}.json")
            with open(path, "w") as f:
                json.dump(d, f)

        def on_err(d, e):
            with open(os.path.join(tmp, f"failed-{d['id']}.log"), "w") as f:
                f.write(str(e))

        post_rows(df, post, on_err)
        posted = glob.glob(os.path.join(tmp, "posted-*.json"))
        failed = glob.glob(os.path.join(tmp, "failed-*.log"))
        assert len(posted) == 16  # 20 minus ids 0,5,10,15
        assert len(failed) == 4


def test_incremental_load_idempotent_retry(spark):
    """§1.5 fix: re-running a load overwrites its own partition
    instead of double-appending."""
    from zoom_spark.operators.incremental import load_incremental

    with tempfile.TemporaryDirectory() as tmp:
        sink = os.path.join(tmp, "sink")
        src = spark.createDataFrame(
            [(i, f"2024-01-{(i % 3) + 1:02d}") for i in range(30)],
            "id long, load_date string",
        )
        load_incremental(src, sink, watermark_col="load_date", partition_col="load_date")
        first = spark.read.parquet(sink).count()
        # simulated retry of the same batch: same partitions rewritten
        load_incremental(src, sink, watermark_col="load_date", partition_col="load_date")
        second = spark.read.parquet(sink).count()
        assert first == second == 30


def test_python_datasource_matches_mapinpandas_fetcher(spark):
    """The DataSource-API reader and the mapInPandas fetcher must land
    identical rows for the same key set (S1/S2 parity, one partition
    per key)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from zoom_spark.sources.datasource import PagedApiDataSource
    from zoom_spark.sources.paginated import MockPagedClient, fetch_paginated

    spark.dataSource.register(PagedApiDataSource)
    keys = [str(k) for k in range(1, 15)]

    via_ds = (
        spark.read.format("paged_api")
        .option("keys", ",".join(keys))
        .load()
    )
    assert via_ds.rdd.getNumPartitions() == len(keys)

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("item_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    keys_df = spark.createDataFrame([(k,) for k in keys], ["key"])
    client = MockPagedClient()
    via_mip = fetch_paginated(
        keys_df,
        lambda k, t: client.fetch_page(k, t),
        schema,
        key_col="key",
    ).select("key", "item_id", "value")

    assert via_ds.subtract(via_mip).count() == 0
    assert via_mip.subtract(via_ds).count() == 0


def test_python_datasource_skips_missing_keys(spark):
    from zoom_spark.sources.datasource import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .option("keys", "1,2,3")
        .option("missing", "2")
        .load()
    )
    assert df.where("key = '2'").count() == 0
    assert df.where("key = '1'").count() > 0
