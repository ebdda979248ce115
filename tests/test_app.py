"""End-to-end test of the connector CLI (the reference's main()
analog): stage orchestration, full-refresh vs incremental load
disciplines, watermark advance, idempotent retry."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zoom_spark.app import Connector, main
from zoom_spark.io import load_table


def test_all_stages_end_to_end(spark, tmp_path):
    sink = str(tmp_path / "wh")
    counts = main(
        ["--all", "--source-dir", SF_DIR, "--sink-dir", sink], spark=spark
    )
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert counts["users"] == n_cust
    assert counts["groups"] == 25
    assert counts["group_members"] == n_cust
    # users conformance: contract columns in order, null-filled extra
    users = spark.read.parquet(f"{sink}/users")
    assert users.columns == [
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal",
        "verified",
    ]
    assert users.where(F.col("verified").isNotNull()).count() == 0
    # meetings: exactly the earliest order day on bootstrap
    meetings = spark.read.parquet(f"{sink}/meetings")
    src_orders = load_table(spark, SF_DIR, "orders")
    first_day = src_orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d")
    ).first().d
    assert meetings.agg(F.count_distinct("order_date")).first()[0] == 1
    assert meetings.first().order_date == first_day
    # participants joined only for loaded meetings
    parts = spark.read.parquet(f"{sink}/participants")
    loaded_keys = {r.o_orderkey for r in meetings.select("o_orderkey").collect()}
    got_keys = {r.meeting_key for r in parts.select("meeting_key").distinct().collect()}
    assert got_keys <= loaded_keys


def test_meetings_watermark_advances_one_day_per_run(spark, tmp_path):
    sink = str(tmp_path / "wh2")
    conn = Connector(spark, SF_DIR, sink)
    conn.load_meetings()
    d1 = spark.read.parquet(f"{sink}/meetings").agg(
        F.max("order_date").alias("d")
    ).first().d
    conn.load_meetings()
    days = spark.read.parquet(f"{sink}/meetings").select(
        "order_date"
    ).distinct().collect()
    assert len(days) <= 2  # second run loads at most the next day
    d2 = max(r.order_date for r in days)
    assert d2 >= d1
    # idempotent retry: re-running the same day must not duplicate
    n_before = spark.read.parquet(f"{sink}/meetings").count()
    # simulate retry by reloading the latest day (dynamic overwrite)
    conn.load_meetings()
    conn_n = spark.read.parquet(f"{sink}/meetings").count()
    assert conn_n >= n_before  # advanced or same, never duplicated rows
    per_key = (
        spark.read.parquet(f"{sink}/meetings")
        .groupBy("o_orderkey")
        .count()
        .where(F.col("count") > 1)
    )
    assert per_key.count() == 0


def test_accounts_writeback_isolates_row_errors(spark, tmp_path):
    conn = Connector(spark, SF_DIR, str(tmp_path / "wh3"))
    seen = []

    def post(row):
        if row["c_custkey"] % 2 == 0:
            raise RuntimeError("boom")
        seen.append(row["c_custkey"])

    n = conn.create_student_accounts(post_fn=post)
    assert n >= 0  # no exception escaped despite failing rows
