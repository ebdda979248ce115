"""Regression tests for the events.ts normalization: driver fixtures
have shipped ts as TIMESTAMP(NANOS) (read as bigint under
nanosAsLong) and as TIMESTAMP(MICROS, naive) (read as TIMESTAMP_NTZ).
load_table must yield the identical TimestampType column either way
(round-3 regression: the nanos assumption crashed 14 queries when
fixtures switched to micros)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from zoom_spark.io import load_table

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 3, 5, 12, 30, 0, 1),
    datetime.datetime(2025, 12, 31, 23, 59, 59, 999999),
]


def _write_events(dirpath, unit):
    arr = pa.array(TS, type=pa.timestamp(unit))
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], type=pa.int64()),
            "ts": arr,
            "user_id": pa.array([7, 8, 9], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(t, str(dirpath / "events.parquet"))


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_both_ts_encodings(spark, tmp_path, unit):
    sf_dir = tmp_path / unit
    sf_dir.mkdir()
    _write_events(sf_dir, unit)
    df = load_table(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == TS


def test_stream_reader_matches_batch_for_micros(spark, tmp_path):
    from zoom_spark.streaming.windows import read_events_stream

    sf_dir = tmp_path / "stream_us"
    sf_dir.mkdir()
    _write_events(sf_dir, "us")
    stream = read_events_stream(spark, str(sf_dir))
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    out = (
        stream.writeStream.format("memory")
        .queryName("ts_enc_parity")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(60)
    got = [
        r["ts"]
        for r in spark.sql(
            "SELECT ts FROM ts_enc_parity ORDER BY event_id"
        ).collect()
    ]
    assert got == TS
