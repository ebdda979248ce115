"""Between-query storage hygiene (zoom_spark.session.release_storage).

The engine localCheckpoints iterative frames; in a long one-JVM bench
session those blocks accumulate and the GC pressure inflates later
timings (round-11 adjudication). release_storage must reap every
cached/persisted block without breaking subsequent fresh queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_spark.session import release_storage


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_storage_reaps_checkpoints_and_cache(spark):
    df = spark.range(10_000).localCheckpoint()
    assert df.count() == 10_000
    cached = spark.range(1_000).select((F.col("id") * 2).alias("x")).cache()
    assert cached.count() == 1_000
    assert _n_persisted(spark) >= 2

    release_storage(spark)

    assert _n_persisted(spark) == 0
    # fresh work is unaffected
    assert spark.range(5).count() == 5


def test_release_storage_idempotent_on_clean_session(spark):
    release_storage(spark)
    release_storage(spark)
    assert _n_persisted(spark) == 0
    assert spark.range(3).count() == 3
