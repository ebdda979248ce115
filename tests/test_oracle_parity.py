"""Driver-style differential tests: every gated query vs its DuckDB
oracle at sf0.001 (fast); the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from oracle_harness import compare_query

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def _cases():
    qs = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    return [(name, fn, oracle.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    res = compare_query(spark, duck, name, fn, sql, SF_DIR)
    assert res["ok"], res


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_count_distinct_within_tolerance(spark):
    """approx_count_distinct (HyperLogLog++) is rows-only in the
    oracle gate; pin its accuracy against the exact count here."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from zoom_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("a")
    ).first()["a"]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)
