"""Gated query registry.

Each module below implements operators from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables and registers them together
with a DuckDB oracle SQL string (omitted only for genuinely
non-SQL-expressible ops, which the driver checks rows-only).

Aliasing rule: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} already "
                f"registered by {QUERIES[name].__module__} "
                f"(round-7 lesson: a dict overwrite silently shadows "
                f"the original)"
            )
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# Populate the registry (import order == SURVEY §7 phase order).
from zoom_spark.queries import parity  # noqa: E402,F401
from zoom_spark.queries import analytics  # noqa: E402,F401
from zoom_spark.queries import events_windows  # noqa: E402,F401
from zoom_spark.queries import text_analysis  # noqa: E402,F401
from zoom_spark.queries import dedup_queries  # noqa: E402,F401
from zoom_spark.queries import similarity_queries  # noqa: E402,F401
from zoom_spark.queries import multimodal_queries  # noqa: E402,F401
from zoom_spark.queries import tpch_like  # noqa: E402,F401
from zoom_spark.queries import tpch_advanced  # noqa: E402,F401
from zoom_spark.queries import scalar_breadth  # noqa: E402,F401
from zoom_spark.queries import subqueries  # noqa: E402,F401
from zoom_spark.queries import agg_breadth  # noqa: E402,F401
from zoom_spark.queries import corpus_stats  # noqa: E402,F401
from zoom_spark.queries import recursive_queries  # noqa: E402,F401
from zoom_spark.queries import llm_pipeline  # noqa: E402,F401
from zoom_spark.queries import warehouse_ops  # noqa: E402,F401
from zoom_spark.queries import advanced_analytics  # noqa: E402,F401
from zoom_spark.queries import mixing  # noqa: E402,F401
from zoom_spark.queries import relational_extras  # noqa: E402,F401
from zoom_spark.queries import pipeline_breadth  # noqa: E402,F401
from zoom_spark.queries import stats_suite  # noqa: E402,F401
from zoom_spark.queries import curation_extras  # noqa: E402,F401
from zoom_spark.queries import training_prep  # noqa: E402,F401
from zoom_spark.queries import tokenization  # noqa: E402,F401
from zoom_spark.queries import round6_breadth  # noqa: E402,F401
from zoom_spark.queries import round6_depth  # noqa: E402,F401
from zoom_spark.queries import rank_stats  # noqa: E402,F401
from zoom_spark.queries import forecasting  # noqa: E402,F401
from zoom_spark.queries import experimentation  # noqa: E402,F401
from zoom_spark.queries import recsys  # noqa: E402,F401
from zoom_spark.queries import survival  # noqa: E402,F401
from zoom_spark.queries import ml_primitives  # noqa: E402,F401
from zoom_spark.queries import diagnostics  # noqa: E402,F401
from zoom_spark.queries import round7_ops  # noqa: E402,F401
from zoom_spark.queries import round8_ops  # noqa: E402,F401
from zoom_spark.queries import round9_ops  # noqa: E402,F401
from zoom_spark.queries import round10_ops  # noqa: E402,F401
from zoom_spark.queries import round10b_ops  # noqa: E402,F401
from zoom_spark.queries import round10c_ops  # noqa: E402,F401
from zoom_spark.queries.parity import flagship_delta  # noqa: E402,F401
