"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query is implemented Spark-first in the ``zoom_spark`` package;
this module only wires (spark, sf_dir) into those operators and keeps
column aliases in lockstep with the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zoom_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core semantic — incremental-delta anti-join
    (/root/reference/main.py:79-85) over a date-prefix 'processed'
    sink (SURVEY.md §7 Phase 0).
    """
    return Q.flagship_delta(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Entries are interleaved round-robin across the query modules
    (operator families) rather than returned in import order, so any
    prefix sample of the registry — the correctness gate samples the
    first N — exercises every family instead of only the earliest
    imported modules.
    """
    from itertools import zip_longest

    by_module: dict[str, list[tuple[str, Callable]]] = {}
    for name, fn in Q.QUERIES.items():
        by_module.setdefault(fn.__module__, []).append((name, fn))
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for wave in zip_longest(*by_module.values()):
        for item in wave:
            if item is not None:
                out[item[0]] = item[1]
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each key in ``queries()``.

    Keys absent here (non-SQL-expressible ops: LSH/minhash dedup,
    streaming-stateful) get the driver's weaker rows-only check.
    """
    return dict(Q.ORACLE)
