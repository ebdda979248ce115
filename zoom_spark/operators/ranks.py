"""Distributed mid-ranks (average ranks under ties) — the building
block for rank statistics: Mann-Whitney U, Kruskal-Wallis H,
rank-biserial / Cliff's delta effect sizes, Spearman-style rank
transforms.

The naive spelling — ``rank().over(Window.orderBy(v))`` — is a
single-task global sort, the shape that dies at 100 TB. The
scale-correct shape is value-collapse + prefix scan:

  1. collapse rows to one row per DISTINCT value with its count
     (one hash aggregate — map-side combinable);
  2. two-phase distributed prefix-sum of the counts in value order
     (``operators.prefix.prefix_sum``: range shuffle + O(P) driver
     offsets, no global window);
  3. mid-rank of value v = cum(v) − c(v) + (c(v)+1)/2.

Every downstream statistic (rank sums per group, tie terms) is then a
plain decomposable aggregate over the distinct-value frame, so the
whole pipeline is two shuffles regardless of row count. Mid-ranks are
half-integers, so rank sums stay EXACT in IEEE doubles up to 2^53 —
cross-engine (Spark vs DuckDB oracle) parity holds bit-for-bit before
any final rounding.

No analog in the reference (/root/reference/main.py is a fetch/load
connector); this belongs to the mandated eval/statistics extension
family (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.operators.prefix import prefix_sum


def add_midranks(
    pv: DataFrame,
    value_col: str = "v",
    cnt_col: str = "c",
    out_col: str = "avg_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Given one row per distinct value with its total count
    (`cnt_col`), add `out_col` = the average 1-based rank the value's
    ties occupy in global ascending `value_col` order:

        avg_rank(v) = cum(v) - c(v) + (c(v) + 1) / 2

    where cum is the inclusive running count. Uses the two-phase
    distributed prefix scan — no single-task global window."""
    c = prefix_sum(
        pv, value_col, cnt_col, out_col="_cum", num_partitions=num_partitions
    )
    return c.withColumn(
        out_col,
        F.col("_cum") - F.col(cnt_col) + (F.col(cnt_col) + 1) / 2.0,
    ).drop("_cum")
