"""Subquery surface (EXISTS / IN / scalar / correlated-scalar) via the
engine's SQL entry point (SURVEY.md §3.1 entry point 2).

These run through ``spark.sql`` over temp views on purpose: the
reference delegates raw SQL strings to its backend
(/root/reference/main.py:79-85, 310-315 — S7 in SURVEY §2.1), so the
rebuilt engine must accept SQL, and subqueries are the one relational
family Catalyst handles with a dedicated rewrite (decorrelation into
joins) that the DataFrame API cannot express directly.

Scale notes: Catalyst decorrelates EXISTS/IN into left-semi joins and
scalar subqueries into (broadcast) aggregates+joins — each plan below
was checked with .explain to confirm no per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from zoom_spark.io import load_table
from zoom_spark.queries import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "exists_heavy_lineitem",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    """,
)
def exists_heavy_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated to a left-semi join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        """
    )


@register(
    "in_subquery_parts",
    sql="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
)
def in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN — a semi join on the subquery's distinct keys."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (
          SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        )
        """
    )


@register(
    "scalar_subquery_above_avg",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — one global aggregate broadcast
    into the filter (no per-row re-evaluation)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "correlated_scalar_vs_cust_avg",
    sql="""
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def correlated_scalar_vs_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders pricier than 1.5x their
    customer's average) — decorrelated into a per-key aggregate
    joined back on the correlation key."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
          SELECT avg(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "not_exists_quiet_customers",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def not_exists_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — left-anti join (the SQL spelling of the
    reference's core delta operator, /root/reference/main.py:79-85)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )
