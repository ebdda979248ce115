"""Reference-parity gated queries (SURVEY.md §2.2–2.4, §2.7–2.8).

Each query re-expresses a concrete operator of the reference
(file:line cited per function) on the driver's star schema, using the
role mapping in FIXTURES.md §C (users→customer, meetings→orders,
participants→lineitem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.functions.dates import fmt_ymd, next_day_date, school_year_start
from zoom_spark.io import load_table
from zoom_spark.operators.conform import conform_schema, enrich_literal
from zoom_spark.operators.incremental import delta_keys, processed_prefix
from zoom_spark.queries import register


@register(
    "flagship_delta",
    sql="""
    WITH thr AS (
      SELECT max(l_shipdate) - INTERVAL 180 DAY AS t FROM lineitem
    ),
    processed AS (
      SELECT l_orderkey FROM lineitem, thr WHERE l_shipdate <= t
    )
    SELECT DISTINCT o_orderkey
    FROM orders
    WHERE NOT EXISTS (
      SELECT 1 FROM processed p WHERE p.l_orderkey = orders.o_orderkey
    )
    """,
)
def flagship_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's incremental-delta anti-join
    (/root/reference/main.py:79-85): distinct parent keys with no row
    in the already-processed child prefix."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    processed = processed_prefix(lineitem, "l_shipdate", days_back=180)
    return delta_keys(orders, processed, "o_orderkey", "l_orderkey")


@register(
    "watermark_next_day",
    sql="""
    SELECT CAST(max(o_orderdate) AS DATE) + 1 AS next_load_date FROM orders
    """,
)
def watermark_next_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+F2+F3 — watermark read: max(ts)::date + 1 day
    (/root/reference/main.py:261-266)."""
    from zoom_spark.operators.incremental import next_watermark

    return next_watermark(load_table(spark, sf_dir, "orders"), "o_orderdate")


@register(
    "conform_contract",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(NULL AS VARCHAR) AS c_phone, c_acctbal
    FROM customer
    """,
)
def conform_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — schema-conforming projection (select + reorder + null-fill
    missing), the Spark form of users.reindex(columns=USER_COLUMNS)
    (/root/reference/main.py:65, config.py:28-42)."""
    customer = load_table(spark, sf_dir, "customer")
    contract = [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_mktsegment", "string"),
        ("c_phone", "string"),  # not in source -> NULL column
        ("c_acctbal", "double"),
    ]
    return conform_schema(customer, contract)


@register(
    "filter_eq",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — equality filter (groups[groups.name == g],
    /root/reference/main.py:142-143); pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "anti_join_customers",
    sql="""
    SELECT DISTINCT c_custkey
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey
    )
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 variant on the second key pair (meeting_id delta,
    /root/reference/main.py:310-315): customers with no orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return delta_keys(customer, orders, "c_custkey", "o_custkey")


@register(
    "semi_join_customers",
    sql="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey
    )
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — the complement of J1 (SURVEY.md §2.3 'Absent' row:
    engine exposes the full join family)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_enrich",
    sql="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
           'zoom' AS source_system
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + P6 literal enrichment
    (/root/reference/main.py:110,165): broadcast the small dimension."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_name", "c_mktsegment")
    return enrich_literal(joined, source_system="zoom")


@register(
    "outer_join_counts",
    sql="""
    SELECT n.n_name, CAST(count(c.c_custkey) AS BIGINT) AS n_customers
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + grouped count — join family breadth."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    return (
        nation.join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "distinct_status",
    sql="SELECT DISTINCT o_orderstatus FROM orders",
)
def distinct_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — DISTINCT (/root/reference/main.py:80)."""
    return load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()


@register(
    "count_rows",
    sql="SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",
)
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — row count (/root/reference/main.py:63,67)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "groupby_multi_agg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS cnt,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price,
           round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY multi-aggregate (SURVEY.md §2.4 'Absent' row — engine
    breadth). Spark plans this as partial+final HashAggregate with
    map-side combine; no extra work needed for scale."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )


@register(
    "union_pages_drift",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(NULL AS DOUBLE) AS l_extendedprice
    FROM lineitem WHERE l_linenumber <= 3
    UNION ALL
    SELECT l_orderkey, l_linenumber, CAST(NULL AS DOUBLE) AS l_quantity,
           l_extendedprice
    FROM lineitem WHERE l_linenumber > 3
    """,
)
def union_pages_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL across drifting JSON pages
    (/root/reference/main.py:218,231-236; schema drift §1.3):
    unionByName(allowMissingColumns=True)."""
    li = load_table(spark, sf_dir, "lineitem")
    page1 = li.where(F.col("l_linenumber") <= 3).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    page2 = li.where(F.col("l_linenumber") > 3).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return page1.unionByName(page2, allowMissingColumns=True)


@register(
    "date_functions",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS ymd,
           CAST(o_orderdate AS DATE) + 1 AS next_day,
           CASE WHEN month(o_orderdate) > 6
                THEN make_date(CAST(year(o_orderdate) AS INT), 8, 1)
                ELSE make_date(CAST(year(o_orderdate) AS INT) - 1, 8, 1)
           END AS school_year_floor
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2–F6 — date formatting, +1-day arithmetic, and the reference's
    school-year floor (/root/reference/main.py:239,242-249,266)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        fmt_ymd("o_orderdate").alias("ymd"),
        next_day_date("o_orderdate").alias("next_day"),
        school_year_start("o_orderdate").alias("school_year_floor"),
    )


@register(
    "nested_json_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def nested_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F8 — nested JSON field projection with null default
    (/root/reference/main.py:324-334)."""
    from zoom_spark.operators.conform import json_field

    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", json_field("props", "k").cast("int").alias("k_value")
    )
