"""TPC-H-shaped multi-join / heavy-agg queries — the engine's
headline analytical workloads (SURVEY.md §2.3/§2.4 breadth rows) and
the primary bench drivers at sf0.1.

Scale design per query:
  * dimensions (region/nation/customer/supplier/part) broadcast —
    no shuffle on the fact side for dim joins;
  * fact-fact joins (orders-lineitem) shuffle on the join key once,
    with AQE skew splitting;
  * aggregates are partial+final HashAggregates (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "tpch_q1_pricing",
    sql="""
    WITH thr AS (SELECT max(l_shipdate) - INTERVAL 90 DAY AS t FROM lineitem)
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
           round(CAST(avg(l_quantity) AS DOUBLE), 6) AS avg_qty,
           round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem, thr
    WHERE l_shipdate <= t
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shaped pricing summary: scan-heavy, 6 aggregates, tiny
    group cardinality — pure map-side-combine territory."""
    li = load_table(spark, sf_dir, "lineitem")
    thr = li.agg((F.max("l_shipdate") - F.expr("INTERVAL 90 DAYS")).alias("t"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def dsum(expr):
        # decimal-cast money sums: exact addition is associative, so
        # totals are independent of shuffle arrival order (doubles
        # are not — a 1-cent flake at rounding boundaries)
        return F.sum(expr.cast("decimal(18,6)")).cast("double")

    return (
        li.join(F.broadcast(thr))
        .where(F.col("l_shipdate") <= F.col("t"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(dsum(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(dsum(disc), 2).alias("sum_disc_price"),
            F.round(dsum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping",
    sql="""
    SELECT l_orderkey,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: broadcast the filtered customer dim into orders,
    shuffle-join lineitem on orderkey, top-10 by revenue
    (deterministic via orderkey tiebreak)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            l.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_revenue",
    sql="""
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped 6-table join: every dimension broadcast, single
    fact-fact shuffle on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@register(
    "range_join_ship_lag",
    sql="""
    SELECT o.o_orderkey,
           CAST(count(l.l_linenumber) AS BIGINT) AS n_quick_ships
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range (theta) join: lineitems shipped within 30 days of
    their order. The equi key drives the hash join; the range
    predicate evaluates as a post-probe filter — no cross product."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < F.date_add(o.o_orderdate.cast("date"), 30).cast("timestamp"))
    )
    return (
        o.join(l, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_linenumber").alias("n_quick_ships"))
    )


@register(
    "tpch_q13_order_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped distribution-of-counts: left join preserves
    zero-order customers, two cascaded aggregates (the second groups
    on the first's output — tiny, coalesced by AQE)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q18_large_orders",
    sql="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           round(CAST(sum(l.l_quantity) AS DOUBLE), 2) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    HAVING sum(l.l_quantity) > 250
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: group-filter (HAVING) over a fact-fact join; the
    HAVING predicate evaluates post-aggregate, after map-side partials
    have already shrunk the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )


@register(
    "tpch_q7_nation_volume",
    sql="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped cross-nation trade volume: the nation dim joins twice
    under different roles (broadcast both), inequality predicate
    between the two role columns."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .where(F.col("n1_key") != F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            # decimal-cast before summing: with 600 groups a double
            # sum's order-dependent last bit lands on a cent-rounding
            # boundary somewhere; exact decimal addition is
            # associative, so the total is shuffle-order-independent
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@register(
    "cross_join_status_region",
    sql="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def cross_join_status_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (join-family completeness; both sides tiny)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "full_outer_balance",
    sql="""
    WITH cust_n AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    supp_n AS (
      SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           c.n_cust, s.n_supp
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.c_nationkey = s.s_nationkey
    """,
)
def full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (join-family completeness) with coalesced key."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_cust",
        "n_supp",
    )
