"""Analytics-breadth gated queries: windows, sorts/top-k, set ops,
rollup/cube/grouping-sets, as-of join (SURVEY.md §2.3–2.7, Phase 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.operators.asof import asof_join
from zoom_spark.operators.windows import latest_per_key, top_k
from zoom_spark.queries import register


@register(
    "latest_order_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 flagship window: per-key watermark generalization of the
    reference's global MAX (/root/reference/main.py:261)."""
    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        key="o_custkey",
        ts_col="o_orderdate",
        tiebreak="o_orderkey",
    )


@register(
    "rank_orders_by_price",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           rank()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS price_dense_rank
    FROM orders
    """,
)
def rank_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank — deterministic under ties (equal rank).

    o_orderstatus has 3 values, so a plain window PARTITION BY holds
    ~1/3 of orders in ONE task at scale; route through the two-phase
    operators/prefix.grouped_rank instead (range shuffle + O(P x 3)
    offset exchange, no single-group task)."""
    from zoom_spark.operators.prefix import grouped_rank

    orders = load_table(spark, sf_dir, "orders")
    return grouped_rank(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        group_cols=["o_orderstatus"],
        order_col="o_totalprice",
        descending=True,
        rank_col="price_rank",
        dense_rank_col="price_dense_rank",
    ).select("o_orderkey", "o_orderstatus", "price_rank", "price_dense_rank")


@register(
    "lag_lead_orders",
    sql="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderdate)  OVER w AS prev_orderdate,
           lead(o_orderdate) OVER w AS next_orderdate
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a total order (ts + unique key tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_orderdate"),
        F.lead("o_orderdate").over(w).alias("next_orderdate"),
    )


@register(
    "running_sum_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
           AS running_spend
    FROM orders
    """,
)
def running_sum_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-frame (rowsBetween running total)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "topk_orders",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 top-k: orderBy+limit → TakeOrderedAndProject (per-partition
    heaps, no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@register(
    "intersect_customers",
    sql="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 INTERSECT."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.where(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@register(
    "except_customers",
    sql="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 EXCEPT — relational complement of the J1 anti-join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.select("c_custkey")
    b = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@register(
    "rollup_lineitem",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS cnt,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price,
           CAST(grouping(l_returnflag) AS BIGINT) * 2
             + CAST(grouping(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 ROLLUP with grouping-id disambiguation of the NULL rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 2).alias("sum_price"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@register(
    "cube_orders",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(grouping(o_orderstatus) AS BIGINT) * 2
             + CAST(grouping(o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 CUBE."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@register(
    "grouping_sets_sql",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 raw-SQL entry point (/root/reference/main.py:79-85 executes
    SQL strings) + GROUPING SETS breadth."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "count_distinct_parts",
    sql="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-aggregate (multi distinct in one agg — Spark expands
    to the standard expand+partial-agg plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
    )


KMV_K = 64  # bottom-k sketch size: rel. error ~ 1/sqrt(K-2) ~ 13%
_KMV_SCALE = float((KMV_K - 1) << 60)  # (K-1) * hash space, exact double


@register(
    "approx_distinct_parts",
    sql=f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM lineitem
    ),
    rk AS (
      SELECT l_returnflag, hv,
             row_number() OVER (
               PARTITION BY l_returnflag ORDER BY hv) AS rn
      FROM h
    ),
    st AS (
      SELECT l_returnflag,
             max(hv) AS hk, CAST(count(*) AS BIGINT) AS nk
      FROM rk WHERE rn <= {KMV_K} GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN nk < {KMV_K} THEN CAST(nk AS DOUBLE)
                ELSE floor({_KMV_SCALE!r} / hk * 1e4 + 0.5) / 1e4
           END AS n_parts_approx
    FROM st
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct count via a K-MINIMUM-VALUES (bottom-k)
    sketch (Bar-Yossef et al. 2002): per group, keep the K smallest
    md5 low-60 hashes of the values; estimate = (K-1) * hash_space /
    k-th_min (exact small-set mode when fewer than K distinct hashes
    exist).  KMV is mergeable (union = bottom-K of the unioned
    sketches) like HLL, but — unlike HLL — its estimate is a pure
    ORDER STATISTIC of engine-portable hashes, so it VALUE-HASHES
    against DuckDB (converted round 10; r9 verdict #6 — this query
    previously used Spark's HLL++, whose sketch no other engine can
    replay; Spark's native F.approx_count_distinct remains exercised
    by hll_distinct_users' property tests).  The rank filter compiles
    to WindowGroupLimit, so each partition forwards at most K hashes
    per group before the final window — sketch-sized shuffle, the
    100 TB shape.  Error bounds vs exact are pinned in tests."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    st = (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("l_returnflag")
        .agg(
            F.max("hv").alias("hk"),
            F.count("*").cast("long").alias("nk"),
        )
    )
    return st.select(
        "l_returnflag",
        F.when(F.col("nk") < KMV_K, F.col("nk").cast("double"))
        .otherwise(
            F.floor(
                F.lit(_KMV_SCALE) / F.col("hk") * 1e4 + F.lit(0.5)
            )
            / 1e4
        )
        .alias("n_parts_approx"),
    )


@register(
    "asof_purchase_view",
    sql="""
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS r_ts, v.event_id AS r_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.3 'Absent' row): for each purchase, the same
    user's latest at-or-before view event. One shuffle via the
    union+window composition (operators/asof.py); oracle is DuckDB's
    native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["ts", "event_id"],
    )


@register(
    "asof_forward_tolerance",
    sql="""
    WITH base AS (
      SELECT p.event_id, p.user_id, p.ts,
             v.ts AS m_ts, v.event_id AS m_event_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts <= v.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN m_ts IS NOT NULL
                 AND epoch_us(m_ts) - epoch_us(ts) <= 86400000000
                THEN m_ts END AS r_ts,
           CASE WHEN m_ts IS NOT NULL
                 AND epoch_us(m_ts) - epoch_us(ts) <= 86400000000
                THEN m_event_id END AS r_event_id
    FROM base
    """,
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (pandas merge_asof parity): for
    each purchase, the same user's NEXT view event, nulled when it
    falls more than 24 h later.  Same one-shuffle union+window plan
    as the backward form, with a following-frame first_value; the
    tolerance is a post-window column expression (exact, since the
    nearest match is the only candidate).  Oracle: DuckDB native
    ASOF with the inequality reversed + an epoch_us gap guard."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["ts", "event_id"],
        direction="forward",
        tolerance_us=86_400_000_000,
    )
