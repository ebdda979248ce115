"""Aggregate / scalar / window breadth (SURVEY.md §2.4-§2.6, §2.8
'Absent' rows): statistical aggregates, ordered collect_list,
string_agg, math and map scalar families, and window frames
(dense_rank / ntile / first-last / RANGE frame).

All partial+final HashAggregate / single-shuffle shapes — nothing
here adds a second exchange beyond the groupBy/window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "stats_aggregates",
    sql="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS qty_stddev,
           round(var_samp(l_quantity), 4) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: stddev/variance/corr/covar."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "collect_sorted_lines",
    sql="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',')
             AS line_numbers_csv,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',')
             AS flags_csv
    FROM lineitem
    WHERE l_orderkey < 1000
    GROUP BY l_orderkey
    """,
)
def collect_sorted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set with deterministic post-sort (raw
    collect order is partition-dependent, so every use at scale must
    sort or treat as bag — the query bakes that discipline in).

    Gate note: both collected arrays are serialized to CSV strings —
    the driver's pandas-based canonicalizer cannot hash list cells.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("l_linenumber")), ","
        ).alias("line_numbers_csv"),
        F.array_join(
            F.array_sort(F.collect_set("l_returnflag")), ","
        ).alias("flags_csv"),
    )


@register(
    "math_functions",
    sql="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS price_dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(pow(CAST(p_size AS DOUBLE), 2.0), 1) AS size_sq,
           round(ln(p_retailprice), 6) AS price_ln,
           round(log10(p_retailprice), 6) AS price_log10,
           p_size % 7 AS size_mod7,
           CAST(sign(p_retailprice - 1000.0) AS INT) AS dev_sign
    FROM part
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family: abs/ceil/floor/sqrt/pow/ln/log10/mod/sign."""
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(price - 1000.0).alias("price_dev"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.pow(F.col("p_size").cast("double"), 2.0), 1).alias("size_sq"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(price - 1000.0).cast("int").alias("dev_sign"),
    )


@register(
    "map_functions",
    sql="""
    WITH t AS (
      SELECT s_suppkey,
             MAP(['nation', 'balance'],
                 [CAST(s_nationkey AS VARCHAR), CAST(round(s_acctbal, 2) AS VARCHAR)])
               AS m
      FROM supplier
    )
    SELECT s_suppkey,
           CAST(cardinality(m) AS INT) AS m_size,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
           m['nation'][1] AS nation_val
    FROM t
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar family: construction, cardinality, keys, lookup.
    Map columns never cross the comparison boundary (engines disagree
    on map ordering/hashing) — only scalars derived from them."""
    s = load_table(spark, sf_dir, "supplier")
    m = F.create_map(
        F.lit("nation"),
        F.col("s_nationkey").cast("string"),
        F.lit("balance"),
        F.round(F.col("s_acctbal"), 2).cast("string"),
    )
    return s.select(
        "s_suppkey",
        F.size(m).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "nation").alias("nation_val"),
    )


@register(
    "percentile_prices",
    sql="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (linear interpolation — value-identical to the
    oracle's quantile_cont) and min_by/max_by argmin aggregates. The
    exact form needs a per-group sort; percentile_approx (t-digest,
    one pass, mergeable) is the 100 TB default but is algorithm-
    specific so it can't be oracle-hashed."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint") * 10000000000
            + F.col("o_orderkey"),
        ).alias("priciest_order"),
    )


@register(
    "window_frames",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(dense_rank() OVER w AS BIGINT) AS price_rank,
           CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
           round(first_value(o_totalprice) OVER w, 2) AS cheapest,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS pair_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window breadth: dense_rank, ntile, first_value, and an explicit
    ROWS frame — one shuffle on the partition key serves all four."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    frame = w.rowsBetween(-1, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).cast("bigint").alias("price_rank"),
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
        F.round(F.sum("o_totalprice").over(frame), 2).alias("pair_sum"),
    )


@register(
    "range_frame_rolling_revenue",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS day_rev
      FROM orders GROUP BY 1
    )
    SELECT d, round(day_rev, 2) AS day_rev,
           round(sum(day_rev) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                              AND CURRENT ROW), 2) AS rev_7d
    FROM daily
    """,
)
def range_frame_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: 7-day rolling revenue. Spark's
    rangeBetween needs a numeric orderBy, so the frame runs over epoch
    days — value-identical to the oracle's INTERVAL frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("day_rev"))
        .withColumn("d_num", F.unix_date(F.col("d")))
    )
    w = Window.orderBy("d_num").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "d",
        F.round("day_rev", 2).alias("day_rev"),
        F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
    )


@register(
    "user_value_slope",
    sql="""
    SELECT user_id,
           round(regr_slope(value, epoch(ts) / 86400.0), 4) AS slope_per_day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 3
    """,
)
def user_value_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trend slope via grouped-map applyInPandas (§2.10):
    events shuffle once on user_id, each group arrives as one Arrow-
    backed pandas DataFrame, and the function emits slope + count in
    a single pass — the engine's vectorized escape hatch for
    aggregates Catalyst lacks. Oracle: DuckDB's built-in regr_slope
    (same covar_pop/var_pop definition)."""
    from zoom_spark.functions.grouped import slope_and_count

    from zoom_spark.operators.sizing import frame_partitions

    ev = load_table(spark, sf_dir, "events")
    days = (F.unix_micros("ts") / F.lit(86400.0 * 1e6)).alias("x")
    # Pin the pre-pandas exchange: an explicit keyed repartition with
    # the same key is REUSED by the groupBy (no second shuffle) and is
    # not AQE-coalescible — byte-based coalescing otherwise collapses
    # the tiny event frame to ~1 partition and the per-group pandas
    # pass runs serially (r13 probe: 3.9 s -> 0.8 s). Row-sized, not
    # core-sized: one task per ~4k rows, capped at 4x cores (pandas
    # groups want small tasks; guide §2.4/§4).
    n_ev = ev.count()
    p = frame_partitions(
        spark.sparkContext, n_ev, target_rows_per_task=4_000
    )
    grouped = (
        ev.select("user_id", days, F.col("value").alias("y"))
        .repartition(p, "user_id")
        .groupBy("user_id")
    )
    out = grouped.applyInPandas(
        slope_and_count,
        schema="user_id bigint, slope_per_day double, n_events bigint",
    )
    return out.where(F.col("n_events") >= 3).withColumn(
        "slope_per_day", F.round("slope_per_day", 4)
    )


@register(
    "unpivot_order_metrics",
    sql="""
    WITH agg AS (
      SELECT l_returnflag,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS sum_price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS sum_disc,
             round(CAST(sum(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS sum_tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM agg
    UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc, sum_tax))
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): per-returnflag measure columns
    become (metric, value) rows via DataFrame.unpivot — the inverse of
    pivot_status_counts. Map-side reshape, no extra shuffle beyond
    the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")

    def dsum(c):
        return F.round(F.sum(F.col(c).cast("decimal(18,6)")).cast("double"), 2)

    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
        dsum("l_tax").alias("sum_tax"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc", "sum_tax"],
        "metric",
        "value",
    )


@register(
    "orders_per_day_densified",
    sql="""
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    per_day AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT s.day, coalesce(p.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN per_day p USING (day)
    """,
)
def orders_per_day_densified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine densification (gap filling): a generated calendar
    spine left-joined to per-day counts so quiet days appear as
    explicit zeros — the standard pre-step for window/timeseries ops.
    The spine generates from one sequence() row and explodes; the
    fact side aggregates BEFORE the join so the spine join touches
    one row per day, not per order."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    per_day = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    return spine.join(per_day, on="day", how="left").select(
        "day", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


@register(
    "variant_json_extract",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS total_value
    FROM events
    GROUP BY 1
    """,
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into a
    VARIANT column, variant_get a typed field, aggregate on it. The
    open-schema analog of from_json-with-declared-schema — the right
    tool when event payloads drift (SURVEY.md §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


@register(
    "approx_quantiles_prices",
    sql="""
    SELECT o_orderstatus,
           printf('%.2f', percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice))
           || ',' ||
           printf('%.2f', percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice))
           || ',' ||
           printf('%.2f', percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice))
           AS approx_quartiles_csv
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via approx_percentile (GK/KLL-style
    sketch, mergeable across partitions — the 100 TB path where exact
    percentile's global sort is off the table). The accuracy knob is
    set above the test-SF row counts, where the sketch is provably
    exact, so the gate can hash it against an exact percentile_disc
    oracle (at 100 TB you dial accuracy down and the same mergeable
    plan stands; the property test bounds the error in that regime).
    Output serializes the quartile array to a %.2f CSV string — the
    gate canonicalizer cannot hash array cells."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.transform(
                F.percentile_approx(
                    "o_totalprice",
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                    1_000_000,
                ),
                lambda x: F.format_string("%.2f", x),
            ),
            ",",
        ).alias("approx_quartiles_csv")
    )


@register(
    "profile_orders",
    sql="""
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (per-column null/distinct/min/max summary) —
    the data-quality pass a warehouse runs before trusting a feed.
    All columns profile in ONE scan: the per-column aggregates run
    side by side in a single Aggregate node, then unpivot to rows
    (never one scan per column)."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    agg = o.agg(
        F.count("*").alias("n_rows"),
        *[
            a
            for c in cols
            for a in (
                F.count(c).alias(f"{c}__nonnull"),
                F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    per_col = [
        agg.select(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"{c}__nonnull").alias("n_nonnull"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in cols
    ]
    out = per_col[0]
    for d in per_col[1:]:
        out = out.unionByName(d)
    return out


@register(
    "orders_lineitem_reconciliation",
    sql="""
    WITH li AS (
      SELECT l_orderkey,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS computed
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT
      CAST(sum(CASE WHEN li.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS orders_without_lines,
      CAST(sum(CASE WHEN li.l_orderkey IS NOT NULL
                    AND abs(li.computed - o.o_totalprice) > 0.01
                    THEN 1 ELSE 0 END) AS BIGINT) AS price_mismatches,
      CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    """,
)
def orders_lineitem_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-sink reconciliation (referential data-quality check):
    recompute each order's total from its lineitems and count orders
    with no lines and orders whose stored total disagrees beyond a
    cent. The aggregate side reduces BEFORE the join, so the join
    moves one row per order, not per lineitem."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    li = l.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast("decimal(18,6)")
            ).cast("double"),
            2,
        ).alias("computed")
    )
    j = o.join(li, li.l_orderkey == o.o_orderkey, "left")
    return j.agg(
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
            "orders_without_lines"
        ),
        F.sum(
            F.when(
                F.col("l_orderkey").isNotNull()
                & (F.abs(F.col("computed") - F.col("o_totalprice")) > 0.01),
                1,
            ).otherwise(0)
        ).alias("price_mismatches"),
        F.count("*").alias("n_orders"),
    )


@register(
    "histogram_prices",
    sql="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)), 19)
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS bucket_min,
           round(max(o_totalprice), 2) AS bucket_max
    FROM orders, bounds
    GROUP BY 1
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets over the observed range) —
    the profiling primitive behind skew detection and range-partition
    planning. Bounds come from one broadcast scalar aggregate; bucket
    assignment is a map-side expression; one aggregate shuffle on the
    bucket id."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width), F.lit(19)
    ).cast("bigint")
    return (
        o.join(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@register(
    "rank_distributions",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey), 6)
             AS pct_rank,
           round(cume_dist() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice, o_orderkey), 6)
             AS cume,
           CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS INTEGER)
             AS quartile
    FROM orders
    """,
)
def rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist /
    ntile) with a full deterministic ordering (price, key) so rank
    values are engine-portable."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "locf_gap_fill",
    sql="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase' THEN round(value, 2) END
               AS purchase_value
      FROM events
    )
    SELECT user_id, event_id,
           last_value(purchase_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS last_purchase_value
    FROM marked
    """,
)
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward (timeseries gap fill): every
    event carries the user's most recent purchase value via
    last_value(..., ignoreNulls) over an ordered frame — the standard
    forward-fill before feature extraction. One shuffle on user_id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.round("value", 2)).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return marked.select(
        "user_id",
        "event_id",
        F.last("purchase_value", ignorenulls=True).over(w).alias(
            "last_purchase_value"
        ),
    )


@register(
    "boolean_aggregates",
    sql="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
           CAST(max_by(o_orderkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                       + o_orderkey) AS BIGINT) AS priciest_order
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family (count_if, bool_and,
    bool_or, max_by) — single-pass partial+final hash aggregate.
    max_by orders on a composite integer (price cents, then orderkey)
    so a price tie cannot make the argmax engine-dependent."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("has_urgent"),
        F.max_by(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint") * 10000000000
            + F.col("o_orderkey"),
        ).alias("priciest_order"),
    )
