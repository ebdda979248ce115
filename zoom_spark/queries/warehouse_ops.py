"""Warehouse-scale operational patterns, round 2 widening:
mergeable HLL sketches, incremental aggregate maintenance, funnel
analysis, and Z-order layout keys.

These are the patterns that distinguish a 100 TB engine from a
laptop one: distinct counts that MERGE instead of reshuffling raw
ids, aggregates maintained from deltas instead of recomputed, and
file-layout keys that let scans prune multi-dimensionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register("hll_distinct_users")  # Datasketches HLL != DuckDB's sketch: rows-only
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    F.hll_sketch_agg): per-event-type sketches are built with map-side
    partial aggregation, then UNIONED into a global estimate without
    ever shuffling raw user_ids — the 100 TB distinct-count idiom
    (a re-aggregatable rollup cube stores the sketch, not the ids).
    DuckDB's approx_distinct uses a different sketch so there is no
    value oracle; the property test bounds both estimates against the
    exact count (HLL lgK=12 -> ~1.6% relative error)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est_users"),
        "exact_users",
    ).unionByName(
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
        ).select(
            F.lit("__all__").alias("event_type"),
            "est_users",
            F.lit(None).cast("long").alias("exact_users"),
        )
    )


@register(
    "incremental_agg_maintenance",
    sql="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_spend
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-customer
    rollup is split into a 'materialized' partition (orders before a
    watermark date) and a 'delta' (at/after it); each side aggregates
    independently and the partial states MERGE by summing — count and
    sum are decomposable, so maintenance cost is O(delta), never a
    full recompute.  The oracle IS the full recompute over all
    orders: merged-partials == recomputed proves the maintenance
    algebra exact (decimal sums, so no float merge drift; the FINAL
    projection casts to rounded DOUBLE because the gate's pandas
    canonicalizer renders Decimal and float64 differently)."""
    orders = load_table(spark, sf_dir, "orders")
    wm = F.to_date(F.lit("1996-01-01"))

    def partial(side: DataFrame) -> DataFrame:
        return side.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spend"),
        )

    merged = (
        partial(orders.where(F.col("o_orderdate") < wm))
        .unionByName(partial(orders.where(F.col("o_orderdate") >= wm)))
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("total_spend").cast("double"), 2).alias("total_spend"),
        )
    )
    return merged


@register(
    "funnel_signup_purchase",
    sql="""
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_users,
      CAST(count(t_view) AS BIGINT) AS step_view,
      CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS step_click,
      CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view
                 THEN 1 END) AS BIGINT) AS step_purchase
    FROM steps
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): one hash aggregate
    collapses each user's history to first-touch timestamps per step
    (min-CASE pivots — no self-joins, no window sort), then a single
    reduce counts users completing each prefix IN ORDER.  The classic
    product-analytics query, shaped so 100 TB of events costs one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return steps.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("step_purchase"),
    )


@register(
    "zorder_layout_keys",
    sql="""
    WITH keyed AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS xk,
             CAST(floor(o_totalprice / 1000.0) AS BIGINT) % 1024 AS yk
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, xk, yk,
             CAST(list_sum(list_transform(generate_series(0, 9),
               i -> (((xk // CAST(pow(2, i) AS BIGINT)) % 2)
                       * CAST(pow(2, 2*i) AS BIGINT))
                  + (((yk // CAST(pow(2, i) AS BIGINT)) % 2)
                       * CAST(pow(2, 2*i + 1) AS BIGINT))))
             AS BIGINT) AS zkey
      FROM keyed
    )
    SELECT o_orderkey, xk, yk, zkey
    FROM z ORDER BY zkey, o_orderkey LIMIT 100
    """,
)
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (custkey, price-bucket):
    interleaves 10 bits of each dimension with pure higher-order
    expressions — the clustering key a 100 TB table would
    repartitionByRange + sortWithinPartitions on before writing, so
    scans filtering on EITHER dimension prune files (multi-dim
    data skipping, the Delta/Iceberg OPTIMIZE ZORDER idiom).  Gated
    on the key computation + global order (TakeOrderedAndProject);
    the write-side layout is exercised in tests."""
    keyed = zorder_keyed_orders(spark, sf_dir)
    return keyed.orderBy("zkey", "o_orderkey").limit(100)


@register(
    "modern_aggregates",
    sql="""
    WITH pc AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    topp AS (
      SELECT o_orderstatus, min(o_orderpriority) AS top_priority
      FROM (SELECT *, max(c) OVER (PARTITION BY o_orderstatus) AS mx FROM pc)
      WHERE c = mx GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           string_agg(DISTINCT o.o_orderpriority, ',' ORDER BY o.o_orderpriority)
             AS priorities,
           t.top_priority,
           round(median(o.o_totalprice), 2) AS median_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders o JOIN topp t USING (o_orderstatus)
    GROUP BY o.o_orderstatus, t.top_priority
    """,
)
def modern_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2023 aggregate family Spark 4 added natively: LISTAGG
    (ordered, DISTINCT), MODE, MEDIAN — each a single hash aggregate
    with map-side partials, replacing the collect_set/sort/UDF
    workarounds older pipelines carried.  mode(col, true) is the
    deterministic form (ties break to the lowest value), so the
    oracle hash is stable even when a group has no strict frequency
    winner; the DuckDB oracle spells the same argmax-with-min
    tie-break explicitly since its mode() leaves ties unspecified."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(DISTINCT o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               mode(o_orderpriority, true) AS top_priority,
               round(median(o_totalprice), 2) AS median_price,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
        """
    )


def _passjoin_name_pairs(nd: DataFrame, tau: int = 2) -> DataFrame:
    """PassJoin (Li et al., VLDB 2011) verified name pairs over a
    DISTINCT-name frame `nd` (p_name, blk, slen): returns (name_u,
    name_v, ed) with name_u < name_v and ed <= tau, same blk.

    Recall note (ADVICE r9): the segment index emits zero-length
    segments for names shorter than tau+1 chars, and the probe side
    filters to l >= 1, so the PassJoin core alone is only
    recall-complete for names of length >= tau+1.  Names shorter than
    that are routed through a direct verify path: the short-name set
    is a tiny vocabulary slice (bounded by the alphabet, |Σ|^tau), and
    each short name's candidate partners are length-bounded by
    slen + tau, so the extra join is broadcast-sized at any scale.
    Uses the 3-arg thresholded F.levenshtein (Spark >= 3.5; this repo
    pins pyspark 4.x)."""

    def seg_geom(m):
        # 3-way near-even split of a length-m string: l_i = (m+i)//3,
        # p_0 = 0, p_i = sum of earlier lengths (0-based starts).
        l0 = F.floor(m / 3).cast("int")
        l1 = F.floor((m + 1) / 3).cast("int")
        l2 = F.floor((m + 2) / 3).cast("int")
        return l0, l1, l2

    # Index side: each distinct name contributes its own 3 segments.
    il0, il1, il2 = seg_geom(F.col("slen"))
    index_k = nd.select(
        F.col("p_name").alias("name_i"),
        F.posexplode(
            F.array(
                F.col("p_name").substr(F.lit(1), il0),
                F.col("p_name").substr(il0 + 1, il1),
                F.col("p_name").substr(il0 + il1 + 1, il2),
            )
        ).alias("i", "seg"),
        F.col("slen").alias("M"),
        "blk",
    ).select("name_i", F.xxhash64("i", "M", "seg", "blk").alias("khash"))

    # Probe side: for every candidate partner length M within tau and
    # every (segment, shift) pair allowed by the position filter,
    # extract the aligned substring of our own name.
    with_m = nd.select(
        F.col("p_name").alias("name_p"),
        "blk",
        "slen",
        F.explode(
            F.sequence(F.col("slen") - tau, F.col("slen") + tau)
        ).alias("M"),
    )
    pl0, pl1, pl2 = seg_geom(F.col("M"))
    with_seg = with_m.select(
        "name_p", "blk", "slen", "M",
        F.posexplode(
            F.array(
                F.struct(F.lit(0).cast("int").alias("p"), pl0.alias("l")),
                F.struct(pl0.cast("int").alias("p"), pl1.alias("l")),
                F.struct((pl0 + pl1).cast("int").alias("p"), pl2.alias("l")),
            )
        ).alias("i", "g"),
    )
    delta = F.col("slen") - F.col("M")
    probe_k = (
        with_seg.select(
            "name_p", "blk", "M", "i", "slen", "g",
            F.explode(F.sequence(F.lit(-tau), F.lit(tau))).alias("d"),
        )
        # Position filter (Li et al. §4.2): recall-complete because
        # for the first error-free segment i, edits before it are
        # >= i (each earlier segment holds >= 1 edit) and >= |d|
        # (the shift), edits after are >= |delta - d|.
        .where(
            F.greatest(F.col("i"), F.abs(F.col("d")))
            + F.abs(delta - F.col("d"))
            <= F.lit(tau)
        )
        .select(
            "name_p", "blk", "M", "i", "slen",
            (F.col("g.p") + F.col("d")).alias("start"),
            F.col("g.l").alias("l"),
        )
        .where(
            (F.col("start") >= 0)
            & (F.col("start") + F.col("l") <= F.col("slen"))
            & (F.col("l") >= 1)
        )
        .select(
            "name_p",
            F.xxhash64(
                "i", "M",
                F.col("name_p").substr(F.col("start") + 1, F.col("l")),
                "blk",
            ).alias("khash"),
        )
    )

    # Candidate pairs from the PassJoin core.  name_p < name_i keeps
    # one direction per unordered pair — recall-safe since PassJoin
    # recall holds for either probe/index orientation.
    cand = (
        probe_k.join(index_k, on="khash")
        .where(F.col("name_p") < F.col("name_i"))
        .select(
            F.col("name_p").alias("name_u"),
            F.col("name_i").alias("name_v"),
        )
    )

    # Short-name recall path: any pair involving a name of length
    # < tau+1 is verified directly (broadcast nested-loop over a
    # vocabulary-bounded set; same-blk + length filters first).
    shorts = nd.select(
        F.col("p_name").alias("sn"),
        F.col("blk").alias("sb"),
        F.col("slen").alias("sl"),
    ).where(F.col("sl") <= tau)
    partners = nd.select(
        F.col("p_name").alias("tn"),
        F.col("blk").alias("tb"),
        F.col("slen").alias("tl"),
    ).where(F.col("tl") <= 2 * tau)
    short_cand = (
        F.broadcast(shorts)
        .join(
            partners,
            (F.col("sb") == F.col("tb"))
            & (F.abs(F.col("sl") - F.col("tl")) <= tau)
            & (F.col("sn") != F.col("tn")),
        )
        .select(
            F.least("sn", "tn").alias("name_u"),
            F.greatest("sn", "tn").alias("name_v"),
        )
    )

    dist_nm = F.levenshtein("name_u", "name_v", tau)
    return (
        cand.unionByName(short_cand)
        .distinct()
        .withColumn("ed", dist_nm)
        .where(F.col("ed") >= 0)
    )


@register(
    "fuzzy_part_matches",
    sql="""
    WITH named AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[-1] AS blk
      FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM named a JOIN named b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: near-identical part names
    (typo-level variants, ed <= 2, same last name token).

    Two-level design that separates the two different growth axes of
    the problem:

    1. **PassJoin over DISTINCT names** (Li et al., VLDB 2011):
       every distinct name is split into tau+1 = 3 contiguous
       segments; if ed(a, b) <= 2 the FIRST error-free segment i of
       b appears verbatim in a at shift d obeying the length-aware +
       multi-match position filter max(i, |d|) + |delta - d| <= tau
       (edits before the segment >= max(i, |d|), edits after
       >= |delta - d|, delta = len(a) - len(b)).  The candidate join
       key (segment_idx, indexed_len, segment_text, last_token) is
       folded into one 8-byte xxhash64 (a collision only ADDS a
       candidate, which the exact verify rejects), so candidate work
       scales with the DISTINCT-NAME vocabulary — the axis that
       grows with real data — not with row count.  Survivors get one
       thresholded (banded, early-exit) levenshtein each.
    2. **Member expansion**: matched name pairs (plus each name
       self-paired at ed = 0) join back to the part rows carrying
       those names; the emitted pk pairs equal the oracle's match
       set exactly, so this stage does OUTPUT-BOUND work — the
       information-theoretic floor for pair enumeration.  (TPC-H-ish
       name pools are tiny — 64 distinct names in the test data —
       so the match OUTPUT itself is quadratic in SF: 53k pairs at
       sf0.01 -> 5.5M at sf0.1.  No algorithm beats output size;
       what this design guarantees is that nothing BEYOND the output
       is quadratic.)  At cluster scale the expansion joins are hash
       joins keyed on name; hot names are bounded by cluster size
       and AQE skew-split handles stragglers.

    Replaces the round-2..8 last-token block (fixed ~92-value
    vocabulary -> per-block quadratic candidate work, round-8
    verdict's #1 scale-killer).  levenshtein() is JVM-side on Spark
    and native in DuckDB, so the whole match set is oracle-hashed."""
    part = load_table(spark, sf_dir, "part")
    named = part.select("p_partkey", "p_name")
    nd = part.select(
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("blk"),
        F.length("p_name").alias("slen"),
    ).distinct()
    vp = _passjoin_name_pairs(nd, tau=2)
    self_p = nd.select(
        F.col("p_name").alias("name_u"),
        F.col("p_name").alias("name_v"),
        F.lit(0).alias("ed"),
    )
    pairs = vp.unionByName(self_p)

    # Output-bound member expansion: every emitted row is a final
    # match.  Same-name pairs need pk_a < pk_b to emit each
    # unordered member pair once; cross-name pairs are already
    # unique per (member_u, member_v).
    expanded = (
        pairs.join(
            named.select(
                F.col("p_partkey").alias("pk_u"),
                F.col("p_name").alias("name_u"),
            ),
            on="name_u",
        )
        .join(
            named.select(
                F.col("p_partkey").alias("pk_v"),
                F.col("p_name").alias("name_v"),
            ),
            on="name_v",
        )
        .where((F.col("name_u") != F.col("name_v")) | (F.col("pk_u") < F.col("pk_v")))
    )
    a_first = F.col("pk_u") < F.col("pk_v")
    return expanded.select(
        F.least("pk_u", "pk_v").alias("key_a"),
        F.greatest("pk_u", "pk_v").alias("key_b"),
        F.when(a_first, F.col("name_u")).otherwise(F.col("name_v")).alias("name_a"),
        F.when(a_first, F.col("name_v")).otherwise(F.col("name_u")).alias("name_b"),
        F.col("ed").cast("long").alias("edit_dist"),
    )


def morton_key(x, y, bits: int = 10):
    """Interleave `bits` low bits of two non-negative long columns
    into a Z-order key — pure higher-order fold, no UDF."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (x / F.pow(F.lit(2.0), i.cast("double")).cast("long")).cast("long") % 2
        * F.pow(F.lit(2.0), (2 * i).cast("double")).cast("long")
        + (y / F.pow(F.lit(2.0), i.cast("double")).cast("long")).cast("long") % 2
        * F.pow(F.lit(2.0), (2 * i + 1).cast("double")).cast("long"),
    )


def zorder_keyed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full keyed table (no top-k): what a layout job would
    repartitionByRange + sortWithinPartitions on before writing."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("xk"),
        (F.floor(F.col("o_totalprice") / 1000.0).cast("long") % 1024).alias("yk"),
    )
    return keyed.withColumn("zkey", morton_key(F.col("xk"), F.col("yk")))


@register(
    "snapshot_diff_orders",
    sql="""
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0
                  THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    v1 AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v2.o_orderkey IS NULL THEN 'deleted'
                WHEN v1.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS change_type,
           v1.o_totalprice AS old_price,
           v2.o_totalprice AS new_price
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v2.o_orderkey IS NULL
       OR v1.o_orderkey IS NULL
       OR v1.o_totalprice <> v2.o_totalprice
       OR v1.o_orderstatus <> v2.o_orderstatus
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-feed between two table versions
    (the Delta-CDF pattern, computed engine-side): v2 is a
    deterministic mutation of orders (every 97th key deleted, every
    100th repriced), and the diff is ONE full-outer equi-join on the
    key with a row-hash-style inequality filter — no per-column
    subqueries, no driver loop. At 100 TB both snapshots would be
    bucket-stored on the key so the join co-locates; the change set
    is the only output that moves."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    v2 = o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 100 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    v1 = o.alias("v1")
    v2 = v2.alias("v2")
    joined = v1.join(v2, on="o_orderkey", how="full_outer").select(
        "o_orderkey",
        F.col("v1.o_totalprice").alias("old_price"),
        F.col("v2.o_totalprice").alias("new_price"),
        F.col("v1.o_orderstatus").alias("old_status"),
        F.col("v2.o_orderstatus").alias("new_status"),
        F.col("v1.o_totalprice").isNull().alias("v1_missing"),
        F.col("v2.o_totalprice").isNull().alias("v2_missing"),
    )
    return (
        joined.where(
            F.col("v2_missing")
            | F.col("v1_missing")
            | (F.col("old_price") != F.col("new_price"))
            | (F.col("old_status") != F.col("new_status"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("v2_missing"), "deleted")
            .when(F.col("v1_missing"), "inserted")
            .otherwise("updated")
            .alias("change_type"),
            "old_price",
            "new_price",
        )
    )


@register("kll_quantile_sketch_prices")  # DataSketches KLL: rows-only + property
def kll_quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Apache DataSketches KLL via
    F.kll_sketch_agg_double): per-status sketches built with map-side
    partials, then MERGED into an all-data sketch without reshuffling
    raw prices — the rollup-cube quantile idiom (store the sketch per
    cell, merge on query). Emits p50/p90/p99 per status plus the
    merged ALL row. DuckDB has no KLL, so the gate is rows-only; the
    property test bounds the sketch quantiles against exact
    percentile_approx-free order statistics."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    # kll_sketch_merge_double is a BINARY scalar merge; the all-data
    # sketch is a fold over the (one-per-status, tiny) sketch list
    sk_list = F.collect_list("sk")
    merged = per.agg(
        sk_list.alias("sks"), F.sum("n_rows").alias("n_rows")
    ).select(
        F.lit("ALL").alias("o_orderstatus"),
        F.aggregate(
            F.slice(F.col("sks"), 2, F.greatest(F.size("sks") - 1, F.lit(0))),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
        "n_rows",
    )
    both = per.unionByName(merged)
    return both.select(
        "o_orderstatus",
        "n_rows",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 2).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 2).alias("p99"),
    )


@register(
    "theta_sketch_segment_overlap",
    sql="""
    WITH seg AS (
      SELECT c_mktsegment, c_custkey FROM customer
    ),
    sizes AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows
      FROM seg GROUP BY 1
    )
    SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
           a.n_rows AS n_a, b.n_rows AS n_b,
           (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM seg
            WHERE c_mktsegment IN (a.c_mktsegment, b.c_mktsegment))
             AS est_union,
           (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT c_custkey FROM seg WHERE c_mktsegment = a.c_mktsegment
               INTERSECT
               SELECT c_custkey FROM seg WHERE c_mktsegment = b.c_mktsegment))
             AS est_intersection
    FROM sizes a JOIN sizes b ON a.c_mktsegment < b.c_mktsegment
    """,
)  # DataSketches Theta in exact mode at test SF: oracle-hashed
def theta_sketch_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable SET sketches (Apache DataSketches Theta): per-segment
    customer sketches support UNION, INTERSECTION and DIFFERENCE
    estimates — the cross-segment audience-overlap question HLL
    cannot answer (HLL only unions). Each segment's sketch is built
    map-side; the pairwise overlap matrix is computed on the tiny
    collected sketch frame via theta_intersection on a self-join of
    segments — sketches move, never customer ids. lgNomEntries=15
    keeps the sketches in EXACT mode below ~32k distinct keys per
    union, so at the gate SFs the estimates equal the true set
    algebra and the query is oracle-hashed against exact
    DISTINCT/INTERSECT SQL (beyond that scale the same plan degrades
    gracefully to ~2% error estimates)."""
    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(
        F.theta_sketch_agg("c_custkey", 15).alias("sk"),
        F.count("*").alias("n_rows"),
    )
    a = seg.select(
        F.col("c_mktsegment").alias("seg_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_rows").alias("n_a"),
    )
    b = seg.select(
        F.col("c_mktsegment").alias("seg_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_rows").alias("n_b"),
    )
    return (
        a.join(b, F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            F.round(
                F.theta_sketch_estimate(
                    F.theta_union(F.col("sk_a"), F.col("sk_b"), 15)
                )
            ).cast("long").alias("est_union"),
            F.round(
                F.theta_sketch_estimate(
                    F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
                )
            ).cast("long").alias("est_intersection"),
        )
    )


@register(
    "bitmap_exact_distinct_customers",
    sql="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    """,
)
def bitmap_exact_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark 4 bitmap aggregates:
    keys bucket into 32k-bit bitmap segments (bitmap_bucket_number),
    each (group, bucket) builds its bitmap with map-side partial OR,
    and the distinct count is the sum of bit_counts — a re-rollable
    EXACT distinct (bitmaps OR-merge like sketches but without
    estimation error; the Delta/ClickHouse bitmap-index idiom).
    Oracle: plain COUNT(DISTINCT) — the bitmap path must match it
    exactly, which is the whole point."""
    o = load_table(spark, sf_dir, "orders")
    per_bucket = o.select(
        "o_orderstatus",
        F.bitmap_bucket_number("o_custkey").alias("bkt"),
        F.col("o_custkey").alias("k"),
    ).groupBy("o_orderstatus", "bkt").agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm")
    )
    return (
        per_bucket.groupBy("o_orderstatus")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct"))
    )


@register(
    "association_rules_pairs",
    sql="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey % 50 AS item FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM lineitem),
    item_supp AS (
      SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY item
    ),
    pair_supp AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING count(*) >= 75
    )
    SELECT p.item_a, p.item_b, p.n_pair,
           round(CAST(p.n_pair AS DOUBLE) / n.n_orders, 6) AS support,
           round(CAST(p.n_pair AS DOUBLE) / sa.n_item, 6) AS confidence,
           round(CAST(p.n_pair AS DOUBLE) * n.n_orders
                 / (sa.n_item * sb.n_item), 6) AS lift
    FROM pair_supp p
    JOIN item_supp sa ON p.item_a = sa.item
    JOIN item_supp sb ON p.item_b = sb.item
    CROSS JOIN n
    """,
)
def association_rules_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (pairwise support / confidence
    / lift — the 2-itemset core of Apriori/FP-growth): baskets are
    per-order distinct item sets, candidate pairs come from a
    self-equi-join ON THE ORDER KEY (quadratic only within a basket,
    the same confinement argument as SemDeDup's clusters), and the
    min-support HAVING prunes before the metric joins. Item stats are
    the small broadcast side. Items bucketed mod 50 so sf0.01's
    baskets genuinely overlap (avg pair co-occurrence ~70)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    ).distinct()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    item_supp = baskets.groupBy("item").agg(F.count("*").alias("n_item"))
    a = baskets.select("l_orderkey", F.col("item").alias("item_a"))
    b = baskets.select("l_orderkey", F.col("item").alias("item_b"))
    pair_supp = (
        a.join(b, "l_orderkey")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= 75)
    )
    sa = item_supp.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    sb = item_supp.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair_supp.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("n_pair") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


TDIGEST_QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@register("tdigest_quantiles_prices")  # order-sensitive sketch: rows-only
def tdigest_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R203 t-digest quantile sketch (Dunning merging digest,
    operators/tdigest.py, δ=100) over order prices — the mergeable
    tail-accurate quantile summary complementing the KLL gate (R52):
    per-partition compress in mapInPandas, then ONE model-sized merge
    of the P·O(δ) partial centroids, then interpolated estimates at
    the 7 standard probe points. Centroid merging is order-sensitive
    (inherent to the sketch), so the gate is rows-only; property
    tests bound the rank error of every estimate (tight at the
    tails, where the k2 size bound concentrates resolution) and
    verify the partial→merge path against a single-shot digest."""
    from zoom_spark.operators.tdigest import tdigest_quantiles

    o = load_table(spark, sf_dir, "orders")
    return tdigest_quantiles(o, "o_totalprice", TDIGEST_QS).select(
        "q",
        F.round("est", 4).alias("est"),
        "n_centroids",
    )


@register(
    "time_travel_asof_orders",
    sql="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS version, 0 AS seq, 'I' AS op,
             o_totalprice AS price, o_orderstatus AS status
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 1, 'U', round(o_totalprice * 1.1, 2),
             o_orderstatus
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey, 2, 2, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey, 3, 1, 'U', round(o_totalprice * 0.8, 2),
             o_orderstatus
      FROM orders WHERE o_orderkey % 50 = 0
    ),
    recon AS (
      SELECT k, op, price, status,
             row_number() OVER (PARTITION BY k
                                ORDER BY version DESC, seq DESC) AS rn
      FROM log WHERE version <= 2
    )
    SELECT k AS o_orderkey, price, status
    FROM recon WHERE rn = 1 AND op <> 'D'
    """,
)
def time_travel_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel AS OF version 2: reconstruct the orders table from
    a change log (insert base, v2 repriced/deleted, v3 repriced
    again) by last-writer-wins per key — ONE window over the log
    partitioned by key (parallel across keys), keep the latest
    non-delete entry at or before the target version. This is the
    Delta/Iceberg snapshot-reconstruction primitive expressed as a
    plain DataFrame plan; the v3 entries prove later versions are
    actually excluded. Sibling of snapshot_diff_orders (forward diff)
    and merge/SCD2 (operators/merge.py)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("version"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    v2u = o.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("version"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") * 1.1, 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    v2d = o.where(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("version"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("status"),
    )
    v3u = o.where(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("version"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.round(F.col("o_totalprice") * 0.8, 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    log = base.unionAll(v2u).unionAll(v2d).unionAll(v3u)
    w = Window.partitionBy("k").orderBy(
        F.col("version").desc(), F.col("seq").desc()
    )
    asof = (
        log.where(F.col("version") <= 2)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return asof.select(F.col("k").alias("o_orderkey"), "price", "status")


@register(
    "l_diversity_report",
    sql="""
    WITH t AS (
      SELECT c_mktsegment AS qi1, c_nationkey % 5 AS qi2,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS sensitive
      FROM customer
    ),
    cls AS (
      SELECT qi1, qi2,
             CAST(count(*) AS BIGINT) AS class_size,
             CAST(count(DISTINCT sensitive) AS BIGINT) AS distinct_l
      FROM t GROUP BY qi1, qi2
    ),
    ent AS (
      SELECT qi1, qi2,
             round(-sum(p * ln(p)), 6) AS entropy_nats
      FROM (
        SELECT qi1, qi2,
               CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY qi1, qi2) AS p
        FROM t GROUP BY qi1, qi2, sensitive
      ) q
      GROUP BY qi1, qi2
    )
    SELECT cls.qi1, cls.qi2, cls.class_size, cls.distinct_l,
           ent.entropy_nats,
           round(exp(ent.entropy_nats), 4) AS entropy_l
    FROM cls JOIN ent ON cls.qi1 = ent.qi1 AND cls.qi2 = ent.qi2
    """,
)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit per quasi-identifier class (the step after
    k-anonymity): distinct-l (count of distinct sensitive values in
    the class) and ENTROPY l-diversity exp(H(sensitive|class)) — the
    privacy guarantee k_anonymity_report cannot see (a large class
    whose sensitive attribute is constant is k-anonymous but 1-
    diverse). Two hash aggregates + one per-class entropy reduce;
    within-class shares are exact-count ratios."""
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        F.col("c_mktsegment").alias("qi1"),
        (F.col("c_nationkey") % 5).alias("qi2"),
        F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias(
            "sensitive"
        ),
    )
    cls = t.groupBy("qi1", "qi2").agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.countDistinct("sensitive").cast("bigint").alias("distinct_l"),
    )
    cell = t.groupBy("qi1", "qi2", "sensitive").agg(
        F.count("*").alias("cnt")
    )
    tot = cell.groupBy("qi1", "qi2").agg(F.sum("cnt").alias("ncls"))
    ent = (
        cell.join(tot, ["qi1", "qi2"])
        .select(
            "qi1",
            "qi2",
            (F.col("cnt").cast("double") / F.col("ncls")).alias("p"),
        )
        .groupBy("qi1", "qi2")
        .agg(F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy_nats"))
    )
    return cls.join(ent, ["qi1", "qi2"]).select(
        "qi1",
        "qi2",
        "class_size",
        "distinct_l",
        "entropy_nats",
        F.round(F.exp("entropy_nats"), 4).alias("entropy_l"),
    )


# ---------------------------------------------------------------------------
# R237: differentially-private median via the exponential mechanism
# ---------------------------------------------------------------------------

DPQ_EPS = 1.0


@register(
    "dp_median_exponential_mechanism",
    sql=f"""
    WITH v AS (SELECT o_totalprice AS x FROM orders),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    pv AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY x),
    cum AS (
      SELECT x, CAST(sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS r
      FROM pv
    ),
    scored AS (
      SELECT cum.x,
             -abs(CAST(cum.r AS DOUBLE) - nn.n / 2.0) AS utility,
             {DPQ_EPS!r} / 2.0
               * (-abs(CAST(cum.r AS DOUBLE) - nn.n / 2.0))
             - ln(-ln((1.0 + CAST(('0x' || substring(
                   md5(CAST(cum.x AS VARCHAR)), 1, 8)) AS BIGINT))
                 / 4294967297.0)) AS gumbel_score
      FROM cum CROSS JOIN nn
    ),
    win AS (
      SELECT x, utility, gumbel_score FROM scored
      ORDER BY gumbel_score DESC, x LIMIT 1
    )
    SELECT nn.n,
           win.x AS dp_median,
           round(win.utility, 4) + 0.0 AS rank_utility,
           round(win.gumbel_score, 6) AS winning_score,
           (SELECT round(quantile_cont(x, 0.5), 4) FROM v)
             AS exact_median
    FROM win CROSS JOIN nn
    """,
)
def dp_median_exponential_mechanism(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R237 ε-differentially-private MEDIAN by the exponential
    mechanism (McSherry-Talwar) with Gumbel-max selection — the
    standard distributed formulation because argmax(score + Gumbel)
    samples exactly from the exponential-mechanism distribution and
    is embarrassingly parallel (one TakeOrdered over candidates, no
    sequential sampling). Utility = −|rank − n/2| from the
    distinct-value prefix scan; sensitivity 1. Gumbel noise derives
    from the repo's md5-uniform idiom so BOTH engines select the
    identical winner (replay-deterministic gate; a production run
    would swap in a fresh seed, changing nothing structural). The
    privacy-utility tradeoff is referee-tested: the winner's rank
    error vs the exact median."""
    from zoom_spark.operators.prefix import prefix_sum

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x")
    )
    nn = o.agg(F.count("*").cast("bigint").alias("n"))
    pv = o.groupBy("x").agg(F.count("*").cast("bigint").alias("cnt"))
    cum = prefix_sum(pv, "x", "cnt", out_col="r").withColumn(
        "r", F.col("r").cast("bigint")
    )
    u = (
        1.0
        + F.conv(
            F.substring(F.md5(F.col("x").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
    ) / F.lit(4294967297.0)
    utility = -F.abs(F.col("r").cast("double") - F.col("n") / 2.0)
    scored = cum.crossJoin(F.broadcast(nn)).select(
        "x",
        utility.alias("utility"),
        (DPQ_EPS / 2.0 * utility - F.log(-F.log(u))).alias(
            "gumbel_score"
        ),
    )
    win = scored.orderBy(
        F.col("gumbel_score").desc(), F.col("x")
    ).limit(1)
    med = o.agg(
        F.round(F.expr("percentile(x, 0.5)"), 4).alias("exact_median")
    )
    return (
        win.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(med))
        .select(
            "n",
            F.col("x").alias("dp_median"),
            (F.round(F.col("utility"), 4) + 0.0).alias("rank_utility"),
            F.round(F.col("gumbel_score"), 6).alias("winning_score"),
            "exact_median",
        )
    )
