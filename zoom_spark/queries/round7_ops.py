"""Round-7 operators: the composed lakehouse-maintenance flagship
(VERDICT r6 item 7) and subsequent R242+ additions.

The flagship composes the repo's warehouse primitives the way a real
nightly table-maintenance job does — CDC batch -> MERGE ->
snapshot-diff vs the prior version -> zone-map prunability report —
mirroring how pretrain_corpus_pipeline composes the curation ops.
Each query is Spark-first with an exact DuckDB oracle twin; floats are
rounded on both sides before compare (driver-gate discipline,
tests/oracle_harness.py).

Reference parity note: the reference (/root/reference/main.py) has no
table-maintenance surface at all — its sink is drop-then-reload
(main.py:58,130,152) with the §1.5 double-insert hazard; this module
is the mandated warehouse extension family (SURVEY.md §2.11+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register

# The scan predicate the zone-map stage evaluates (orders ingest-month
# chunks before this date are prunable for `o_orderdate >= pred`).
LH_PRED_DATE = "1997-06-01"


@register(
    "lakehouse_maintenance_pipeline",
    sql=f"""
    WITH o AS (
      SELECT o_orderkey AS k, o_totalprice AS price,
             o_orderstatus AS status, CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    base AS (SELECT * FROM o WHERE k % 97 <> 0),
    ins AS (SELECT * FROM o WHERE k % 97 = 0),
    upd AS (
      SELECT k, round(price * 1.05, 2) AS price, status, d
      FROM base WHERE k % 100 = 0
    ),
    dels AS (SELECT k FROM base WHERE k % 89 = 0 AND k % 100 <> 0),
    up AS (SELECT * FROM ins UNION ALL SELECT * FROM upd),
    merged AS (
      SELECT m.* FROM (
        SELECT b.* FROM base b
        WHERE b.k NOT IN (SELECT k FROM up)
        UNION ALL
        SELECT * FROM up
      ) m
      WHERE m.k NOT IN (SELECT k FROM dels)
    ),
    diff AS (
      SELECT CASE WHEN b.k IS NULL THEN 'inserted'
                  WHEN m.k IS NULL THEN 'deleted'
                  ELSE 'updated' END AS change_type,
             coalesce(m.d, b.d) AS d
      FROM merged m FULL OUTER JOIN base b ON m.k = b.k
      WHERE b.k IS NULL OR m.k IS NULL
         OR m.price <> b.price OR m.status <> b.status
    ),
    ch AS (
      SELECT CAST(year(d) * 12 + month(d) - 1 AS BIGINT) AS chunk,
             CAST(sum(CASE WHEN change_type = 'inserted' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_inserted,
             CAST(sum(CASE WHEN change_type = 'updated' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_updated,
             CAST(sum(CASE WHEN change_type = 'deleted' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_deleted
      FROM diff GROUP BY 1
    ),
    zm AS (
      SELECT CAST(year(d) * 12 + month(d) - 1 AS BIGINT) AS chunk,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(d) AS min_date, max(d) AS max_date,
             (max(d) < DATE '{LH_PRED_DATE}') AS prunable
      FROM merged GROUP BY 1
    )
    SELECT coalesce(zm.chunk, ch.chunk) AS chunk,
           CAST(coalesce(zm.n_rows, 0) AS BIGINT) AS n_rows,
           zm.min_date, zm.max_date, zm.prunable,
           CAST(coalesce(ch.n_inserted, 0) AS BIGINT) AS n_inserted,
           CAST(coalesce(ch.n_updated, 0) AS BIGINT) AS n_updated,
           CAST(coalesce(ch.n_deleted, 0) AS BIGINT) AS n_deleted
    FROM zm FULL OUTER JOIN ch ON zm.chunk = ch.chunk
    """,
)
def lakehouse_maintenance_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R242 composed lakehouse-maintenance flagship: a deterministic
    day-N CDC batch (inserts = every 97th key, updates = every 100th
    repriced +5%, deletes = every 89th) is MERGEd into the base
    snapshot (operators/merge.merge_upsert + key anti-join delete),
    the new snapshot is DIFFed against the base (the snapshot_diff /
    Delta-CDF full-outer-join pattern), and a zone-map report
    (per ingest-month chunk: rows, min/max date, prunable for
    `o_orderdate >= {LH_PRED_DATE}`) is joined with the per-chunk
    change counts — one row per month chunk describing both the new
    layout and what the maintenance pass changed in it.

    Composition consistency is referee-tested: diff(merge(base,
    batch), base) must reproduce the batch exactly (the §1.5
    double-insert hazard inverted into an invariant). Scale shape:
    every stage is an equi-join or hash aggregate on the table key or
    the month chunk — at 100 TB both snapshots bucket on the key so
    MERGE and DIFF co-locate, and the zone-map pass is the metadata
    aggregate a lakehouse scan planner runs, not a data rewrite."""
    from zoom_spark.operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    base = o.where(F.col("k") % 97 != 0)
    ins = o.where(F.col("k") % 97 == 0)
    upd = base.where(F.col("k") % 100 == 0).withColumn(
        "price", F.round(F.col("price") * 1.05, 2)
    )
    dels = base.where(
        (F.col("k") % 89 == 0) & (F.col("k") % 100 != 0)
    ).select("k")
    merged = merge_upsert(base, ins.unionByName(upd), "k").join(
        dels, on="k", how="left_anti"
    )
    m, b = merged.alias("m"), base.alias("b")
    joined = m.join(b, F.col("m.k") == F.col("b.k"), "full_outer")
    diff = joined.where(
        F.col("b.k").isNull()
        | F.col("m.k").isNull()
        | (F.col("m.price") != F.col("b.price"))
        | (F.col("m.status") != F.col("b.status"))
    ).select(
        F.when(F.col("b.k").isNull(), "inserted")
        .when(F.col("m.k").isNull(), "deleted")
        .otherwise("updated")
        .alias("change_type"),
        F.coalesce(F.col("m.d"), F.col("b.d")).alias("d"),
    )
    chunk = (F.year("d") * 12 + F.month("d") - 1).cast("bigint")
    ch = diff.groupBy(chunk.alias("chunk")).agg(
        F.sum(F.when(F.col("change_type") == "inserted", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.sum(F.when(F.col("change_type") == "updated", 1).otherwise(0))
        .cast("bigint")
        .alias("n_updated"),
        F.sum(F.when(F.col("change_type") == "deleted", 1).otherwise(0))
        .cast("bigint")
        .alias("n_deleted"),
    )
    zm = merged.groupBy(chunk.alias("chunk")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("d").alias("min_date"),
        F.max("d").alias("max_date"),
        (F.max("d") < F.lit(LH_PRED_DATE).cast("date")).alias("prunable"),
    )
    z, c = zm.alias("z"), ch.alias("c")
    return z.join(c, F.col("z.chunk") == F.col("c.chunk"), "full_outer").select(
        F.coalesce(F.col("z.chunk"), F.col("c.chunk")).alias("chunk"),
        F.coalesce(F.col("z.n_rows"), F.lit(0)).cast("bigint").alias("n_rows"),
        "min_date",
        "max_date",
        "prunable",
        F.coalesce(F.col("c.n_inserted"), F.lit(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.coalesce(F.col("c.n_updated"), F.lit(0))
        .cast("bigint")
        .alias("n_updated"),
        F.coalesce(F.col("c.n_deleted"), F.lit(0))
        .cast("bigint")
        .alias("n_deleted"),
    )


# Shared DuckDB skeleton for the co-purchase graph (engine twin:
# advanced_analytics._co_purchase_edges). `eu` is the undirected
# deduped edge list (u < v), `sym` both orientations.
_CP_EDGES_SQL = """li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    eu AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM eu UNION ALL SELECT v AS a, u AS b FROM eu
    ),
    deg AS MATERIALIZED (SELECT a AS node, count(*) AS d FROM sym GROUP BY a)"""


RC_MAX_K = 10


@register(
    "rich_club_coefficients",
    sql=f"""
    WITH {_CP_EDGES_SQL},
    emd AS (
      SELECT least(du.d, dv.d) AS min_deg
      FROM eu e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    eh AS (SELECT min_deg, count(*) AS ec FROM emd GROUP BY min_deg),
    nh AS (SELECT d, count(*) AS nc FROM deg GROUP BY d),
    ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, {RC_MAX_K} + 1)),
    agg AS (
      SELECT k.k,
             CAST(coalesce(sum(CASE WHEN nh.d > k.k THEN nh.nc END), 0)
                  AS BIGINT) AS n_nodes
      FROM ks k LEFT JOIN nh ON true GROUP BY k.k
    ),
    eagg AS (
      SELECT k.k,
             CAST(coalesce(sum(CASE WHEN eh.min_deg > k.k THEN eh.ec END), 0)
                  AS BIGINT) AS n_edges
      FROM ks k LEFT JOIN eh ON true GROUP BY k.k
    )
    SELECT a.k, a.n_nodes, e.n_edges,
           CASE WHEN a.n_nodes >= 2
                THEN round(2.0 * e.n_edges
                           / (a.n_nodes * (a.n_nodes - 1.0)), 6)
           END AS phi
    FROM agg a JOIN eagg e ON a.k = e.k
    """,
)
def rich_club_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R244 rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) for
    k = 1..{RC_MAX_K}: the edge density among nodes of degree > k —
    rising phi(k) means hubs preferentially interconnect (the
    'rich club' that dominates spreading/robustness analyses).
    Scale shape: the k-grid never touches the edge list — edges
    collapse to a min-endpoint-degree HISTOGRAM (one aggregate),
    nodes to a degree histogram, and the 10-row grid joins against
    those model-sized frames; integer counts end-to-end, one division
    at the end."""
    from zoom_spark.queries.advanced_analytics import _co_purchase_edges

    eu = _co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = eu.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        eu.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    emd = (
        eu.join(deg.withColumnRenamed("d", "du"), eu["u"] == deg["node"])
        .drop("node")
        .join(
            deg.withColumnRenamed("d", "dv").withColumnRenamed(
                "node", "node2"
            ),
            F.col("v") == F.col("node2"),
        )
        .select(F.least("du", "dv").alias("min_deg"))
    )
    eh = emd.groupBy("min_deg").agg(F.count("*").alias("ec"))
    nh = deg.groupBy("d").agg(F.count("*").alias("nc"))
    ks = spark.range(1, RC_MAX_K + 1).select(
        F.col("id").cast("bigint").alias("k")
    )
    agg = (
        ks.crossJoin(F.broadcast(nh))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("d") > F.col("k"), F.col("nc"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_nodes")
        )
    )
    eagg = (
        ks.crossJoin(F.broadcast(eh))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("min_deg") > F.col("k"), F.col("ec"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_edges")
        )
    )
    return agg.join(eagg, on="k").select(
        "k",
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") >= 2,
            F.round(
                2.0
                * F.col("n_edges")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1.0)),
                6,
            ),
        ).alias("phi"),
    )


@register(
    "modularity_brand_partition",
    sql=f"""
    WITH {_CP_EDGES_SQL},
    lab AS MATERIALIZED (
      SELECT p_partkey AS node, p_brand AS community FROM part
    ),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM eu),
    internal AS (
      SELECT lu.community, count(*) AS e_c
      FROM eu e
      JOIN lab lu ON e.u = lu.node JOIN lab lv ON e.v = lv.node
      WHERE lu.community = lv.community
      GROUP BY lu.community
    ),
    dsum AS (
      SELECT l.community, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d.d) AS BIGINT) AS degree_sum
      FROM deg d JOIN lab l ON d.node = l.node
      GROUP BY l.community
    )
    SELECT ds.community,
           ds.n_nodes,
           CAST(coalesce(i.e_c, 0) AS BIGINT) AS internal_edges,
           ds.degree_sum,
           round(coalesce(i.e_c, 0) / (SELECT m FROM m)
                 - (ds.degree_sum / (2.0 * (SELECT m FROM m)))
                   * (ds.degree_sum / (2.0 * (SELECT m FROM m))),
                 6) AS q_contribution
    FROM dsum ds LEFT JOIN internal i ON ds.community = i.community
    """,
)
def modularity_brand_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R245 Newman-Girvan modularity of a GIVEN partition — the brand
    of each part — over the co-purchase graph: per community c,
    Q_c = e_c/m - (d_c/2m)^2 (internal-edge fraction minus the
    configuration-model expectation); sum(Q_c) is the modularity a
    community-detection pass would report for this labeling. This is
    the evaluation half of community detection expressed as pure
    joins/aggregates (the detection half, label propagation, is
    community_labels_copurchase): two broadcast label joins + two
    hash aggregates, integer counts into one closed form — one
    shuffle on the node key regardless of scale."""
    from zoom_spark.queries.advanced_analytics import _co_purchase_edges

    eu = _co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = eu.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        eu.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    lab = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("community")
    )
    m_row = eu.agg(F.count("*").cast("double").alias("m"))
    lu = lab.withColumnRenamed("node", "u").withColumnRenamed(
        "community", "cu"
    )
    lv = lab.withColumnRenamed("node", "v").withColumnRenamed(
        "community", "cv"
    )
    internal = (
        eu.join(F.broadcast(lu), on="u")
        .join(F.broadcast(lv), on="v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").alias("e_c"))
    )
    dsum = (
        deg.join(F.broadcast(lab), on="node")
        .groupBy("community")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    return (
        dsum.join(internal, on="community", how="left")
        .crossJoin(F.broadcast(m_row))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0))
            .cast("bigint")
            .alias("internal_edges"),
            "degree_sum",
            F.round(
                F.coalesce(F.col("e_c"), F.lit(0)) / F.col("m")
                - (F.col("degree_sum") / (2.0 * F.col("m")))
                * (F.col("degree_sum") / (2.0 * F.col("m"))),
                6,
            ).alias("q_contribution"),
        )
    )


@register(
    "powerlaw_degree_fit",
    sql=f"""
    WITH {_CP_EDGES_SQL},
    dh AS (SELECT d, count(*) AS nc FROM deg GROUP BY d),
    n AS (SELECT CAST(sum(nc) AS DOUBLE) AS n FROM dh),
    ccdf AS (
      SELECT d,
             CAST(sum(nc) OVER (ORDER BY d DESC) AS DOUBLE)
               / (SELECT n FROM n) AS p_ge
      FROM dh
    ),
    pts AS (
      SELECT ln(CAST(d AS DOUBLE)) AS lx, ln(p_ge) AS ly FROM ccdf
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS k,
             sum(lx) AS sx, sum(ly) AS sy,
             sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
      FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_distinct_degrees,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS ccdf_slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k,
                 6) AS ccdf_intercept
    FROM s
    """,
)
def powerlaw_degree_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R246 power-law tail fit of the degree distribution: OLS of
    ln(CCDF) on ln(degree) over the distinct-degree grid — slope
    ~ -(alpha-1) estimates the power-law exponent (the quick
    log-log-regression diagnostic; for publication-grade fits use
    MLE a la Clauset-Shalizi-Newman, but this is the scan-level
    health check a graph pipeline logs). The regression runs over
    the DEGREE HISTOGRAM (hundreds of rows at any SF — the CCDF
    window is over that model-sized frame, not the node list), so
    the only data-sized work is one degree aggregate."""
    from pyspark.sql import Window

    from zoom_spark.queries.advanced_analytics import _co_purchase_edges

    eu = _co_purchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = eu.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        eu.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    dh = deg.groupBy("d").agg(F.count("*").alias("nc"))
    n_row = dh.agg(F.sum("nc").cast("double").alias("n"))
    w = Window.orderBy(F.col("d").desc())
    ccdf = (
        dh.crossJoin(F.broadcast(n_row))
        .withColumn("cum_ge", F.sum("nc").over(w).cast("double"))
        .select("d", (F.col("cum_ge") / F.col("n")).alias("p_ge"))
    )
    pts = ccdf.select(
        F.log(F.col("d").cast("double")).alias("lx"),
        F.log("p_ge").alias("ly"),
    )
    s = pts.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("k").cast("bigint").alias("n_distinct_degrees"),
        F.round(slope, 6).alias("ccdf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias(
            "ccdf_intercept"
        ),
    )
