"""Similarity-search gated queries (X3) over `embeddings`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register
from zoom_spark.similarity.knn import brute_force_topk, lsh_bucketed_topk

N_QUERIES = 20
EMBED_DIM = 64


def int_lloyd_cte_sql(k: int, iters: int, qscale: int) -> str:
    """Shared unrolled integer-Lloyd WITH-body (round-9 technique):
    the whole fit runs on INTEGER-quantized vectors, so every dot
    product and partial sum is exact in both engines (|x| <= qscale,
    64-term products well under 2^53) — no 9dp snap schedule, no
    half-grid risk.  Exposes CTEs edim (vec_id, d, x), vecs (vec_id,
    qv array), and assign{iters} (vec_id, cell) for the caller's
    final SELECT.  Reused by kmeans_corpus_cells and the SemDeDup
    oracle."""
    parts = [
        f"""
    WITH edim AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {qscale} + 0.5) AS BIGINT) AS x
      FROM embeddings
    ),
    vecs AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * {qscale} + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings
    ),
    seed AS (
      SELECT vec_id,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS INTEGER) AS cell
      FROM embeddings
    ),
    cent0 AS MATERIALIZED (
      SELECT s.cell, e.d, e.x AS cv
      FROM seed s JOIN edim e USING (vec_id)
      WHERE s.cell < {k}
    )"""
    ]
    for r in range(iters + 1):
        parts.append(f""",
    cn2_{r} AS (
      SELECT cell, sum(cv * cv) AS n2 FROM cent{r} GROUP BY cell
    ),
    score{r} AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             -2 * sum(e.x * c.cv) + any_value(n.n2) AS s
      FROM edim e
      JOIN cent{r} c ON e.d = c.d
      JOIN cn2_{r} n ON n.cell = c.cell
      GROUP BY e.vec_id, c.cell
    ),
    assign{r} AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY s, cell) AS rn
        FROM score{r}
      ) WHERE rn = 1
    )""")
        if r < iters:
            parts.append(f""",
    cent{r + 1} AS MATERIALIZED (
      SELECT a.cell, e.d,
             CAST(floor(CAST(sum(e.x) AS DOUBLE) / count(*) + 0.5)
                  AS BIGINT) AS cv
      FROM assign{r} a JOIN edim e USING (vec_id)
      GROUP BY a.cell, e.d
    )""")
    return "".join(parts)



def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


@register(
    "knn_bruteforce",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS n_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS nv
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, n_id,
             round(list_cosine_similarity(qv, nv), 6) AS cosine_sim
      FROM q CROSS JOIN c WHERE q_id <> n_id
    ),
    ranked AS (
      SELECT q_id, n_id AS neighbor_id, cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY cosine_sim DESC, n_id) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT q_id, neighbor_id, cosine_sim, rnk FROM ranked WHERE rnk <= 5
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 baseline: exact top-5 cosine neighbors for the first
    20 vectors — broadcast queries x corpus scan, JVM-side math."""
    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(emb, queries, vec_col="embedding", id_col="vec_id", k=5)


LSH_PLANES = 4
LSH_QSCALE = 1_000_000


def _int_planes() -> list[list[int]]:
    """The LCG hyperplanes snapped once to the 1e-6 integer grid —
    model weights shared verbatim by the engine and the oracle, so
    every projection is an exact 64-term integer dot product."""
    from zoom_spark.similarity.knn import make_hyperplanes

    return [
        [int(__import__("math").floor(x * LSH_QSCALE + 0.5)) for x in p]
        for p in make_hyperplanes(EMBED_DIM, LSH_PLANES, seed=42)
    ]


def _knn_lsh_oracle_sql() -> str:
    planes = _int_planes()
    vals = ",\n        ".join(
        f"({p}, {d + 1}, {w})"
        for p, row in enumerate(planes)
        for d, w in enumerate(row)
    )
    return f"""
    WITH planes(p, d, w) AS (VALUES
        {vals}
    ),
    vecs AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * {LSH_QSCALE} + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings
    ),
    edim AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {LSH_QSCALE} + 0.5) AS BIGINT) AS x
      FROM embeddings
    ),
    buckets AS MATERIALIZED (
      SELECT e.vec_id,
             CAST(sum(CASE WHEN proj > 0
                      THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS b
      FROM (
        SELECT e.vec_id, pl.p, sum(e.x * pl.w) AS proj
        FROM edim e JOIN planes pl ON e.d = pl.d
        GROUP BY e.vec_id, pl.p
      ) e GROUP BY e.vec_id
    ),
    nv AS MATERIALIZED (
      SELECT v.vec_id, b.b, v.qv,
             sqrt(CAST(list_inner_product(v.qv, v.qv) AS DOUBLE)) AS nrm
      FROM vecs v JOIN buckets b USING (vec_id)
    ),
    probes AS (   -- own bucket + the 4 Hamming-1 flips
      SELECT vec_id AS q_id, xor(b, m.m) AS pb
      FROM buckets, (VALUES (0), (1), (2), (4), (8)) m(m)
      WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.q_id, c.vec_id AS neighbor_id,
             floor(CAST(list_inner_product(q.qv, c.qv) AS DOUBLE)
                   / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine_sim
      FROM probes p
      JOIN nv c ON c.b = p.pb
      JOIN nv q ON q.vec_id = p.q_id
      WHERE c.vec_id <> p.q_id
    ),
    ranked AS (
      SELECT q_id, neighbor_id, cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY q_id
               ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT q_id, neighbor_id, cosine_sim, rnk FROM ranked WHERE rnk <= 5
    """


@register("knn_lsh_bucketed", sql=_knn_lsh_oracle_sql())
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: random-hyperplane LSH bucketing — equi-join on
    bucket instead of a full cross join, with radius-1 multi-probe
    (query side explodes to the 5 Hamming-adjacent buckets; candidate
    set is still ~5/16 of the corpus, not O(n)). Property tests keep
    measuring recall overlap vs brute force and planted-neighbor
    recall for the float general operator (knn.lsh_bucketed_topk).

    Oracle-hashed since round 9: the LCG hyperplanes AND the vectors
    snap once to the 1e-6 integer grid, so every projection is an
    exact 64-term integer dot product — sign bits, bucket ids and
    the probe fan-out are bit-deterministic in both engines, and the
    candidate ranking reuses the exact-cosine contract (integer dot
    / IEEE sqrt norms, shared floor(x*1e6+0.5) snap BEFORE ranking).
    The approximate result value-hashes even though recall < 1 —
    same round-9 technique as knn_ivf."""
    from zoom_spark.similarity.kmeans import int_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    base = int_quantize(
        emb, "embedding", "vec_id", LSH_QSCALE
    ).localCheckpoint(eager=False)
    planes = _int_planes()
    dotl = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pstats = F.broadcast(
        spark.createDataFrame(
            [(planes,)], "pmat array<array<long>>"
        )
    )
    bucket = F.aggregate(
        F.zip_with(
            F.col("pmat"),
            F.sequence(F.lit(0), F.lit(LSH_PLANES - 1)),
            lambda p, i: F.when(
                dotl(F.col("vec"), p) > 0,
                F.pow(F.lit(2.0), i.cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nv = (
        base.crossJoin(pstats)
        .select(
            "id",
            "vec",
            bucket.alias("b"),
            F.sqrt(dotl(F.col("vec"), F.col("vec")).cast("double")).alias(
                "nrm"
            ),
        )
        .localCheckpoint(eager=False)
    )
    masks = [0] + [1 << i for i in range(LSH_PLANES)]
    probes = (
        nv.where(F.col("id") < N_QUERIES)
        .select(
            F.col("id").alias("q_id"),
            F.explode(
                F.array(
                    *[
                        F.col("b").bitwiseXOR(F.lit(m).cast("long"))
                        for m in masks
                    ]
                )
            ).alias("pb"),
        )
    )
    qv = nv.select(
        F.col("id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    sim = (
        F.floor(
            dotl(F.col("q_vec"), F.col("vec")).cast("double")
            / (F.col("q_nrm") * F.col("nrm"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        probes.join(nv, probes["pb"] == nv["b"])
        .where(F.col("q_id") != F.col("id"))
        .join(F.broadcast(qv), on="q_id")
        .select(
            "q_id",
            F.col("id").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 5)
    )


IVF_K = 8
IVF_ITERS = 3
IVF_PROBE = 3
IVF_QSCALE = 1_000_000


def _knn_ivf_oracle_sql() -> str:
    return (
        int_lloyd_cte_sql(IVF_K, IVF_ITERS, IVF_QSCALE)
        + f""",
    cn2_f AS (
      SELECT cell, sum(cv * cv) AS n2 FROM cent{IVF_ITERS} GROUP BY cell
    ),
    qscore AS (   -- per (query, cell) exact integer L2 score
      SELECT e.vec_id AS q_id, c.cell,
             -2 * sum(e.x * c.cv) + any_value(n.n2) AS s
      FROM edim e
      JOIN cent{IVF_ITERS} c ON e.d = c.d
      JOIN cn2_f n ON n.cell = c.cell
      WHERE e.vec_id < {N_QUERIES}
      GROUP BY e.vec_id, c.cell
    ),
    probes AS (
      SELECT q_id, cell FROM (
        SELECT q_id, cell,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY s, cell) AS pr
        FROM qscore
      ) WHERE pr <= {IVF_PROBE}
    ),
    nv AS MATERIALIZED (
      SELECT a.vec_id, a.cell, v.qv,
             sqrt(CAST(list_inner_product(v.qv, v.qv) AS DOUBLE)) AS nrm
      FROM assign{IVF_ITERS} a JOIN vecs v USING (vec_id)
    ),
    scored AS (
      SELECT p.q_id, c.vec_id AS neighbor_id,
             floor(CAST(list_inner_product(q.qv, c.qv) AS DOUBLE)
                   / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6 AS cosine_sim
      FROM probes p
      JOIN nv c ON c.cell = p.cell
      JOIN nv q ON q.vec_id = p.q_id
      WHERE c.vec_id <> p.q_id
    ),
    ranked AS (
      SELECT q_id, neighbor_id, cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY q_id
               ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT q_id, neighbor_id, cosine_sim, rnk FROM ranked WHERE rnk <= 5
    """
    )


@register("knn_ivf", sql=_knn_ivf_oracle_sql())
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2: IVF-flat at the PRODUCTION shape — coarse-
    quantizer cells, map-side corpus assignment, n_probe = 3 of 8
    cells probed per query (recall < 1 by contract).

    Oracle-hashed since round 9 via the INTEGER-QUANTIZED pipeline
    (SQ + IVF — a real production ANN configuration): vectors snap
    once to the 1e-6 grid, the coarse quantizer is the exact integer
    Lloyd fit shared with kmeans_corpus_cells/semdedup_corpus, probe
    ordering is the exact integer L2 score (ties to the lowest cell
    id), and candidate ranking uses cosine from exact integer dots
    over IEEE-correctly-rounded sqrt norms, snapped with the shared
    floor(x*1e6+0.5) spelling BEFORE ranking — every tie-break is
    bit-deterministic, so the approximate result value-hashes even
    though recall < 1.  The float general operator (similarity/
    ivf.ivf_topk) keeps its recall property tests; knn_ivf_fullprobe
    keeps hashing the n_probe == n_centroids exact boundary."""
    from pyspark.sql import Window

    from zoom_spark.similarity.kmeans import (
        int_assign,
        int_lloyd_fit,
        int_quantize,
        lloyd_cache_key,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = int_quantize(
        emb, "embedding", "vec_id", IVF_QSCALE
    ).localCheckpoint(eager=False)
    cents = int_lloyd_fit(
        base, k=IVF_K, iters=IVF_ITERS,
        cache_key=lloyd_cache_key(sf_dir, "embeddings", "embedding", IVF_QSCALE),
    )
    dotl = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nv = int_assign(base, cents).select(
        "id",
        "cell",
        "vec",
        F.sqrt(dotl(F.col("vec"), F.col("vec")).cast("double")).alias("nrm"),
    )
    # per-query probe list: exact integer L2 score against every
    # centroid (the same one-row broadcast-matrix fold as int_assign,
    # keeping Catalyst's plan O(1) in k), rank, keep n_probe
    spark_ = emb.sparkSession
    cstats = F.broadcast(
        spark_.createDataFrame(
            [(
                [c for _, c in cents],
                [sum(x * x for x in c) for _, c in cents],
                [cid for cid, _ in cents],
            )],
            "cmat array<array<long>>, cn2 array<long>, cid array<int>",
        )
    )
    q = base.where(F.col("id") < N_QUERIES).crossJoin(cstats).select(
        F.col("id").alias("q_id"),
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.col("cmat"),
                    F.col("cn2"),
                    lambda c, n2: -2 * dotl(F.col("vec"), c) + n2,
                ),
                F.col("cid"),
                lambda s, cid: F.struct(s.alias("s"), cid.alias("cell")),
            )
        ).alias("sc"),
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("sc.s"), F.col("sc.cell")
    )
    probes = (
        q.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= IVF_PROBE)
        .select("q_id", F.col("sc.cell").alias("cell"))
    )
    qv = nv.select(
        F.col("id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    sim = (
        F.floor(
            dotl(F.col("q_vec"), F.col("vec")).cast("double")
            / (F.col("q_nrm") * F.col("nrm"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        probes.join(nv, on="cell")
        .where(F.col("q_id") != F.col("id"))
        .join(F.broadcast(qv), on="q_id")
        .select(
            "q_id",
            F.col("id").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 5)
    )


@register(
    "knn_ivf_fullprobe",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS n_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS nv
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, n_id,
             round(list_cosine_similarity(qv, nv), 6) AS cosine_sim
      FROM q CROSS JOIN c WHERE q_id <> n_id
    ),
    ranked AS (
      SELECT q_id, n_id AS neighbor_id, cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY cosine_sim DESC, n_id) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT q_id, neighbor_id, cosine_sim, rnk FROM ranked WHERE rnk <= 5
    """,
)
def knn_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat at n_probe == n_centroids: every cell probed, so the
    result is EXACTLY brute force (the recall=1 boundary case) and the
    gate can hash the IVF machinery — cell assignment, probe join,
    per-query top-k — against the exact-kNN SQL oracle. knn_ivf keeps
    the production n_probe<n_centroids contract (rows-only, recall
    property-tested)."""
    from zoom_spark.similarity.ivf import ivf_topk

    emb = _emb_double(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivf_topk(
        emb, queries, vec_col="embedding", id_col="vec_id",
        k=5, n_centroids=8, n_probe=8,
    )


KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_QSCALE = 1_000_000  # 1e-6 input quantization grid


def _kmeans_oracle_sql() -> str:
    return (
        int_lloyd_cte_sql(KMEANS_K, KMEANS_ITERS, KMEANS_QSCALE)
        + f"""
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors
    FROM assign{KMEANS_ITERS} GROUP BY cell
    """
    )


@register("kmeans_corpus_cells", sql=_kmeans_oracle_sql())
def kmeans_corpus_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 distributed Lloyd's k-means (k=8, 3 iterations) over the
    embedding corpus; returns per-cluster sizes. M-step is the
    two-phase partial-sum reduction (see similarity/kmeans.py) —
    only K·partitions tiny rows ever shuffle.

    Oracle-hashed since round 9 via the INTEGER-QUANTIZED Lloyd
    replay: inputs snap once to the 1e-6 grid (scalar quantization —
    the SQ theme the X3 family already ships), seeds are the k
    smallest md5(vec_id) vectors, and every E/M step is exact
    integer arithmetic (dot products <= 6.4e13 < 2^53; centroid
    update = floor(sum/n + 0.5) with exactly-representable
    operands), so engine and oracle agree bitwise with NO float
    snap schedule at all.  The DuckDB side unrolls the 3 rounds as
    materialized CTEs; argmin ties break to the lowest cell id on
    both sides.  Property referees (inertia monotone, planted-
    cluster recovery) stay in tests/."""
    from zoom_spark.similarity.kmeans import (
        int_assign,
        int_lloyd_fit,
        int_quantize,
        lloyd_cache_key,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = int_quantize(
        emb, "embedding", "vec_id", KMEANS_QSCALE
    ).localCheckpoint(eager=False)
    cents = int_lloyd_fit(
        base, k=KMEANS_K, iters=KMEANS_ITERS,
        cache_key=lloyd_cache_key(sf_dir, "embeddings", "embedding", KMEANS_QSCALE),
    )
    return (
        int_assign(base, cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )


PQ_M = 8          # subspaces (64 dims -> 8 x 8)
PQ_SUBDIM = 8
PQ_CODES = 16     # codes per subspace codebook
PQ_ITERS = 3
PQ_NQ = 5
PQ_QSCALE = 1_000_000


def _pq_lloyd_body_sql(src: str) -> str:
    """Unrolled integer product-quantization training CTE BODY
    (assumes an open WITH and a CTE named ``src`` providing
    (vec_id, sub, dd, x)): ONE Lloyd unroll vectorized across all
    PQ_M subspaces by carrying the `sub` key through every frame
    (seeds are the PQ_CODES smallest md5(vec_id) vectors, shared
    across subspaces).  Emits pcent{PQ_ITERS} (codebooks) and codes
    (vec_id, sub, cell)."""
    parts = [
        f""",
    pseed AS (
      SELECT vec_id,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS INTEGER) AS cell
      FROM embeddings
    ),
    pcent0 AS MATERIALIZED (
      SELECT e.sub, s.cell, e.dd, e.x AS cv
      FROM pseed s JOIN {src} e USING (vec_id)
      WHERE s.cell < {PQ_CODES}
    )"""
    ]
    for r in range(PQ_ITERS + 1):
        parts.append(f""",
    pn2_{r} AS (
      SELECT sub, cell, sum(cv * cv) AS n2
      FROM pcent{r} GROUP BY sub, cell
    ),
    pscore{r} AS MATERIALIZED (
      SELECT e.vec_id, e.sub, c.cell,
             -2 * sum(e.x * c.cv) + any_value(n.n2) AS s
      FROM {src} e
      JOIN pcent{r} c ON e.sub = c.sub AND e.dd = c.dd
      JOIN pn2_{r} n ON n.sub = c.sub AND n.cell = c.cell
      GROUP BY e.vec_id, e.sub, c.cell
    ),
    passign{r} AS MATERIALIZED (
      SELECT vec_id, sub, cell FROM (
        SELECT vec_id, sub, cell,
               row_number() OVER (
                 PARTITION BY vec_id, sub ORDER BY s, cell) AS rn
        FROM pscore{r}
      ) WHERE rn = 1
    )""")
        if r < PQ_ITERS:
            parts.append(f""",
    pcent{r + 1} AS MATERIALIZED (
      SELECT a.sub, a.cell, e.dd,
             CAST(floor(CAST(sum(e.x) AS DOUBLE) / count(*) + 0.5)
                  AS BIGINT) AS cv
      FROM passign{r} a
      JOIN {src} e ON e.vec_id = a.vec_id AND e.sub = a.sub
      GROUP BY a.sub, a.cell, e.dd
    )""")
    parts.append(f""",
    codes AS MATERIALIZED (
      SELECT vec_id, sub, cell FROM passign{PQ_ITERS}
    )""")
    return "".join(parts)


def _knn_pq_oracle_sql() -> str:
    return (
        f"""
    WITH sdim AS MATERIALIZED (
      SELECT vec_id, CAST((d - 1) // {PQ_SUBDIM} AS INTEGER) AS sub,
             CAST((d - 1) % {PQ_SUBDIM} AS INTEGER) AS dd,
             CAST(floor(CAST(x AS DOUBLE) * {PQ_QSCALE} + 0.5)
                  AS BIGINT) AS x
      FROM (
        SELECT vec_id, generate_subscripts(embedding, 1) AS d,
               unnest(embedding) AS x
        FROM embeddings
      )
    )"""
        + _pq_lloyd_body_sql("sdim")
        + f""",
    lut AS MATERIALIZED (   -- per (query, sub, cell) exact sq dist
      SELECT e.vec_id AS q_id, c.sub, c.cell,
             sum((e.x - c.cv) * (e.x - c.cv)) AS d2
      FROM sdim e
      JOIN pcent{PQ_ITERS} c ON e.sub = c.sub AND e.dd = c.dd
      WHERE e.vec_id < {PQ_NQ}
      GROUP BY e.vec_id, c.sub, c.cell
    ),
    adc AS (
      SELECT l.q_id AS query_id, k.vec_id AS id,
             floor(CAST(sum(l.d2) AS DOUBLE)
                   / {PQ_QSCALE}.0 / {PQ_QSCALE}.0 * 1e6 + 0.5) / 1e6
               AS adc_dist
      FROM codes k
      JOIN lut l ON l.sub = k.sub AND l.cell = k.cell
      GROUP BY l.q_id, k.vec_id
    ),
    rankedq AS (
      SELECT query_id, id, adc_dist,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, id) AS rank
      FROM adc
    )
    SELECT query_id, id, adc_dist, CAST(rank AS INTEGER) AS rank
    FROM rankedq WHERE rank <= 10
    """
    )


# Codebook memo for _int_pq_train: training is a pure function of the
# input frame, so callers may pass a cache_key identifying the data
# (sf_dir + which subvector frame).  Only the MODEL-SIZED codebook rows
# (PQ_M * PQ_CODES * PQ_SUBDIM ints) are memoized — never the N-row
# codes frame — and on a hit the final encode pass still runs.
_PQ_TRAIN_CACHE: dict[tuple, list[tuple[int, int, list[int]]]] = {}

# Row budget for the driver-local PQ training path (subvector rows =
# N x PQ_M): the collect is a few MB at the bound — the same
# model-artifact size class as the per-iteration codebook collects the
# distributed path already does. Past it, the iterative distributed
# trainer runs unchanged (fails closed at 100 TB).
PQ_LOCAL_MAX = 400_000


def _int_pq_train(ids: DataFrame, sdim: DataFrame, cache_key: tuple | None = None):
    """Train all PQ_M integer codebooks at once over a (vec_id, sub,
    dd, x) frame (seeds: the PQ_CODES smallest md5(vec_id) rows of
    ``ids``).  Returns (codes(vec_id, sub, cell), cent(sub, cell, dd,
    cv)) — codes lazily checkpointed, cent broadcast-sized.  Exact
    integer arithmetic throughout: mirrors _pq_lloyd_body_sql bitwise.

    Round-10 rewrite: the Lloyd loop is DRIVER-ORCHESTRATED like
    int_lloyd_fit — the codebook (PQ_M x PQ_CODES x PQ_SUBDIM ints, a
    model artifact) collects each round and rides back as a one-row
    broadcast matrix; assignment is a map-side fold per (vec_id, sub)
    subvector and the M-step one partially-aggregated explode.  The
    previous shape (iteration = equi-join + groupBy + per-(vec,sub)
    window over chained lazy checkpoints) spent ~8 s/query at sf0.1 in
    shuffle + window stages; this is <2 s with bitwise-identical
    output (long sums are order-exact, argmin ties to lowest cell)."""
    spark = sdim.sparkSession
    # pivot the long frame into per-(vec_id, sub) subvector arrays
    svec = (
        sdim.groupBy("vec_id", "sub")
        .agg(F.array_sort(F.collect_list(F.struct("dd", "x"))).alias("e"))
        .select(
            "vec_id", "sub",
            F.transform("e", lambda t: t["x"]).alias("v8"),
        )
        .localCheckpoint(eager=False)
    )

    def assign_frame(cb: dict[tuple[int, int], list[int]]) -> DataFrame:
        """Map-side encode against a driver-side codebook dict keyed
        (sub, cell): one-row broadcast of the 3-level matrix, exact
        long fold, argmin ties to the lowest cell id."""
        subs = sorted({s for s, _ in cb})
        cells_by_sub = {s: sorted(c for s2, c in cb if s2 == s) for s in subs}
        cmat3 = [[cb[(s, c)] for c in cells_by_sub[s]] for s in subs]
        cn2 = [[sum(x * x for x in cb[(s, c)]) for c in cells_by_sub[s]] for s in subs]
        cid3 = [cells_by_sub[s] for s in subs]
        cstats = F.broadcast(
            spark.createDataFrame(
                [(cmat3, cn2, cid3)],
                "cmat3 array<array<array<long>>>, "
                "cn2 array<array<long>>, cid3 array<array<int>>",
            )
        )
        dotl = lambda u, v: F.aggregate(  # noqa: E731
            F.zip_with(u, v, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sc_ = F.element_at(F.col("cmat3"), F.col("sub") + 1)
        sn2 = F.element_at(F.col("cn2"), F.col("sub") + 1)
        scid = F.element_at(F.col("cid3"), F.col("sub") + 1)
        score = F.zip_with(
            sc_, sn2, lambda c, n2: -2 * dotl(F.col("v8"), c) + n2
        )
        idx = F.array_position(score, F.array_min(score)).cast("int")
        return svec.crossJoin(cstats).select(
            "vec_id", "sub", F.element_at(scid, idx).alias("cell"), "v8"
        )

    def cent_frame(cb):
        rows = [
            (s, c, dd, int(cv))
            for (s, c), vec in sorted(cb.items())
            for dd, cv in enumerate(vec)
        ]
        return F.broadcast(
            spark.createDataFrame(rows, "sub int, cell int, dd int, cv long")
        )

    if cache_key is not None:
        hit = _PQ_TRAIN_CACHE.get(cache_key)
        if hit is not None:
            cb = {(s, c): vec for s, c, vec in hit}
            codes = assign_frame(cb).select("vec_id", "sub", "cell")
            return codes.localCheckpoint(eager=False), cent_frame(cb)

    # r14: a model-sized subvector frame (N x PQ_M rows; the gate
    # fails closed at scale) trains faster with ONE collect + numpy
    # than with PQ_ITERS sequential Spark jobs (each assign + M-step
    # job paid ~1 s of scheduler + interpreted-HOF latency at sf0.1).
    # Bitwise-identical arithmetic: int64 dots are exact, np.argmin
    # takes the FIRST minimum (= the lowest cell id over the sorted
    # cell list), seeds order by the same (md5(str(vec_id)), vec_id)
    # key, and the M-step divides the double-cast exact int sum by the
    # count in the same IEEE division before the shared floor(m+0.5).
    n_sv = svec.count()
    if n_sv <= PQ_LOCAL_MAX:
        import hashlib as _hashlib
        import math as _math

        import numpy as np

        sv_rows = svec.collect()
        vec_ids = sorted({int(r["vec_id"]) for r in sv_rows})
        seed_ids = sorted(
            vec_ids,
            key=lambda i: (_hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:PQ_CODES]
        cell_of = {vid: i for i, vid in enumerate(seed_ids)}
        cb = {}
        for r in sv_rows:
            vid = int(r["vec_id"])
            if vid in cell_of:
                cb[(int(r["sub"]), cell_of[vid])] = [
                    int(x) for x in r["v8"]
                ]
        subs = sorted({int(r["sub"]) for r in sv_rows})
        mats = {
            s: np.asarray(
                [r["v8"] for r in sv_rows if int(r["sub"]) == s],
                dtype=np.int64,
            )
            for s in subs
        }
        for _ in range(PQ_ITERS):
            new_cb: dict[tuple[int, int], list[int]] = {}
            for s in subs:
                cells = sorted(c for s2, c in cb if s2 == s)
                C = np.asarray([cb[(s, c)] for c in cells], dtype=np.int64)
                X = mats[s]
                scores = -2 * (X @ C.T) + (C * C).sum(axis=1)
                idx = np.argmin(scores, axis=1)
                for j, c in enumerate(cells):
                    mask = idx == j
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    sums = X[mask].sum(axis=0)
                    new_cb[(s, c)] = [
                        int(_math.floor(float(int(x)) / n + 0.5))
                        for x in sums
                    ]
            cb = new_cb
    else:
        # seeds: the PQ_CODES smallest (md5(vec_id), vec_id) ids,
        # cell = 0-based md5 rank — identical to the oracle's pseed CTE
        seed_ids = [
            r["vec_id"]
            for r in ids.orderBy(
                F.md5(F.col("vec_id").cast("string")), "vec_id"
            )
            .limit(PQ_CODES)
            .collect()
        ]
        cell_of = {vid: i for i, vid in enumerate(seed_ids)}
        cb = {}
        for r in svec.where(F.col("vec_id").isin(seed_ids)).collect():
            cb[(int(r["sub"]), cell_of[r["vec_id"]])] = [
                int(x) for x in r["v8"]
            ]

        for _ in range(PQ_ITERS):
            a = assign_frame(cb)
            rows = (
                a.select("sub", "cell", F.posexplode("v8").alias("dd", "x"))
                .groupBy("sub", "cell", "dd")
                .agg(
                    F.floor(
                        F.sum("x").cast("double") / F.count("*") + F.lit(0.5)
                    )
                    .cast("long")
                    .alias("cv")
                )
                .collect()
            )
            cb = {}
            for r in rows:
                cb.setdefault(
                    (int(r["sub"]), int(r["cell"])), [0] * PQ_SUBDIM
                )[int(r["dd"])] = int(r["cv"])
    if cache_key is not None:
        _PQ_TRAIN_CACHE[cache_key] = [
            (s, c, vec) for (s, c), vec in sorted(cb.items())
        ]
    codes = (
        assign_frame(cb)
        .select("vec_id", "sub", "cell")
        .localCheckpoint(eager=False)
    )
    return codes, cent_frame(cb)


@register("knn_pq_adc", sql=_knn_pq_oracle_sql())
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: codebook training per subspace
    (m=8 x 8 dims, 16 codes, 3 Lloyd rounds), encoding to m int
    codes (8x compression of the 64-d corpus), then ADC top-10 for
    5 query vectors — the memory-bound regime IVF-flat can't reach.

    Oracle-hashed since round 9 via the INTEGER-QUANTIZED pipeline:
    subvectors snap once to the 1e-6 grid, all PQ_M codebooks train
    in ONE vectorized Lloyd (a `sub` key rides every frame), and the
    ADC distance is an exact integer sum of per-subspace squared
    distances — encoding argmins, LUT entries and the final ranking
    are bit-deterministic in both engines; the only float op is the
    final exact-operand unit rescale (/ QSCALE^2).  The float
    general operator (similarity/pq.py: literal-LUT JVM fold, no
    shuffle) keeps its property tests and serves knn_ivfpq."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    sdim = (
        emb.select(
            "vec_id",
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.floor(
                        x.cast("double") * PQ_QSCALE + F.lit(0.5)
                    ).cast("long"),
                )
            ).alias("d", "x"),
        )
        .select(
            "vec_id",
            (F.col("d") / PQ_SUBDIM).cast("int").alias("sub"),
            (F.col("d") % PQ_SUBDIM).cast("int").alias("dd"),
            "x",
        )
        .localCheckpoint(eager=False)
    )
    import os as _os

    codes, cent = _int_pq_train(
        emb.select("vec_id"), sdim,
        cache_key=(_os.path.realpath(sf_dir), "pq-sdim", PQ_QSCALE),
    )
    lut = (
        sdim.where(F.col("vec_id") < PQ_NQ)
        .withColumnRenamed("vec_id", "q_id")
        .join(cent, on=["sub", "dd"])
        .groupBy("q_id", "sub", "cell")
        .agg(
            F.sum(
                (F.col("x") - F.col("cv")) * (F.col("x") - F.col("cv"))
            ).alias("d2")
        )
    )
    adc = (
        codes.join(F.broadcast(lut), on=["sub", "cell"])
        .groupBy(F.col("q_id").alias("query_id"), F.col("vec_id").alias("id"))
        .agg(
            (
                F.floor(
                    F.sum("d2").cast("double")
                    / float(PQ_QSCALE)
                    / float(PQ_QSCALE)
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "id", "adc_dist", "rank")
    )


IVFPQ_CELLS = 8
IVFPQ_PROBE = 3
IVFPQ_NQ = 5


def _knn_ivfpq_oracle_sql() -> str:
    return (
        int_lloyd_cte_sql(IVFPQ_CELLS, IVF_ITERS, PQ_QSCALE)
        + f""",
    rdim AS MATERIALIZED (   -- residuals vs the coarse centroid
      SELECT e.vec_id,
             CAST((e.d - 1) // {PQ_SUBDIM} AS INTEGER) AS sub,
             CAST((e.d - 1) % {PQ_SUBDIM} AS INTEGER) AS dd,
             e.x - c.cv AS x
      FROM edim e
      JOIN assign{IVF_ITERS} a USING (vec_id)
      JOIN cent{IVF_ITERS} c ON c.cell = a.cell AND c.d = e.d
    )"""
        + _pq_lloyd_body_sql("rdim")
        + f""",
    cn2_f AS (
      SELECT cell, sum(cv * cv) AS n2
      FROM cent{IVF_ITERS} GROUP BY cell
    ),
    qscore AS (
      SELECT e.vec_id AS q_id, c.cell,
             -2 * sum(e.x * c.cv) + any_value(n.n2) AS s
      FROM edim e
      JOIN cent{IVF_ITERS} c ON e.d = c.d
      JOIN cn2_f n ON n.cell = c.cell
      WHERE e.vec_id < {IVFPQ_NQ}
      GROUP BY e.vec_id, c.cell
    ),
    probes AS (
      SELECT q_id, cell FROM (
        SELECT q_id, cell,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY s, cell) AS pr
        FROM qscore
      ) WHERE pr <= {IVFPQ_PROBE}
    ),
    qr AS MATERIALIZED (   -- query residual vs EACH probed cell
      SELECT p.q_id, p.cell,
             CAST((e.d - 1) // {PQ_SUBDIM} AS INTEGER) AS sub,
             CAST((e.d - 1) % {PQ_SUBDIM} AS INTEGER) AS dd,
             e.x - c.cv AS x
      FROM probes p
      JOIN edim e ON e.vec_id = p.q_id
      JOIN cent{IVF_ITERS} c ON c.cell = p.cell AND c.d = e.d
    ),
    lut AS MATERIALIZED (
      SELECT q.q_id, q.cell, pc.sub, pc.cell AS code,
             sum((q.x - pc.cv) * (q.x - pc.cv)) AS d2
      FROM qr q
      JOIN pcent{PQ_ITERS} pc ON pc.sub = q.sub AND pc.dd = q.dd
      GROUP BY q.q_id, q.cell, pc.sub, pc.cell
    ),
    adc AS (
      SELECT p.q_id AS query_id, a.vec_id AS id,
             floor(CAST(sum(l.d2) AS DOUBLE)
                   / {PQ_QSCALE}.0 / {PQ_QSCALE}.0 * 1e6 + 0.5) / 1e6
               AS adc_dist
      FROM probes p
      JOIN assign{IVF_ITERS} a ON a.cell = p.cell
      JOIN codes k ON k.vec_id = a.vec_id
      JOIN lut l ON l.q_id = p.q_id AND l.cell = p.cell
                AND l.sub = k.sub AND l.code = k.cell
      GROUP BY p.q_id, a.vec_id
    ),
    rankedq AS (
      SELECT query_id, id, adc_dist,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, id) AS rank
      FROM adc
    )
    SELECT query_id, id, adc_dist, CAST(rank AS INTEGER) AS rank
    FROM rankedq WHERE rank <= 10
    """
    )


@register("knn_ivfpq", sql=_knn_ivfpq_oracle_sql())
def knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ (the Jegou et al. IVFADC layout): coarse L2
    cells + PQ codebooks trained on the RESIDUALS x - centroid[cell]
    (residual energy is what PQ should spend its codes on), probe
    join on cell with a per-(query, cell) lookup table.  The
    memory-bound 100 TB ANN layout: 8x-compressed codes, m-lookup
    distances, and only n_probe/n_cells of the corpus scanned per
    query.

    Oracle-hashed since round 9: with the 1e-6 integer grid the
    residuals are STILL exact integers (difference of ints), so the
    coarse quantizer (shared int-Lloyd), the residual codebooks
    (shared vectorized int-PQ trainer), the per-(query, probed-cell)
    LUT, and the ADC sums are all bit-deterministic — the complete
    IVFADC pipeline value-hashes at production shape (n_probe=3).
    The float general operator (similarity/pq.py ivfpq_build/topk:
    broadcast LUT-as-data, JVM fold) keeps its property tests."""
    from pyspark.sql import Window

    from zoom_spark.similarity.kmeans import (
        int_assign,
        int_lloyd_fit,
        int_quantize,
        lloyd_cache_key,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = int_quantize(
        emb, "embedding", "vec_id", PQ_QSCALE
    ).localCheckpoint(eager=False)
    cents = int_lloyd_fit(
        base, k=IVFPQ_CELLS, iters=IVF_ITERS,
        cache_key=lloyd_cache_key(sf_dir, "embeddings", "embedding", PQ_QSCALE),
    )
    assigned = int_assign(base, cents).localCheckpoint(eager=False)
    spark_ = emb.sparkSession
    cdim = F.broadcast(
        spark_.createDataFrame(
            [
                (cid, d, int(cv))
                for cid, c in cents
                for d, cv in enumerate(c)
            ],
            "cell int, d int, cv long",
        )
    )
    rdim = (
        assigned.select(
            F.col("id").alias("vec_id"),
            "cell",
            F.posexplode("vec").alias("d", "x"),
        )
        .join(cdim, on=["cell", "d"])
        .select(
            "vec_id",
            (F.col("d") / PQ_SUBDIM).cast("int").alias("sub"),
            (F.col("d") % PQ_SUBDIM).cast("int").alias("dd"),
            (F.col("x") - F.col("cv")).alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    import os as _os

    codes, pcent = _int_pq_train(
        emb.select("vec_id"), rdim,
        cache_key=(_os.path.realpath(sf_dir), "ivfpq-rdim", PQ_QSCALE),
    )
    # per-query probe list: exact integer L2 vs the coarse centroids
    cstats = F.broadcast(
        spark_.createDataFrame(
            [(
                [c for _, c in cents],
                [sum(x * x for x in c) for _, c in cents],
                [cid for cid, _ in cents],
            )],
            "cmat array<array<long>>, cn2 array<long>, cid array<int>",
        )
    )
    dotl = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    q = base.where(F.col("id") < IVFPQ_NQ).crossJoin(cstats).select(
        F.col("id").alias("q_id"),
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.col("cmat"),
                    F.col("cn2"),
                    lambda c, n2: -2 * dotl(F.col("vec"), c) + n2,
                ),
                F.col("cid"),
                lambda sc, cid: F.struct(sc.alias("s"), cid.alias("cell")),
            )
        ).alias("sc"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sc.s"), F.col("sc.cell"))
    probes = (
        q.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= IVFPQ_PROBE)
        .select("q_id", F.col("sc.cell").alias("cell"))
        .localCheckpoint(eager=False)
    )
    qr = (
        probes.join(
            base.where(F.col("id") < IVFPQ_NQ).select(
                F.col("id").alias("q_id"), F.posexplode("vec").alias("d", "x")
            ),
            on="q_id",
        )
        .join(cdim, on=["cell", "d"])
        .select(
            "q_id",
            "cell",
            (F.col("d") / PQ_SUBDIM).cast("int").alias("sub"),
            (F.col("d") % PQ_SUBDIM).cast("int").alias("dd"),
            (F.col("x") - F.col("cv")).alias("x"),
        )
    )
    lut = (
        qr.join(
            pcent.select(
                "sub", F.col("cell").alias("code"), "dd", "cv"
            ),
            on=["sub", "dd"],
        )
        .groupBy("q_id", "cell", "sub", "code")
        .agg(
            F.sum(
                (F.col("x") - F.col("cv")) * (F.col("x") - F.col("cv"))
            ).alias("d2")
        )
    )
    adc = (
        probes.join(
            assigned.select(F.col("id").alias("vec_id"), "cell"), on="cell"
        )
        .join(codes.withColumnRenamed("cell", "code"), on="vec_id")
        .join(F.broadcast(lut), on=["q_id", "cell", "sub", "code"])
        .groupBy(
            F.col("q_id").alias("query_id"), F.col("vec_id").alias("id")
        )
        .agg(
            (
                F.floor(
                    F.sum("d2").cast("double")
                    / float(PQ_QSCALE)
                    / float(PQ_QSCALE)
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# R194: margin-based mutual-kNN pair mining (bitext-mining primitive)
# ---------------------------------------------------------------------------

MARGIN_PANEL = 50  # query-panel size (one "language side" of the mining)
MARGIN_K = 4  # neighborhood size for the margin denominator


@register(
    "margin_mutual_knn_pairs",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS q_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {MARGIN_PANEL}
    ),
    c AS (
      SELECT vec_id AS c_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, c_id,
             round(list_cosine_similarity(qv, cv), 6) AS sim
      FROM q CROSS JOIN c WHERE q_id <> c_id
    ),
    qr AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY sim DESC, c_id) AS r
      FROM scored
    ),
    cr AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY c_id
                                ORDER BY sim DESC, q_id) AS r
      FROM scored
    ),
    qavg AS (SELECT q_id, avg(sim) AS qa FROM qr
             WHERE r <= {MARGIN_K} GROUP BY q_id),
    cavg AS (SELECT c_id, avg(sim) AS ca FROM cr
             WHERE r <= {MARGIN_K} GROUP BY c_id),
    qtop AS (SELECT q_id, c_id, sim FROM qr WHERE r = 1),
    ctop AS (SELECT q_id, c_id FROM cr WHERE r = 1)
    SELECT t.q_id, t.c_id, t.sim AS cosine_sim,
           round(t.sim / ((qa.qa + ca.ca) / 2), 6) AS margin
    FROM qtop t
    JOIN ctop m ON m.c_id = t.c_id AND m.q_id = t.q_id
    JOIN qavg qa ON qa.q_id = t.q_id
    JOIN cavg ca ON ca.c_id = t.c_id
    """,
)
def margin_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R194 margin-based mutual-kNN pair mining — the bitext/parallel-
    pair mining primitive (Artetxe & Schwenk ratio margin): a pair
    (q, c) survives iff each is the other's top-1 neighbor (mutuality
    kills hub vectors) and is scored by cos(q,c) normalized by the
    mean of both sides' top-{MARGIN_K} neighborhoods — the margin that
    separates true translations from dense-region look-alikes. ONE
    broadcast(panel) x corpus scan produces BOTH directions' scores
    (O(N·panel), linear in corpus size); the q-side ranks over
    corpus-sized groups are the documented exact-baseline contract
    (panel is fixed at {MARGIN_PANEL}), the c-side ranks are
    {MARGIN_PANEL}-sized groups, and the margin denominators are
    panel-bounded aggregates of 6dp-grid cosines (exact on both
    engines). Scale route for the candidate step: the existing
    LSH/IVF/PQ family (knn_lsh_bucketed et al.)."""
    from pyspark.sql import Window

    from zoom_spark.functions.vectors import cosine_with_norms, norm

    emb = _emb_double(spark, sf_dir)
    q = emb.where(F.col("vec_id") < MARGIN_PANEL).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("cv"),
        norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(
                cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("sim"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    wc = Window.partitionBy("c_id").orderBy(F.col("sim").desc(), F.col("q_id"))
    qr = scored.withColumn("r", F.row_number().over(wq))
    cr = scored.withColumn("r", F.row_number().over(wc))
    qavg = (
        qr.where(F.col("r") <= MARGIN_K)
        .groupBy("q_id")
        .agg(F.avg("sim").alias("qa"))
    )
    cavg = (
        cr.where(F.col("r") <= MARGIN_K)
        .groupBy("c_id")
        .agg(F.avg("sim").alias("ca"))
    )
    qtop = qr.where(F.col("r") == 1).select("q_id", "c_id", "sim")
    ctop = cr.where(F.col("r") == 1).select(
        F.col("q_id").alias("m_q"), F.col("c_id").alias("m_c")
    )
    return (
        qtop.join(
            ctop,
            (F.col("m_c") == F.col("c_id")) & (F.col("m_q") == F.col("q_id")),
        )
        .join(F.broadcast(qavg), on="q_id")
        .join(F.broadcast(cavg), on="c_id")
        .select(
            "q_id",
            "c_id",
            F.col("sim").alias("cosine_sim"),
            F.round(
                F.col("sim") / ((F.col("qa") + F.col("ca")) / 2), 6
            ).alias("margin"),
        )
    )


@register("frequent_directions_spectrum")  # mergeable matrix sketch: rows-only
def frequent_directions_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequent Directions sketch (similarity/fd.py) of the N×64
    embedding matrix at ℓ=16: per-partition constant-memory FD via
    applyInPandas, one tiny merge pass (the FD merge theorem keeps
    the ‖AᵀA−BᵀB‖₂ ≤ ‖A‖²_F/ℓ guarantee through concatenation).
    Output: the sketch's singular-value spectrum (sign-free, so
    replay-deterministic) plus cumulative energy share — the
    streaming answer to "how low-rank are my embeddings" that never
    materializes the Gram matrix. Referee test checks the spectral
    error bound and per-direction lower bounds against exact numpy."""
    import numpy as np

    from zoom_spark.similarity.fd import fd_sketch

    emb = load_table(spark, sf_dir, "embeddings")
    sketch = fd_sketch(emb, "embedding", "vec_id", ell=16, n_groups=8)
    s = np.linalg.svd(sketch, compute_uv=False)
    tot = float((s**2).sum()) or 1.0
    cum = np.cumsum(s**2) / tot
    rows = [
        (int(i + 1), float(round(sv, 4)), float(round(c, 6)))
        for i, (sv, c) in enumerate(zip(s, cum))
    ]
    return spark.createDataFrame(
        rows, "rank_idx int, singular_value double, cum_energy double"
    )


def _jl_oracle_sql() -> str:
    """The Achlioptas matrix is deterministic, so the JL projection is
    fully oracle-able: nonzero entries ride in as a VALUES table and
    DuckDB recomputes the same fixed-point CSV. `+ 0.0` after round
    normalizes IEEE -0.0 on both engines (driver-gate-constraints
    memory)."""
    from zoom_spark.similarity.fd import achlioptas_matrix

    vals = ", ".join(
        f"({j}, {i + 1}, {w!r})"
        for j, row in enumerate(achlioptas_matrix(64, 16))
        for i, w in enumerate(row)
        if w != 0.0
    )
    return f"""
    WITH w(j, i, wt) AS (VALUES {vals}),
    s AS (
      SELECT e.vec_id, w.j,
             CAST(sum(CAST(round(CAST(e.embedding[w.i] AS DOUBLE)
                                 * CAST(w.wt AS DOUBLE) * 10000000)
                           AS BIGINT)) AS BIGINT) AS t
      FROM embeddings e JOIN w ON TRUE
      GROUP BY e.vec_id, w.j
    ),
    r AS (
      SELECT vec_id, j,
             CASE WHEN t >= 0 THEN (t + 500) // 1000
                  ELSE -((-t + 500) // 1000) END AS p4
      FROM s
    )
    SELECT vec_id,
           string_agg(printf('%.4f', (p4 + 0) / 10000.0), ',' ORDER BY j)
             AS proj_csv
    FROM r GROUP BY vec_id
    """


@register("jl_random_projection", sql=_jl_oracle_sql())
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R230 Johnson-Lindenstrauss sparse random projection
    (similarity/fd.py random_project): 64-d embeddings -> 16-d with
    the deterministic Achlioptas {+,0,-} matrix (md5-derived, 2/3
    sparse), shipped as a 1-row broadcast matrix column and applied
    as a JVM-side higher-order fold — map-only, no shuffle, no UDF.
    The dimensionality-reduction front-end for the LSH/IVF/PQ probes;
    the referee pins exact numpy parity AND the JL distance-
    preservation statistics on sampled pairs."""
    from zoom_spark.similarity.fd import random_project

    emb = load_table(spark, sf_dir, "embeddings")
    return random_project(emb, "embedding", d_out=16).select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                "proj",
                lambda x: F.format_string("%.4f", x),
            ),
        ).alias("proj_csv"),
    )
