"""Approximate / exact nearest-neighbor search over an embedding
column (X3; PAPERS.md similarity-search background).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, rank per query with a window. One shuffle on
query_id; the scoring pass is JVM-side zip_with/aggregate.

Scale path: random-hyperplane LSH bucketing (IVF-style): corpus and
queries hash to sign-bit buckets; search only within the query's
bucket (optionally multi-probe neighboring buckets). Turns the
O(N·Q) scan into O(Q·bucket_size) at some recall cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zoom_spark.functions.vectors import cosine_with_norms, dot, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).
    Deterministic: rank by (rounded sim desc, neighbor id asc)."""
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = F.broadcast(q).crossJoin(c).where(F.col("q_id") != F.col("n_id"))
    sim = F.round(
        cosine_with_norms(
            F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")
        ),
        6,
    )
    return (
        scored.select("q_id", F.col("n_id").alias("neighbor_id"), sim.alias("cosine_sim"))
        .withColumn("rnk", F.row_number().over(Window.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cosine_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


def _rp_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from random-hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — avoids needing
    numpy on executors; driver-side tiny)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _probe_buckets(bucket, n_planes: int, radius: int):
    """The query's own bucket plus every bucket within Hamming
    distance `radius` of it (multi-probe LSH, Lv et al. VLDB'07:
    near-miss buckets differ in the sign bits whose projections were
    closest to zero; probing all r-flips is the rank-free variant).
    Driver-side combinatorics only — the column expression is a
    literal XOR fan-out, and the join stays an equi-join."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            masks.append(sum(1 << b for b in bits))
    return F.array(
        *[bucket.bitwiseXOR(F.lit(m).cast("long")) for m in masks]
    )


def _directed_probe_buckets(vec_col, bucket, planes: list[list[float]], t: int):
    """Query-directed multi-probe (Lv et al. VLDB'07 proper): rank the
    sign bits by |projection| — the planes the query sits closest to
    are the likeliest to disagree with a true neighbor — and probe the
    buckets obtained by flipping the t least-confident bits, one at a
    time.  t+1 probes buy most of radius-1's recall at a fraction of
    its bucket count.  Pure column expressions: zip (|proj|, idx),
    array_sort (lexicographic: by |proj| then idx — deterministic),
    slice, flip."""
    n = len(planes)
    projs = F.array(
        *[dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) for p in planes]
    )
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                projs,
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda p, i: F.struct(
                    F.abs(p).alias("conf"), i.alias("idx")
                ),
            )
        ),
        lambda s: s.getField("idx"),
    )
    flips = F.transform(
        F.slice(ranked, 1, t),
        # shiftleft needs a literal bit count; 2^i via pow is exact
        # for i < 53 and casts cleanly to long
        lambda i: bucket.bitwiseXOR(
            F.pow(F.lit(2.0), i.cast("double")).cast("long")
        ),
    )
    return F.concat(F.array(bucket), flips)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    seed: int = 42,
    multi_probe: int = 0,
    directed_probes: int = 0,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's hyperplane
    bucket, plus Hamming-adjacent buckets when ``multi_probe`` > 0
    (radius of sign-bit flips to probe — each flip trades one more
    bucket-sized scan per query for recall; the candidate set stays
    O(probes * corpus / 2^n_planes) vs the brute-force O(corpus)).
    Property tests check overlap vs brute force. Join is an equi-join
    on bucket — shuffle-partitioned, no cross product; each corpus row
    lives in exactly ONE bucket so probing never duplicates a
    (query, candidate) pair and needs no dedup."""
    planes = make_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_norm"),
        _rp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        _rp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    if directed_probes > 0:
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_norm"),
            F.explode(
                _directed_probe_buckets(
                    F.col(vec_col),
                    _rp_bucket(F.col(vec_col), planes),
                    planes,
                    directed_probes,
                )
            ).alias("bucket"),
        )
    elif multi_probe > 0:
        q = q.select(
            "q_id",
            "q_vec",
            "q_norm",
            F.explode(
                _probe_buckets(F.col("bucket"), n_planes, multi_probe)
            ).alias("bucket"),
        )
    scored = q.join(c, on="bucket").where(F.col("q_id") != F.col("n_id"))
    sim = F.round(
        cosine_with_norms(
            F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")
        ),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.select("q_id", F.col("n_id").alias("neighbor_id"), sim.alias("cosine_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cosine_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )
