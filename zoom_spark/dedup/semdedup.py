"""SemDeDup — semantic deduplication over an embedding column
(X2/X5 extension: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540 — public
paper, re-expressed as DataFrame ops).

The reference pipeline has no embedding-space dedup; this is part of
the §2.11 LLM-training-data extension family alongside
dedup/embedding.py (threshold near-dup) and similarity/kmeans.py.

Algorithm (the paper's shape):
  1. k-means cluster the embeddings (coarse partition of the space);
  2. WITHIN each cluster, compute pairwise cosine similarity;
  3. drop a vector iff some SMALLER-ID vector in the same cluster is
     >= threshold similar (a one-hop witness rule).

Note the rule is one-hop, not connected-components: a
similarity-connected group may keep several exemplars (chain a~b~c
with a!~c keeps a, drops b and c — and c's witness b is itself
dropped, so a dropped row's nearest KEPT row can be farther than the
threshold). That is the paper's cheap deterministic variant; when
true one-exemplar-per-connected-group semantics are wanted, feed the
over-threshold pairs to dedup/components.connected_components within
each cluster instead.

Scale design: the quadratic step is confined to single clusters — the
whole point of clustering first. The pair join is an equi-join on
``cell`` (hash-partitioned, no cross product across cells), and each
side carries a precomputed norm so the per-pair fold is one zip_with.
At 100 TB you raise k so the expected cluster size keeps
|cluster|^2 work bounded — k scales with corpus size, the per-cluster
work does not. Keep/drop is that single pigeonhole shuffle — no
fixpoint loop.

Gate: float k-means centroids make cluster boundaries
partitioning-sensitive, so the gated query is rows-only; exactness is
covered by property tests (planted exact duplicates are always
dropped, orthogonal sets are never touched) in
tests/test_semdedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.functions.vectors import cosine_with_norms, norm
from zoom_spark.similarity.kmeans import kmeans_fit


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    threshold: float = 0.95,
    max_iter: int = 4,
    centroids=None,
) -> DataFrame:
    """(id, cell, keep) for every row of ``df``: ``keep`` is false iff
    some same-cluster vector with smaller id has cosine similarity
    >= threshold. Pass precomputed ``centroids`` to skip the fit
    (e.g. reuse an IVF coarse quantizer)."""
    if centroids is None:
        centroids, _ = kmeans_fit(
            df, vec_col, id_col, k, max_iter=max_iter, compute_inertia=False
        )
    # _assign already carries the vector through the cell projection —
    # taking it from there (instead of kmeans_assign + join back onto
    # df) saves a full equi-join/shuffle of the vectors
    from zoom_spark.similarity.kmeans import _assign

    assigned = _assign(df, vec_col, id_col, centroids).select("id", "vec", "cell")
    vecs = assigned.withColumn("nrm", norm(F.col("vec")))
    a = vecs.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
        "cell",
    )
    b = vecs.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
        "cell",
    )
    # one direction only (a < b): b is droppable because a witnesses it
    dropped = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            cosine_with_norms(
                F.col("vec_a"), F.col("vec_b"), F.col("nrm_a"), F.col("nrm_b")
            )
            >= threshold
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assigned.select("id", "cell")
        .join(dropped.withColumn("__drop", F.lit(True)), "id", "left")
        .select(
            "id",
            "cell",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )
