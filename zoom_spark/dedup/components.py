"""Connected components over a near-duplicate match graph ->
canonical document ids (X2 final step: MinHash/SimHash/Jaccard
emit PAIRS; groups need the transitive closure).

Iterative min-label propagation: every node starts as its own
component; each round, a node adopts the smallest label among itself
and its neighbors; stop when no label changes. Converges in
O(graph diameter) rounds — near-dup graphs are unions of small
cliques, so the practical round count is 2-3. (The O(log n)
large-star/small-star variant from the MapReduce literature drops in
behind the same signature if adversarial chain-shaped graphs ever
matter.)

Scale notes: each round is one shuffle (join on dst + groupBy src);
labels are localCheckpoint()ed per round so the plan does not grow
with iterations (lineage-truncation, the standard Spark idiom for
iterative algorithms). Convergence check is a count of changed
labels — one extra action per round on the (small) label frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in `pairs`; component
    is the minimum node id reachable through the pair graph."""
    sym = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    # The label frame is (node, component) — tiny relative to the data
    # that produced the pairs. Sizing its partition count to the frame
    # (not the session shuffle default) keeps each iteration's jobs
    # from paying 32 near-empty tasks per round; at real scale this
    # would be ~nodes/target_rows_per_task instead of a constant.
    n_parts = max(2, min(8, sym.sparkSession.sparkContext.defaultParallelism))
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .coalesce(n_parts)
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
            .coalesce(n_parts)
            .localCheckpoint()
        )
        n_changed = updated.where("__changed").count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def canonical_ids(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every row of `df` tagged with its canonical id: the component
    minimum for nodes in the match graph, the row's own id otherwise
    (singletons are their own canonical)."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        df.join(comp, df[id_col] == comp.id, "left")
        .select(
            df["*"],
            F.coalesce("component", df[id_col]).alias("canonical_id"),
        )
    )
