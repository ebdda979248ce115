"""sf1-scale smoke for the quadratic-tail suspects (VERDICT r1 #7):
`ngram_jaccard_dups`, `minhash_dedup_docs`, `canonical_doc_ids`.

Synthesizes a ~10x upscale of sf0.1's documents table (each doc
replicated 10x with a per-replica suffix token — near-duplicates with
distinct ids, the realistic dup-clique shape), times each suspect at
sf0.1 and at the upscale, and reports the wall-time ratio vs the 10x
row ratio.  A query whose ratio is far above the row ratio has a
super-linear tail (candidate blowup, all-pairs leak, O(n) rounds).

Writes BENCH_NOTES.md at the repo root.  Usage:
    python scripts/scale_smoke.py [replication=10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import QUERIES

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_smoke/sf1"
SUSPECTS = [
    "ngram_jaccard_dups",
    "minhash_dedup_docs",
    "canonical_doc_ids",
    # round 2: star CC on chain graphs, banded-LSH embedding dedup
    "canonical_ids_chained",
    "embedding_neardup_lsh",
    # round-2 continuation: graph ops over the co-purchase edge list
    # (upscaled as DISJOINT graph copies -> exactly linear expected)
    "co_purchase_triangles",
    "pagerank_parts",
    # round 4: semdedup's within-cell cosine step is the quadratic
    # suspect (clusters grow with the near-dup replication); the
    # substring-gram pass is the shuffle-volume suspect
    "semdedup_corpus",
    "duplicate_spans",
    # round 5: alignment-invariant grams (stride-1 side is the volume
    # suspect), per-doc-bounded PMI pair join, shingle-join
    # decontamination, and the lineitem-graph iterative peels
    "duplicate_spans_invariant",
    "pmi_cooccurrence",
    "decontaminate_ngram_overlap",
    "kcore_parts",
    "bfs_reachable_parts",
    # round 6 (VERDICT r6 #4): quadratic-adjacent additions — wedge
    # joins (AA, clustering, truss), sorted-neighborhood windows,
    # winnowing shingles, the lnfact prefix build, and the
    # O(N*panel) margin-kNN scan
    "adamic_adar_link_prediction",
    "local_clustering_parts",
    "k_truss_copurchase",
    "sorted_neighborhood_pairs",
    "robust_winnow_fingerprints",
    "fisher_exact_weekend_purchase",
    "margin_mutual_knn_pairs",
    # round 8 (VERDICT r7 #3): round-7 heavies — prefix-doubling
    # suffix array (rounds fixed by max doc length -> linear in
    # docs), grid DBSCAN over 10x embeddings, ER min-label closure
    # over the replicated part catalog, bounded random walks on the
    # disjoint graph copies, FS linkage blocking, GMM over 10x
    # orders rows (day-frame ops like matrix_profile stay flat by
    # construction: the calendar does not grow with rows)
    "suffix_array_corpus",
    "matrix_profile_revenue",
    "dbscan_embedding_cells",
    "er_clusters_from_linkage",
    "deterministic_random_walks",
    "gmm_em_order_values",
    "fellegi_sunter_part_linkage",
    # round 9 (VERDICT r8 #2): the two headline heavies that joined the
    # bench after the round-8 smoke rerun — seeded-BFS harmonic
    # centrality over the disjoint graph copies (frontier rounds are
    # diameter-bound per copy -> linear expected) and the rebuilt
    # distinct-name PassJoin fuzzy matcher (replica-suffixed last
    # tokens keep clusters same-sized: 10x more distinct names, 10x
    # output -> linear expected)
    "harmonic_centrality_parts",
    "fuzzy_part_matches",
    # round 9: the integer-exact conversions and new graph ops — all
    # expected linear-band on the replica-disjoint upscale (louvain /
    # PPR walk disjoint graph copies; the md5 dedup family re-blocks
    # per replica; sqrt(N)-cell IVF mining is the documented N^1.5)
    "louvain_moves_copurchase",
    "personalized_pagerank_parts",
    # (minhash_dedup_docs already a suspect above — don't re-list;
    # a duplicate here emitted two table rows per merge, r10 verdict #4)
    "simhash_dedup_docs",
    "hard_negative_pairs_ann",
    "hamming_knn_signbits",
    # round 10: the re-scoped fixed-size (64) md5 query batch — work is
    # 64 * N, so the 10x upscale should be ~linear (broadcast batch,
    # map-side corpus scan)
    "hard_negative_pairs",
    # round 10 second wave: the wedge-join link-prediction panel
    # (work = sum deg_Q * deg, like AA — linear on the replica-
    # disjoint upscale) and 4-round synchronous LPA over the
    # support-2 graph (one shuffle per round, linear in edges)
    "link_prediction_panel",
    "label_propagation_copurchase",
    # round 10 third wave: the support-2 four-cycle census (wedge join
    # over disjoint graph copies -> linear expected), item-item
    # covisitation pair counting (basket-bounded pair explosion,
    # linear in lineitem), and the seasonal-MK day-pair join (day
    # frame is calendar-FIXED under the upscale -> flat expected)
    "four_cycle_count_copurchase",
    "covisitation_item_item_topk",
    "seasonal_mann_kendall_revenue",
]


def build_upscale(spark: SparkSession, replication: int) -> int:
    docs = load_table(spark, SRC, "documents")
    reps = spark.range(replication).withColumnRenamed("id", "rep")
    up = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 100_000).alias("doc_id"),
            # replica 0 keeps the original text; others append a
            # variant token -> near-duplicates, not exact clones
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" variant"), F.col("rep").cast("string")))
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    up.write.mode("overwrite").parquet(os.path.join(DST, "documents.parquet"))
    emb = load_table(spark, SRC, "embeddings")
    emb_up = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 100_000).alias("vec_id"),
            "label",
            # perturb replicas so they are near- but not exact copies
            F.transform(
                "embedding", lambda x: x + F.col("rep").cast("float") * 0.001
            ).alias("embedding"),
        )
    )
    emb_up.write.mode("overwrite").parquet(os.path.join(DST, "embeddings.parquet"))
    # lineitem: replicate with BOTH orderkey and partkey offsets —
    # `replication` disjoint copies of the co-purchase graph, so edge,
    # wedge and triangle counts all scale exactly linearly and any
    # super-linear time is the algorithm's fault, not densification.
    li = load_table(spark, SRC, "lineitem")
    li_up = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("rep") * 10_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("l_partkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
    )
    li_up.write.mode("overwrite").parquet(os.path.join(DST, "lineitem.parquet"))
    # part: per-replica suffix appended to the LAST TOKEN (no space!)
    # keeps every blocking scheme the suspects use replica-disjoint
    # and same-sized — 10x more blocks, not 10x denser blocks. A
    # space-separated " v{rep}" suffix would CREATE a shared new last
    # token per replica, collapsing last-token blocking (ER linkage,
    # Fellegi-Sunter) into 10 giant blocks and measuring the
    # generator's artifact instead of the algorithm (round-8 lesson:
    # er_clusters showed 44x before this fix, 'superlinear' purely
    # from densified blocks).
    part = load_table(spark, SRC, "part")
    part_up = part.crossJoin(F.broadcast(reps)).select(
        (F.col("p_partkey") + F.col("rep") * 10_000_000).alias("p_partkey"),
        F.when(F.col("rep") == 0, F.col("p_name"))
        .otherwise(
            F.concat("p_name", F.lit("v"), F.col("rep").cast("string"))
        )
        .alias("p_name"),
        *[c for c in part.columns if c not in ("p_partkey", "p_name")],
    )
    part_up.write.mode("overwrite").parquet(os.path.join(DST, "part.parquet"))
    # events: disjoint user/event-id copies — contingency counts and the
    # lnfact-table length scale ~10x, exercising the prefix-sum build.
    ev = load_table(spark, SRC, "events")
    ev_up = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    )
    ev_up.write.mode("overwrite").parquet(os.path.join(DST, "events.parquet"))
    # orders: disjoint orderkey copies, SAME calendar — row-linear ops
    # (GMM EM scans) get 10x rows while day-frame ops (matrix profile,
    # trend fits) keep a constant-size frame, which is exactly the
    # 100 TB contract those queries document.
    od = load_table(spark, SRC, "orders")
    od_up = od.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("o_orderkey"),
        *[c for c in od.columns if c != "o_orderkey"],
    )
    od_up.write.mode("overwrite").parquet(os.path.join(DST, "orders.parquet"))
    # remaining tables are not read by the suspects; symlink for load_table
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    return up.count()


def time_query(name: str, spark: SparkSession, sf_dir: str) -> tuple[float, int]:
    from zoom_spark.session import release_storage

    t0 = time.time()
    n = QUERIES[name](spark, sf_dir).count()
    dt = time.time() - t0
    # hygiene OUTSIDE the timed span: accumulated checkpoint blocks from
    # earlier suspects distorted a later heavy's upscale ratio by GC
    # pressure (triangles read 20.0x in a 3-suspect batch, 8.2x alone)
    release_storage(spark)
    return dt, n


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # Clear any previous upscale: DST may hold stale symlinks for tables
    # this run now writes (overwriting THROUGH a symlink would touch the
    # read-only source tree).
    import shutil

    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    n_up = build_upscale(spark, replication)
    # Optional: smoke only the named suspects (full list at round end);
    # a partial run merges its rows into the existing BENCH_NOTES table.
    only = set(sys.argv[2:])
    suspects = [s for s in dict.fromkeys(SUSPECTS) if not only or s in only]
    results = {}
    for name in suspects:
        t_base, n_base = time_query(name, spark, SRC)
        t_up, n_out = time_query(name, spark, DST)
        ratio = t_up / t_base if t_base > 0 else float("inf")
        results[name] = {
            "sf0.1_sec": round(t_base, 2),
            "upscale_sec": round(t_up, 2),
            "time_ratio": round(ratio, 2),
            "row_ratio": replication,
            "upscale_out_rows": n_out,
            "superlinear": ratio > replication * 1.5,
        }
        print(json.dumps({name: results[name]}))
    lines = [
        "# BENCH NOTES — upscale smoke (quadratic-tail suspects)",
        "",
        f"Upscale: sf0.1 documents x{replication} near-dup replicas "
        f"({n_up} rows), local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]. "
        "A healthy query's time_ratio stays near the row ratio "
        f"({replication}x) — shuffle growth allows up to ~1.5x over it.",
        "",
        "| query | sf0.1 s | upscale s | time ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        verdict = "SUPER-LINEAR" if r["superlinear"] else "ok (≲ linear + shuffle)"
        lines.append(
            f"| {name} | {r['sf0.1_sec']} | {r['upscale_sec']} | "
            f"{r['time_ratio']}x vs {r['row_ratio']}x rows | {verdict} |"
        )
    # Replace ONLY the upscale-smoke section (everything up to the first
    # "## " heading); later hand-written sections (variance notes, etc.)
    # are preserved.
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_NOTES.md",
    )
    tail = ""
    old_rows: dict[str, str] = {}
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
        # Harvest prior rows ONLY from the smoke section itself (before
        # the first "## " heading). Scanning the whole file let rows
        # from later hand-written tables (isolated steady states, the
        # round-5 delta table) shadow same-named smoke rows and corrupt
        # the table schema on the next partial merge (r10 verdict #4).
        head = old[:idx] if idx != -1 else old
        for ln in head.splitlines():
            if ln.startswith("| ") and not ln.startswith("| query"):
                old_rows[ln.split("|")[1].strip()] = ln
    if only:
        # Partial run: merge fresh rows into the existing table so the
        # untouched suspects keep their last full-battery numbers.
        for ln in lines[len(lines) - len(results):]:
            old_rows[ln.split("|")[1].strip()] = ln
        merged = []
        for s in dict.fromkeys(SUSPECTS):
            if s in old_rows:
                merged.append(old_rows[s])
            else:
                # ADVICE r9: never silently shrink the table — a suspect
                # with neither a fresh row nor a prior one gets a visible
                # placeholder so the gap is auditable.
                print(f"WARNING: suspect {s} has no fresh or prior row")
                merged.append(f"| {s} | — | — | — | MISSING (no run recorded) |")
        lines = lines[: len(lines) - len(results)] + merged
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("wrote BENCH_NOTES.md (upscale section)")
    spark.stop()


if __name__ == "__main__":
    main()
