"""MinHash + LSH banding near-dedup (X2) — the 100 TB scale path.

shingle -> K minhashes (xxhash64 with per-permutation salt) ->
B bands of R rows -> band-bucket join for candidates -> exact
Jaccard verification of candidates only.

Everything through candidate generation is column expressions
(transform/array_min/posexplode); cost is O(N·K) map-side plus one
shuffle on (band_id, band_hash). The quadratic work only happens
inside buckets, which is the entire point of LSH banding (see
PAPERS.md; standard MMDS ch.3 construction — public knowledge).

With K = B·R, the candidate-capture probability of a pair with true
Jaccard s is 1 - (1 - s^R)^B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.dedup.ngram import jaccard, shingles


def minhash_signature(shingle_arr, num_hashes: int = 32):
    """Array of `num_hashes` minhash values: min over shingles of
    xxhash64(shingle, salt=i)."""
    # closure factory, not a default arg: a 2-param lambda would make
    # pyspark bind the 2nd param to the array-index lambda variable
    def perm(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(shingle_arr, perm(i))) for i in range(num_hashes)]
    )


def band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(id, band_id, band_hash) — one row per document per band."""
    rows = num_hashes // bands

    def perm(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    # Build band hashes directly from the per-permutation min-hash
    # expressions so each is referenced EXACTLY once. Routing them
    # through an intermediate signature-array column lets Catalyst's
    # CollapseProject inline the whole 32-hash expression into every
    # element_at() — a 32x duplication that turned this stage from
    # ~1s into ~6min at sf0.1.
    sh = shingles(F.col(text_col), shingle_n)
    mh = [F.array_min(F.transform(sh, perm(i))) for i in range(num_hashes)]
    bands_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",", *[mh[b * rows + r].cast("string") for r in range(rows)]
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bands_arr).alias("band_id", "band_hash"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 band bucket."""
    bk = band_buckets(
        df, text_col, id_col,
        shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
    )
    a = bk.select("band_id", "band_hash", F.col("id").alias("id_a"))
    b = bk.select("band_id", "band_hash", F.col("id").alias("id_b"))
    return (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold."""
    cands = minhash_candidate_pairs(
        df, text_col, id_col,
        shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    pairs = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), on="id_b")
    )
    sim = F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    return (
        pairs.select("id_a", "id_b", sim.alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= threshold)
    )
