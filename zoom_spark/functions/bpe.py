"""Byte-pair-encoding tokenizer: driver-side training on a
deterministic sample + distributed greedy APPLY (R149/R150).

Real pretrain pipelines pack shards by TOKEN counts, not word or char
counts — so the packing stage needs an actual tokenizer applied to
every document. The classic BPE split (Sennrich et al. 2016, public
algorithm):

  * TRAINING is inherently sequential (merge i+1's pair counts depend
    on merge i), so it runs driver-side over a deterministic
    hash-ordered SAMPLE of the corpus — the merge table is a MODEL
    ARTIFACT (n_merges rows), exactly like k-means centroids or PQ
    codebooks elsewhere in this repo. queries/pipeline_breadth's R68
    `bpe_merge_candidates` is the distributed single-round pair-count
    twin that feeds monitoring.
  * APPLY is embarrassingly parallel: broadcast the merge-rank dict,
    greedy-merge each word inside an Arrow-batched mapInPandas (the
    documented Python-UDF exception: byte-level tokenization has no
    JVM expression form). A per-batch word->tokens memo collapses the
    Zipf head, so cost tracks DISTINCT words per batch, not words.

Reference parity note: the reference ETL (/root/reference/main.py) has
no tokenizer; this belongs to the mandated training-data extension
family (SURVEY.md §2.11 / round-5 verdict "Next round" #7).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_freqs_sample(
    docs: DataFrame, text_col: str, id_col: str, sample_docs: int
) -> Counter:
    """Word frequencies from the `sample_docs` docs with the smallest
    xxhash64(id) — a reproducible pseudo-random sample taken with a
    distributed top-k (TakeOrderedAndProject), never a global sort."""
    rows = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .orderBy(F.xxhash64(F.col("id").cast("string")), F.col("id"))
        .limit(sample_docs)
        .collect()
    )
    freqs: Counter = Counter()
    for r in rows:
        for w in r["t"].split():
            if w:
                freqs[w] += 1
    return freqs


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    sample_docs: int = 200,
) -> list[tuple[str, str]]:
    """Classic BPE training on a deterministic corpus sample: start
    from characters + an end-of-word marker, repeatedly merge the
    most frequent adjacent symbol pair (ties break lexicographically
    for cross-run determinism). Returns the ordered merge list —
    rank == list index."""
    freqs = _word_freqs_sample(docs, text_col, id_col, sample_docs)
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (END_OF_WORD,): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += c
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    LOWEST-RANK adjacent pair present (the canonical BPE apply rule —
    merge order follows training order, not left-to-right scanning)."""
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_tokens, tokens_sample) per document via
    Arrow-batched mapInPandas with the merge ranks broadcast in the
    closure (model-artifact-sized). A per-batch word->len memo makes
    the cost proportional to distinct words per batch."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def tok_len(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                memo[w] = n
            return n

        for pdf in batches:
            n_words, n_tokens, sample = [], [], []
            for t in pdf[text_col]:
                ws = [w for w in t.split() if w]
                n_words.append(len(ws))
                n_tokens.append(sum(tok_len(w) for w in ws))
                sample.append(
                    ",".join(encode_word(ws[0], ranks)) if ws else ""
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                    "first_word_tokens": sample,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema="doc_id long, n_words long, n_tokens long, "
        "first_word_tokens string",
    )
