"""BPE tokenizer + token-budget packing (R149–R150).

Referee: an INDEPENDENT pure-Python BPE apply using the original
Sennrich-style formulation — iterate merges in training order and,
for each, replace every occurrence left-to-right — vs the engine's
lowest-rank-first greedy loop. The two formulations are provably
equivalent, so any divergence is a bug in one of them.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def _referee_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    symbols = list(word) + ["</w>"]
    for a, b in merges:
        out, i = [], 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def test_train_bpe_merges_tiny_corpus_known_answer(spark):
    """'low low lower' (classic example): the most frequent pair is
    ('l','o') -> then ('lo','w') -> then ('low','</w>')."""
    from zoom_spark.functions.bpe import train_bpe_merges

    df = spark.createDataFrame(
        [(0, "low low lower"), (1, "low lowest")], "doc_id long, text string"
    )
    merges = train_bpe_merges(df, n_merges=3, sample_docs=10)
    assert merges[:3] == [("l", "o"), ("lo", "w"), ("low", "</w>")]


def test_encode_word_matches_referee_on_corpus_vocab(spark):
    """Every distinct word in the sf-dir corpus encodes identically
    under the engine's rank-greedy loop and the referee's
    merge-order replay."""
    from zoom_spark.functions.bpe import encode_word, train_bpe_merges
    from zoom_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges = train_bpe_merges(docs, n_merges=120, sample_docs=100)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = {
        w
        for r in docs.select("text").limit(200).collect()
        for w in r["text"].split()
        if w
    }
    assert len(vocab) > 20  # synthetic corpus vocab is ~31 words
    for w in sorted(vocab):
        assert encode_word(w, ranks) == _referee_encode(w, merges), w


def test_bpe_encode_docs_counts_match_referee(spark):
    from zoom_spark.functions.bpe import bpe_encode_docs, train_bpe_merges
    from zoom_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(80)
    merges = train_bpe_merges(docs, n_merges=80, sample_docs=50)
    got = {r["doc_id"]: r for r in bpe_encode_docs(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in r["text"].split() if w]
        want_tokens = sum(len(_referee_encode(w, merges)) for w in ws)
        assert got[r["doc_id"]]["n_words"] == len(ws)
        assert got[r["doc_id"]]["n_tokens"] == want_tokens
        if ws:
            assert got[r["doc_id"]]["first_word_tokens"] == ",".join(
                _referee_encode(ws[0], merges)
            )


def test_bpe_tokens_compress_vs_chars(spark):
    """Merges only ever shrink: chars+1 per word is the no-merge
    ceiling, and with 200 trained merges real text must come in
    strictly under it in aggregate."""
    from zoom_spark.queries.tokenization import bpe_token_counts

    rows = bpe_token_counts(spark, SF_DIR).collect()
    assert rows
    total_tokens = sum(r["n_tokens"] for r in rows)
    ceiling = 0
    from zoom_spark.io import load_table

    for r in load_table(spark, SF_DIR, "documents").select("text").collect():
        ws = [w for w in r["text"].split() if w]
        ceiling += sum(len(w) + 1 for w in ws)
    assert total_tokens < ceiling


def test_pack_shards_token_budget_properties(spark):
    """Every shard fits the budget (single-oversize-doc shards
    exempt), shards are contiguous in doc_id order, and every doc is
    assigned exactly once."""
    from zoom_spark.queries.tokenization import (
        TOKEN_BUDGET,
        pack_shards_token_budget,
    )

    rows = sorted(
        pack_shards_token_budget(spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # contiguity: shard ids are non-decreasing when walking doc order
    shard_seq = [r["shard_id"] for r in rows]
    assert shard_seq == sorted(shard_seq)
    # pack_by_budget bins by exclusive-prefix position: docs in a
    # shard are a contiguous run and only the LAST doc may straddle
    # the boundary — so each shard minus its final doc fits the
    # budget, and the overshoot is bounded by one doc's weight.
    by_shard: dict[int, list] = {}
    for r in rows:  # rows already sorted by doc_id
        by_shard.setdefault(r["shard_id"], []).append(r["n_tokens"])
    for sid, weights in by_shard.items():
        assert sum(weights[:-1]) <= TOKEN_BUDGET, (sid, sum(weights))
        assert sum(weights) <= TOKEN_BUDGET + weights[-1]


def test_pack_by_budget_bpe_weights(spark):
    """The BPE-exact packing variant (r10: the registered query now
    packs by the portable chars/4 estimate so it can value-hash; the
    BPE weight path stays covered here): same contiguity and budget
    properties over bpe_token_counts' n_tokens."""
    from zoom_spark.operators.prefix import pack_by_budget
    from zoom_spark.queries.tokenization import (
        TOKEN_BUDGET,
        _encoded_docs,
    )

    enc = _encoded_docs(spark, SF_DIR).select("doc_id", "n_tokens")
    rows = sorted(
        pack_by_budget(
            enc, order_col="doc_id", weight_col="n_tokens", budget=TOKEN_BUDGET
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    shard_seq = [r["shard_id"] for r in rows]
    assert shard_seq == sorted(shard_seq)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["n_tokens"])
    for sid, weights in by_shard.items():
        assert sum(weights[:-1]) <= TOKEN_BUDGET, (sid, sum(weights))
