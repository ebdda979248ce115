"""Cross-validation of the engine's dedup/text operators against
pyspark.ml's independent implementations (SURVEY.md §2.11 names
MinHashLSH / HashingTF as the stock Spark route; the engine's own
column-expression LSH is the scale path, ml is the referee)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zoom_spark.io import load_table
from zoom_spark.queries.dedup_queries import DUP_OFFSET, _doubled_docs


def test_ml_minhash_lsh_agrees_on_clone_pairs(spark):
    """pyspark.ml MinHashLSH over token CountVectorizer vectors must
    also place every clone pair at distance 0 — independent referee
    for the engine's minhash_dedup_docs clone-capture property."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    originals = load_table(spark, SF_DIR, "documents").limit(200)
    docs = originals.unionByName(
        originals.withColumn("doc_id", F.col("doc_id") + DUP_OFFSET)
    )
    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+", toLowercase=True
    )
    toks = tok.transform(docs)
    cv = CountVectorizer(inputCol="toks", outputCol="vec", binary=True).fit(toks)
    vecs = cv.transform(toks).select("doc_id", "vec")
    mh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=4).fit(vecs)
    pairs = mh.approxSimilarityJoin(vecs, vecs, 0.01, distCol="jd").where(
        F.col("datasetA.doc_id") + DUP_OFFSET == F.col("datasetB.doc_id")
    )
    n_docs = originals.count()
    assert pairs.count() == n_docs  # every clone pair at distance ~0
    assert pairs.where(F.col("jd") > 0.0).count() == 0


def test_ml_tfidf_pipeline_deterministic_and_shaped(spark):
    """Tokenizer -> HashingTF -> IDF (the stock X4 route): output
    dimensionality fixed, IDF weights deterministic across fits on
    the same data."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text", outputCol="toks", pattern=r"\s+", toLowercase=True
            ),
            HashingTF(inputCol="toks", outputCol="tf", numFeatures=1024),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    m1 = pipe.fit(docs)
    m2 = pipe.fit(docs)
    out1 = m1.transform(docs).select("doc_id", "tfidf")
    assert out1.first().tfidf.size == 1024
    idf1 = list(m1.stages[-1].idf)
    idf2 = list(m2.stages[-1].idf)
    assert idf1 == idf2
