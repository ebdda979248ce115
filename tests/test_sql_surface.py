"""ANSI/Spark SQL surface parity checks for constructs a reference
user would reach for that aren't individually worth a gated oracle
query: GROUP BY ALL, inline VALUES tables, TABLESAMPLE REPEATABLE
determinism, EXCEPT/INTERSECT ALL bag semantics, and Hive-style
LATERAL VIEW explode. Each is pinned against an equivalent DataFrame
computation in the same engine (self-parity), which is the contract
that matters for users porting SQL text onto this engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_spark.io import register_views

SF_DIR = "/root/testdata/sf0.001"


def test_group_by_all(spark):
    register_views(spark, SF_DIR)
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): r["n"]
        for r in spark.sql(
            "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
            "FROM orders GROUP BY ALL"
        ).collect()
    }
    ref = {
        (r["o_orderstatus"], r["o_orderpriority"]): r["n"]
        for r in spark.table("orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == ref and len(got) > 1


def test_inline_values_join(spark):
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        SELECT v.tier, count(*) AS n
        FROM orders o
        JOIN VALUES ('1-URGENT', 'hot'), ('5-LOW', 'cold') AS v(pri, tier)
          ON o.o_orderpriority = v.pri
        GROUP BY v.tier
        """
    ).collect()
    got = {r["tier"]: r["n"] for r in out}
    base = {
        r["o_orderpriority"]: r["count"]
        for r in spark.table("orders").groupBy("o_orderpriority").count().collect()
    }
    assert got == {"hot": base["1-URGENT"], "cold": base["5-LOW"]}


def test_tablesample_repeatable_is_deterministic(spark):
    register_views(spark, SF_DIR)
    q = (
        "SELECT o_orderkey FROM orders "
        "TABLESAMPLE (20 PERCENT) REPEATABLE (42)"
    )
    a = sorted(r["o_orderkey"] for r in spark.sql(q).collect())
    b = sorted(r["o_orderkey"] for r in spark.sql(q).collect())
    assert a == b
    n = spark.table("orders").count()
    assert 0 < len(a) < n  # actually sampled


def test_except_all_and_intersect_all_bag_semantics(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "x int"
    )
    other = spark.createDataFrame([(1,), (3,), (3,)], "x int")
    except_all = sorted(r["x"] for r in df.exceptAll(other).collect())
    intersect_all = sorted(r["x"] for r in df.intersectAll(other).collect())
    # bag semantics: one copy of 1 survives, 2 survives, 3 fully removed
    assert except_all == [1, 2]
    assert intersect_all == [1, 3]
    # and the SQL spellings agree
    df.createOrReplaceTempView("t_a")
    other.createOrReplaceTempView("t_b")
    assert sorted(
        r["x"]
        for r in spark.sql("SELECT x FROM t_a EXCEPT ALL SELECT x FROM t_b").collect()
    ) == except_all
    assert sorted(
        r["x"]
        for r in spark.sql(
            "SELECT x FROM t_a INTERSECT ALL SELECT x FROM t_b"
        ).collect()
    ) == intersect_all


def test_lateral_view_explode_matches_dataframe_explode(spark):
    register_views(spark, SF_DIR)
    got = spark.sql(
        """
        SELECT doc_id, w FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS w
        WHERE w <> ''
        """
    ).count()
    ref = (
        spark.table("documents")
        .select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .count()
    )
    assert got == ref > 0
