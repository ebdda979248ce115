"""Scalar-function breadth queries (SURVEY.md §2.8 'Absent' rows:
string / array / conditional / null-handling built-ins + F7
url-encode) and pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "string_functions",
    sql="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 4) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           CAST(length(p_name) AS INT) AS name_len
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (F9 breadth): case, substring, concat,
    pad, regex replace, length."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "url_encode_names",
    sql="""
    SELECT c_custkey, replace(c_name, '#', '%23') AS name_encoded
    FROM customer
    """,
)
def url_encode_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — url_encode (/root/reference/main.py:6 imports urllib quote
    for uuid safety). Spark's url_encode is form-encoding; the oracle
    mirrors it for the '#'-only charset of c_name."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", F.url_encode("c_name").alias("name_encoded"))


@register(
    "case_when_buckets",
    sql="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing (CASE WHEN chains)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("price_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2).alias("total"),
    )


@register(
    "null_handling",
    sql="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_filled,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
                THEN 1 ELSE 0 END AS was_building
    FROM customer
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: nullif / coalesce / IS NULL flags (P4)."""
    c = load_table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("SUPPRESSED")).alias("seg_filled"),
        F.when(seg_null.isNull(), 1).otherwise(0).alias("was_building"),
    )


@register(
    "explode_doc_tokens",
    sql=r"""
    SELECT doc_id, t.token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS token
      FROM documents WHERE doc_id < 50
    ) t(doc_id, token)
    GROUP BY doc_id, t.token
    """,
)
def explode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode -> per-document token frequencies (§2.8 array
    family; the flatMap shape of every bag-of-words pass)."""
    from zoom_spark.functions.text import ws_tokens

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.explode(ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "array_functions",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
           CASE WHEN len(list_filter(toks, x -> x = 'spark')) > 0
                THEN TRUE ELSE FALSE END AS has_spark,
           list_sort(list_distinct(toks))[1] AS first_token_alpha,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), ',')
             AS first3_csv
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family: size, distinct, contains, sort,
    slice, join."""
    from zoom_spark.functions.text import ws_tokens

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = ws_tokens(F.col("text"))
    sorted_distinct = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(sorted_distinct, 1).alias("first_token_alpha"),
        F.array_join(F.slice(sorted_distinct, 1, 3), ",").alias("first3_csv"),
    )


@register(
    "epoch_timezone_functions",
    sql="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
           CAST(strftime(o_orderdate, '%H') AS INT) AS hr,
           strftime(o_orderdate + INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S')
             AS plus5h,
           CAST(date_diff('day', DATE '2026-01-01', o_orderdate) AS BIGINT)
             AS days_from_2026
    FROM orders WHERE o_orderkey < 1000
    """,
)
def epoch_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/interval conversions (F1-F3 breadth): unix seconds,
    field extraction, interval shift, day arithmetic. Session TZ is
    UTC so epoch matches the oracle's naive-timestamp epoch()."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.year("o_orderdate").alias("yr"),
        F.hour("o_orderdate").alias("hr"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 5 HOURS"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("plus5h"),
        F.datediff(F.to_date("o_orderdate"), F.lit("2026-01-01").cast("date"))
        .cast("bigint")
        .alias("days_from_2026"),
    )


@register(
    "regexp_groups",
    sql=r"""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           CASE WHEN regexp_matches(c_name, '0{2}') THEN TRUE ELSE FALSE END
             AS has_double_zero,
           CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
           translate(c_name, '#0', '_O') AS translated
    FROM customer
    """,
)
def regexp_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture groups, boolean match, global extraction count,
    and character translation (F9 breadth)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.col("c_name").rlike("0{2}").alias("has_double_zero"),
        F.size(F.regexp_extract_all("c_name", F.lit("[0-9]"), 0)).alias(
            "n_digits"
        ),
        F.translate("c_name", "#0", "_O").alias("translated"),
    )


@register(
    "pivot_status_counts",
    sql="""
    SELECT o_custkey,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
             AS status_F,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
             AS status_O,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
             AS status_P
    FROM orders GROUP BY o_custkey
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) with a fixed value list —
    the scalable form: no distinct-values pre-pass, single shuffle."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_custkey",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("status_P"),
    )


@register(
    "try_functions",
    sql="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
           round(o_totalprice / nullif(o_custkey % 5, 0), 4) AS risky_ratio
    FROM orders
    """,
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (try_cast / try_divide): malformed
    input degrades to NULL instead of failing the job — the batch
    analog of the reference's domain-error skip (S15,
    /root/reference/main.py:284-286). At 100 TB a single dirty row
    must never kill the stage."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_to_number("o_orderpriority", F.lit("999")).cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("priority_num"),
        # round(4): a 2-decimal price over a divisor in 1..4 can hit an
        # exact half at the 2nd decimal (x/2 = y.xx5 -> engines split on
        # half-up vs correctly-rounded) but never at the 4th
        F.round(
            F.try_divide("o_totalprice", F.col("o_custkey") % 5), 4
        ).alias("risky_ratio"),
    )


@register(
    "higher_order_arrays",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           coalesce(list_aggregate(list_transform(toks, t -> length(t) > 6),
                                   'bool_or'), false) AS has_long_token,
           coalesce(list_aggregate(list_transform(toks, t -> length(t) >= 1),
                                   'bool_and'), true) AS all_nonempty,
           CAST(coalesce(list_aggregate(list_transform(toks, t -> length(t)),
                                        'sum'), 0) AS BIGINT)
             AS total_token_chars,
           CAST(len(list_filter(toks, t -> t LIKE 's%')) AS BIGINT)
             AS n_s_tokens
    FROM t
    """,
)
def higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (exists / forall / aggregate /
    filter) — the lambda family that keeps per-row collection logic
    JVM-side instead of in a Python UDF. All run inside one codegen
    stage over the token array."""
    from zoom_spark.functions.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 6).alias("has_long_token"),
        F.forall(toks, lambda t: F.length(t) >= 1).alias("all_nonempty"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).cast("bigint").alias("total_token_chars"),
        F.size(F.filter(toks, lambda t: t.startswith("s"))).cast("bigint").alias(
            "n_s_tokens"
        ),
    )
