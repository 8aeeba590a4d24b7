"""Scalar-function battery (SURVEY.md §2.8 F1–F9): string / date / math /
array / JSON expressions, all JVM-side built-ins inside whole-stage
codegen — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table


# F9/F7 — JSON extraction from events.props ('{"k": <int>}'). from_json
# with an explicit schema: parsed once, pruned, codegen'd.
@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("prop_k"),
    )


# F3/F5/F9 — string functions (upper/substring/length/concat_ws/replace).
@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


# F1/F2 — date functions: extract parts, day arithmetic, formatting (the
# reference's strptime/str round trip, src/parser.py:23-26,34).
@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate_str
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("due_date"),
        # F2: the reference's 'YYYY-MM-DD HH:MM:SS' serialization.
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate_str"),
    )


# F8 + conditional logic — CASE WHEN bucketing.
@query(
    "scalar_case_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000.0 THEN 'small'
                WHEN o_totalprice < 200000.0 THEN 'medium'
                WHEN o_totalprice < 350000.0 THEN 'large'
                ELSE 'jumbo' END AS size_bucket
    FROM orders
    """,
)
def scalar_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000.0, "small")
        .when(F.col("o_totalprice") < 200000.0, "medium")
        .when(F.col("o_totalprice") < 350000.0, "large")
        .otherwise("jumbo")
        .alias("size_bucket"),
    )


# F9 math — abs/floor/ceil/sqrt and IEEE-stable products.
@query(
    "scalar_math_funcs",
    oracle="""
    SELECT event_id,
           abs(value) AS v_abs,
           CAST(floor(value) AS BIGINT) AS v_floor,
           CAST(ceil(value) AS BIGINT) AS v_ceil,
           sqrt(abs(value)) AS v_sqrt,
           value * value AS v_sq,
           CAST(greatest(value, 0.0) AS DOUBLE) AS v_pos,
           CAST(least(value, 100.0) AS DOUBLE) AS v_cap
    FROM events
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v).alias("v_abs"),
        F.floor(v).alias("v_floor"),
        F.ceil(v).alias("v_ceil"),
        F.sqrt(F.abs(v)).alias("v_sqrt"),
        (v * v).alias("v_sq"),
        F.greatest(v, F.lit(0.0)).alias("v_pos"),
        F.least(v, F.lit(100.0)).alias("v_cap"),
    )


# F9 arrays — split / size / element_at / array_contains on documents.
@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark
    FROM documents
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


# F6 — regex on row data: extract the first numeric run from p_name-like
# text; rlike predicate.
@query(
    "scalar_regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '[A-Z]+') AS first_word,
           regexp_matches(p_name, 'part_1') AS matches_part1
    FROM part
    """,
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "[A-Z]+", 0).alias("first_word"),
        F.col("p_name").rlike("part_1").alias("matches_part1"),
    )
