"""Reshape queries: pivot / unpivot / nested array builds (SURVEY.md
§2.11 U1/U2 analogs on the synthetic star schema, plus §2.4 A2).

The JHU-shaped byte-exact contract is golden-tested in
tests/test_etl_golden.py; these catalog entries exercise the same
operators on the driver's oracle-checkable tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.functions.exprs import DEC_SUM_SQL, day_str, dec_sum
from jhu_data_parser_spark.operators.reshape import long_to_nested, wide_to_long
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_STATUSES = ["F", "O", "P"]
_MONTHS = list(range(1, 13))


# Wide pivot: one row per priority, one count column per order status.
# Spark pivot with an explicit value list — no extra pass to discover
# values, and deterministic column order at any scale.
@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}") for s in _STATUSES],
    )


@query(
    "pivot_monthly_revenue",
    oracle="SELECT CAST(year(o_orderdate) AS INT) AS order_year, "
    + ", ".join(
        "COALESCE(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FILTER (WHERE month(o_orderdate) = {m}) AS DOUBLE) / 100.0, 0.0) AS m{m:02d}"
        for m in _MONTHS
    )
    + " FROM orders GROUP BY year(o_orderdate)",
)
def pivot_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year")
        .pivot("order_month", _MONTHS)
        .agg(dec_sum("o_totalprice"))
    )
    return pivoted.select(
        "order_year",
        *[F.coalesce(F.col(str(m)), F.lit(0.0)).alias(f"m{m:02d}") for m in _MONTHS],
    )


# U1 long form on a genuinely wide input: unpivot the lineitem metric
# columns. Generate-style projection, no shuffle.
@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS metric_value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumnsRenamed(
        {"l_quantity": "quantity", "l_extendedprice": "extendedprice", "l_discount": "discount"}
    )
    return wide_to_long(
        li,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["quantity", "extendedprice", "discount"],
        var_name="metric",
        value_name="metric_value",
    )


# A2/U1 nested build — the reference's array<struct> time_series on the
# star schema: per customer, the ordered daily spend series. A raw
# array<struct> column is not hashable by the driver's row canonicalizer
# (r01 returned TypeError), so the driver-facing surface serializes the
# array with to_json — the nested build still happens (and is asserted
# structurally in tests), the JSON string is just the wire format.
# Oracle (backfilled r15 — this was the last rows-only gap the driver
# could compare): DuckDB reconstructs Spark's exact to_json rendering
# with string_agg — no spaces, struct-field order (order_day,
# day_spend), array sorted by the leading struct field (sort_array ≡
# ORDER BY order_day: the day key is unique per customer). Doubles are
# safe to render portably here because every day_spend is an exact
# k/100 with |k| < 2^31 (dec_sum's scaled-long sum of bounded order
# totals): both Jackson (Spark) and DuckDB emit the shortest
# round-trip decimal — "123.45", "100.0" — and neither switches to
# scientific notation below 1e7 (Java) / 1e15 (DuckDB), far above the
# per-customer daily spend envelope (~1e6). Verified hash-green at
# sf0.001 and sf0.01.
@query(
    "nested_daily_spend",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS INT) AS n_days,
           '[' || string_agg(
               '{{"order_day":"' || order_day || '","day_spend":'
                   || CAST(day_spend AS VARCHAR) || '}}',
               ',' ORDER BY order_day) || ']' AS time_series_json
    FROM (
      SELECT o_custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             {DEC_SUM_SQL("o_totalprice")} AS day_spend
      FROM orders GROUP BY o_custkey, strftime(o_orderdate, '%Y-%m-%d'))
    GROUP BY o_custkey
    """,
)
def nested_daily_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = nested_daily_spend_raw(spark, sf_dir)
    return nested.select(
        "o_custkey",
        F.size("time_series").alias("n_days"),
        F.to_json("time_series").alias("time_series_json"),
    )


def nested_daily_spend_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The true nested build (array<struct> retained) used by tests and
    by the roundtrip query below."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_custkey", day_str("o_orderdate").alias("order_day")
    ).agg(dec_sum("o_totalprice").alias("day_spend"))
    return long_to_nested(
        daily,
        key_cols=["o_custkey"],
        order_field="order_day",
        struct_fields=["day_spend"],
        array_name="time_series",
    )


# The same nested build, re-flattened — proves the round trip AND gives
# the oracle a SQL-comparable surface for the collect/sort semantics.
@query(
    "nested_daily_spend_roundtrip",
    oracle=f"""
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           {DEC_SUM_SQL('o_totalprice')} AS day_spend
    FROM orders GROUP BY o_custkey, strftime(o_orderdate, '%Y-%m-%d')
    """,
)
def nested_daily_spend_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = nested_daily_spend_raw(spark, sf_dir)
    exploded = nested.select("o_custkey", F.explode("time_series").alias("e"))
    return exploded.select(
        "o_custkey",
        F.col("e.order_day").alias("order_day"),
        F.col("e.day_spend").alias("day_spend"),
    )


# U2 analog on the star schema — parser2's 3-stream zip re-expressed:
# three per-(customer, day) metric streams left-joined on the composite
# key with default-0 on misses (src/parser2.py:35-46), zipped into one
# sorted array<struct> per customer, then exploded back so the oracle
# can hash the collect/zip/default semantics.
@query(
    "nested_zip_metrics_roundtrip",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    urgent AS (
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             CAST(COUNT(*) AS BIGINT) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2
    ),
    spend AS (
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             {DEC_SUM_SQL('o_totalprice')} AS day_spend
      FROM orders GROUP BY 1, 2
    )
    SELECT b.o_custkey, b.order_day, b.n_orders,
           COALESCE(u.n_urgent, 0) AS n_urgent,
           COALESCE(s.day_spend, 0.0) AS day_spend
    FROM base b
    LEFT JOIN urgent u USING (o_custkey, order_day)
    LEFT JOIN spend s USING (o_custkey, order_day)
    """,
)
def nested_zip_metrics_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = day_str("o_orderdate").alias("order_day")
    base = o.groupBy("o_custkey", day).agg(F.count(F.lit(1)).alias("n_orders"))
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey", day)
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    spend = o.groupBy("o_custkey", day).agg(dec_sum("o_totalprice").alias("day_spend"))
    zipped = (
        base.join(urgent, ["o_custkey", "order_day"], "left")
        .join(spend, ["o_custkey", "order_day"], "left")
        .select(
            "o_custkey",
            "order_day",
            "n_orders",
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("day_spend", F.lit(0.0)).alias("day_spend"),
        )
    )
    nested = long_to_nested(
        zipped,
        key_cols=["o_custkey"],
        order_field="order_day",
        struct_fields=["n_orders", "n_urgent", "day_spend"],
        array_name="time_series",
    )
    return nested.select("o_custkey", F.explode("time_series").alias("e")).select(
        "o_custkey",
        F.col("e.order_day").alias("order_day"),
        F.col("e.n_orders").alias("n_orders"),
        F.col("e.n_urgent").alias("n_urgent"),
        F.col("e.day_spend").alias("day_spend"),
    )
