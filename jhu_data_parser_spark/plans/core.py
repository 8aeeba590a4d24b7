"""Core relational queries: scans, filters, joins, aggregations, sorts,
set operations (SURVEY.md §2.2–2.4, §2.6–2.7).

Each entry pairs an idiomatic DataFrame plan with a DuckDB oracle twin.
Scale notes are inline: the point of each plan is that Catalyst produces
the physical strategy you'd want on a 1000-executor cluster (broadcast
hash joins for dims, partial aggregation before the shuffle, pushed
filters, `TakeOrderedAndProject` for top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.functions.exprs import (
    DEC_AVG_SQL,
    DEC_SUM_SQL,
    REVENUE_SQL,
    day_str,
    dec_avg,
    dec_sum,
    revenue,
)
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A1 — global count (the reference's only aggregate: numrecords counter,
# src/parser.py:60,79,83). Distributed: partial counts per partition, one
# tiny final reduce — no data shuffle.
# --------------------------------------------------------------------------
@query(
    "global_count",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem",
)
def global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------------
# P5 — filter + projection. Correct at scale iff the predicate and the
# 3-column projection reach the parquet scan (PushedFilters / ReadSchema
# in .explain) — verified in tests/test_plans_physical.py.
# --------------------------------------------------------------------------
@query(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45.0 AND l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45.0) & (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# --------------------------------------------------------------------------
# A3 — grouped aggregation battery (TPC-H Q1 shape). Partial aggregation
# (map-side combine) happens before the shuffle; only |groups| rows move.
# --------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {DEC_SUM_SQL('l_quantity')} AS sum_qty,
      {DEC_SUM_SQL('l_extendedprice')} AS sum_base_price,
      {DEC_SUM_SQL(REVENUE_SQL, 4)} AS sum_disc_price,
      {DEC_AVG_SQL('l_quantity')} AS avg_qty,
      {DEC_AVG_SQL('l_discount', 4)} AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("sum_qty"),
        dec_sum("l_extendedprice").alias("sum_base_price"),
        dec_sum(revenue(), scale=4).alias("sum_disc_price"),
        dec_avg("l_quantity").alias("avg_qty"),
        dec_avg("l_discount", scale=4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# A3 — distinct aggregation. countDistinct shuffles (key, value) pairs —
# Spark rewrites to a two-stage expand+agg; exact answer.
# --------------------------------------------------------------------------
@query(
    "agg_distinct_customers",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A4 — rollup. One pass with grouping-set expansion; Spark and DuckDB both
# emit NULL group keys for the subtotal rows.
# --------------------------------------------------------------------------
@query(
    "agg_rollup_segment_nation",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           {DEC_SUM_SQL('c_acctbal')} AS total_bal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def agg_rollup_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dec_sum("c_acctbal").alias("total_bal"),
    )


@query(
    "agg_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DEC_SUM_SQL('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Flagship (entry): revenue by nation within a region-year slice.
# Plan shape at scale: lineitem (the 100 TB fact) is scanned once; orders
# filtered by year joins it on l_orderkey (shuffle on the fact's natural
# key); customer→nation→region are dims — broadcast hash joins, no
# shuffle. Region/nation are a few KB; customer at real scale may exceed
# broadcast, where AQE/SMJ takes over.
# --------------------------------------------------------------------------
@query(
    "join_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {DEC_SUM_SQL(REVENUE_SQL, 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # nation/region are KB-scale — always-safe broadcast hints. customer
    # is NOT hinted: a forced broadcast OOMs when it outgrows executors
    # at real scale; below the threshold Catalyst/AQE broadcasts it
    # anyway (the plan test still sees 3+ broadcast joins locally).
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dec_sum(revenue(), scale=4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape — join + group + top-k with unique tiebreaker.
# Catalyst rewrites orderBy().limit() to TakeOrderedAndProject: each task
# keeps its local top-10, driver merges — no global sort at 100 TB.
# --------------------------------------------------------------------------
@query(
    "join_shipping_priority_top10",
    oracle=f"""
    SELECT o.o_orderkey,
           {DEC_SUM_SQL(REVENUE_SQL, 4)} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def join_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # The segment-filtered customer side shrinks 5×, but is still
    # table-proportional — no forced broadcast (Catalyst/AQE upgrades it
    # when it fits; a hint would OOM at real scale). Join order keeps
    # both build sides as direct file scans (they broadcast in parallel;
    # pre-joining o⋈c first would serialize an intermediate broadcast —
    # measured slower). Grouping is on the raw date (bigint/date/string
    # keys); the display string is formatted on the ~|groups| aggregated
    # rows, not per input row.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue(), scale=4).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            day_str("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# J2/F8 analog — left outer join + default-0 (the reference's
# try/except-KeyError→0, src/parser2.py:35-46). Customers with no orders
# keep a 0 instead of disappearing or going NULL.
# --------------------------------------------------------------------------
@query(
    "join_left_default_zero",
    oracle=f"""
    SELECT c.c_custkey,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {DEC_SUM_SQL('o_totalprice')} AS total_spent
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def join_left_default_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("total_spent"))
    )
    # Aggregate-then-join: the shuffle moves |customers| pre-aggregated
    # rows, not |orders| raw rows — the right order at 100 TB.
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
    )


# --------------------------------------------------------------------------
# J1 analog — first-match enrich join. The reference's nested-loop lookup
# takes the FIRST matching dimension row and breaks (src/parser.py:64-70),
# so the build side must be deduplicated to one row per key before the
# join. Done here with a window over the explicit priority order —
# the distributed expression of "first in file order".
# --------------------------------------------------------------------------
@query(
    "join_first_match_enrich",
    oracle="""
    WITH first_sup AS (
      SELECT s_nationkey, s_name, s_acctbal FROM (
        SELECT s_nationkey, s_name, s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
        FROM supplier
      ) WHERE rn = 1
    )
    SELECT n.n_nationkey, n.n_name,
           f.s_name AS first_supplier,
           f.s_acctbal AS first_supplier_bal
    FROM nation n LEFT JOIN first_sup f ON n.n_nationkey = f.s_nationkey
    """,
)
def join_first_match_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.joins import first_match_join

    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    enriched = first_match_join(
        n,
        s.select("s_nationkey", "s_suppkey", "s_name", "s_acctbal"),
        left_key="n_nationkey",
        right_key="s_nationkey",
        order_by="s_suppkey",
    )
    return enriched.select(
        "n_nationkey",
        "n_name",
        F.col("s_name").alias("first_supplier"),
        F.col("s_acctbal").alias("first_supplier_bal"),
    )


# --------------------------------------------------------------------------
# J5 — anti join (the reference's logged join misses, src/parser2.py:134,
# materialized as data instead of log lines).
# --------------------------------------------------------------------------
@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
    )
    """,
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# §2.6 — top-k. TakeOrderedAndProject, not a global sort.
# --------------------------------------------------------------------------
@query(
    "sort_top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def sort_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# §2.7 — set operations (distinct semantics, matching SQL).
# --------------------------------------------------------------------------
def _building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )


_SET_A_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SET_B_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0"


@query("set_union", oracle=f"{_SET_A_SQL} UNION {_SET_B_SQL}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_customers(spark, sf_dir).union(_big_order_customers(spark, sf_dir)).distinct()


@query("set_intersect", oracle=f"{_SET_A_SQL} INTERSECT {_SET_B_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_customers(spark, sf_dir).intersect(_big_order_customers(spark, sf_dir))


@query("set_except", oracle=f"{_SET_A_SQL} EXCEPT {_SET_B_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_customers(spark, sf_dir).exceptAll(_big_order_customers(spark, sf_dir)).distinct()


# --------------------------------------------------------------------------
# J6 — range join (non-equi). Expressed declaratively; at test scale
# Catalyst picks a broadcast nested-loop on the small build side. At
# 100 TB you'd pre-bucket both sides by time bucket and join on
# (user_id, bucket) first — that variant is operators/joins.py:range_join
# with bucketing, used here.
# --------------------------------------------------------------------------
@query(
    "join_range_followup_events",
    oracle="""
    SELECT a.event_id AS click_id,
           CAST(COUNT(b.event_id) AS BIGINT) AS n_followups
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'purchase'
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click'
    GROUP BY a.event_id
    """,
)
def join_range_followup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.joins import range_join_count

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return range_join_count(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        left_id="event_id",
    ).select(F.col("event_id").alias("click_id"), F.col("n_followups"))
