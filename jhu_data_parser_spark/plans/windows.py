"""Window-function queries (SURVEY.md §2.5): ranking, analytic (lag/lead),
aggregate-over-frame. The reference's nested `time_series` array was its
substitute for exactly this class of query (day-over-day deltas, rolling
averages over the unpivoted form).

Scale note: every window below partitions by a high-cardinality key
(nation, user) — state per partition stays small, and the shuffle is one
hash exchange on the partition key. Frames use the decimal-sum discipline
(functions/exprs.py) so frame aggregation is order-independent and
oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.functions.exprs import scaled_long
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table


@query(
    "window_rank_top_customers",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)
def window_rank_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# Rolling mean over the last 3 rows. Decimal-sum inside the frame so the
# value is independent of the engines' frame-accumulation strategy
# (DuckDB uses segment trees / incremental add-remove; Spark re-sums).
@query(
    "window_rolling_avg",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                  OVER w AS DOUBLE) / 10000.0 / COUNT(*) OVER w AS rolling_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        (
            F.sum(scaled_long("value", 4)).over(w).cast("double")
            / F.lit(10000.0)
            / F.count(F.lit(1)).over(w)
        ).alias("rolling_avg"),
    )


@query(
    "window_cumulative_spend",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS cum_spend
    FROM orders
    """,
)
def window_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        (F.sum(scaled_long("o_totalprice", 2)).over(w).cast("double") / F.lit(100.0)).alias(
            "cum_spend"
        ),
    )


# percent_rank = (rank-1)/(n-1): integer inputs, one double division —
# bit-identical across engines. Unique ordering key avoids rank ties.
@query(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS pr
    FROM orders
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.percent_rank().over(w).alias("pr"))


@query(
    "window_lead_next_order_gap",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', o_orderdate,
                          lead(o_orderdate) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey))
                AS INT) AS days_to_next
    FROM orders
    """,
)
def window_lead_next_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias("days_to_next"),
    )


# Distinct count over a trailing time window — a frame aggregate NEITHER
# engine supports natively (no COUNT(DISTINCT) OVER ... RANGE): Spark
# side composes collect_list → array_distinct → size inside the frame;
# the oracle recomputes each row's answer with a correlated range
# subquery. Both sides range on floor'd epoch seconds so the frame
# boundaries are integer-identical. At 100 TB the exact form's state is
# the value list per frame — the documented sketch upgrade is an HLL
# register set per frame (agg_hll_sketch_merge shows the sketch
# machinery) when values-per-window stops fitting.
@query(
    "window_rolling_distinct_types",
    oracle="""
    SELECT e.event_id,
           (SELECT CAST(COUNT(DISTINCT e2.event_type) AS INT)
            FROM events e2
            WHERE e2.user_id = e.user_id
              AND CAST(floor(epoch(e2.ts)) AS BIGINT)
                  BETWEEN CAST(floor(epoch(e.ts)) AS BIGINT) - 3600
                      AND CAST(floor(epoch(e.ts)) AS BIGINT)
           ) AS n_distinct_types
    FROM events e
    """,
)
def window_rolling_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # cast via timestamp so the expression is legal even on TIMESTAMP_NTZ;
    # session TZ pinned UTC → exact epoch s either way
    sec = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias(
            "n_distinct_types"
        ),
    )


# §2.5 completion — the two remaining ANSI window functions without a
# catalog entry: cume_dist (fraction of peers at-or-below) and nth_value
# (the frame's n-th row). cume_dist multiplies to a 1e6 fixed-point
# integer so the hash never touches an engine-ordered float sum.
@query(
    "window_cume_dist_nth",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_e6,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest_order
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value over each sampled customer's orders by
    price: the cumulative-distribution position (n_at_or_below/n as one
    IEEE division, floored to 1e6 fixed point — floor() explicitly,
    because DuckDB's double→BIGINT CAST rounds while Spark's truncates) and the customer's second-cheapest
    order key (full-frame nth_value). Completes §2.5: every ANSI window
    function now has a gated catalog entry. One exchange, both
    functions share the (o_custkey, price) sort."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.cume_dist().over(w) * 1000000).cast("long").alias("cume_e6"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest_order"),
    )
