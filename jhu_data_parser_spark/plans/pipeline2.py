"""Round-2 catalog wave: training-data pipeline operators (batch
sessionization, document chunking, vocabulary build, deterministic
train/test split) and SQL-surface classics (correlated / scalar
subqueries).

Reference parity note: the reference (/root/reference) has none of
these — they belong to the LLM-pipeline extension surface (SURVEY.md
§2.12) and the SQL-over-the-lake surface (§2.1 S6).

Portability discipline (driver hashes Spark vs DuckDB results):
- timestamps → formatted strings before they leave a query
- double sums → scaled-long exact pattern (functions/exprs.py)
- every gap/bucket decision computed on values that are bit-identical
  in both engines (epoch doubles, md5 hex, integer arithmetic)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.functions.exprs import DEC_SUM_SQL, dec_sum
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table, register_views

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_SESSION_GAP_SEC = 1800.0  # 30 min — the classic web-session cutoff


# Batch sessionization — the training-data form of the streaming session
# window (batch_session_windows): split each user's event stream into
# sessions at >30-min silence gaps, one output row per session. The
# gap decision runs on epoch doubles (micros/1e6 — bit-identical in both
# engines); ties on ts break on event_id so lag() order is total.
# At 100 TB: one shuffle on user_id (window partition), then the
# session-number prefix sum and the session agg reuse that partitioning
# — Catalyst collapses both windows + groupBy into one exchange.
@query(
    "events_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > {_SESSION_GAP_SEC}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    )
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {DEC_SUM_SQL('value', 4)} AS total_value
    FROM s GROUP BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")  # NTZ-safe numeric seconds
    prev = F.lag(sec).over(w)
    new_sess = F.when(prev.isNull() | (sec - prev > _SESSION_GAP_SEC), 1).otherwise(0)
    sessions = ev.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", scale=4).alias("total_value"),
    )


_CHUNK_SIZE = 50
_CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


# Document chunking — the tokenize-and-window step that turns a corpus
# into fixed-size training sequences with overlap. All native exprs:
# split → sequence of chunk starts → transform/slice/array_join →
# posexplode. No shuffle at all (pure generate-style projection), so it
# scales with the scan.
@query(
    "text_chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_no,
           array_to_string(list_slice(toks, i * {_CHUNK_STRIDE} + 1,
                                      i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')
             AS chunk_text,
           CAST(len(list_slice(toks, i * {_CHUNK_STRIDE} + 1,
                               i * {_CHUNK_STRIDE} + {_CHUNK_SIZE})) AS INT)
             AS n_tokens
    FROM t, UNNEST(range((len(toks) - 1) // {_CHUNK_STRIDE} + 1)) AS u(i)
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # chunk i exists while i*stride < n_tokens
    starts = F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_STRIDE).cast("int"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, i * _CHUNK_STRIDE + 1, _CHUNK_SIZE), " "
            ).alias("chunk_text"),
            F.size(F.slice(toks, i * _CHUNK_STRIDE + 1, _CHUNK_SIZE)).alias(
                "n_tokens"
            ),
        ),
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_no", "c")
    ).select(
        "doc_id",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


_VOCAB_MIN_COUNT = 5
_VOCAB_TOP_K = 100


# Vocabulary build — the tokenizer-training step: corpus-wide unigram
# counts, min-count floor, top-k by (count desc, term). The top-k cut
# happens via orderBy+limit (TakeOrderedAndProject: per-partition
# partial top-k, no global sort) BEFORE the rank window touches a
# single-partition frame of only k rows — the scale-safe order of
# operations.
@query(
    "text_vocab_topk",
    oracle=f"""
    WITH counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
      WHERE term <> ''
      GROUP BY term
      HAVING COUNT(*) >= {_VOCAB_MIN_COUNT}
    )
    SELECT term, n, CAST(rn AS INT) AS vocab_rank
    FROM (SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rn
          FROM counts)
    WHERE rn <= {_VOCAB_TOP_K}
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _VOCAB_MIN_COUNT)
    )
    topk = counts.orderBy(F.col("n").desc(), "term").limit(_VOCAB_TOP_K)
    w = Window.orderBy(F.col("n").desc(), "term")
    return topk.withColumn("vocab_rank", F.row_number().over(w).cast("int"))


# Deterministic hash-based train/test split — reproducible corpus
# partitioning that survives reshuffles and re-runs (unlike
# df.randomSplit). Bucket = first hex digit of md5(doc_id): digits
# 0-9,a,b,c → train (13/16 ≈ 81%), d,e,f → test. md5 of the SAME string
# renders identical lowercase hex in both engines, so the split is
# bit-portable.
@query(
    "sample_train_test_split",
    oracle="""
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = F.when(bucket < "d", "train").otherwise("test")
    return (
        d.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# --- SQL-surface classics (S6): correlated & scalar subqueries --------------
# Catalyst decorrelates these into joins — the queries assert the SQL
# *surface* (what an Athena user would type), while the physical plan is
# the same join the DataFrame API would build.


# Correlated scalar subquery: orders above their customer's average
# order value (per-customer mean inlined as a decorrelated aggregate).
@query(
    "sql_correlated_above_avg",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT {DEC_SUM_SQL('o2.o_totalprice')} / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def sql_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5) AS LONG)) AS DOUBLE)
                   / 100.0 / COUNT(*)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# TPC-H Q4 shape — EXISTS correlated subquery: count orders per priority
# having at least one lineitem shipped ≥90 days after the order date
# (this star schema has no commit/receipt dates — ship-lag carries the
# same correlated-date-predicate shape). Catalyst rewrites EXISTS → left
# semi join; the oracle runs the equivalent ANSI text.
@query(
    "sql_exists_late_lineitem",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def sql_exists_late_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
        """
    )


# TPC-H Q22 shape — uncorrelated scalar subquery + NOT EXISTS: customers
# with above-average account balance and no orders, grouped by nation
# (this schema has no phone column; nationkey carries the same group
# shape). Exercises scalar-subquery broadcast + anti join.
@query(
    "sql_scalar_sub_no_orders",
    oracle=f"""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           {DEC_SUM_SQL('c_acctbal')} AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT {DEC_SUM_SQL('c_acctbal')} / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def sql_scalar_sub_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_custs,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS LONG)) AS DOUBLE) / 100.0
                 AS total_bal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS LONG)) AS DOUBLE)
                     / 100.0 / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        """
    )


# --- data-quality & time-series wave ----------------------------------------


# Constraint-validation report — the corpus QA gate run before training:
# each rule is a count_if over one scan (single job, no shuffle beyond
# the 1-row agg), melted to one row per rule via stack(). The rules
# themselves are portable ANSI predicates the oracle re-runs.
@query(
    "quality_constraint_report",
    oracle="""
    SELECT 'empty_text' AS rule,
           CAST(COUNT(*) FILTER (WHERE length(text) = 0) AS BIGINT) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'n_chars_drift',
           CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'unknown_lang',
           CAST(COUNT(*) FILTER (WHERE lang NOT IN ('en','es','de','fr','zh','ja'))
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'bad_doc_id',
           CAST(COUNT(*) FILTER (WHERE doc_id IS NULL OR doc_id < 0) AS BIGINT)
    FROM documents
    """,
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    agg = d.agg(
        F.count_if(F.length("text") == 0).alias("empty_text"),
        F.count_if(F.col("n_chars") != F.length("text")).alias("n_chars_drift"),
        F.count_if(
            ~F.col("lang").isin("en", "es", "de", "fr", "zh", "ja")
        ).alias("unknown_lang"),
        F.count_if(F.col("doc_id").isNull() | (F.col("doc_id") < 0)).alias(
            "bad_doc_id"
        ),
    )
    return agg.selectExpr(
        "stack(4, 'empty_text', empty_text, 'n_chars_drift', n_chars_drift, "
        "'unknown_lang', unknown_lang, 'bad_doc_id', bad_doc_id) "
        "AS (rule, n_violations)"
    )


# Time-series gap filling — resample each event_type's daily counts onto
# its full [min_day, max_day] calendar with zeros for silent days (the
# input to any windowed trend model). The day spine is generated from
# the aggregated spans (|types| rows → sequence/explode), never from a
# driver-side loop; the counts join reuses the (type, day) partitioning.
@query(
    "events_fill_gaps",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM counts GROUP BY 1
    ),
    spine AS (
      SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN counts c USING (event_type, day)
    """,
)
def events_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    spans = counts.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    return (
        spine.join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


# Z-score outlier detection with ORACLE-EXACT variance: per-type n, Σx,
# Σx² accumulate as scaled exact integers (value has 2 decimals →
# scale-4 squares stay integral), the float math happens once per GROUP
# in a fixed operation order — so mean/std/z are bit-identical across
# engines and the |z| > 3 cut is portable. The broadcast of the tiny
# per-type stats frame back onto events keeps it one fact-table scan
# per side of the join.
@query(
    "events_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s1,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                 * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s2
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mean,
             sqrt((CAST(s2 AS DOUBLE) / 10000.0
                   - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0)
                     / CAST(n AS DOUBLE))
                  / CAST(n - 1 AS DOUBLE)) AS std
      FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - m.mean) / m.std, 6) AS z
    FROM events e JOIN m USING (event_type)
    WHERE abs((e.value - m.mean) / m.std) > 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scaled = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("s1"),
        F.sum(scaled * scaled).alias("s2"),
    )
    m = stats.select(
        "event_type",
        (F.col("s1").cast("double") / 100.0 / F.col("n").cast("double")).alias("mean"),
        F.sqrt(
            (
                F.col("s2").cast("double") / 10000.0
                - (F.col("s1").cast("double") / 100.0)
                * (F.col("s1").cast("double") / 100.0)
                / F.col("n").cast("double")
            )
            / (F.col("n") - 1).cast("double")
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


# Mergeable-sketch distinct counts (Apache DataSketches HLL via Spark
# built-ins): per-group sketches + a union-merged grand total — the
# partial-aggregation pattern that makes distinct counting feasible at
# 100 TB (sketches merge associatively across partitions/days; exact
# distinct would shuffle every key). Sketch bytes are engine-specific →
# no SQL oracle; the accuracy bound vs exact distinct is pinned in
# tests/test_operators.py.
@query("agg_hll_sketch_merge", oracle=None)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", 14).alias("sketch")
    )
    grand = per_group.agg(
        F.lit("__ALL__").alias("o_orderpriority"),
        F.hll_union_agg("sketch").alias("sketch"),
    )
    return (
        per_group.unionByName(grand)
        .select(
            "o_orderpriority",
            F.hll_sketch_estimate("sketch").alias("approx_distinct_customers"),
        )
    )


# BPE tokenizer TRAINING (text_token_count_bpe applies a BPE-ish rule;
# this learns the merge table from the corpus). Iterative: K small
# shuffles over the |vocab| word table after one corpus-sized pass.
# The driver loop (argmax per round) is not one SQL statement, but with
# a FIXED merge budget each round unrolls into a CTE: words ride as
# \x01-delimited symbol strings (every symbol wrapped, so a literal
# replace() is exactly the greedy non-overlapping left-to-right merge
# fold the Spark operator applies), pair counts come from the split
# symbol list, and the per-round argmax is ORDER BY n DESC, a, b LIMIT 1
# — the operator's exact tie-break. Equivalence to a pure-python
# reference BPE is additionally pinned in tests/test_operators.py.
def _bpe_trainer_parts(num_merges: int = 10, min_word_count: int = 2) -> list[str]:
    """The unrolled training CTE chain (b1..bK hold the per-round merge
    argmax) — shared by the trainer oracle and the encoder oracle."""
    sep = "chr(1)"
    parts = [
        f"""w AS (
      SELECT tok AS w, COUNT(*) AS wc
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY tok HAVING COUNT(*) >= {min_word_count}),
    s0 AS (
      SELECT wc,
             {sep} || array_to_string(
               list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
               {sep} || {sep}) || {sep} AS s
      FROM w)"""
    ]
    for r in range(1, num_merges + 1):
        parts.append(f"""sy{r} AS (
      SELECT wc, string_split(substr(s, 2, length(s) - 2), {sep} || {sep}) AS L
      FROM s{r - 1}),
    p{r} AS (
      SELECT L[g.i] AS a, L[g.i + 1] AS b, SUM(wc) AS n
      FROM sy{r}, LATERAL (SELECT unnest(range(1, len(L))) AS i) g
      GROUP BY 1, 2),
    b{r} AS (SELECT a, b, CAST(n AS BIGINT) AS n FROM p{r}
             ORDER BY n DESC, a, b LIMIT 1),
    s{r} AS (
      SELECT wc, replace(s, {sep} || b{r}.a || {sep} || {sep} || b{r}.b || {sep},
                            {sep} || b{r}.a || b{r}.b || {sep}) AS s
      FROM s{r - 1}, b{r})""")
    return parts


def _bpe_merges_oracle(num_merges: int = 10, min_word_count: int = 2) -> str:
    parts = _bpe_trainer_parts(num_merges, min_word_count)
    unions = "\n    UNION ALL ".join(
        f"""SELECT CAST({r - 1} AS INT) AS merge_rank, a AS "left", b AS "right",
               a || b AS merged, n AS pair_count FROM b{r}"""
        for r in range(1, num_merges + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + unions


@query("text_bpe_train_merges", oracle=_bpe_merges_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.text import bpe_train_merges

    d = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(d, num_merges=10, min_word_count=2)


# RANGE-frame window over event time (not row count): each order sees
# the customer's trailing-30-day spend — the feature-engineering frame
# where row-based frames are wrong (orders per window vary). Both
# engines run the frame over epoch-seconds longs so the boundary
# semantics are identical; the windowed sum itself is a scaled-long
# (exact, order-independent).
@query(
    "window_trailing_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(trailing_cents AS DOUBLE) / 100.0 AS trailing_30d_spend,
           CAST(n_in_window AS BIGINT) AS n_in_window
    FROM (
      SELECT o_orderkey, o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
               AS trailing_cents,
             COUNT(*) OVER w AS n_in_window
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    )
    """,
)
def window_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; the session TZ is
    # pinned UTC so the ltz hop is exact epoch seconds (= DuckDB epoch()).
    epoch_s = F.col("o_orderdate").cast("timestamp_ltz").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_s)
        .rangeBetween(-2592000, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("trailing_30d_spend"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# Per-customer spend trend (OLS slope over day index) with EXACT
# portable arithmetic: x = day index (int), y = cents (long); n, Σx,
# Σy, Σxy, Σx² accumulate as exact integers and the slope divides once
# at the end — bit-identical across engines where a naive regr_slope
# (order-dependent double sums) would hash-mismatch. The
# feature-engineering shape for per-entity model inputs at 100 TB: one
# shuffle on the entity key, everything else map-side.
@query(
    "agg_spend_trend_per_customer",
    oracle="""
    SELECT o_custkey,
           CAST(n AS BIGINT) AS n_days,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 100.0, 6) AS slope_per_day
    FROM (
      SELECT o_custkey,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM (
        SELECT o_custkey,
               CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) AS x,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
        FROM orders GROUP BY o_custkey, datediff('day', TIMESTAMP '1992-01-01', o_orderdate)
      )
      GROUP BY o_custkey
    )
    WHERE n >= 2 AND (n * sxx - sx * sx) <> 0
    """,
)
def agg_spend_trend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("timestamp"))
        .cast("long")
        .alias("x"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("y"))
    s = daily.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) / 100.0
    return (
        s.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        )
        .select(
            "o_custkey",
            F.col("n").alias("n_days"),
            F.round(slope, 6).alias("slope_per_day"),
        )
    )


# TPC-H Q9 shape (profit by nation and year): the widest join in the
# catalog — fact ⋈ part ⋈ supplier ⋈ nation with a pushed-down part
# filter. Both dims broadcast; profit = revenue − retail-cost proxy in
# exact scaled cents; grouping on (nation, year) after the fact-side
# projection narrows to 4 columns. The brand filter prunes parts BEFORE
# the join (PushedFilters on p_brand), so the fact join probes a
# reduced build side — the selective-dim star shape at any scale.
@query(
    "join_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)
                                - p.p_retailprice * l.l_quantity) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_brand <> 'Brand#45'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def join_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#45")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg((F.sum(profit_cents).cast("double") / 100.0).alias("profit"))
    )


# Funnel analysis: how many users complete each prefix of the
# signup → click → purchase sequence IN ORDER. Stage times are per-user
# MINs (one shuffle on user_id); the ordered-prefix test is a pure
# projection over the tiny per-user frame. The classic product-analytics
# query, exactly SQL-portable.
@query(
    "events_funnel_ordered",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
             MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT) AS n_signup,
      CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup)
           AS BIGINT) AS n_signup_click,
      CAST(COUNT(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
                            AND t_purchase > t_click)
           AS BIGINT) AS n_signup_click_purchase
    FROM stages
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    c1 = F.col("t_signup").isNotNull()
    c2 = c1 & (F.col("t_click") > F.col("t_signup"))
    c3 = c2 & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count_if(c1).alias("n_signup"),
        F.count_if(c2).alias("n_signup_click"),
        F.count_if(c3).alias("n_signup_click_purchase"),
    )


# Exact rolling median over a bounded row frame (last 5 orders per
# customer): collect the frame into an array, sort, take the exact
# middle (average of the two middles on even counts, computed in exact
# cents). Median-over-window has no native Spark aggregate; the
# collect+sort form is exact and stays correct because the frame is
# BOUNDED (5 rows) — the pattern for small-frame exact order statistics
# at scale. Oracle: DuckDB's native windowed median (same tie/interp
# semantics on even frames).
@query(
    "window_rolling_median_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(median(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0 AS rolling_median
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_median_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    frame = F.array_sort(F.collect_list(cents).over(w))
    n = F.size(frame)
    median = F.when(
        n % 2 == 1,
        F.element_at(frame, ((n + 1) / 2).cast("int")).cast("double"),
    ).otherwise(
        (
            F.element_at(frame, (n / 2).cast("int"))
            + F.element_at(frame, (n / 2 + 1).cast("int"))
        ).cast("double")
        / 2.0
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (median / 100.0).alias("rolling_median"),
    )
