"""Round-2 second wave: training-batch assembly operators — sequence
packing and weighted corpus sampling.

Reference parity note: the reference (/root/reference) stops at JSON
records; these are LLM-data-pipeline extensions (the step after
dedup/quality-filter: assembling fixed-token-budget training batches
and importance-sampling the corpus).

Oracle discipline: everything is integer-exact or single-expression
double (same IEEE ops in the same order on both engines). The weighted
sampler's keep test compares md5-hex prefixes against a
``printf('%08x', threshold)`` string — byte-identical lowercase
zero-padded hex in Spark (``format_string``) and DuckDB (``printf``),
verified char-for-char, so the Bernoulli draw is bit-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_PACK_BUDGET = 2048  # tokens per training sequence (context window)


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    packed AS (
      SELECT lang, n_tokens,
             (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens)
               // {_PACK_BUDGET} AS pack_id
      FROM toks)
    SELECT lang, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: documents are laid head-to-tail
    in deterministic (lang, doc_id) order and cut into fixed
    token-budget packs — pack_id = floor(preceding-token-total / budget).

    Scale posture: the running sum is windowed PER LANGUAGE (in
    production: per hash-shard), so there is no global sort — each
    partition packs independently, one exchange on the partition key,
    and the pack aggregate reuses that same partitioning (no second
    shuffle). Greedy first-fit packing would be sequential; offset
    packing is the order-preserving distributed equivalent (same
    fill guarantee: every pack except a partition's last holds ≥ budget
    − max_doc_tokens)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(_PACK_BUDGET))
        .cast("long"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


@query(
    "sample_quality_weighted",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, lang, n_tokens
    FROM scored
    WHERE n_tokens >= 512
       OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          < printf('%08x', CAST(FLOOR(
               CAST(LEAST(n_tokens, 512) AS DOUBLE) / 512 * 4294967296)
               AS BIGINT))
    """,
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (importance) corpus sampling: each document is kept with
    probability proportional to its quality weight — here
    min(n_tokens, 512)/512, the long-documents-first curriculum prior —
    via a DETERMINISTIC Bernoulli draw: keep iff the first 8 md5-hex
    chars of doc_id sort below the weight rendered as a hex threshold.

    Unlike ``df.sample`` (seed-dependent, engine-private RNG) this is
    reproducible bit-for-bit across engines, restarts, and partitionings
    — the property a training-data pipeline needs so that re-running a
    sample spec yields the same corpus. Pure codegen: one scan, filter
    pushed to the scan stage, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    draw = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8)
    thresh = F.format_string(
        "%08x",
        F.floor(
            F.least(F.col("n_tokens"), F.lit(512)).cast("double")
            / F.lit(512)
            * F.lit(4294967296.0)
        ).cast("long"),
    )
    # Weight 1.0 must keep EVERY row: floor(1.0·2³²) renders as 9 hex
    # chars ("100000000") while the draw is 8, so the lexicographic
    # compare alone keeps only draws starting with '0' (~1/16). The
    # explicit rate>=1 guard (same pattern as sample_mixture_weights)
    # makes the max-weight branch exact.
    return scored.filter((F.col("n_tokens") >= 512) | (draw < thresh))


_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# Shared session-derivation CTE (identical rules to events_sessionize —
# 30-min gap cutoff; see plans/pipeline2.py).
_SESS_CTE = """
    g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    ),
    sess AS (SELECT user_id, session_no, MIN(ts) AS st, MAX(ts) AS en
             FROM s GROUP BY 1, 2)
"""


@query(
    "events_retention_weekly",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cw
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', CAST(f.cw AS DATE), CAST(a.wk AS DATE)) // 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id) GROUP BY 1, 2
    """,
)
def events_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each later week they return — the table behind every retention
    curve. Two aggregations over the same user_id partitioning (first
    week, distinct active weeks) joined on user_id: Catalyst reuses one
    exchange; nothing is driver-side."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    joined = act.join(first, "user_id")
    return joined.groupBy(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff(F.col("wk").cast("date"), F.col("cw").cast("date")) / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count_distinct("user_id").alias("n_users"))


@query(
    "events_session_concurrency",
    oracle=f"""
    WITH {_SESS_CTE}
    SELECT a.user_id,
           strftime(a.st, '{_TS_FMT_DUCK}') AS session_start,
           CAST(COUNT(b.user_id) AS BIGINT) AS n_concurrent
    FROM sess a LEFT JOIN sess b
      ON b.user_id <> a.user_id AND b.st <= a.en AND a.st <= b.en
    GROUP BY a.user_id, a.st
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join: for every session, how many OTHER
    users' sessions overlap it in time (platform concurrency). The
    naive form is an all-pairs interval predicate — quadratic. The
    scalable rewrite: replicate each interval to the hour buckets it
    spans (``explode(sequence(hour(st), hour(en)))``), equi-join on the
    bucket, and count each overlapping pair exactly ONCE without any
    distinct by keeping only the bucket containing the overlap's start
    (``bucket == hour(greatest(a.st, b.st))`` — that bucket is unique
    and lies in both replication ranges). Replication factor is bounded
    by interval length / bucket width; the oracle is the quadratic
    form, proving the rewrite exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")  # NTZ-safe numeric seconds
    prev = F.lag(sec).over(w)
    new_sess = F.when(prev.isNull() | (sec - prev > 1800.0), 1).otherwise(0)
    sess = (
        ev.withColumn(
            "session_no",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    b = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "st"),
                F.date_trunc("hour", "en"),
                F.expr("interval 1 hour"),
            )
        ),
    )
    left = b.select(
        F.col("user_id").alias("ua"),
        F.col("st").alias("sa"),
        F.col("en").alias("ea"),
        "bucket",
    )
    right = b.select(
        F.col("user_id").alias("ub"),
        F.col("st").alias("sb"),
        F.col("en").alias("eb"),
        "bucket",
    )
    pairs = left.join(
        right,
        (left.bucket == right.bucket)
        & (F.col("ua") != F.col("ub"))
        & (F.col("sb") <= F.col("ea"))
        & (F.col("sa") <= F.col("eb"))
        & (left.bucket == F.date_trunc("hour", F.greatest("sa", "sb"))),
    )
    counts = pairs.groupBy("ua", "sa").agg(F.count(F.lit(1)).alias("n_concurrent"))
    return (
        sess.join(
            counts,
            (sess.user_id == counts.ua) & (sess.st == counts.sa),
            "left",
        )
        .select(
            "user_id",
            F.date_format("st", _TS_FMT).alias("session_start"),
            F.coalesce("n_concurrent", F.lit(0)).alias("n_concurrent"),
        )
    )


@query(
    "events_session_concurrency_sweep",
    oracle=f"""
    WITH {_SESS_CTE}
    SELECT a.user_id,
           strftime(a.st, '{_TS_FMT_DUCK}') AS session_start,
           CAST(COUNT(b.user_id) AS BIGINT) AS n_concurrent
    FROM sess a LEFT JOIN sess b
      ON b.user_id <> a.user_id AND b.st <= a.en AND a.st <= b.en
    GROUP BY a.user_id, a.st
    """,
)
def events_session_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same concurrency numbers as ``events_session_concurrency``
    (identical quadratic oracle) WITHOUT materializing overlap pairs:
    sweep-line rank arithmetic via a distributed two-level prefix sum
    (operators/intervals.py). Work is linear in session count — immune
    to the ~100× pair-density blowup the bucketed join showed in the
    10× scaling series (PLANS.md round-2c)."""
    from jhu_data_parser_spark.operators.intervals import session_overlap_counts

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")  # NTZ-safe numeric seconds
    prev = F.lag(sec).over(w)
    new_sess = F.when(prev.isNull() | (sec - prev > 1800.0), 1).otherwise(0)
    sess = (
        ev.withColumn(
            "session_no",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    out = session_overlap_counts(sess, key_cols=["user_id", "session_no"])
    return out.select(
        "user_id",
        F.date_format("st", _TS_FMT).alias("session_start"),
        "n_concurrent",
    )


_MIX_RATE_SQL = """CASE WHEN source IN ('src0','src1','src2','src3') THEN 1.0
             WHEN source IN ('src4','src5','src6','src7') THEN 0.5
             ELSE 0.2 END"""


@query(
    "sample_mixture_weights",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source, ({_MIX_RATE_SQL}) AS rate FROM documents),
    kept AS (
      SELECT doc_id, source FROM rated
      WHERE rate >= 1.0
         OR md5('mix:' || CAST(doc_id AS VARCHAR))[1:8]
            < printf('%08x', CAST(FLOOR(rate * 4294967296) AS BIGINT)))
    SELECT r.source,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM rated r LEFT JOIN kept k ON r.doc_id = k.doc_id
    GROUP BY r.source
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing for pretraining: each source is downsampled at its
    mixture rate (full web-quality sources at 1.0, mid at 0.5, tail at
    0.2) with the same deterministic md5-threshold Bernoulli draw as
    ``sample_quality_weighted`` (salted 'mix:' so the two samples are
    independent). Returns the per-source audit (kept vs total) a
    mixture spec review needs. One scan + one k-group agg; the draw is
    reproducible across engines and re-runs, so the mixture is an
    artifact of the SPEC, not of a seed."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rate = F.expr(_MIX_RATE_SQL)
    draw = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")).cast("binary")),
        1,
        8,
    )
    thresh = F.format_string(
        "%08x", F.floor(rate * F.lit(4294967296.0)).cast("long")
    )
    kept = F.when((rate >= 1.0) | (draw < thresh), F.lit(1)).otherwise(F.lit(0))
    return d.groupBy("source").agg(
        F.sum(kept).cast("long").alias("n_kept"),
        F.count(F.lit(1)).alias("n_total"),
    )
