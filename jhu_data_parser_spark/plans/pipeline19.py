"""Catalog waves 34-41 — round 11: substring-span dedup, mergeable
sketches (quantile histograms, covariance moments, PCA), preference-
pair audits, statistical sampling, and their incremental/stream twins.

The two anchor families close the r10 verdict's "next" items 3 and 4:

- ``dedup_substring_spans`` / ``dedup_substring_excision`` — exact
  cross-document substring duplication with POSITIONS: the span
  listing (where is the duplicated run in each doc) and the excision
  accounting (tokens removed per language after merging overlapping
  spans on the later doc). The existing span family
  (``dedup_shared_span_pairs``, plans/pipeline5.py) reports per-PAIR
  summaries; surgical span REMOVAL — the "deduplicating training
  data" exact-substring pass — needs the spans themselves.
- ``agg_quantile_sketch_merge`` / ``agg_quantile_sketch_tokens`` — a
  MERGEABLE quantile sketch completing the sketch family (CMS/KMV/HLL
  exist; ``agg_approx_percentile`` is rows-only because Spark's
  ``approx_percentile`` internals are engine-private): fixed-width
  integer-bucket histograms whose merge is ADDITION (associative +
  commutative), built per leaf partition (nation / source), merged up
  a level in-plan, and queried with integer-exact rank thresholds —
  every step replays bit-for-bit in DuckDB, unlike any
  engine-private sketch. ``tests/test_wave16.py`` pins merge-of-leaf
  ≡ direct-global equivalence, the defining sketch property.

Reference parity note: the reference (/root/reference) has no dedup or
sketch surface — [extension] operators (SURVEY.md §2.12).

Oracle discipline: positions/lengths/counts are BIGINT end-to-end; the
only doubles touched are ``floor(o_totalprice)`` where both engines
floor the same IEEE double; quantile rank thresholds are integer
cross-multiplications (``cum*den >= n*num``), never a double ``ceil``.

Scale posture: spans — exact-collapse kills the verbatim-copy blowup,
the df gate bounds gram-bucket fanout, the pair join is the banded
equi-join shape, and the islands window partitions by (pair, diagonal)
— no global sort anywhere; excision merges intervals per DOC before
the corpus-sized join (|affected| rows join |docs|). Sketches — two
hash aggregations (leaf, merge) + one per-group cumulative window over
≤ a few hundred buckets per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators import dedup as dd
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Substring-span dedup (positions + lengths).
# --------------------------------------------------------------------------

_SUB_K = 8  # seed gram width (tokens) — matches the SHINGLE8 family
_SUB_MIN_SPAN = 12  # report spans strictly longer than one seed
_SUB_DF_CAP = 16  # gram doc-frequency gate (boilerplate stoplist contract)

# Shared CTE chain: the DuckDB replay of operators/dedup.substring_spans
# (exact-collapse by text ≡ the Spark 192-bit-hash collapse; positional
# 8-grams; df gate; pair seeds; diagonal gaps-and-islands).
_SPANS_CTE = f"""
    t AS (
      SELECT MIN(doc_id) AS doc_id,
             arg_min(lang, doc_id) AS lang,
             string_split(lower(text), ' ') AS toks,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok
      FROM documents WHERE length(text) > 0
      GROUP BY text
      HAVING len(string_split(lower(text), ' ')) >= {_SUB_K}),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             substr(md5(array_to_string(toks[i:i+{_SUB_K - 1}], ' ')), 1, 16)
               AS gh
      FROM t, unnest(generate_series(1, len(toks) - {_SUB_K - 1})) u(i)),
    mg AS (
      SELECT gh FROM g GROUP BY gh
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_SUB_DF_CAP}),
    s AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, b.pos AS pos_b
      FROM g a JOIN mg USING (gh) JOIN g b USING (gh)
      WHERE a.doc_id < b.doc_id),
    isl AS (
      SELECT *, pos_a - row_number() OVER (
                  PARTITION BY doc_a, doc_b, pos_a - pos_b
                  ORDER BY pos_a) AS grp
      FROM s),
    spans AS (
      SELECT doc_a, doc_b,
             CAST(MIN(pos_a) AS BIGINT) AS start_a,
             CAST(MIN(pos_b) AS BIGINT) AS start_b,
             CAST(MAX(pos_a) - MIN(pos_a) + {_SUB_K} AS BIGINT) AS span_len
      FROM isl GROUP BY doc_a, doc_b, pos_a - pos_b, grp),
    fspans AS (SELECT * FROM spans WHERE span_len >= {_SUB_MIN_SPAN})
"""

_SPANS_ORACLE = f"""
    WITH {_SPANS_CTE}
    SELECT doc_a, doc_b, start_a, start_b, span_len
    FROM fspans
    ORDER BY span_len DESC, doc_a, doc_b, start_a, start_b
    LIMIT 50
"""


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return dd.substring_spans(
        d, k=_SUB_K, min_span=_SUB_MIN_SPAN, df_cap=_SUB_DF_CAP
    )


@query("dedup_substring_spans", oracle=_SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest exactly-duplicated cross-document token spans WITH
    positions: top-50 by length over all maximal spans of >= 12 tokens
    between distinct-text representatives — the span listing the
    exact-substring dedup pass excises (see
    :func:`jhu_data_parser_spark.operators.dedup.substring_spans` for
    the plan shape; contract-bounded shortlist per the pair-LISTING
    discipline — the unbounded span set feeds the excision aggregate
    below, never a user-facing listing)."""
    return (
        _spans(spark, sf_dir)
        .orderBy(
            F.desc("span_len"), "doc_a", "doc_b", "start_a", "start_b"
        )
        .limit(50)
    )


_EXCISION_ORACLE = f"""
    WITH {_SPANS_CTE},
    iv AS (
      SELECT DISTINCT doc_b AS doc_id, start_b AS s,
             start_b + span_len - 1 AS e
      FROM fspans),
    m AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  CAST(-1 AS BIGINT))
                  THEN 1 ELSE 0 END AS new_isl
      FROM iv),
    m2 AS (
      SELECT *, SUM(new_isl) OVER (
                  PARTITION BY doc_id ORDER BY s, e
                  ROWS UNBOUNDED PRECEDING) AS grp
      FROM m),
    mer AS (
      SELECT doc_id, grp, MAX(e) - MIN(s) + 1 AS seg
      FROM m2 GROUP BY doc_id, grp),
    rem AS (
      SELECT doc_id, CAST(SUM(seg) AS BIGINT) AS removed
      FROM mer GROUP BY doc_id)
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_affected,
           CAST(SUM(rem.removed) AS BIGINT) AS tokens_removed,
           CAST(SUM(t.ntok - rem.removed) AS BIGINT) AS tokens_kept
    FROM rem JOIN t USING (doc_id)
    GROUP BY t.lang
"""


@query("dedup_substring_excision", oracle=_EXCISION_ORACLE)
def dedup_substring_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal accounting: on each span's LATER doc (the one an
    excision pass would cut), overlapping/adjacent span intervals are
    merged per doc (gaps-and-islands on the running max end — the
    same window idiom as the span recovery itself, partitioned by
    doc), then rolled up per language: affected docs, tokens removed,
    tokens kept. Interval merge runs per-DOC before the join back to
    the representative table, so the join is |affected docs| rows
    against |docs| — never |spans| against the corpus."""
    spans = _spans(spark, sf_dir)
    iv = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_len") - 1).alias("e"),
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.withColumn(
        "new_isl",
        F.when(
            F.col("s") > F.coalesce(prev_max_e, F.lit(-1).cast("long")), 1
        ).otherwise(0),
    ).withColumn(
        "grp", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    rem = (
        m.groupBy("doc_id", "grp")
        .agg((F.max("e") - F.min("s") + 1).alias("seg"))
        .groupBy("doc_id")
        .agg(F.sum("seg").cast("long").alias("removed"))
    )
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = dd.substring_reps(d, k=_SUB_K).select("doc_id", "lang", "ntok")
    return (
        rem.join(t, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_affected"),
            F.sum("removed").cast("long").alias("tokens_removed"),
            F.sum(F.col("ntok") - F.col("removed"))
            .cast("long")
            .alias("tokens_kept"),
        )
    )


# --------------------------------------------------------------------------
# Mergeable quantile sketch: fixed-width integer-bucket histograms.
#
# The sketch for one group is the map {bucket -> count}; merge of two
# sketches is entrywise ADDITION — associative and commutative, so any
# partial build (per executor, per partition, per day) merges to the
# exact same sketch as a single global build (tests/test_wave16.py
# pins this). Quantile query: the smallest bucket whose cumulative
# count reaches rank ceil(q*n), reported as the bucket's inclusive
# upper bound — a deterministic integer, so unlike engine-private
# KLL/GK sketches every value replays exactly in ANSI SQL. Accuracy is
# ±width by construction (rank-exact, value rounded up to a boundary).
# --------------------------------------------------------------------------

_QS_WIDTH = 1000  # whole-dollar bucket width for o_totalprice
_QS_QUANTS = ((50, "q50_est"), (90, "q90_est"), (99, "q99_est"))


_QS_MERGE_ORACLE = f"""
    WITH v AS (
      SELECT r_name AS region_name, n_name AS nation_name,
             CAST(floor(o_totalprice) AS BIGINT) // {_QS_WIDTH} AS bucket
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    leaf AS (
      SELECT region_name, nation_name, bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2, 3),
    merged AS (
      SELECT region_name, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM leaf GROUP BY 1, 2),
    cum AS (
      SELECT *,
             CAST(SUM(cnt) OVER (PARTITION BY region_name ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY region_name) AS BIGINT) AS n
      FROM merged)
    SELECT region_name,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum * 100 >= n * {q} "
               f"THEN (bucket + 1) * {_QS_WIDTH} END) AS BIGINT) AS {alias}"
               for q, alias in _QS_QUANTS
           )}
    FROM cum GROUP BY region_name
"""


def _order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.expr(
                f"CAST(floor(o_totalprice) AS BIGINT) DIV {_QS_WIDTH}"
            ).alias("bucket"),
        )
    )


def _sketch_quantiles(
    merged: DataFrame, group_col: str, width: int, quants, n_alias: str
) -> DataFrame:
    """Quantile query over a merged {group, bucket, cnt} sketch:
    per-group cumulative counts (window over <= a few hundred bucket
    rows per group — bounded by value range / width, not by data
    size), then integer-exact rank thresholds via cross-multiplication
    (cum * 100 >= n * q  <=>  cum >= ceil(n*q/100) for integer cum)."""
    wg = Window.partitionBy(group_col).orderBy("bucket")
    cum = merged.withColumn(
        "cum", F.sum("cnt").over(wg.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("n", F.sum("cnt").over(Window.partitionBy(group_col)))
    aggs = [F.max("n").cast("long").alias(n_alias)]
    for q, alias in quants:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("n") * q,
                    (F.col("bucket") + 1) * width,
                )
            )
            .cast("long")
            .alias(alias)
        )
    return cum.groupBy(group_col).agg(*aggs)


@query("agg_quantile_sketch_merge", oracle=_QS_MERGE_ORACLE)
def agg_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-level order-value quantiles from MERGED per-nation
    histogram sketches: leaf sketches (one hash aggregation per
    (nation, bucket)) merge by addition into region sketches (second
    hash aggregation — the in-plan proof the sketch is mergeable),
    then integer-exact rank selection reports q50/q90/q99 upper
    bounds. Dims broadcast; the only window runs over bucket rows
    (≤ ~500 per region at any scale — the histogram's size is set by
    the value range, not the row count)."""
    leaf = (
        _order_buckets(spark, sf_dir)
        .groupBy("region_name", "nation_name", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    merged = (
        leaf.groupBy("region_name", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return _sketch_quantiles(
        merged, "region_name", _QS_WIDTH, _QS_QUANTS, "n_orders"
    )


_QT_WIDTH = 8  # token-count bucket width for documents
_QT_QUANTS = ((25, "q25_est"), (50, "q50_est"), (95, "q95_est"))

_QS_TOKENS_ORACLE = f"""
    WITH v AS (
      SELECT lang, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) // {_QT_WIDTH}
               AS bucket
      FROM documents WHERE length(text) > 0),
    leaf AS (
      SELECT lang, source, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2, 3),
    merged AS (
      SELECT lang, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM leaf GROUP BY 1, 2),
    cum AS (
      SELECT *,
             CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM merged)
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum * 100 >= n * {q} "
               f"THEN (bucket + 1) * {_QT_WIDTH} END) AS BIGINT) AS {alias}"
               for q, alias in _QT_QUANTS
           )}
    FROM cum GROUP BY lang
"""


@query("agg_quantile_sketch_tokens", oracle=_QS_TOKENS_ORACLE)
def agg_quantile_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document token-count quantiles from merged
    per-(lang, source) histogram sketches — the same mergeable-sketch
    shape as ``agg_quantile_sketch_merge`` applied to the curation
    table every length-filter decision reads (whitespace token count,
    the exact quantity the Gopher gates threshold)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    v = d.select(
        "lang",
        "source",
        F.expr(
            f"CAST(size(split(text, ' ')) AS BIGINT) DIV {_QT_WIDTH}"
        ).alias("bucket"),
    )
    leaf = v.groupBy("lang", "source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    merged = leaf.groupBy("lang", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    return _sketch_quantiles(merged, "lang", _QT_WIDTH, _QT_QUANTS, "n_docs")


@query("stream_quantile_sketch_tokens", oracle=_QS_TOKENS_ORACLE)
def stream_quantile_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram sketch as a REAL stream (shares the batch
    query's oracle — stream ≡ batch ≡ SQL is the mergeability claim);
    see streaming/jobs.run_quantile_sketch_stream."""
    from jhu_data_parser_spark.streaming.jobs import run_quantile_sketch_stream

    return run_quantile_sketch_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# Exact embedding covariance from mergeable integer moments — the
# second-moment analogue of the histogram sketch (PCA/whitening is the
# standard pre-step for SemDeDup-style embedding dedup): each Arrow
# batch contributes one D×D int64 Gram partial (numpy matmul — the
# vectorized-Python rule), partials merge by ADDITION, and covariance
# derives from the merged moments as n·Sxy − Sx·Sy with one fixed IEEE
# chain over exact integers (the Pearson discipline, pipeline17).
# --------------------------------------------------------------------------

_COV_SCALE = 100_000  # element fixed point; Σ(scale·x)² safe to ~3e9 rows
_COV_DIM = 64

# One fixed IEEE chain over exact integer moments (identical text both
# engines): covariance scaled to 1e9 fixed point. scale² = 1e10.
_COV_EXPR = (
    "CAST(floor(1000000000.0 * ("
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000000000.0)"
    ")) AS BIGINT)"
)

_COV_CTE = f"""
    f AS (
      SELECT list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {_COV_SCALE}) AS BIGINT))
               AS fp
      FROM embeddings),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
    s1 AS (
      SELECT i, CAST(SUM(fp[i]) AS BIGINT) AS sx
      FROM f, range(1, {_COV_DIM + 1}) t(i) GROUP BY i),
    s2 AS (
      SELECT i, j, CAST(SUM(fp[i] * fp[j]) AS BIGINT) AS sxy
      FROM f, range(1, {_COV_DIM + 1}) t(i), range(1, {_COV_DIM + 1}) u(j)
      WHERE i <= j GROUP BY i, j),
    cov AS (
      SELECT i, j, {_COV_EXPR} AS cov_fp
      FROM (SELECT s2.i AS i, s2.j AS j, s2.sxy AS sxy,
                   a.sx AS sx, b.sx AS sy, nn.n AS n
            FROM s2
            JOIN s1 a ON a.i = s2.i
            JOIN s1 b ON b.i = s2.j
            CROSS JOIN nn) v)
"""


def _cov_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    mom = sim.embedding_moment_partials(emb, scale=_COV_SCALE)
    n_row = mom.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    s1 = mom.filter((F.col("j") == -1) & (F.col("i") > 0)).select(
        "i", F.col("s").alias("sx")
    )
    s2 = mom.filter(F.col("j") > 0).select("i", "j", F.col("s").alias("sxy"))
    return (
        s2.join(F.broadcast(s1), "i")
        .join(
            F.broadcast(
                s1.select(F.col("i").alias("j"), F.col("sx").alias("sy"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n_row))
        .select("i", "j", F.expr(_COV_EXPR).alias("cov_fp"))
    )


_COV_SPECTRUM_ORACLE = f"""
    WITH {_COV_CTE}
    SELECT i AS dim, cov_fp AS var_fp FROM cov WHERE i = j
"""


@query("embed_covariance_spectrum", oracle=_COV_SPECTRUM_ORACLE)
def embed_covariance_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-dimension embedding variance (1e9 fixed point) from
    the merged integer moments — the diagonal of the covariance; the
    table a whitening/Matryoshka-truncation decision reads. One
    Arrow-batched moment pass + one (i, j) merge; every downstream
    row count is D-bounded (≤ 64 here), never corpus-bounded."""
    return _cov_table(spark, sf_dir).filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"), F.col("cov_fp").alias("var_fp")
    )


_COV_TOPK_ORACLE = f"""
    WITH {_COV_CTE}
    SELECT i AS dim_i, j AS dim_j, cov_fp
    FROM cov WHERE i < j
    ORDER BY abs(cov_fp) DESC, i, j LIMIT 20
"""


@query("embed_covariance_topk", oracle=_COV_TOPK_ORACLE)
def embed_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-correlated off-diagonal dimension pairs by |cov|
    (signed value reported) — the entries an OPQ-style rotation or
    feature-decorrelation audit looks at first. Same moment table as
    the spectrum; the top-k orders a D(D−1)/2-row table (2016 rows at
    D = 64 — constant in corpus size)."""
    c = _cov_table(spark, sf_dir).filter(F.col("i") < F.col("j"))
    return (
        c.orderBy(F.abs(F.col("cov_fp")).desc(), "i", "j")
        .limit(20)
        .select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            "cov_fp",
        )
    )


# --------------------------------------------------------------------------
# Daily event-value quantiles — an event-time consumer of the same
# mergeable histogram: leaves per (day, event_type, bucket) merge to
# (day, bucket), quantiles per day. The leaf level is exactly what a
# per-hour/per-executor partial build would sink; the merge proves the
# day readout is independent of how the partials were cut.
# --------------------------------------------------------------------------

_QE_WIDTH = 10  # whole-value bucket width for events.value
_QE_QUANTS = ((50, "q50_est"), (95, "q95_est"))

_QE_DAILY_ORACLE = f"""
    WITH v AS (
      SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(floor(value / {_QE_WIDTH}) AS BIGINT) AS bucket
      FROM events),
    leaf AS (
      SELECT day, event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2, 3),
    merged AS (
      SELECT day, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM leaf GROUP BY 1, 2),
    cum AS (
      SELECT *,
             CAST(SUM(cnt) OVER (PARTITION BY day ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
      FROM merged)
    SELECT CAST(day AS BIGINT) AS day,
           CAST(MAX(n) AS BIGINT) AS n_events,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum * 100 >= n * {q} "
               f"THEN (bucket + 1) * {_QE_WIDTH} END) AS BIGINT) AS {alias}"
               for q, alias in _QE_QUANTS
           )}
    FROM cum GROUP BY 1
"""


@query("events_value_quantiles_daily", oracle=_QE_DAILY_ORACLE)
def events_value_quantiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event-value quantile estimates from merged (day,
    event_type) histogram leaves — the event-time consumer of the
    mergeable sketch (day derived by pure micros integer arithmetic;
    no engine TZ involved)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        "event_type",
        # floor(value / W), NOT floor(value) DIV W: integer DIV truncates
        # toward zero (Spark) while DuckDB // floors — they diverge on
        # negative values. floor-division is identical in both engines
        # for any sign (and equals the old form on the nonneg fixture).
        F.expr(f"CAST(floor(value / {_QE_WIDTH}) AS BIGINT)").alias(
            "bucket"
        ),
    )
    leaf = v.groupBy("day", "event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    merged = leaf.groupBy("day", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    out = _sketch_quantiles(merged, "day", _QE_WIDTH, _QE_QUANTS, "n_events")
    return out.select(
        F.col("day").cast("long").alias("day"),
        "n_events",
        *[alias for _q, alias in _QE_QUANTS],
    )


# --------------------------------------------------------------------------
# ROUGE-style exact bigram overlap for preference pairs — the lexical-
# closeness audit of the DPO input table (a chosen/rejected pair that
# is a near-copy teaches nothing and hints at reward hacking): per
# best-vs-rest pair, the MULTISET bigram intersection (Σ least(count_a,
# count_b) — clipped counts, the ROUGE definition) plus both totals
# and an integer-milli recall. All counts exact; the pair table is
# |corpus|-bounded (each doc is rejected in at most one pair), and the
# gram join runs pair-constrained — pairs pick up the CHOSEN doc's
# bigram counts first, then equi-join on (rejected_doc, gram): rows
# stay linear in corpus grams end-to-end, never |pairs| × vocabulary.
# --------------------------------------------------------------------------

def _rouge_oracle() -> str:
    # the pair definition is pipeline18's best-vs-rest table, verbatim —
    # one source of truth for what a "preference pair" is
    from jhu_data_parser_spark.plans.pipeline18 import _CAND_DUCK

    return f"""
    WITH c AS ({_CAND_DUCK}),
    ch AS (
      SELECT prompt_id, doc_id AS chosen_doc_id
      FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score DESC, doc_id ASC) AS rk FROM c)
      WHERE rk = 1),
    pairs AS (
      SELECT c.prompt_id, ch.chosen_doc_id, c.doc_id AS rejected_doc_id
      FROM c JOIN ch ON c.prompt_id = ch.prompt_id
      WHERE c.doc_id <> ch.chosen_doc_id),
    tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents WHERE length(text) > 0),
    bg AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        FROM tk, unnest(generate_series(1, greatest(len(t) - 1, 0))) u(i))
      GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM bg GROUP BY 1),
    ov AS (
      SELECT p.prompt_id, p.chosen_doc_id, p.rejected_doc_id,
             CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS n_overlap
      FROM pairs p
      JOIN bg a ON a.doc_id = p.chosen_doc_id
      JOIN bg b ON b.doc_id = p.rejected_doc_id AND b.g = a.g
      GROUP BY 1, 2, 3)
    SELECT p.prompt_id, p.chosen_doc_id, p.rejected_doc_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(COALESCE(tc.n, 0) AS BIGINT) AS n_chosen_bigrams,
           CAST(COALESCE(tr.n, 0) AS BIGINT) AS n_rejected_bigrams,
           CAST(CASE WHEN COALESCE(tc.n, 0) > 0
                THEN (1000 * COALESCE(ov.n_overlap, 0)) // tc.n
                END AS BIGINT) AS rouge2_recall_milli
    FROM pairs p
    LEFT JOIN ov ON ov.prompt_id = p.prompt_id
               AND ov.chosen_doc_id = p.chosen_doc_id
               AND ov.rejected_doc_id = p.rejected_doc_id
    LEFT JOIN tot tc ON tc.doc_id = p.chosen_doc_id
    LEFT JOIN tot tr ON tr.doc_id = p.rejected_doc_id
    """


_BIGRAMS_SQL = (
    "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
    "i -> array_join(slice(t, i, 2), ' ')) "
    "ELSE CAST(array() AS array<string>) END"
)


@query("pairs_rouge_bigram", oracle=_rouge_oracle())
def pairs_rouge_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact clipped-bigram (ROUGE-2-style) overlap per preference
    pair: Σ least(count_chosen, count_rejected) over shared bigrams,
    both totals, and integer-milli recall against the chosen text.
    Plan: one per-doc clipped-count table (explode + hash aggregate,
    grams crossing the shuffle as 8-byte xxhash64 keys, never text),
    then ONE equi-join on (prompt group, gram hash) where only the
    CHOSEN side expands to gram rows (|groups| x grams — group-size
    times smaller than expanding every pair; measured 62 -> 11 s at
    100x against the per-pair expansion) and the rejected side is the
    count table itself with its group id derived in place. Per-key
    skew is bounded by the group size; the pair table is
    |corpus|-bounded (each doc is rejected in at most one best-vs-rest
    pair); totals are size(t)-1 arithmetic, no aggregation."""
    from jhu_data_parser_spark.plans.pipeline18 import _GROUP, _pref_pairs

    pairs = _pref_pairs(spark, sf_dir).select(
        "prompt_id", "chosen_doc_id", "rejected_doc_id"
    )
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tk = d.select("doc_id", F.split(F.lower("text"), " ").alias("t"))
    # per-doc clipped-count table; the gram crosses the shuffle as an
    # 8-byte xxhash64, never text (engine-internal key only — the
    # oracle compares final counts, and a within-pair collision needs
    # two of a doc's ~|text| grams to agree on 64 bits)
    def _gram_counts(docs: DataFrame) -> DataFrame:
        return (
            docs.select("doc_id", F.explode(F.expr(_BIGRAMS_SQL)).alias("g"))
            .groupBy("doc_id", F.xxhash64("g").alias("gh"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    # total bigram mass needs no aggregation: it is exactly size(t)-1
    tot = tk.select(
        "doc_id",
        F.greatest(F.size("t") - 1, F.lit(0)).cast("long").alias("n"),
    )
    # The clip join runs per (prompt group, gram): only the CHOSEN
    # side expands to gram rows keyed by group, and its count table is
    # built from the 1/group_size chosen-doc subset (semi-join BEFORE
    # the explode — building the full table twice was the measured
    # cost center); the rejected side is the full count table with its
    # group id derived in place. shuffle_hash on the small side keeps
    # the 25M-row big side from sorting (SMJ's sort was the other
    # half); per-key skew is bounded by the group size, and the
    # (prompt, chosen, rejected) aggregate partial-combines map-side.
    ch = pairs.select("prompt_id", "chosen_doc_id").distinct()
    tkc = tk.join(
        ch.select(F.col("chosen_doc_id").alias("doc_id")), "doc_id", "semi"
    )
    cg = (
        _gram_counts(tkc)
        .withColumnRenamed("doc_id", "chosen_doc_id")
        .withColumn("prompt_id", F.expr(f"chosen_doc_id DIV {_GROUP}"))
        .withColumnRenamed("c", "ca")
    )
    bgb = _gram_counts(tk).withColumn(
        "prompt_id", F.expr(f"doc_id DIV {_GROUP}")
    )
    ov = (
        bgb.join(cg.hint("shuffle_hash"), ["prompt_id", "gh"])
        .filter(F.col("doc_id") != F.col("chosen_doc_id"))
        .groupBy(
            "prompt_id",
            "chosen_doc_id",
            F.col("doc_id").alias("rejected_doc_id"),
        )
        .agg(F.sum(F.least("ca", "c")).cast("long").alias("n_overlap"))
    )
    tc = tot.select(
        F.col("doc_id").alias("chosen_doc_id"), F.col("n").alias("nc")
    )
    tr = tot.select(
        F.col("doc_id").alias("rejected_doc_id"), F.col("n").alias("nr")
    )
    return (
        pairs.join(
            ov, ["prompt_id", "chosen_doc_id", "rejected_doc_id"], "left"
        )
        .join(tc, "chosen_doc_id", "left")
        .join(tr, "rejected_doc_id", "left")
        .select(
            "prompt_id",
            "chosen_doc_id",
            "rejected_doc_id",
            F.coalesce("n_overlap", F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            F.coalesce("nc", F.lit(0)).cast("long").alias("n_chosen_bigrams"),
            F.coalesce("nr", F.lit(0))
            .cast("long")
            .alias("n_rejected_bigrams"),
            F.when(
                F.coalesce("nc", F.lit(0)) > 0,
                F.expr("(1000 * coalesce(n_overlap, 0)) DIV nc"),
            )
            .cast("long")
            .alias("rouge2_recall_milli"),
        )
    )


# --------------------------------------------------------------------------
# Dominant principal direction by fixed-point power iteration over the
# merged covariance — the PCA step on top of the moment sketch, kept
# ORACLE-PAIRABLE (unlike any float eigen-solver): the matvec is exact
# int64 (|cov_fp·v| ≤ 64·2.5e8·1000 ≈ 1.6e13), the per-iteration
# renormalization is one floor(u·1000/max|u|) double op over exact
# integers (bit-identical IEEE in both engines), and the iteration
# count is fixed (6) — determinism by construction, convergence a
# quality property rather than a correctness requirement. Everything
# after the corpus scan is D- or D²-bounded.
# --------------------------------------------------------------------------

_PCA_ITERS = 6


def _pca_oracle() -> str:
    ctes = [
        f"full_c AS (SELECT i, j, cov_fp FROM cov UNION ALL "
        f"SELECT j, i, cov_fp FROM cov WHERE i < j)",
        f"v0 AS (SELECT i AS dim, CAST(1000 AS BIGINT) AS v "
        f"FROM range(1, {_COV_DIM + 1}) t(i))",
    ]
    for k in range(1, _PCA_ITERS + 1):
        # MATERIALIZED: each vK is referenced twice by vK+1 (values +
        # the max-abs subquery) — default inlining grows 2^iters
        ctes.append(
            f"u{k} AS MATERIALIZED ("
            f"SELECT c.i AS dim, CAST(SUM(c.cov_fp * v.v) AS BIGINT) AS u "
            f"FROM full_c c JOIN v{k - 1} v ON v.dim = c.j GROUP BY 1)"
        )
        ctes.append(
            f"v{k} AS MATERIALIZED ("
            f"SELECT dim, CAST(floor(u * 1000.0 / "
            f"(SELECT greatest(MAX(abs(u)), 1) FROM u{k})) AS BIGINT) AS v "
            f"FROM u{k})"
        )
    return (
        f"WITH {_COV_CTE}, "
        + ", ".join(ctes)
        + f" SELECT CAST(dim AS INT) AS dim, v AS v_milli FROM v{_PCA_ITERS}"
    )


@query("embed_pca_power_direction", oracle=_pca_oracle())
def embed_pca_power_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant covariance eigendirection (milli fixed point, 64 rows)
    after 6 deterministic power iterations from the all-ones start —
    the direction a PCA-whitening or Matryoshka-rotation step would
    remove first. Each iteration is a D²-row join + D-row aggregate
    (tiny, lazily checkpointed to keep the lineage flat); the only
    corpus-sized work is the one moment-partial scan underneath
    ``_cov_table``."""
    cov = _cov_table(spark, sf_dir)
    mirror = cov.filter(F.col("i") < F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "cov_fp"
    )
    # checkpoint the D²-row matrix once: every iteration's matvec
    # references it, and without the cut the corpus-sized moment scan
    # underneath re-runs per iteration (measured 12.2 → 6.4 s at 100×)
    full_c = (
        cov.select("i", "j", "cov_fp")
        .unionByName(mirror)
        .localCheckpoint(eager=False)
    )
    v = spark.range(1, _COV_DIM + 1).select(
        F.col("id").cast("int").alias("dim"),
        F.lit(1000).cast("long").alias("v"),
    )
    for _ in range(_PCA_ITERS):
        u = (
            full_c.join(v, full_c["j"] == v["dim"])
            .groupBy(full_c["i"].alias("dim"))
            .agg(F.sum(F.col("cov_fp") * F.col("v")).cast("long").alias("u"))
        )
        m = u.agg(
            F.greatest(F.max(F.abs(F.col("u"))), F.lit(1))
            .cast("long")
            .alias("m")
        )
        v = (
            u.crossJoin(F.broadcast(m))
            .select(
                "dim",
                F.expr("CAST(floor(u * 1000.0 / m) AS BIGINT)").alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    return v.select(F.col("dim").cast("int").alias("dim"), F.col("v").alias("v_milli"))


# --------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution — completes the
# attribution family (first/last/linear exist): 40% first, 40% last,
# 20% shared by the middles, all as exact integer micro-credits with
# largest-remainder conservation (n=1 -> 1e6, n=2 -> 500k/500k).
# Same scale shape as events_attribution_linear: one user_id equi-join,
# bounded per-purchase windows.
# --------------------------------------------------------------------------

_U_WINDOW_SEC = 3 * 86400

_U_CREDIT_CASE = """
    CASE WHEN n_touch = 1 THEN 1000000
         WHEN n_touch = 2 THEN 500000
         WHEN rk = 1 OR rk = n_touch THEN 400000
         ELSE 200000 {div} (n_touch - 2)
              + CASE WHEN rk - 1 <= 200000 % (n_touch - 2)
                     THEN 1 ELSE 0 END
    END
"""

_USHAPE_ORACLE = f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')),
    pairs AS (
      SELECT p.p_id, t.t_id, t.touch_type,
             CAST(row_number() OVER (PARTITION BY p.p_id
                                     ORDER BY t.t_ts, t.t_id) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY p.p_id) AS BIGINT) AS n_touch
      FROM p JOIN t USING (user_id)
      WHERE t.t_ts < p.p_ts
        AND t.t_ts >= p.p_ts - INTERVAL {_U_WINDOW_SEC} SECONDS),
    credit AS (
      SELECT touch_type, t_id,
             {_U_CREDIT_CASE.format(div="//")} AS micro
      FROM pairs)
    SELECT touch_type,
           CAST(SUM(micro) AS BIGINT) AS micro_credits,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(t_id) AS BIGINT) AS id_checksum
    FROM credit GROUP BY 1
"""


@query("events_attribution_ushape", oracle=_USHAPE_ORACLE)
def events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: 40/20/40 first/middles/
    last split per purchase over its 3-day touch window, exact integer
    micro-credits (largest remainder to the earliest middles — credit
    conserves to exactly 1e6 per attributed purchase). Same one-join +
    bounded-window plan as the linear variant."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = p.join(t, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {_U_WINDOW_SEC} SECONDS")
        )
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wn = Window.partitionBy("p_id")
    credit = (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n_touch", F.count(F.lit(1)).over(wn).cast("long"))
        .select(
            "touch_type",
            "t_id",
            F.expr(
                f"CAST({_U_CREDIT_CASE.format(div='DIV')} AS BIGINT)"
            ).alias("micro"),
        )
    )
    return credit.groupBy("touch_type").agg(
        F.sum("micro").cast("long").alias("micro_credits"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("t_id").cast("long").alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# Neyman-allocated stratified sampling, threshold form — the sampling
# family's statistical close-out: a fixed budget is allocated across
# language strata proportional to N_h·S_h (optimal allocation for
# estimating the mean token count), with the allocation computed by
# exact integer moments + one fixed IEEE sqrt chain and apportioned by
# the largest-remainder rule over the ≤|strata| allocation table; the
# draw itself is the leakage-safe threshold form (u48 md5 draw per
# doc against a precomputed integer threshold) — one scan, NO
# per-stratum sort (the exact-n_h variant would sort each stratum; the
# threshold form is the shape that survives 100 TB, trading exact
# counts for a Binomial(n_h/N_h) draw, both reported).
# --------------------------------------------------------------------------

_NEY_BUDGET = 100
_NEY_TWO48 = 1 << 48


def _neyman_oracle() -> str:
    from jhu_data_parser_spark.plans.pipeline18 import _draw48_duck

    u48 = _draw48_duck("neyman:", "doc_id")
    return f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x
      FROM documents WHERE length(text) > 0),
    m AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM d GROUP BY 1),
    wgt AS (
      SELECT lang, n, s1, s2,
             CAST(n AS DOUBLE) * sqrt(
               (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(greatest(n - 1, 1) AS DOUBLE))
             ) AS w
      FROM m),
    shares AS (
      SELECT lang, n, s1, s2, w,
             CAST(floor({_NEY_BUDGET} * w / (SELECT SUM(w) FROM wgt))
                  AS BIGINT) AS base,
             {_NEY_BUDGET} * w / (SELECT SUM(w) FROM wgt)
               - floor({_NEY_BUDGET} * w / (SELECT SUM(w) FROM wgt)) AS frac
      FROM wgt),
    alloc AS (
      SELECT lang, n, s1, s2, w,
             base + CASE WHEN row_number() OVER (ORDER BY frac DESC, lang)
                         <= {_NEY_BUDGET} - (SELECT SUM(base) FROM shares)
                    THEN 1 ELSE 0 END AS n_alloc
      FROM shares),
    thr AS (
      SELECT lang, n, n_alloc,
             (n_alloc * CAST({_NEY_TWO48} AS BIGINT)) // n AS t48
      FROM alloc),
    drawn AS (
      SELECT d.lang, d.doc_id
      FROM d JOIN thr ON thr.lang = d.lang
      WHERE {u48} < thr.t48)
    SELECT thr.lang,
           CAST(thr.n AS BIGINT) AS n_docs,
           CAST(thr.n_alloc AS BIGINT) AS n_alloc,
           CAST(COUNT(drawn.doc_id) AS BIGINT) AS n_drawn,
           CAST(COALESCE(SUM(drawn.doc_id), 0) AS BIGINT) AS drawn_checksum
    FROM thr LEFT JOIN drawn ON drawn.lang = thr.lang
    GROUP BY 1, 2, 3
    """


@query("sample_neyman_threshold", oracle=_neyman_oracle())
def sample_neyman_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample: budget apportioned across
    language strata by N_h·S_h (exact integer moments, one IEEE sqrt
    chain, largest-remainder over the tiny allocation table — the only
    single-partition window runs over ≤|strata| aggregate rows), then
    a threshold md5 draw per doc against the per-stratum integer
    threshold floor(n_alloc·2^48 / N_h) — one corpus scan, no
    per-stratum sort. Reports per stratum: size, allocation, actual
    draws, and the drawn-id checksum."""
    from jhu_data_parser_spark.plans.pipeline18 import _draw48_spark

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            "lang",
            F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("x"),
        )
    )
    m = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    w_expr = (
        "CAST(n AS DOUBLE) * sqrt("
        "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(greatest(n - 1, CAST(1 AS BIGINT)) AS DOUBLE)))"
    )
    wgt = m.withColumn("w", F.expr(w_expr))
    tw = wgt.agg(F.sum("w").alias("wsum"))
    shares = (
        wgt.crossJoin(F.broadcast(tw))
        .withColumn(
            "base",
            F.expr(f"CAST(floor({_NEY_BUDGET} * w / wsum) AS BIGINT)"),
        )
        .withColumn(
            "frac",
            F.expr(
                f"{_NEY_BUDGET} * w / wsum"
                f" - floor({_NEY_BUDGET} * w / wsum)"
            ),
        )
    )
    rem = shares.agg(
        (F.lit(_NEY_BUDGET) - F.sum("base")).cast("long").alias("spare")
    )
    wr = Window.orderBy(F.desc("frac"), "lang")
    alloc = (
        shares.crossJoin(F.broadcast(rem))
        .withColumn("rk", F.row_number().over(wr))
        .withColumn(
            "n_alloc",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("spare"), 1).otherwise(0)
            ).cast("long"),
        )
    )
    thr = alloc.select(
        "lang",
        "n",
        "n_alloc",
        F.expr(
            f"CAST((n_alloc * CAST({_NEY_TWO48} AS BIGINT)) DIV n AS BIGINT)"
        ).alias("t48"),
    )
    u48 = _draw48_spark("neyman:", F.col("doc_id"))
    drawn = (
        d.join(F.broadcast(thr), "lang")
        .filter(u48 < F.col("t48"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_drawn"),
            F.sum("doc_id").cast("long").alias("drawn_checksum"),
        )
    )
    return (
        thr.join(drawn, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            "n_alloc",
            F.coalesce("n_drawn", F.lit(0)).cast("long").alias("n_drawn"),
            F.coalesce("drawn_checksum", F.lit(0))
            .cast("long")
            .alias("drawn_checksum"),
        )
    )


# --------------------------------------------------------------------------
# Data-loader interleave audit — after the deterministic hash shuffle
# that orders training examples, how well are sources interleaved?
# Per-source gap statistics over the global shuffle rank: a gap of 1
# means two same-source docs are adjacent (the correlation data-loader
# shuffling exists to prevent). The global rank reuses
# adaptive_global_rank (single-task under the crossover, distributed
# prefix sum above); the gap windows partition BY SOURCE — bounded,
# never global.
# --------------------------------------------------------------------------


def _interleave_oracle() -> str:
    from jhu_data_parser_spark.plans.pipeline18 import _draw48_duck

    u48 = _draw48_duck("shuffle:", "doc_id")
    return f"""
    WITH d AS (
      SELECT doc_id, source, {u48} AS u48
      FROM documents WHERE length(text) > 0),
    r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (ORDER BY u48, doc_id) AS BIGINT) AS rk
      FROM d),
    g AS (
      SELECT source, rk,
             rk - lag(rk) OVER (PARTITION BY source ORDER BY rk) AS gap
      FROM r)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(gap) FILTER (gap = 1) AS BIGINT) AS n_adjacent,
           CAST(MIN(gap) AS BIGINT) AS min_gap,
           CAST(MAX(gap) AS BIGINT) AS max_gap,
           CAST(CASE WHEN COUNT(gap) > 0
                THEN (1000 * SUM(gap)) // COUNT(gap) END AS BIGINT)
             AS mean_gap_milli
    FROM g GROUP BY 1
    """


@query("sample_interleave_gaps", oracle=_interleave_oracle())
def sample_interleave_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interleave quality of the deterministic md5 shuffle
    order: adjacent-pair counts and gap statistics over the global
    shuffle rank (adaptive_global_rank — u48 keys are unique with
    doc_id tiebreak, so the weight-1 running sum IS row_number), with
    the gap windows partitioned per source."""
    from jhu_data_parser_spark.operators.intervals import adaptive_global_rank
    from jhu_data_parser_spark.plans.pipeline18 import _draw48_spark

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            "source",
            _draw48_spark("shuffle:", F.col("doc_id")).alias("u48"),
        )
    )
    r = adaptive_global_rank(
        d.withColumn("__w", F.lit(1)), ["u48", "doc_id"], "__w",
        n_rows=d.count(),
    ).select("source", F.col("rank").alias("rk"))
    wg = Window.partitionBy("source").orderBy("rk")
    g = r.withColumn("gap", F.col("rk") - F.lag("rk").over(wg))
    return g.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("gap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_adjacent"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        F.when(
            F.count("gap") > 0,
            F.expr("(1000 * sum(gap)) DIV count(gap)"),
        )
        .cast("long")
        .alias("mean_gap_milli"),
    )


@query("stream_substring_spans_incremental", oracle=_SPANS_ORACLE)
def stream_substring_spans_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Substring-span dedup as a REAL incremental stream (append-only
    gram-posting index, exactly-once cross-batch seed discovery,
    corpus-global df gate at read-back) sharing the batch query's
    oracle — stream ≡ batch ≡ SQL; see
    streaming/jobs.run_substring_spans_incremental_stream."""
    from jhu_data_parser_spark.streaming.jobs import (
        run_substring_spans_incremental_stream,
    )

    return run_substring_spans_incremental_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# Winsorized robust pricing — the sketch COMPOSED in-plan: per-region
# p05/p95 bucket bounds come from the same merged histogram the
# quantile queries read, broadcast back onto the fact rows, and values
# clip to the integer bounds — robust location statistics whose every
# step (bucket thresholds, clipping, sums) is exact integer
# arithmetic. The composition is the point: sketch artifacts are plan
# nodes, not driver-side state.
# --------------------------------------------------------------------------

_WINS_QUANTS = ((5, "q05_est"), (95, "q95_est"))

_WINSOR_ORACLE = f"""
    WITH v AS (
      SELECT r_name AS region_name, n_name AS nation_name,
             CAST(floor(o_totalprice) AS BIGINT) AS val,
             CAST(floor(o_totalprice) AS BIGINT) // {_QS_WIDTH} AS bucket
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    merged AS (
      SELECT region_name, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2),
    cum AS (
      SELECT *,
             CAST(SUM(cnt) OVER (PARTITION BY region_name ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY region_name) AS BIGINT) AS n
      FROM merged),
    thr AS (
      SELECT region_name,
             CAST(MIN(CASE WHEN cum * 100 >= n * 5
                  THEN (bucket + 1) * {_QS_WIDTH} END) AS BIGINT) AS q05_est,
             CAST(MIN(CASE WHEN cum * 100 >= n * 95
                  THEN (bucket + 1) * {_QS_WIDTH} END) AS BIGINT) AS q95_est
      FROM cum GROUP BY 1)
    SELECT v.region_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(LEAST(GREATEST(v.val, t.q05_est), t.q95_est)) AS BIGINT)
             AS winsorized_sum,
           CAST(SUM(CASE WHEN v.val < t.q05_est THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN v.val > t.q95_est THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high
    FROM v JOIN thr t USING (region_name)
    GROUP BY 1
"""


@query("agg_winsorized_pricing", oracle=_WINSOR_ORACLE)
def agg_winsorized_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region winsorized order-value statistics: values clip to the
    sketch's p05/p95 integer bucket bounds (the ≤|regions|-row
    threshold table broadcasts back onto the facts), reporting the
    winsorized sum and clip counts — robust aggregates from one fact
    scan feeding both the sketch and the clip pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    v = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region_name"),
            F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("val"),
        )
        .withColumn("bucket", F.expr(f"val DIV {_QS_WIDTH}"))
    )
    merged = v.groupBy("region_name", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    thr = _sketch_quantiles(
        merged, "region_name", _QS_WIDTH, _WINS_QUANTS, "n_sketch"
    ).drop("n_sketch")
    clipped = v.join(F.broadcast(thr), "region_name").select(
        "region_name",
        F.expr("LEAST(GREATEST(val, q05_est), q95_est)").alias("w"),
        F.when(F.col("val") < F.col("q05_est"), 1).otherwise(0).alias("lo"),
        F.when(F.col("val") > F.col("q95_est"), 1).otherwise(0).alias("hi"),
    )
    return clipped.groupBy("region_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("w").cast("long").alias("winsorized_sum"),
        F.sum("lo").cast("long").alias("n_clipped_low"),
        F.sum("hi").cast("long").alias("n_clipped_high"),
    )


# --------------------------------------------------------------------------
# k-core peeling on the strong trade graph — the degeneracy view the
# community/link-prediction family lacks: nodes with degree < k peel
# off, degrees recompute, repeat. Fixed peel schedule (4 rounds — a
# fixed iteration count like the LPA/PageRank chains: determinism by
# construction, convergence a property the per-round stats expose),
# per-round node/edge counts + a node checksum. The graph-build step
# (top-60 undirected edges by lineitem volume) is the family's shared
# convention; every peel round is a |E|-row join — nation arity bounds
# the graph, the fact scan is the only corpus-sized work.
# --------------------------------------------------------------------------

_KCORE_K = 4
_KCORE_ROUNDS = 4

_STRONG_CTE = """
    raw AS (
      SELECT LEAST(s.s_nationkey, c.c_nationkey) AS a,
             GREATEST(s.s_nationkey, c.c_nationkey) AS b,
             COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2),
    strong AS (
      SELECT a, b FROM raw ORDER BY w DESC, a, b LIMIT 60)
"""


def _kcore_oracle() -> str:
    ctes = [f"e0 AS MATERIALIZED (SELECT a, b FROM strong)"]
    stats = []
    for r in range(_KCORE_ROUNDS + 1):
        ctes.append(
            f"d{r} AS MATERIALIZED ("
            f"SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM ("
            f"SELECT a AS x FROM e{r} UNION ALL SELECT b FROM e{r})"
            f" GROUP BY x)"
        )
        stats.append(
            f"SELECT CAST({r} AS INT) AS peel_round,"
            f" CAST((SELECT COUNT(*) FROM d{r}) AS BIGINT) AS n_nodes,"
            f" CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges,"
            f" CAST(COALESCE((SELECT SUM(x) FROM d{r}), 0) AS BIGINT)"
            f" AS node_checksum"
        )
        if r < _KCORE_ROUNDS:
            ctes.append(
                f"s{r} AS (SELECT x FROM d{r} WHERE d >= {_KCORE_K})"
            )
            ctes.append(
                f"e{r + 1} AS MATERIALIZED ("
                f"SELECT a, b FROM e{r}"
                f" WHERE a IN (SELECT x FROM s{r})"
                f" AND b IN (SELECT x FROM s{r}))"
            )
    return (
        f"WITH {_STRONG_CTE}, "
        + ", ".join(ctes)
        + " "
        + " UNION ALL ".join(stats)
    )


@query("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k = 4, 4 fixed rounds) over the strong trade
    graph: per round, the surviving node/edge counts and node-id
    checksum — the degeneracy profile. Each round is two tiny
    semi-joins + a degree aggregate over the ≤60-edge table (lazily
    checkpointed per round); the fact scan feeding the graph build is
    the only corpus-sized work. At a real |E| the per-round
    localCheckpoint chain needs periodic EVICTION (unpersist rounds
    older than r−1 every few rounds, or a reliable-checkpoint cut
    every ~10 rounds) — each round only ever reads the previous
    round's survivors, so nothing older is load-bearing."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    raw = (
        l.select("l_orderkey", "l_suppkey")
        .join(
            o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    cur = (
        raw.orderBy(F.desc("w"), "a", "b")
        .limit(60)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    stats = []
    for r in range(_KCORE_ROUNDS + 1):
        sym = cur.select(F.col("a").alias("x")).unionAll(
            cur.select(F.col("b").alias("x"))
        )
        deg = sym.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
        node_stats = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("node_checksum"),
        )
        edge_stats = cur.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        stats.append(
            node_stats.crossJoin(edge_stats).select(
                F.lit(r).cast("int").alias("peel_round"),
                "n_nodes",
                "n_edges",
                "node_checksum",
            )
        )
        if r < _KCORE_ROUNDS:
            surv = deg.filter(F.col("d") >= _KCORE_K).select("x")
            cur = (
                cur.join(
                    surv.select(F.col("x").alias("a")), "a", "semi"
                )
                .join(surv.select(F.col("x").alias("b")), "b", "semi")
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
    out = stats[0]
    for st in stats[1:]:
        out = out.unionByName(st)
    return out


# --------------------------------------------------------------------------
# Vocabulary growth curve (the Heaps'-law points, exact integers): how
# many distinct words has the corpus seen after each eighth of the
# doc-id range? The classic one-pass trick: a word's contribution to
# every prefix is determined by its FIRST document (min doc_id), so
# one word-level aggregate + a broadcast 8-row bounds table replaces
# eight distinct-count scans. The curve is what a tokenizer-budget or
# dedup-saturation decision reads; all points are exact integers (no
# cross-engine ln()).
# --------------------------------------------------------------------------

_VG_PARTS = 8

_VOCAB_GROWTH_ORACLE = f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok
      FROM documents WHERE length(text) > 0),
    lim AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM d),
    bounds AS (
      SELECT CAST(p AS INT) AS p,
             lim.lo + (lim.hi - lim.lo + 1) * p // {_VG_PARTS} AS bound
      FROM range(1, {_VG_PARTS} + 1) t(p), lim),
    w AS (
      SELECT word, MIN(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents WHERE length(text) > 0)
      GROUP BY word),
    tok AS (
      SELECT b.p, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(d.ntok) AS BIGINT) AS n_tokens
      FROM d JOIN bounds b ON d.doc_id < b.bound GROUP BY b.p),
    voc AS (
      SELECT b.p, CAST(COUNT(*) AS BIGINT) AS n_vocab
      FROM w JOIN bounds b ON w.first_doc < b.bound GROUP BY b.p)
    SELECT tok.p AS prefix_eighth, tok.n_docs, tok.n_tokens, voc.n_vocab
    FROM tok JOIN voc ON voc.p = tok.p
"""


@query("text_vocab_growth", oracle=_VOCAB_GROWTH_ORACLE)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vocabulary-growth (Heaps) points over eight doc-id-range
    prefixes: docs, tokens, and distinct words seen per prefix. One
    word-level min(doc_id) aggregate + an 8-row broadcast bounds table
    — never eight distinct scans; every point is an exact integer."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").alias(
                "ntok"
            ),
            F.split(F.lower("text"), " ").alias("toks"),
        )
    )
    lim = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    bounds = (
        spark.range(1, _VG_PARTS + 1)
        .select(F.col("id").cast("int").alias("p"))
        .crossJoin(F.broadcast(lim))
        .select(
            "p",
            F.expr(f"lo + (hi - lo + 1) * p DIV {_VG_PARTS}").alias("bound"),
        )
    )
    tok = (
        d.select("doc_id", "ntok")
        .join(F.broadcast(bounds), F.col("doc_id") < F.col("bound"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    w = (
        d.select("doc_id", F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    voc = (
        w.join(F.broadcast(bounds), F.col("first_doc") < F.col("bound"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    )
    return (
        tok.join(voc, "p")
        .select(
            F.col("p").alias("prefix_eighth"), "n_docs", "n_tokens", "n_vocab"
        )
    )


# --------------------------------------------------------------------------
# CUSUM drift monitor — the monitoring family's change-point chart
# (EWMA/Holt/seasonal cover smoothing; CUSUM's max(0, ·) CLAMP is a
# different recurrence class — not window-expressible, not a linear
# fold): per event type, the two-sided cumulative-sum chart over the
# daily count series with target = mean (integer floor) and slack =
# 5% of target. Exact integers end-to-end. The per-type day series is
# bounded by the TIME RANGE, not the data size (a 100 TB corpus over
# the same month still folds ≤31 elements per type), so the
# collect_list + in-row fold is the scale-correct shape; the oracle
# replays the clamp recurrence as a recursive CTE over day indexes.
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
    WITH RECURSIVE c AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    ci AS (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS i
      FROM c),
    t AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) // COUNT(*) AS BIGINT) AS target,
             CAST(greatest((SUM(x) // COUNT(*)) // 20, 1) AS BIGINT) AS slack
      FROM ci GROUP BY 1),
    rec(event_type, i, hi, ph, lo, pl) AS (
      SELECT ci.event_type, ci.i,
             greatest(ci.x - t.target - t.slack, 0),
             greatest(ci.x - t.target - t.slack, 0),
             greatest(t.target - t.slack - ci.x, 0),
             greatest(t.target - t.slack - ci.x, 0)
      FROM ci JOIN t USING (event_type) WHERE ci.i = 1
      UNION ALL
      SELECT r.event_type, r.i + 1,
             greatest(r.hi + ci.x - t.target - t.slack, 0),
             greatest(r.ph, greatest(r.hi + ci.x - t.target - t.slack, 0)),
             greatest(r.lo + t.target - t.slack - ci.x, 0),
             greatest(r.pl, greatest(r.lo + t.target - t.slack - ci.x, 0))
      FROM rec r
      JOIN ci ON ci.event_type = r.event_type AND ci.i = r.i + 1
      JOIN t ON t.event_type = r.event_type)
    SELECT r.event_type,
           t.n_days, t.target, t.slack,
           CAST(r.ph AS BIGINT) AS peak_hi,
           CAST(r.pl AS BIGINT) AS peak_lo
    FROM rec r JOIN t ON t.event_type = r.event_type
    WHERE r.i = t.n_days
"""


def _cusum_finish(c: DataFrame) -> DataFrame:
    """Chart computation over a (event_type, day, x) daily-count table
    — shared by the batch query and the stream twin so the fold can
    never drift between them."""
    per = c.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), e -> e.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
    ).select(
        "event_type",
        "xs",
        "n_days",
        F.expr("CAST(total DIV n_days AS BIGINT)").alias("target"),
        F.expr(
            "CAST(greatest((total DIV n_days) DIV 20, CAST(1 AS BIGINT))"
            " AS BIGINT)"
        ).alias("slack"),
    )
    fold = (
        "aggregate(xs, "
        "named_struct('hi', CAST(0 AS BIGINT), 'ph', CAST(0 AS BIGINT), "
        "'lo', CAST(0 AS BIGINT), 'pl', CAST(0 AS BIGINT)), "
        "(a, x) -> named_struct("
        "'hi', greatest(a.hi + x - target - slack, CAST(0 AS BIGINT)), "
        "'ph', greatest(a.ph, greatest(a.hi + x - target - slack,"
        " CAST(0 AS BIGINT))), "
        "'lo', greatest(a.lo + target - slack - x, CAST(0 AS BIGINT)), "
        "'pl', greatest(a.pl, greatest(a.lo + target - slack - x,"
        " CAST(0 AS BIGINT)))))"
    )
    return per.withColumn("cs", F.expr(fold)).select(
        "event_type",
        "n_days",
        "target",
        "slack",
        F.col("cs.ph").alias("peak_hi"),
        F.col("cs.pl").alias("peak_lo"),
    )


@query("events_cusum_drift", oracle=_CUSUM_ORACLE)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM control chart per event type over daily counts:
    peak upward/downward cumulative deviations against an integer
    target (mean daily count) with 5% slack — the clamped recurrence
    folded in-row over the day-sorted series (bounded by the time
    range); one (type, day) aggregate + one per-type fold
    (:func:`_cusum_finish`)."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    return _cusum_finish(c)


@query("stream_cusum_drift", oracle=_CUSUM_ORACLE)
def stream_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM over a REAL events stream: per-micro-batch (type, day)
    count partials merge by addition, the chart folds once at
    read-back — N micro-batches ≡ one batch pass, gated by the shared
    oracle; see streaming/jobs.run_cusum_drift_stream."""
    from jhu_data_parser_spark.streaming.jobs import run_cusum_drift_stream

    return run_cusum_drift_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# KMV/theta sketch SET ALGEBRA — the sketch family's missing operation:
# union and intersection cardinality estimates between two user sets
# (clickers vs purchasers) from one bottom-k sample of the union, next
# to the exact counts so the driver gate certifies estimator AND input.
# theta = k-th smallest union hash; |A∪B| ≈ (k−1)·2^48 // θ; |A∩B| ≈
# |{h ∈ A∩B : h < θ}| · 2^48 // θ — all exact integer division. The
# bottom-k is orderBy().limit(k) → TakeOrderedAndProject (per-task
# heaps — the scale-correct bottom-k, no global sort/window), exactly
# the distributed merge a theta sketch does.
# --------------------------------------------------------------------------

_THETA_K = 32
_THETA_DOMAIN = 1 << 48


def _theta_oracle() -> str:
    from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql

    h = _hexpoly_sql("md5(CAST(user_id AS VARCHAR))", 12)
    return f"""
    WITH a AS (SELECT DISTINCT {h} AS h FROM events
               WHERE event_type = 'click'),
    b AS (SELECT DISTINCT {h} AS h FROM events
          WHERE event_type = 'purchase'),
    u AS (SELECT h FROM a UNION SELECT h FROM b),
    bk AS (SELECT h FROM u ORDER BY h LIMIT {_THETA_K}),
    th AS (SELECT MAX(h) AS theta, CAST(COUNT(*) AS BIGINT) AS n_bot FROM bk),
    ex AS (
      SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_click_exact,
             CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_purchase_exact,
             CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_union_exact,
             CAST((SELECT COUNT(*) FROM a JOIN b USING (h)) AS BIGINT)
               AS n_inter_exact),
    samp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ni_samp
      FROM a JOIN b USING (h), th WHERE a.h < th.theta)
    SELECT ex.n_click_exact, ex.n_purchase_exact,
           ex.n_union_exact, ex.n_inter_exact,
           CAST(th.theta AS BIGINT) AS theta,
           CAST(CASE WHEN th.n_bot < {_THETA_K} THEN ex.n_union_exact
                ELSE ({_THETA_K - 1} * CAST({_THETA_DOMAIN} AS BIGINT))
                     // th.theta END AS BIGINT) AS union_est,
           CAST(CASE WHEN th.n_bot < {_THETA_K} THEN ex.n_inter_exact
                ELSE (samp.ni_samp * CAST({_THETA_DOMAIN} AS BIGINT))
                     // th.theta END AS BIGINT) AS inter_est
    FROM ex, th, samp
    """


@query("agg_kmv_set_algebra", oracle=_theta_oracle())
def agg_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over clicker/purchaser user sets:
    union and intersection estimates from one bottom-k union sample
    (TakeOrderedAndProject bottom-k — per-task heaps, the distributed
    theta merge), reported next to the exact counts. Exact integer
    division throughout; ni_samp ≤ k−1 bounds the product far inside
    int64."""
    from jhu_data_parser_spark.plans.pipeline6 import _hex_long

    ev = load_table(spark, sf_dir, "events")

    def _set(et: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == et)
            .select(
                _hex_long(F.md5(F.col("user_id").cast("string")), 12).alias(
                    "h"
                )
            )
            .distinct()
        )

    a = _set("click").localCheckpoint(eager=False)
    b = _set("purchase").localCheckpoint(eager=False)
    u = a.unionByName(b).distinct().localCheckpoint(eager=False)
    th = (
        u.orderBy("h")
        .limit(_THETA_K)
        .agg(
            F.max("h").alias("theta"),
            F.count(F.lit(1)).cast("long").alias("n_bot"),
        )
    )
    ex = (
        a.agg(F.count(F.lit(1)).cast("long").alias("n_click_exact"))
        .crossJoin(
            b.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_exact"))
        )
        .crossJoin(u.agg(F.count(F.lit(1)).cast("long").alias("n_union_exact")))
        .crossJoin(
            a.join(b, "h")
            .agg(F.count(F.lit(1)).cast("long").alias("n_inter_exact"))
        )
    )
    samp = (
        a.join(b, "h")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("ni_samp"))
    )
    return (
        ex.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(samp))
        .select(
            "n_click_exact",
            "n_purchase_exact",
            "n_union_exact",
            "n_inter_exact",
            F.col("theta").cast("long").alias("theta"),
            F.when(F.col("n_bot") < _THETA_K, F.col("n_union_exact"))
            .otherwise(
                F.expr(
                    f"CAST({(_THETA_K - 1) * _THETA_DOMAIN} AS BIGINT)"
                    " DIV theta"
                )
            )
            .cast("long")
            .alias("union_est"),
            F.when(F.col("n_bot") < _THETA_K, F.col("n_inter_exact"))
            .otherwise(
                F.expr(
                    f"(ni_samp * CAST({_THETA_DOMAIN} AS BIGINT)) DIV theta"
                )
            )
            .cast("long")
            .alias("inter_est"),
        )
    )


# --------------------------------------------------------------------------
# Theil–Sen robust trend per event type — the monitoring family's
# robust-regression member (CUSUM detects shifts; Theil–Sen quantifies
# the trend without OLS's outlier sensitivity): the median of all
# pairwise slopes over the daily-count series. The day series is
# bounded by the TIME RANGE (≤ a few hundred points at any corpus
# size), so the O(n²) pair set stays in-row: nested transforms
# generate the ≤ n(n−1)/2 slopes, one array_sort + element pick takes
# the lower-median. Slopes are one IEEE double division over exact
# integers (identical both engines; integer DIV is AVOIDED — Spark
# truncates toward zero while DuckDB floors, which diverges on
# negative slopes); the reported value re-enters integers as
# floor(1e6·median).
# --------------------------------------------------------------------------

_THEIL_ORACLE = """
    WITH c AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    arr AS (
      SELECT event_type,
             list(day ORDER BY day) AS ds,
             list(x ORDER BY day) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM c GROUP BY event_type),
    sl AS (
      SELECT event_type, n_days, xs,
             list_sort(flatten(list_transform(range(1, len(xs)), i ->
               list_transform(range(i + 1, len(xs) + 1), j ->
                 CAST(xs[j] - xs[i] AS DOUBLE)
                 / CAST(ds[j] - ds[i] AS DOUBLE))))) AS slopes
      FROM arr)
    SELECT event_type, n_days,
           CAST(list_sort(xs)[CAST((n_days + 1) // 2 AS INT)] AS BIGINT)
             AS median_daily,
           CASE WHEN len(slopes) >= 1 THEN
             CAST(floor(1000000.0 *
                  slopes[CAST((len(slopes) + 1) // 2 AS INT)]) AS BIGINT)
           END AS sen_slope_micro
    FROM sl
"""


@query("events_theil_sen_trend", oracle=_THEIL_ORACLE)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily-count trend per event type: lower-median
    of all pairwise slopes (micro fixed point) plus the median daily
    count. One (type, day) aggregate; the pair set and both medians
    stay in-row over the time-range-bounded series."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    arr = c.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), e -> e.day)"
        ).alias("ds"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), e -> e.x)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    slopes = (
        "array_sort(flatten(transform(sequence(1, size(xs) - 1), i -> "
        "transform(sequence(i + 1, size(xs)), j -> "
        "CAST(element_at(xs, j) - element_at(xs, i) AS DOUBLE)"
        " / CAST(element_at(ds, j) - element_at(ds, i) AS DOUBLE)))))"
    )
    return arr.withColumn("slopes", F.expr(slopes)).select(
        "event_type",
        "n_days",
        F.expr(
            "CAST(element_at(array_sort(xs),"
            " CAST((n_days + 1) DIV 2 AS INT)) AS BIGINT)"
        ).alias("median_daily"),
        # single-day groups have an empty slope set: Spark element_at
        # raises on index 0 while DuckDB slopes[0] is NULL — guard both
        # sides to an explicit NULL row instead of a crash-vs-NULL split
        F.expr(
            "CASE WHEN size(slopes) >= 1 THEN"
            " CAST(floor(1000000.0 * element_at(slopes,"
            " CAST((size(slopes) + 1) DIV 2 AS INT))) AS BIGINT) END"
        ).alias("sen_slope_micro"),
    )
