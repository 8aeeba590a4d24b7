"""Round-2 third wave: corpus-statistics quality scoring, ranked
retrieval, ANN recall measurement, and in-stream sampling.

Reference parity note: the reference (/root/reference) stops at flat
JSON records; these are LLM-data-pipeline extensions — the
quality-filter / retrieval / index-evaluation steps a training-data
pipeline runs between raw scan and batch assembly.

Oracle discipline (same rules as pipeline2/pipeline3):

- Counts and per-term fixed-point contributions are BIGINT — summed as
  integers, so aggregation order cannot move the result.
- Every double is produced by a fixed, explicitly-parenthesized chain of
  IEEE ops written identically in the Spark expression and the DuckDB
  SQL (single divisions, no reassociation left to either optimizer).
- BM25's one transcendental (ln) is rounded to 1e-6 fixed-point BEFORE
  the cross-term sum; per-term values are far from rounding boundaries
  relative to any last-ulp libm divergence.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_mem_counter = itertools.count()

# Max run length in the SORTED token array == max occurrence count of any
# token — computed per row with a single higher-order fold (no explode,
# no shuffle). Accumulator: (previous element, current run, best run).
_MAX_RUN_SQL = (
    "aggregate({arr}, "
    "named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'b', 0L), "
    "(a, t) -> named_struct("
    "'p', t, "
    "'r', IF(a.p <=> t, a.r + 1L, 1L), "
    "'b', GREATEST(a.b, IF(a.p <=> t, a.r + 1L, 1L))), "
    "a -> a.b)"
)


@query(
    "text_repetition_signals",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    t1 AS (SELECT doc_id, MAX(c) AS max_tok, SUM(c) AS n_tokens,
                  COUNT(*) AS d_tok
           FROM tc GROUP BY 1),
    big AS (
      -- DuckDB's generate_series table function rejects lateral column
      -- args; the scalar list range() + list_transform doesn't.
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
    b1 AS (SELECT doc_id, MAX(c) AS max_bg, SUM(c) AS n_bg,
                  COUNT(*) AS d_bg
           FROM bc GROUP BY 1)
    SELECT t1.doc_id,
           CAST(t1.n_tokens AS BIGINT) AS n_tokens,
           CAST(t1.max_tok AS DOUBLE) / CAST(t1.n_tokens AS DOUBLE)
             AS top_token_frac,
           CAST(b1.max_bg AS DOUBLE) / CAST(b1.n_bg AS DOUBLE)
             AS top_bigram_frac,
           1.0 - (CAST(b1.d_bg AS DOUBLE) / CAST(b1.n_bg AS DOUBLE))
             AS dup_bigram_frac,
           CAST(t1.d_tok AS DOUBLE) / CAST(t1.n_tokens AS DOUBLE)
             AS distinct_token_ratio,
           (CAST(t1.max_tok AS DOUBLE) / CAST(t1.n_tokens AS DOUBLE) <= 0.20
            AND (b1.n_bg IS NULL
                 OR CAST(b1.max_bg AS DOUBLE) / CAST(b1.n_bg AS DOUBLE) <= 0.10))
             AS passes_repetition
    -- LEFT join: a 1-token doc has no bigrams, so it is absent from b1;
    -- its bigram stats are NULL and only the token signal gates it.
    FROM t1 LEFT JOIN b1 USING (doc_id)
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    fraction of tokens taken by the most frequent token, fraction of
    bigrams taken by the most frequent bigram, duplicate-bigram
    fraction, distinct-token ratio, and the resulting keep flag.

    Scale posture: everything is computed PER ROW with higher-order
    functions — sort the token array and take the longest run (equal to
    the max occurrence count), so there is no explode, no shuffle, and
    no per-doc aggregation state; the whole operator is one narrow
    codegen projection over the scan, embarrassingly parallel at any
    corpus size. The oracle recomputes the same statistics the classic
    way (unnest → GROUP BY) — two independent formulations must agree.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    d = d.select(
        "doc_id",
        "n_tokens",
        F.expr(_MAX_RUN_SQL.format(arr="array_sort(toks)")).alias("max_tok"),
        F.size(F.array_distinct("toks")).cast("long").alias("d_tok"),
        F.expr(
            "IF(n_tokens >= 2, "
            "transform(sequence(1, CAST(n_tokens AS INT) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))), "
            "CAST(array() AS ARRAY<STRING>))"
        ).alias("bigrams"),
    )
    d = d.select(
        "doc_id",
        "n_tokens",
        "max_tok",
        "d_tok",
        F.expr(_MAX_RUN_SQL.format(arr="array_sort(bigrams)")).alias("max_bg"),
        F.size("bigrams").cast("long").alias("n_bg"),
        F.size(F.array_distinct("bigrams")).cast("long").alias("d_bg"),
    )
    top_tok = F.col("max_tok").cast("double") / F.col("n_tokens").cast("double")
    # Bigram stats are undefined (NULL, not NaN/∞) for <2-token docs;
    # such docs are gated by the token signal alone — mirrors the
    # oracle's LEFT join against the bigram aggregate.
    has_bg = F.col("n_bg") > 0
    top_bg = F.when(
        has_bg, F.col("max_bg").cast("double") / F.col("n_bg").cast("double")
    )
    return d.select(
        "doc_id",
        "n_tokens",
        top_tok.alias("top_token_frac"),
        top_bg.alias("top_bigram_frac"),
        F.when(
            has_bg,
            F.lit(1.0) - (F.col("d_bg").cast("double") / F.col("n_bg").cast("double")),
        ).alias("dup_bigram_frac"),
        (F.col("d_tok").cast("double") / F.col("n_tokens").cast("double")).alias(
            "distinct_token_ratio"
        ),
        ((top_tok <= 0.20) & (~has_bg | (top_bg <= 0.10))).alias("passes_repetition"),
    )


@query(
    "text_unigram_likelihood",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    tot AS (SELECT COUNT(*) AS t FROM toks),
    per_doc AS (
      SELECT d.doc_id, COUNT(*) AS n_tokens, SUM(v.c) AS sum_corpus_count
      FROM toks d JOIN vocab v USING (tok) GROUP BY 1)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_corpus_count AS BIGINT) AS sum_corpus_count,
           (CAST(sum_corpus_count AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             / CAST(t AS DOUBLE) AS mean_token_freq
    FROM per_doc, tot
    """,
)
def text_unigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-likelihood quality score — the shape of the perplexity
    filter (CCNet / Wenzek et al. 2020) with the language model replaced
    by the corpus's own unigram distribution: score each document by the
    mean corpus frequency of its tokens, so rare-token (noisy) documents
    score low and can be culled or bucketed.

    Exactness: per-document we sum the INTEGER corpus count of each
    token (order-free), and divide twice at the end in a fixed order —
    no float accumulation anywhere. (A production filter would sum log
    probabilities; the integer sum keeps the cross-engine oracle exact
    and ranks low-likelihood documents the same way for filtering.)

    Scale posture: vocab build is word-count (map-side combine, tiny
    result), broadcast back onto the exploded tokens (Zipf vocabularies
    fit in a broadcast long past 100 TB corpora — else this join
    degrades to sort-merge on the token key with stopword salting), and
    the per-doc sum shuffles uniform doc_id keys once. The corpus total
    is a 1-row aggregate cross-joined in — never a driver action."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = d.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    per_doc = (
        d.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("sum_corpus_count"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_corpus_count",
        (
            (
                F.col("sum_corpus_count").cast("double")
                / F.col("n_tokens").cast("double")
            )
            / F.col("t").cast("double")
        ).alias("mean_token_freq"),
    )


_BM25_TERMS = ("join", "window", "hash")
_BM25_K1 = 1.2  # k1 + 1 = 2.2 written literally below
_BM25_B = 0.75  # 1 - b = 0.25 written literally below
_BM25_TOPK = 20


def _bm25_contrib_sql(tf: str, df: str) -> str:
    """The per-term BM25 contribution, rounded to 1e-6 fixed point —
    IDENTICAL text evaluated by Spark (via F.expr) and DuckDB, so both
    engines execute the same IEEE op chain in the same order."""
    return (
        f"CASE WHEN {tf} = 0 THEN 0 ELSE CAST(ROUND("
        f"ln(1.0 + (CAST(n_docs - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"
        f" * ((CAST({tf} AS DOUBLE) * 2.2) / (CAST({tf} AS DOUBLE)"
        f" + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        f" * 1000000.0) AS BIGINT) END"
    )


def _bm25_oracle_sql() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"COUNT(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    contrib = " + ".join(
        _bm25_contrib_sql(f"tf{i}", f"df{i}") for i in range(len(_BM25_TERMS))
    )
    n_terms = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
               FROM documents),
    t AS (SELECT doc_id, dl, {tf_cols} FROM d),
    s AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM t)
    SELECT doc_id, CAST({n_terms} AS INT) AS n_terms_hit,
           CAST({contrib} AS BIGINT) AS score_fp
    FROM t, s
    WHERE {" + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))} > 0
    ORDER BY score_fp DESC, doc_id LIMIT {_BM25_TOPK}
    """


@query("text_bm25_search", oracle=_bm25_oracle_sql())
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson–Spärck Jones, k1=1.2 b=0.75)
    for a fixed literal term set, top-20 documents.

    Scale posture — full-corpus scoring in ONE pass and ZERO wide
    shuffles: per-document term frequencies come from higher-order
    `filter` over the token array (no explode), corpus statistics
    (N, Σdl, per-term document frequencies) are ONE 1-row aggregate
    broadcast-cross-joined back, and the top-k is
    TakeOrderedAndProject (per-partition partial top-k, no sort
    shuffle). An inverted-index engine prunes non-matching docs
    up front; the scan-scoring form is the Spark-native equivalent
    and the WHERE tf>0 filter drops non-matches before ranking.

    The per-term contribution is rounded to 1e-6 fixed point and the
    cross-term sum is an INTEGER sum, so the result hash cannot move
    with aggregation or addition order; Spark and DuckDB evaluate the
    literally-identical arithmetic expression (see _bm25_contrib_sql).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("dl"),
    )
    t = d.select(
        "doc_id",
        "dl",
        *[
            F.expr(f"size(filter(toks, x -> x = '{term}'))")
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    stats = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    scored = t.crossJoin(F.broadcast(stats))
    contrib = " + ".join(
        _bm25_contrib_sql(f"tf{i}", f"df{i}") for i in range(len(_BM25_TERMS))
    )
    n_terms = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_BM25_TERMS))
    )
    any_hit = " + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))
    return (
        scored.filter(F.expr(any_hit) > 0)
        .select(
            "doc_id",
            F.expr(n_terms).cast("int").alias("n_terms_hit"),
            F.expr(contrib).cast("long").alias("score_fp"),
        )
        .orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


def _recall_oracle_sql() -> str:
    # Compose the two existing, independently-verified oracles: exact
    # brute-force top-10 and the full LSH replay (planes inlined as SQL
    # literals). Nested WITH inside a CTE body is standard SQL.
    from jhu_data_parser_spark.plans.llm import _TOPK_ORACLE, _lsh_oracle_sql

    return f"""
    WITH bf AS ({_TOPK_ORACLE}),
    lsh AS ({_lsh_oracle_sql()})
    SELECT CAST(10 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(COUNT(*) AS DOUBLE) / CAST(10 AS DOUBLE) AS recall
    FROM bf JOIN lsh USING (vec_id)
    """


@query("sim_lsh_recall_report", oracle=_recall_oracle_sql())
def sim_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the RP-LSH ANN path against exact brute force — the
    index-evaluation query every ANN deployment runs before trusting an
    approximate index, expressed as a first-class catalog entry so the
    driver gate MEASURES the approximation instead of taking it on
    faith.

    Both arms are existing oracle-verified operators (`sim_cosine_topk`,
    `sim_cosine_topk_lsh`); this query inner-joins their top-10 id sets
    and reports |BF ∩ LSH| / k. At scale the two arms share the one
    corpus scan; the join is 10×10 rows — free. The oracle replays BOTH
    algorithms end-to-end in SQL (planes as literals) and intersects
    them independently."""
    from jhu_data_parser_spark.operators import similarity as sim
    from jhu_data_parser_spark.plans.llm import _query_vec

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir, 0)
    bf = sim.topk_cosine(corpus, qv, k=10).select("vec_id")
    lsh = sim.topk_cosine_lsh(corpus, qv, dim=len(qv), k=10, n_planes=8).select(
        "vec_id"
    )
    return bf.join(lsh, "vec_id").agg(
        F.lit(10).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)).cast("double") / F.lit(10).cast("double")).alias(
            "recall"
        ),
    )


@query(
    "stream_sample_bernoulli",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           (CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
              / 10000.0) AS kept_value
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '40000000'
    GROUP BY 1
    """,
)
def stream_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling inside a REAL availableNow
    stream (keep rate 0.25 = hex threshold 40000000): the md5-keyed draw
    is a pure function of the record, so the sampled stream equals the
    sampled batch bit-for-bit — restarts, repartitions, and micro-batch
    boundaries cannot change membership. The oracle is the batch filter
    + aggregate; see streaming/jobs.run_stream_sample."""
    from jhu_data_parser_spark.streaming.jobs import run_stream_sample

    table = f"stream_sample_{next(_mem_counter)}"
    return run_stream_sample(spark, sf_dir, table)


@query(
    "pipeline_curation_funnel",
    oracle="""
    WITH flagged AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
               AS surv,
             (len(string_split(text, ' ')) >= 20
              AND CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','a','an','of','and','to','in','is','it','for')))
                   AS DOUBLE) / len(string_split(text, ' ')) >= 0.05
              AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0)
               AS q,
             (CAST(tokmax.mx AS DOUBLE) / len(string_split(text, ' ')) <= 0.20
              AND CAST(bgmax.mx AS DOUBLE)
                   / (len(string_split(text, ' ')) - 1) <= 0.10) AS r
      FROM documents,
      LATERAL (SELECT MAX(c) AS mx FROM (
                 SELECT COUNT(*) AS c
                 FROM unnest(string_split(text, ' ')) AS u(tok) GROUP BY tok))
               AS tokmax,
      LATERAL (SELECT MAX(c) AS mx FROM (
                 SELECT COUNT(*) AS c FROM unnest(
                   list_transform(range(1, len(string_split(text, ' '))),
                     i -> string_split(text, ' ')[i] || ' '
                          || string_split(text, ' ')[i + 1])) AS u(bg)
                 GROUP BY bg)) AS bgmax),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c0,
             CAST(SUM(n_tok) AS BIGINT) AS t0,
             CAST(COUNT(*) FILTER (WHERE surv) AS BIGINT) AS c1,
             CAST(COALESCE(SUM(n_tok) FILTER (WHERE surv), 0) AS BIGINT) AS t1,
             CAST(COUNT(*) FILTER (WHERE surv AND q) AS BIGINT) AS c2,
             CAST(COALESCE(SUM(n_tok) FILTER (WHERE surv AND q), 0) AS BIGINT) AS t2,
             CAST(COUNT(*) FILTER (WHERE surv AND q AND r) AS BIGINT) AS c3,
             CAST(COALESCE(SUM(n_tok) FILTER (WHERE surv AND q AND r), 0) AS BIGINT) AS t3
      FROM flagged)
    SELECT CAST(0 AS INT) AS stage, 'raw' AS stage_name, c0 AS n_docs, t0 AS n_tokens FROM s
    UNION ALL
    SELECT 1, 'exact_dedup', c1, t1 FROM s
    UNION ALL
    SELECT 2, 'quality', c2, t2 FROM s
    UNION ALL
    SELECT 3, 'repetition', c3, t3 FROM s
    """,
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation funnel as ONE query: raw → exact-dedup
    survivors → +quality thresholds (text_quality_filter's exact rules)
    → +repetition thresholds (text_repetition_signals' exact rules),
    reporting per-stage document and token counts — the stage-by-stage
    yield table every training-data pipeline reviews before a run.

    Scale posture: one scan computes every flag (dedup survivorship is a
    row_number over md5(text) — 16-byte keys shuffled once, never the
    text), then ONE 1-row aggregate with conditional counts and a
    4-row stack — no per-stage rescans, no driver loop. The funnel adds
    exactly one wide shuffle to what exact-dedup alone costs."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = F.split(F.col("text"), " ")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    flagged = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        toks.alias("toks"),
        (F.row_number().over(w) == 1).alias("surv"),
        F.expr(
            "CAST(size(filter(split(text, ' '), "
            "t -> array_contains(array('the','a','an','of','and','to','in','is','it','for'), t)))"
            " AS DOUBLE) / size(split(text, ' '))"
        ).alias("sw_ratio"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("mean_tok"),
    )
    flagged = flagged.select(
        "doc_id",
        "n_tok",
        "surv",
        (
            (F.col("n_tok") >= 20)
            & (F.col("sw_ratio") >= 0.05)
            & F.col("mean_tok").between(2.0, 12.0)
        ).alias("q"),
        (
            (
                F.expr(_MAX_RUN_SQL.format(arr="array_sort(toks)")).cast("double")
                / F.col("n_tok").cast("double")
                <= 0.20
            )
            & (
                F.expr(
                    _MAX_RUN_SQL.format(
                        arr="array_sort(transform(sequence(1, CAST(n_tok AS INT) - 1), "
                        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"
                    )
                ).cast("double")
                / (F.col("n_tok") - F.lit(1)).cast("double")
                <= 0.10
            )
        ).alias("r"),
    )
    s = flagged.agg(
        F.count(F.lit(1)).alias("c0"),
        F.sum("n_tok").alias("t0"),
        F.count_if(F.col("surv")).alias("c1"),
        F.coalesce(F.sum(F.when(F.col("surv"), F.col("n_tok"))), F.lit(0)).alias("t1"),
        F.count_if(F.col("surv") & F.col("q")).alias("c2"),
        F.coalesce(
            F.sum(F.when(F.col("surv") & F.col("q"), F.col("n_tok"))), F.lit(0)
        ).alias("t2"),
        F.count_if(F.col("surv") & F.col("q") & F.col("r")).alias("c3"),
        F.coalesce(
            F.sum(F.when(F.col("surv") & F.col("q") & F.col("r"), F.col("n_tok"))),
            F.lit(0),
        ).alias("t3"),
    )
    return s.selectExpr(
        "inline(array("
        "named_struct('stage', CAST(0 AS INT), 'stage_name', 'raw', 'n_docs', c0, 'n_tokens', t0), "
        "named_struct('stage', CAST(1 AS INT), 'stage_name', 'exact_dedup', 'n_docs', c1, 'n_tokens', t1), "
        "named_struct('stage', CAST(2 AS INT), 'stage_name', 'quality', 'n_docs', c2, 'n_tokens', t2), "
        "named_struct('stage', CAST(3 AS INT), 'stage_name', 'repetition', 'n_docs', c3, 'n_tokens', t3)))"
    )


@query(
    "scd2_event_state_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS version
      FROM o),
    g AS (
      SELECT user_id, version, MIN(event_type) AS state,
             MIN(ts) AS vf, COUNT(*) AS n
      FROM v GROUP BY 1, 2)
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           state,
           epoch_us(vf) AS valid_from_us,
           lead(epoch_us(vf)) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to_us,
           (lead(vf) OVER (PARTITION BY user_id ORDER BY version) IS NULL)
             AS is_current,
           CAST(n AS BIGINT) AS n_events
    FROM g
    """,
)
def scd2_event_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension assembly from an event log:
    collapse each user's consecutive runs of the same state
    (event_type) into versioned validity intervals —
    [valid_from, valid_to) with an open current row — the standard
    lakehouse dimension-history build (Kimball SCD type 2), derived
    with gaps-and-islands instead of a MERGE loop.

    Scale posture: ONE exchange total. The change-flag window, the
    cumulative version sum, the per-version aggregate, and the
    valid_to lead window are all clustered by user_id —
    HashPartitioning(user_id) satisfies every downstream distribution
    (groupBy(user_id, version) clusters on a superset of the
    partitioning keys), so Catalyst inserts no further shuffle.
    Timestamps surface as integer epoch-microseconds, so the driver
    hash is exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    v = o.withColumn(
        "version", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    g = v.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return g.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        F.unix_micros(F.col("vf").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead("vf").over(w2).cast("timestamp")).alias("valid_to_us"),
        F.lead("vf").over(w2).isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )


_PHASH_SEED_MOD = 23
_PHASH_POWERS = ", ".join(str(1 << i) for i in range(64))


def _phash_cte_sql(seed_mod: int, perturb_odd: bool) -> str:
    """Shared CTE chain replaying the ENTIRE image pipeline in SQL from
    doc_id arithmetic: the BMP pixel bytes are an LCG over the padded
    pixel buffer (codecs._fill_bytes), so every sampled grid byte — and
    therefore the dHash — is recomputable without ever seeing a payload.
    64-bit wraparound multiply is emulated in HUGEINT (DuckDB integer
    ops trap on overflow rather than wrapping). With ``perturb_odd``,
    odd documents get the planted +128 perturbation of the sampled
    grid-center pixel's first channel (see attach_image_bucketed)."""

    def byte(i: str) -> str:
        raw = (
            f"CAST((((({i}) + s) * 6364136223846793005 + 1442695040888963407)"
            f" % 170141183460469231731687303715884105728"  # keep HUGEINT ctx
            f" % 18446744073709551616) // 8589934592 % 256 AS BIGINT)"
        )
        if not perturb_odd:
            return raw
        # center pixel (gx=4, gy=4), channel 0 — same arithmetic as the
        # Spark-side synthesis
        pidx = "((h - 1 - (4 * h) // 8) * ((w * 3 + 3) // 4 * 4) + ((4 * w) // 9) * 3)"
        return (
            f"CASE WHEN doc_id % 2 = 1 AND ({i}) = {pidx}"
            f" THEN ({raw} + 128) % 256 ELSE {raw} END"
        )

    base = "((h - 1 - sy) * ((w * 3 + 3) // 4 * 4) + sx * 3)"
    return f"""d AS (
      SELECT doc_id,
             CAST(doc_id % {seed_mod} AS HUGEINT) AS s,
             CAST(doc_id % {seed_mod} % 64 + 16 AS BIGINT) AS w,
             CAST(doc_id % {seed_mod} % 48 + 16 AS BIGINT) AS h
      FROM documents),
    grid AS (
      SELECT d.*, gy.y, gx.x,
             (gx.x * d.w) // 9 AS sx,
             (gy.y * d.h) // 8 AS sy
      FROM d, generate_series(0, 7) gy(y), generate_series(0, 8) gx(x)),
    gray AS (
      SELECT doc_id, y, x,
             ({byte(base)} + {byte(base + " + 1")} + {byte(base + " + 2")}) // 3
               AS g
      FROM grid),
    bits AS (
      SELECT doc_id, y, x,
             CASE WHEN g > lead(g) OVER (PARTITION BY doc_id, y ORDER BY x)
                  THEN 1 ELSE 0 END AS bit
      FROM gray),
    ph AS (
      SELECT doc_id,
             SUM(CAST(bit AS HUGEINT)
                 * ([{_PHASH_POWERS}]::HUGEINT[])[y * 8 + x + 1]) AS pu
      FROM bits WHERE x < 8 GROUP BY doc_id),
    signed AS (
      SELECT doc_id,
             CAST(CASE WHEN pu >= 9223372036854775808
                       THEN pu - 18446744073709551616 ELSE pu END AS BIGINT)
               AS phash
      FROM ph)"""


def _phash_oracle_sql(seed_mod: int = _PHASH_SEED_MOD) -> str:
    return f"""
    WITH {_phash_cte_sql(seed_mod, perturb_odd=False)}
    SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS group_size,
           COUNT(*) OVER (PARTITION BY phash) > 1 AS is_duplicate
    FROM signed
    """


@query("multimodal_phash_dedup", oracle=_phash_oracle_sql())
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed IMAGE dedup via perceptual difference hashing:
    synthesize a corpus with planted byte-identical images (content
    keyed by doc_id % 23), decode the REAL BMP byte streams, compute a
    64-bit dHash from the decoded pixels (9×8 nearest-neighbor
    grayscale, adjacent-comparison bits), and group documents by hash —
    the image-pipeline analog of md5-text exact dedup, robust to
    re-encoding in production.

    Scale posture: decode + hash is Arrow-batched mapInPandas —
    embarrassingly parallel, no shuffle; the only shuffled column is the
    8-byte hash (window over phash), never the payloads. Near-dup
    (hamming ≤ k) extends via the same pigeonhole banding as
    dedup_simhash_candidates.

    The oracle replays decode→sample→hash END-TO-END from doc_id
    arithmetic (the pixel LCG emulated with HUGEINT wraparound) — it
    never sees a byte, so the hash match proves the Spark side genuinely
    parsed headers, padding, bottom-up row order, and pixel values."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_image_bucketed,
        perceptual_dhash,
    )
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    hashed = perceptual_dhash(
        attach_image_bucketed(d, seed_mod=_PHASH_SEED_MOD)
    )
    w = Window.partitionBy("phash")
    n = F.count(F.lit(1)).over(w)
    return hashed.select(
        "doc_id", "phash",
        n.cast("long").alias("group_size"),
        (n > 1).alias("is_duplicate"),
    )


def _phash_pairs_oracle_sql(seed_mod: int = _PHASH_SEED_MOD) -> str:
    # Ground truth, not a replay of the algorithm: brute-force ALL-PAIRS
    # Hamming join over independently recomputed hashes. The banded
    # Spark plan must reproduce it exactly — the pigeonhole guarantee
    # (hamming <= bands-1 => some 16-bit chunk matches) says recall is
    # 100% at radius 2, and the driver hash-match proves it.
    return f"""
    WITH {_phash_cte_sql(seed_mod, perturb_odd=True)}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM signed a JOIN signed b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.phash, b.phash)) <= 2
    """


@query("multimodal_phash_near_pairs", oracle=_phash_pairs_oracle_sql())
def multimodal_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs (Hamming ≤ 2 on the 64-bit dHash) via
    pigeonhole banding — the image analog of SimHash text dedup. The
    planted corpus has byte-identical twins (hamming 0) AND odd-id
    variants perturbed at a grid-sampled pixel (hamming 1-2), so the
    result exercises genuinely-near-but-not-identical matches.

    Scale posture: the hash splits into four 16-bit chunks; any pair
    within Hamming 3 must agree on a whole chunk, so banding is an
    EQUI-JOIN on (band, chunk): the banded table (4 narrow rows per
    image, checkpointed so the dHash pipeline runs once) self-joins on
    the bucket key — sort-merge buffers one bucket's rows per key, so
    task memory is O(bucket) no matter how dense duplicates get, and
    AQE's skew-join splitting applies to pathological buckets for free.
    First-colliding-band exactly-once emission and the Hamming verify
    are pure codegen lane/bit_count arithmetic on the carried hashes —
    no per-pair interpreted HOF, no collect_list buffering (the
    previous in-bucket generator expansion held and copied whole-bucket
    arrays per anchor row: measured 92 s / OOM-prone on the 10×
    replicated layout where every image has ten identical twins; this
    join form runs it in seconds). The ORACLE is the opposite plan —
    brute-force quadratic ground truth over independently recomputed
    hashes — so the driver match proves the banding loses nothing at
    radius 2."""
    from jhu_data_parser_spark.operators.dedup import banded_hamming_pairs
    from jhu_data_parser_spark.operators.multimodal import (
        attach_image_bucketed,
        perceptual_dhash,
    )

    d = load_table(spark, sf_dir, "documents")
    hashed = perceptual_dhash(
        attach_image_bucketed(d, seed_mod=_PHASH_SEED_MOD, perturb_odd=True)
    )
    # Pair-listing budget: at extreme duplicate density (the 100×
    # layout's ~21k-member groups) the intra listing is Σ C(k,2) ≈ 1e10
    # rows — fail fast with group diagnostics (use the O(n) groups
    # deliverable there) instead of letting the output OOM the job.
    return banded_hamming_pairs(
        hashed,
        id_col="doc_id",
        hash_col="phash",
        bands=4,
        max_hamming=2,
        max_intra_pairs=100_000_000,
    )


@query(
    "join_asof_nearest_click",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, m.cid AS click_id, m.side, m.delta_us
    FROM p LEFT JOIN LATERAL (
      SELECT cid,
             CASE WHEN ct <= pt THEN 'backward' ELSE 'forward' END AS side,
             CASE WHEN ct <= pt THEN pt - ct ELSE ct - pt END AS delta_us
      FROM c
      WHERE c.user_id = p.user_id AND abs(ct - pt) <= 1800000000
      ORDER BY delta_us, ct, cid
      LIMIT 1) m ON TRUE
    """,
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event attribution: each purchase matched to the CLOSEST
    click by the same user within ±30 minutes, whichever side of the
    purchase it falls on (ties → earlier click) — the bidirectional
    complement of the backward as-of join.

    Scale posture: operators/joins.asof_join_nearest — one union, one
    user_id exchange, two window passes over the same partitioning, and
    a codegen candidate pick; never a non-equi nested-loop join. The
    oracle is the quadratic ground truth (LATERAL min-|Δ| per purchase),
    so the driver match proves the two-pass window rewrite implements
    nearest semantics exactly, tie-breaks included."""
    from jhu_data_parser_spark.operators.joins import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    out = asof_join_nearest(
        purchases, clicks,
        key="user_id", left_ts="ts", right_ts="ts",
        right_id="click_id", tolerance_us=1_800_000_000,
    )
    return out.select("purchase_id", "click_id", "side", "delta_us")


# --------------------------------------------------------------------------
# URL-canonicalization dedup — the step CommonCrawl-scale pipelines run
# BEFORE any content dedup: the same page arrives under scheme/case/
# www/port/tracking-param/fragment variants, and collapsing them is
# string normalization, not similarity. URLs are synthesized from
# doc_id (same attach pattern as the multimodal family: the messy raw
# string is a pure function of the id, replayed identically in DuckDB)
# and then canonicalized FROM THE RAW STRING by the real operator —
# scheme strip, fragment strip, host lowercasing, www./default-port
# strip, trailing-slash strip, tracking-param filter with kept params
# preserved — all codegen string/regex ops, zero UDFs, one shuffle on
# the canonical key. 40 planted identities; the oracle only matches if
# every normalization step ran against the raw bytes.
# --------------------------------------------------------------------------

# raw URL variants planted per doc_id: scheme case (did%4), www. (did%3),
# host case (did%5), :443 (did%7), trailing slash (did%2), tracking
# params around a KEPT p=<k> param (did%6), #fragment (did%4). The
# canonical identity is k = did % 40.
def _url_raw_spark(uid: str = "doc_id % 40") -> str:
    """Spark twin of :func:`_url_raw_sql` — same parameterization."""
    return f"""
    concat(
      element_at(array('http', 'https', 'HTTP', 'HTTPS'),
                 CAST(doc_id % 4 AS INT) + 1), '://',
      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
      CASE WHEN doc_id % 5 = 0 THEN upper(concat('site', CAST({uid} AS STRING), '.com'))
           ELSE concat('site', CAST({uid} AS STRING), '.com') END,
      CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END,
      '/docs/', CAST({uid} AS STRING),
      CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      CASE WHEN doc_id % 6 = 0 THEN concat('?utm_source=feed&p=', CAST({uid} AS STRING))
           WHEN doc_id % 6 = 3 THEN concat('?p=', CAST({uid} AS STRING), '&utm_medium=email')
           ELSE concat('?p=', CAST({uid} AS STRING)) END,
      CASE WHEN doc_id % 4 = 0 THEN concat('#section-', CAST(doc_id % 9 AS STRING)) ELSE '' END)
    """


_URL_RAW_SPARK = _url_raw_spark()

# The WITH-body of the URL canonicalization chain (raw → canon), shared
# by the standalone oracle below and the curation-funnel v2 oracle
# (pipeline12) so both replay the identical normalization text.
# SQL fragment synthesizing the decorated raw URL for a given id
# expression — parameterized so the funnel-v3 oracle (pipeline13) can
# key site/path/param on a MIRRORED id while keeping the decoration
# variants keyed on doc_id (mirrors differ in raw bytes, canonicalize
# equal).
def _url_raw_sql(uid: str = "doc_id % 40") -> str:
    return f"""
             (['http', 'https', 'HTTP', 'HTTPS'])[CAST(doc_id % 4 AS INT) + 1]
             || '://'
             || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN upper('site' || CAST({uid} AS VARCHAR) || '.com')
                     ELSE 'site' || CAST({uid} AS VARCHAR) || '.com' END
             || CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END
             || '/docs/' || CAST({uid} AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || CASE WHEN doc_id % 6 = 0
                     THEN '?utm_source=feed&p=' || CAST({uid} AS VARCHAR)
                     WHEN doc_id % 6 = 3
                     THEN '?p=' || CAST({uid} AS VARCHAR) || '&utm_medium=email'
                     ELSE '?p=' || CAST({uid} AS VARCHAR) END
             || CASE WHEN doc_id % 4 = 0
                     THEN '#section-' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END
    """


# The canonicalization steps (url → canonical_url) WITHOUT the raw
# synthesis CTE — composable behind any `raw(doc_id, url)` CTE.
_URL_CANON_STEPS = """steps AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(url, '^[A-Za-z]+://', ''),
                            '#.*$', '') AS defrag
      FROM raw),
    split AS (
      SELECT doc_id, url,
             regexp_replace(defrag, '\\?.*$', '') AS hp,
             CASE WHEN strpos(defrag, '?') > 0
                  THEN substr(defrag, strpos(defrag, '?') + 1) ELSE '' END AS qs
      FROM steps),
    norm AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(hp), '^www\\.', ''),
                 ':(80|443)(/|$)', '\\2'),
               '/$', '') AS hostpath,
             list_filter(string_split(qs, '&'),
                         p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p = ''))
               AS kept
      FROM split),
    canon AS (
      SELECT doc_id, url,
             hostpath || CASE WHEN len(kept) > 0
                              THEN '?' || array_to_string(kept, '&')
                              ELSE '' END AS canonical_url
      FROM norm)"""

_URL_CANON_CTES = (
    f"""raw AS (
      SELECT doc_id, {_url_raw_sql()} AS url
      FROM documents),
    """
    + _URL_CANON_STEPS
)

_URL_ORACLE = (
    "WITH "
    + _URL_CANON_CTES
    + """
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    """
)


def url_canonical_frame(d):
    """(doc_id, url, canonical_url) — the reusable canonicalization
    chain (scheme/fragment strip, host lowercase, www./default-port
    strip, trailing-slash strip, tracking-param filter); shared by
    text_url_canonical_dedup and the curation-funnel v2."""
    raw = d.select("doc_id", F.expr(_URL_RAW_SPARK).alias("url"))
    return canonicalize_urls(raw)


def canonicalize_urls(raw):
    """Canonicalize a (doc_id, url) frame — the steps of
    :func:`url_canonical_frame` behind any URL synthesis (funnel v3
    plugs a mirrored-id synthesis, pipeline13)."""
    defrag = F.regexp_replace(
        F.regexp_replace("url", "^[A-Za-z]+://", ""), "#.*$", ""
    )
    s = raw.select("doc_id", "url", defrag.alias("defrag"))
    hp = F.regexp_replace("defrag", "\\?.*$", "")
    qs = F.expr(
        "CASE WHEN instr(defrag, '?') > 0 "
        "THEN substr(defrag, instr(defrag, '?') + 1) ELSE '' END"
    )
    sp = s.select("doc_id", "url", hp.alias("hp"), qs.alias("qs"))
    hostpath = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("hp")), "^www\\.", ""),
            ":(80|443)(/|$)",
            "$2",
        ),
        "/$",
        "",
    )
    kept = F.expr(
        "filter(split(qs, '&'), p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid=%' "
        "OR p = ''))"
    )
    n = sp.select("doc_id", "url", hostpath.alias("hostpath"), kept.alias("kept"))
    canonical = F.expr(
        "concat(hostpath, CASE WHEN size(kept) > 0 "
        "THEN concat('?', array_join(kept, '&')) ELSE '' END)"
    )
    return n.select("doc_id", "url", canonical.alias("canonical_url"))


@query("text_url_canonical_dedup", oracle=_URL_ORACLE)
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup groups: strip scheme and fragment,
    lowercase the authority, drop www. and default ports, drop the
    trailing slash, filter tracking params (utm_*, fbclid) while
    PRESERVING real params — then group by the canonical URL with
    count, raw-variant count, and the min-id keeper. Every step is a
    codegen string/regex op over the raw URL bytes; the only shuffle
    is the final canonical-key aggregate. At 100 TB this is the
    cheapest dedup pass a crawl pipeline runs (no content touched),
    which is why it goes first."""
    d = load_table(spark, sf_dir, "documents")
    return (
        url_canonical_frame(d)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("url").cast("long").alias("n_raw_variants"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )
