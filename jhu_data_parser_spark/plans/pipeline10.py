"""Round-7 fourth-wave catalog queries: four more published curation /
retrieval-training operators — a bigram-LM perplexity filter (the
CCNet / Wenzek et al. 2020 model-filter mechanism, re-expressed with a
corpus-trained add-one bigram LM), a domain-blocklist filter (the UT1-
style crawl hygiene pass), hard-negative mining for embedding-model
training data (BM25-plausible but semantically-far documents), and
temperature-scaled source mixing (the XLM-R / mT5 n^alpha rule).

Reference parity note: the reference (src/parser.py:28-102,
src/parser2.py:28-139) has no analytics surface — these extend the
engine along SURVEY.md §2's "LLM data pipeline" axis, each paired with
a DuckDB oracle replaying the identical arithmetic.

Exactness discipline (same as pipeline9): every hash gate rides on
integers — counts, fixed-point floor(1e6·ln(r)) of exactly-
representable rationals (numerator/denominator are int64 products
< 2^53, so the DOUBLE cast, the single ÷, and the single ln see
bit-identical inputs in both engines), floor(1e6·sqrt(n)) draws, and
integer DIV shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.plans.pipeline4 import _bm25_contrib_sql
from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql
from jhu_data_parser_spark.plans.pipeline9 import (
    _RRF_SHORTLIST,
    _RRF_TERMS,
)
from jhu_data_parser_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Bigram-LM perplexity filter — the CCNet quality signal (Wenzek et
# al. 2020 train a 5-gram KenLM and bucket documents by perplexity;
# the distributed re-expression trains an add-one-smoothed BIGRAM LM
# on the corpus itself and buckets per language).
#
#   nll(w | prev) = ln((c(prev) + V) / (c(prev,w) + 1))      [add-one]
#   doc perplexity (micro-nats/token) = Σ nll  DIV  n_bigrams
#
# Scale posture: one explode produces the (prev, bigram) stream; the
# bigram-count table aggregates with map-side combine and JOINS BACK ON
# THE BIGRAM KEY (a shuffle join — bigram vocabularies do NOT reliably
# fit in a broadcast at 100 TB, unlike unigrams); the unigram-context
# counts and the vocab-size scalar broadcast. Per-doc sums shuffle
# uniform doc_id keys once; the rollup output is ≤ |langs|·|buckets|.
#
# Exactness: c(prev), c(prev,w), V are integers; (c(prev)+V) and
# (c(prev,w)+1) are exact int64 → DOUBLE (< 2^53) → one IEEE ÷, one
# ln, one floor(1e6·x) → identical in both engines (the DSIR
# fixed-point-ln pattern); per-doc sums and the final DIV are integer.
# --------------------------------------------------------------------------

_PPX_BUCKET_MICRO = 250_000  # 0.25 nats/token per bucket

_PPX_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id, lang, z[1] AS prev, z[1] || '_' || z[2] AS big
      FROM (SELECT doc_id, lang,
                   unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z
            FROM d WHERE len(w) >= 2)),
    cb AS (SELECT big, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY 1),
    cp AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
          FROM (SELECT unnest(w) AS tok FROM d)),
    nll AS (
      SELECT bg.doc_id, bg.lang,
             CAST(floor(1000000.0 * ln(
               CAST(cp.cp + v.v AS DOUBLE) / CAST(cb.cb + 1 AS DOUBLE)))
               AS BIGINT) AS nll_micro
      FROM bg JOIN cb USING (big) JOIN cp USING (prev), v),
    pd AS (
      SELECT doc_id, lang,
             CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS ppx_micro
      FROM nll GROUP BY 1, 2)
    SELECT lang,
           CAST(ppx_micro // {_PPX_BUCKET_MICRO} AS BIGINT) AS ppx_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ppx_micro) AS BIGINT) AS sum_ppx_micro,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM pd GROUP BY 1, 2
    """


@query("text_bigram_perplexity", oracle=_PPX_ORACLE)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity buckets from a corpus-trained add-one
    bigram LM: per (lang, 0.25-nat bucket) document counts, exact
    fixed-point micro-nat sums, and a doc-id checksum."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("w")
    )
    bg = (
        d.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                    " (a, b) -> struct(a AS prev, concat(a, '_', b) AS big))"
                )
            ).alias("z"),
        )
        .select("doc_id", "lang", "z.prev", "z.big")
    )
    # Two full-stream aggregates, both map-side-combined. (Deriving
    # c(prev) by re-aggregating a (prev, big)-keyed count table was
    # measured SLOWER at sf0.1 and 100× — the wider shuffle key costs
    # more than the second combine-compressed aggregate saves.)
    cb = bg.groupBy("big").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    cp = bg.groupBy("prev").agg(F.count(F.lit(1)).cast("long").alias("cp"))
    v = d.select(F.explode("w").alias("tok")).agg(
        F.countDistinct("tok").cast("long").alias("v")
    )
    nll = (
        bg.join(cb, "big")  # shuffle join: bigram vocab may not broadcast
        .join(F.broadcast(cp), "prev")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "CAST(floor(1000000.0 * ln("
                "CAST(cp + v AS DOUBLE) / CAST(cb + 1 AS DOUBLE))) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    pd = nll.groupBy("doc_id", "lang").agg(
        F.expr("CAST(SUM(nll_micro) DIV COUNT(*) AS BIGINT)").alias("ppx_micro")
    )
    return pd.groupBy(
        "lang",
        F.expr(f"CAST(ppx_micro DIV {_PPX_BUCKET_MICRO} AS BIGINT)").alias(
            "ppx_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ppx_micro").cast("long").alias("sum_ppx_micro"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# Domain-blocklist filter — the crawl-hygiene pass every web corpus
# gets before content filtering (UT1 / adult-domain lists): extract
# the registrable domain from each page URL and drop documents whose
# domain is listed. Hosts are synthesized from doc_id (the established
# attach pattern: a subdomain prefix, a numbered base, a .com/.org
# TLD), the registrable domain is the last two labels, and the
# blocklist is derived deterministically (md5 draw on the domain, ~1
# in 5 blocked) so the filter genuinely fires.
#
# Scale posture: real blocklists are MB-scale (≤ millions of rows) —
# the list BROADCASTS into the corpus scan (plan-tested) and the
# filter is a left join + flag, never a shuffle of the corpus on the
# domain key; per-source stats shuffle ≤ |sources| rows.
# --------------------------------------------------------------------------

_HOST_SPARK = """
    concat(
      element_at(array('', 'cdn.', 'blog.'), CAST(doc_id % 3 AS INT) + 1),
      'site', CAST(doc_id % 50 AS STRING),
      CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.org' END)
    """

_HOST_DUCK = """
      (['', 'cdn.', 'blog.'])[CAST(doc_id % 3 AS INT) + 1]
      || 'site' || CAST(doc_id % 50 AS VARCHAR)
      || CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.org' END
    """

_BLOCK_ORACLE = f"""
    WITH hosts AS (
      SELECT doc_id, source, {_HOST_DUCK} AS host FROM documents),
    dom AS (
      SELECT doc_id, source,
             regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
      FROM hosts),
    blocked AS (
      SELECT DISTINCT domain FROM dom
      WHERE ({_hexpoly_sql("md5(domain)", 4)}) % 5 = 0)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(b.domain) AS BIGINT) AS n_blocked,
           CAST(COUNT(*) - COUNT(b.domain) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN b.domain IS NULL THEN d.doc_id END), 0)
                AS BIGINT) AS kept_id_sum
    FROM dom d LEFT JOIN blocked b ON d.domain = b.domain
    GROUP BY 1
    """


@query("text_domain_blocklist_filter", oracle=_BLOCK_ORACLE)
def text_domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain blocklist filter: per-source document counts,
    blocked/kept split, and a kept-doc-id checksum; the blocklist is a
    broadcast dim derived from an md5 draw over distinct domains."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.regexp_extract(
            F.expr(_HOST_SPARK), r"([^.]+\.[^.]+)$", 1
        ).alias("domain"),
    )
    blocked = (
        d.select("domain")
        .distinct()
        .filter(
            F.conv(F.substring(F.md5("domain"), 1, 4), 16, 10).cast("long") % 5
            == 0
        )
        .withColumn("hit", F.lit(1))
    )
    return (
        d.join(F.broadcast(blocked), "domain", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("hit").cast("long").alias("n_blocked"),
            (F.count(F.lit(1)) - F.count("hit")).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("hit").isNull(), F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
    )


# --------------------------------------------------------------------------
# Hard-negative mining — the training-data op behind every modern
# embedding model (DPR / Karpukhin et al. 2020 §4.2): for a query,
# take documents the LEXICAL ranker finds plausible (BM25 shortlist)
# that the DENSE ranker rejects (outside the cosine top-k) — those are
# the hard negatives a contrastive batch wants. Shares its two ranker
# sides with retrieval_rrf_hybrid (same terms, same query vector).
#
# Scale posture: both sides are one-scan partial top-k shortlists
# (TakeOrderedAndProject); the set difference and the rank window run
# on ≤50 rows; the exact cosine for the surviving negatives comes from
# broadcasting the ≤50-row shortlist back into the embedding scan (the
# sim_pq_rerank refine shape) — full vectors are touched for ≤50 rows
# regardless of corpus size.
#
# Exactness: BM25 is the 1e-6 fixed-point contribution chain; cosine
# is DOUBLE[]-exact dot/sqrt/÷ on identical inputs, gated through one
# floor(1e9·sim).
# --------------------------------------------------------------------------

_HN_TOPK = 20


def _hard_neg_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_RRF_TERMS)
    )
    df_cols = ", ".join(
        f"COUNT(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(_RRF_TERMS))
    )
    contrib = " + ".join(
        _bm25_contrib_sql(f"tf{i}", f"df{i}") for i in range(len(_RRF_TERMS))
    )
    any_hit = " + ".join(f"tf{i}" for i in range(len(_RRF_TERMS)))
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
               FROM documents WHERE doc_id <> 0),
    t AS (SELECT doc_id, dl, {tf_cols} FROM d),
    s AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM t),
    bm AS (SELECT doc_id, CAST({contrib} AS BIGINT) AS score_fp
           FROM t, s WHERE {any_hit} > 0
           ORDER BY score_fp DESC, doc_id LIMIT {_RRF_SHORTLIST}),
    bmr AS (SELECT doc_id, score_fp,
                   row_number() OVER (ORDER BY score_fp DESC, doc_id) AS r
            FROM bm),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = 0),
    cs AS (SELECT e.vec_id AS doc_id
           FROM embeddings e, qv WHERE e.vec_id <> 0
           ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.qe)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(qv.qe, qv.qe))) DESC, doc_id
           LIMIT {_RRF_SHORTLIST}),
    hard AS (
      SELECT b.doc_id, b.score_fp, b.r
      FROM bmr b ANTI JOIN cs c ON b.doc_id = c.doc_id),
    sims AS (
      SELECT h.doc_id, h.score_fp, h.r,
             CAST(floor(1000000000.0 *
               (list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.qe)
                / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(qv.qe, qv.qe))))) AS BIGINT)
               AS sim_nano
      FROM hard h JOIN embeddings e ON e.vec_id = h.doc_id, qv)
    SELECT doc_id, CAST(r AS BIGINT) AS bm25_rank, score_fp AS bm25_fp,
           sim_nano,
           CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS neg_rank
    FROM sims ORDER BY r LIMIT {_HN_TOPK}
    """


@query("retrieval_hard_negatives", oracle=_hard_neg_oracle())
def retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for the RRF query: BM25-shortlisted documents
    OUTSIDE the dense cosine top-50, ranked by BM25, with the exact
    cosine of each survivor recovered via a broadcast join back into
    the embedding scan."""
    from jhu_data_parser_spark.operators import similarity as sim

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") != 0)
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("dl"),
        *[
            F.expr(f"size(filter(split(text, ' '), x -> x = '{term}'))")
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(_RRF_TERMS)
        ],
    )
    stats = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(_RRF_TERMS))
        ],
    )
    contrib = " + ".join(
        _bm25_contrib_sql(f"tf{i}", f"df{i}") for i in range(len(_RRF_TERMS))
    )
    any_hit = " + ".join(f"tf{i}" for i in range(len(_RRF_TERMS)))
    bm = (
        t.crossJoin(F.broadcast(stats))
        .filter(F.expr(any_hit) > 0)
        .select("doc_id", F.expr(f"CAST({contrib} AS BIGINT)").alias("score_fp"))
        .orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(_RRF_SHORTLIST)
    )
    bmr = bm.select(
        "doc_id",
        "score_fp",
        F.row_number()
        .over(Window.orderBy(F.col("score_fp").desc(), "doc_id"))
        .alias("r"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    cs = sim.topk_cosine(
        e.filter(F.col("vec_id") != 0), qv, k=_RRF_SHORTLIST
    ).select(F.col("vec_id").alias("doc_id"))
    hard = bmr.join(cs, "doc_id", "left_anti")
    # exact cosine for the ≤50 survivors: broadcast the shortlist into
    # the embedding scan (the rerank refine shape), never the reverse.
    qlit = F.array(*[F.lit(x) for x in qv])
    qn = sum(x * x for x in qv) ** 0.5
    sims = (
        e.join(F.broadcast(hard), e.vec_id == hard.doc_id)
        .select(
            "doc_id",
            "score_fp",
            "r",
            # Rounding order matches the oracle exactly: 1e9 * (dot/denom),
            # not (1e9*dot)/denom — the two can differ by 1 ulp and flip
            # the floor at bucket boundaries.
            F.floor(
                1_000_000_000.0
                * (
                    sim.dot(F.col("embedding"), qlit)
                    / (sim.l2_norm(F.col("embedding")) * F.lit(qn))
                )
            )
            .cast("long")
            .alias("sim_nano"),
        )
    )
    w = Window.orderBy("r")
    return (
        sims.orderBy("r")
        .limit(_HN_TOPK)
        .select(
            "doc_id",
            F.col("r").cast("long").alias("bm25_rank"),
            F.col("score_fp").alias("bm25_fp"),
            "sim_nano",
            F.row_number().over(w).cast("long").alias("neg_rank"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-scaled source mixing — the multilingual-sampling rule
# (XLM-R / Conneau et al. 2020; mT5): sample source i proportionally
# to n_i^alpha with alpha = 0.5, so low-resource sources are
# up-sampled relative to their token share. One corpus scan into a
# ≤|sources|-row aggregate; all downstream arithmetic is on that tiny
# table.
#
# Exactness: n_i is an integer token count; s_i = floor(1e6·sqrt(n_i))
# (IEEE sqrt is correctly rounded — identical in both engines); shares
# and allocations are integer DIV on exact int64 products (1e6·s_i and
# B·s_i both < 2^63 for any corpus under ~10^24 tokens/source).
# --------------------------------------------------------------------------

_MIX_BUDGET = 100_000  # documents to allocate across sources

_MIX_ORACLE = f"""
    WITH n AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    s AS (
      SELECT source, n_tokens,
             CAST(floor(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)))
                  AS BIGINT) AS s_fp
      FROM n),
    tot AS (SELECT CAST(SUM(s_fp) AS BIGINT) AS sum_s,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_n FROM s)
    SELECT source, n_tokens,
           CAST(1000000 * n_tokens // sum_n AS BIGINT) AS prop_ppm,
           CAST(1000000 * s_fp // sum_s AS BIGINT) AS temp_ppm,
           CAST({_MIX_BUDGET} * s_fp // sum_s AS BIGINT) AS alloc_docs
    FROM s, tot
    """


@query("sample_temperature_mix", oracle=_MIX_ORACLE)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) source-mixing weights: exact
    proportional vs temperature ppm shares and an integer document
    allocation per source."""
    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    s = n.select(
        "source",
        "n_tokens",
        F.floor(1_000_000.0 * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("long")
        .alias("s_fp"),
    )
    tot = s.agg(
        F.sum("s_fp").cast("long").alias("sum_s"),
        F.sum("n_tokens").cast("long").alias("sum_n"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr("CAST(1000000 * n_tokens DIV sum_n AS BIGINT)").alias(
            "prop_ppm"
        ),
        F.expr("CAST(1000000 * s_fp DIV sum_s AS BIGINT)").alias("temp_ppm"),
        F.expr(f"CAST({_MIX_BUDGET} * s_fp DIV sum_s AS BIGINT)").alias(
            "alloc_docs"
        ),
    )
