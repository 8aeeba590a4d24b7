"""Round-7 second-wave catalog queries: corpus-curation operators a
large-scale training-data pipeline runs between crawl and tokenizer.

Reference parity note: the reference (src/parser.py:28-102,
src/parser2.py:28-139) has no analytics surface at all — these queries
extend the engine along SURVEY.md §2's "LLM data pipeline" axis, each
paired with a DuckDB oracle replaying the identical arithmetic.

Scale posture shared by the module: every query is expressible as
codegen string/array expressions plus hash-partitioned aggregates —
no UDFs, no driver collects (the one deliberate exception is the
≤n_parts-row offsets frame inside ``operators/intervals.global_rank``,
the same class as a broadcast dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql
from jhu_data_parser_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Global rank WITHOUT a single-partition window — the distributed
# two-level prefix sum (operators/intervals.global_rank) applied to the
# classic "rank every customer by lifetime spend" ask. A naive
# ``RANK() OVER (ORDER BY spend DESC)`` puts the whole corpus through
# ONE task at scale; here the rank comes from range-partitioned
# per-partition running sums plus a ≤n_parts-row offset table, so
# wall-clock scales with rows. Competition ranking (ties share the
# smallest rank) is encoded in the sort key: at equal spend, probe rows
# (tag 0) sort before point rows (tag 1), so a probe's running sum
# counts exactly the customers with STRICTLY greater spend.
# --------------------------------------------------------------------------

_GLOBAL_RANK_ORACLE = """
    WITH s AS (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY 1)
    SELECT c_custkey, spend_cents,
           CAST(RANK() OVER (ORDER BY spend_cents DESC) AS BIGINT) AS spend_rank
    FROM s
    """


@query("window_global_rank_distributed", oracle=_GLOBAL_RANK_ORACLE)
def window_global_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact competition rank of every customer by total spend (exact
    integer cents), computed by the distributed prefix-sum rank — the
    plan a 100 TB engine must use where ``RANK() OVER (ORDER BY …)``
    would serialize the corpus into one task."""
    from jhu_data_parser_spark.operators.intervals import global_rank

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("spend_cents")
    )
    points = spend.select(
        (-F.col("spend_cents")).alias("neg"),
        F.lit(1).alias("tag"),
        F.lit(1).cast("long").alias("w"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("long").alias("spend_cents"),
    )
    probes = spend.select(
        (-F.col("spend_cents")).alias("neg"),
        F.lit(0).alias("tag"),
        F.lit(0).cast("long").alias("w"),
        "c_custkey",
        "spend_cents",
    )
    ranked = global_rank(points.unionByName(probes), ["neg", "tag"], "w")
    return ranked.filter(F.col("w") == 0).select(
        "c_custkey",
        "spend_cents",
        (F.col("rank") + F.lit(1)).cast("long").alias("spend_rank"),
    )


# --------------------------------------------------------------------------
# Gopher-style quality-rule battery (Rae et al. 2021 §A1.1) — the
# document-level heuristic filter every pretraining pipeline runs.
# The raw corpus is decorated deterministically from doc_id (the same
# attach pattern as the URL/multimodal families: truncation, '#'
# symbol runs, numeric tokens — replayed identically in DuckDB) so
# every rule genuinely fires on part of the corpus, then the battery
# evaluates the decorated text with integer-exact RATIONAL comparisons
# (``3·n_words ≤ letters``) instead of float ratios — nothing to drift
# between engines. One shuffle: the per-lang rollup.
# --------------------------------------------------------------------------

_GOPHER_DECO_SPARK = """
    concat(
      CASE WHEN doc_id % 13 = 0
           THEN array_join(slice(split(text, ' '), 1, 8), ' ')
           ELSE text END,
      CASE WHEN doc_id % 7 = 0
           THEN repeat(' #', CAST(doc_id % 5 AS INT) + 1) ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN ' 12345 678 90210' ELSE '' END)
    """

_GOPHER_ORACLE = """
    WITH deco AS (
      SELECT doc_id, lang,
             (CASE WHEN doc_id % 13 = 0
                   THEN array_to_string(string_split(text, ' ')[1:8], ' ')
                   ELSE text END)
             || (CASE WHEN doc_id % 7 = 0
                      THEN repeat(' #', CAST(doc_id % 5 AS INT) + 1) ELSE '' END)
             || (CASE WHEN doc_id % 11 = 0 THEN ' 12345 678 90210' ELSE '' END)
               AS t
      FROM documents),
    m AS (
      SELECT lang,
             len(string_split(t, ' ')) AS n_words,
             length(t) - (len(string_split(t, ' ')) - 1) AS letters,
             length(t) - length(replace(t, '#', '')) AS n_hash,
             len(list_filter(string_split(t, ' '),
                             w -> NOT regexp_matches(w, '[a-z]'))) AS n_nonalpha,
             len(list_intersect(string_split(t, ' '),
                                ['the', 'and', 'of', 'to', 'in', 'a', 'is']))
               AS n_stop
      FROM deco),
    flags AS (
      SELECT lang,
             (n_words < 30) AS f_short,
             NOT (3 * n_words <= letters AND letters <= 10 * n_words) AS f_meanlen,
             (10 * n_hash > n_words) AS f_symbols,
             (10 * n_nonalpha > n_words) AS f_alpha,
             (n_stop < 2) AS f_stop
      FROM m)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE f_short) AS BIGINT) AS fail_short,
           CAST(COUNT(*) FILTER (WHERE f_meanlen) AS BIGINT) AS fail_meanlen,
           CAST(COUNT(*) FILTER (WHERE f_symbols) AS BIGINT) AS fail_symbols,
           CAST(COUNT(*) FILTER (WHERE f_alpha) AS BIGINT) AS fail_alpha,
           CAST(COUNT(*) FILTER (WHERE f_stop) AS BIGINT) AS fail_stopwords,
           CAST(COUNT(*) FILTER (
             WHERE NOT (f_short OR f_meanlen OR f_symbols OR f_alpha OR f_stop))
             AS BIGINT) AS n_pass
    FROM flags GROUP BY lang
    """


def _gopher_flags(d: DataFrame) -> DataFrame:
    """Per-document Gopher rule flags over a documents frame — shared
    by the batch report and its streaming twin (the flags are pure
    per-row codegen; the per-lang counts they roll into are mergeable
    by addition, which is what lets the stream re-sum per-batch
    partials into the exact batch answer)."""
    deco = d.select("doc_id", "lang", F.expr(_GOPHER_DECO_SPARK).alias("t"))
    m = deco.select(
        "lang",
        F.expr("size(split(t, ' '))").alias("n_words"),
        F.expr("length(t) - (size(split(t, ' ')) - 1)").alias("letters"),
        F.expr("length(t) - length(replace(t, '#', ''))").alias("n_hash"),
        F.expr(
            "size(filter(split(t, ' '), w -> NOT (w rlike '[a-z]')))"
        ).alias("n_nonalpha"),
        F.expr(
            "size(array_intersect(split(t, ' '), "
            "array('the', 'and', 'of', 'to', 'in', 'a', 'is')))"
        ).alias("n_stop"),
    )
    return m.select(
        "lang",
        (F.col("n_words") < 30).alias("f_short"),
        (
            ~(
                (3 * F.col("n_words") <= F.col("letters"))
                & (F.col("letters") <= 10 * F.col("n_words"))
            )
        ).alias("f_meanlen"),
        (10 * F.col("n_hash") > F.col("n_words")).alias("f_symbols"),
        (10 * F.col("n_nonalpha") > F.col("n_words")).alias("f_alpha"),
        (F.col("n_stop") < 2).alias("f_stop"),
    )


def _gopher_rollup(flags: DataFrame) -> DataFrame:
    """Per-lang count rollup of the rule flags (addition-mergeable)."""

    def cnt(cond: F.Column, name: str) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        cnt(F.col("f_short"), "fail_short"),
        cnt(F.col("f_meanlen"), "fail_meanlen"),
        cnt(F.col("f_symbols"), "fail_symbols"),
        cnt(F.col("f_alpha"), "fail_alpha"),
        cnt(F.col("f_stop"), "fail_stopwords"),
        cnt(
            ~(
                F.col("f_short")
                | F.col("f_meanlen")
                | F.col("f_symbols")
                | F.col("f_alpha")
                | F.col("f_stop")
            ),
            "n_pass",
        ),
    )


@query("text_gopher_quality", oracle=_GOPHER_ORACLE)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gopher-rule report: word-count floor, mean-word-
    length band, symbol-to-word ratio, alpha-word ratio, stopword
    presence — integer-exact rational comparisons over codegen string
    ops; the only shuffle is the per-lang rollup."""
    return _gopher_rollup(_gopher_flags(load_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# Line-level boilerplate removal (CCNet / RefinedWeb): a line that
# repeats across ≥ max(3, corpus/20) documents is boilerplate
# (nav bars, copyright footers, newsletter prompts) and is stripped
# from every document. Documents are decomposed into lines (6-word
# chunks of the real text, plus planted boilerplate lines from doc_id
# — replayed identically in DuckDB), line frequencies come from one
# hash-partitioned aggregate, and the removal is a BROADCAST anti-join
# against the boilerplate set — small by construction (that is the
# definition of boilerplate), so document payloads shuffle only once
# for the per-doc reassembly. The clean text is re-joined in original
# line order and gated by md5, so the driver proves the exact surviving
# byte sequence.
# --------------------------------------------------------------------------

# consumes a pre-split token column `w` (callers project
# split(text, ' ') AS w first): HOF lambdas are interpreted with no
# CSE, so an inline split(text) here re-tokenized the WHOLE text once
# per 6-word chunk — O(len²/6) per doc (r14, same class as the
# containment shingle fix)
_BOILER_LINES_SPARK = """
    concat(
      filter(array(CASE WHEN doc_id % 4 = 0
                        THEN 'subscribe to our newsletter today' END),
             x -> x IS NOT NULL),
      transform(sequence(0, CAST(ceil(size(w) / 6.0) AS INT) - 1),
                i -> array_join(slice(w, i * 6 + 1, 6), ' ')),
      filter(array(CASE WHEN doc_id % 6 = 0
                        THEN 'copyright 2024 all rights reserved' END,
                   CASE WHEN doc_id % 9 = 0
                        THEN 'click here to read more' END),
             x -> x IS NOT NULL))
    """

_BOILER_ORACLE = """
    WITH built AS (
      SELECT doc_id,
             list_filter([CASE WHEN doc_id % 4 = 0
                               THEN 'subscribe to our newsletter today' END],
                         x -> x IS NOT NULL)
             || list_transform(
                  generate_series(0,
                    CAST(ceil(len(string_split(text, ' ')) / 6.0) AS INT) - 1),
                  i -> array_to_string(string_split(text, ' ')[i*6+1 : i*6+6], ' '))
             || list_filter([CASE WHEN doc_id % 6 = 0
                                  THEN 'copyright 2024 all rights reserved' END,
                             CASE WHEN doc_id % 9 = 0
                                  THEN 'click here to read more' END],
                            x -> x IS NOT NULL)
               AS lines
      FROM documents),
    ex AS (
      SELECT doc_id,
             unnest(lines) AS line,
             unnest(generate_series(0, len(lines) - 1)) AS pos
      FROM built),
    tot AS (SELECT COUNT(*) AS n FROM built),
    stats AS (SELECT line, COUNT(DISTINCT doc_id) AS ndl FROM ex GROUP BY 1),
    boiler AS (SELECT line FROM stats, tot WHERE ndl >= GREATEST(3, n // 20)),
    kept AS (SELECT * FROM ex WHERE line NOT IN (SELECT line FROM boiler)),
    clean AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY 1)
    SELECT b.doc_id,
           CAST(len(b.lines) AS BIGINT) AS n_lines,
           CAST(len(b.lines) - c.n_kept AS BIGINT) AS n_removed,
           c.clean_md5
    FROM built b JOIN clean c USING (doc_id)
    """


@query("text_boilerplate_lines", oracle=_BOILER_ORACLE)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip lines that repeat across ≥ max(3, corpus/20) documents;
    per doc: line counts before/after and the md5 of the cleaned text
    reassembled in original line order."""
    d = load_table(spark, sf_dir, "documents")
    doc_lines = d.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select("doc_id", F.expr(_BOILER_LINES_SPARK).alias("lines"))
    # n_lines rides the exploded rows: every doc keeps ≥1 organic line
    # (planted boilerplate never equals a 6-word soup chunk), so the
    # final rollup needs no join back to a second evaluation of the
    # interpreted line-build HOF — one scan, one evaluation.
    ex = doc_lines.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.posexplode("lines").alias("pos", "line"),
    )
    total = doc_lines.agg(F.count(F.lit(1)).alias("tot"))
    stats = ex.groupBy("line").agg(F.countDistinct("doc_id").alias("ndl"))
    boiler = (
        stats.crossJoin(F.broadcast(total))
        .filter(F.col("ndl") >= F.greatest(F.lit(3), F.expr("tot DIV 20")))
        .select("line")
    )
    kept = ex.join(F.broadcast(boiler), "line", "left_anti")
    return kept.groupBy("doc_id").agg(
        F.max("n_lines").alias("n_lines"),
        (F.max("n_lines") - F.count(F.lit(1))).cast("long").alias("n_removed"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, line))), "
                    "s -> s.line)"
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# Hashed-feature linear quality scorer — fastText-style model INFERENCE
# as pure codegen: features are unigrams + adjacent bigrams, hashed
# into 1024 buckets via the portable md5 prefix, with a deterministic
# integer weight table w(b) = (37·b + 11) mod 201 − 100. The per-doc
# score is an exact integer sum, so the whole forward pass is two
# hash-partitioned aggregates and zero UDFs — the shape model-based
# corpus filtering takes at 100 TB (the real weights would arrive as a
# broadcast lookup table; the arithmetic is the same).
# --------------------------------------------------------------------------

_LINSCORE_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    f AS (
      SELECT doc_id, lang,
             unnest(w || list_transform(
               list_zip(w[1:len(w)-1], w[2:len(w)]),
               z -> z[1] || '_' || z[2])) AS feat
      FROM d),
    b AS (
      SELECT doc_id, lang,
             ({_hexpoly_sql("md5(feat)", 8)}) % 1024 AS bucket
      FROM f),
    s AS (
      SELECT doc_id, lang,
             CAST(SUM((bucket * 37 + 11) % 201 - 100) AS BIGINT) AS score
      FROM b GROUP BY 1, 2)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE score > 0) AS BIGINT) AS n_keep,
           CAST(SUM(score) AS BIGINT) AS sum_score,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM s GROUP BY lang
    """


@query("text_quality_linear_score", oracle=_LINSCORE_ORACLE)
def text_quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with a hashed unigram+bigram linear model
    (portable md5 bucket hash, deterministic integer weights) and roll
    keep-rates and score stats up per language."""
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(split(text, ' '), "
                "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
                "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), "
                "(a, b) -> concat(a, '_', b)))"
            )
        ).alias("feat"),
    )
    scored = feats.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("long") % 1024
        ).alias("bucket"),
    ).select(
        "doc_id",
        "lang",
        ((F.col("bucket") * 37 + 11) % 201 - 100).alias("wt"),
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("wt").cast("long").alias("score")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).cast("long").alias("n_keep"),
        F.sum("score").cast("long").alias("sum_score"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )


# --------------------------------------------------------------------------
# Asymmetric containment dedup — c(A,B) = |S_A ∩ S_B| / |S_A| ≥ 0.8 over
# 3-token shingle SETS: the "document quoted/embedded inside another"
# detector (news-wire copies, quoted posts) that symmetric Jaccard
# misses (a short doc inside a long one has tiny Jaccard but
# containment 1.0). Quote docs are planted deterministically (12-word
# prefixes of every %10 doc; the %20 half gets 5 unknown words appended
# so it genuinely FAILS the threshold), the corpus is collapsed to
# distinct texts first (exact duplicates belong to the exact pass — and
# it bounds the pair listing under replicated layouts), and candidates
# come from the ASYMMETRIC prefix filter: a container must share one of
# the contained doc's ⌊(1−τ)·n⌋+1 rarest shingles, so the inverted-
# index join touches rare postings only. Verification is an exact
# integer comparison 5·|∩| ≥ 4·|S_A| — no floats anywhere.
# --------------------------------------------------------------------------

_CONTAIN_CORPUS_SPARK = """
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS id,
           concat(array_join(slice(split(text, ' '), 1, 12), ' '),
                  CASE WHEN doc_id % 20 = 0
                       THEN ' zq1 zq2 zq3 zq4 zq5' ELSE '' END) AS text
    FROM documents WHERE doc_id % 10 = 0
    """

_CONTAIN_ORACLE = """
    WITH corpus AS (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(string_split(text, ' ')[1:12], ' ')
             || CASE WHEN doc_id % 20 = 0
                     THEN ' zq1 zq2 zq3 zq4 zq5' ELSE '' END
      FROM documents WHERE doc_id % 10 = 0),
    reps AS (SELECT text, MIN(id) AS id FROM corpus GROUP BY text),
    t AS (SELECT id, string_split(text, ' ') AS w FROM reps),
    sh AS (
      SELECT id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> array_to_string(w[i:i+2], ' ')))
                  ELSE [] END AS s
      FROM t),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_intersect(a.s, b.s)) AS n_shared,
             len(a.s) AS n_a
      FROM sh a JOIN sh b ON a.id <> b.id
      WHERE len(a.s) > 0)
    SELECT id_a, id_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_a AS BIGINT) AS n_a,
           CAST((1000 * n_shared) // n_a AS BIGINT) AS contain_millis
    FROM pairs WHERE 5 * n_shared >= 4 * n_a
    """


@query("dedup_containment_pairs", oracle=_CONTAIN_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ordered pairs (contained, container) with shingle-set
    containment ≥ 0.8, via the asymmetric prefix filter (candidates
    only from each doc's ⌊0.2·n⌋+1 globally-rarest shingles joined
    against the full inverted index) + exact set verification. The
    oracle is the QUADRATIC brute force, so the driver gate proves the
    prefix filter's 100% recall."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    corpus = spark.sql(_CONTAIN_CORPUS_SPARK)
    # Distinct-text collapse: exact duplicates are the exact pass's
    # job; at 100 TB this is exact_collapse on a fingerprint — here the
    # corpus-sized groupBy carries the text column once.
    reps = corpus.groupBy("text").agg(F.min("id").alias("id"))
    # Shingles are relabeled to xxhash64 longs ONCE (the Jaccard-family
    # lesson: long-key joins and long-array intersects beat ~17-char
    # string keys severalfold; the STRING-set oracle re-proves the
    # hashed counts, so the driver gate doubles as a collision check).
    # Two-step hash (r14, guide §4.1 HOFs are interpreted — no CSE
    # inside a lambda): the old one-expression form re-ran
    # split(text) per ITERATION and built a shingle string per
    # position (O(len²) per doc — measured 2.0 s for this stage);
    # hashing each token once and then hashing consecutive token-hash
    # TRIPLES natively is 0.5 s for identical per-doc set sizes.
    # Equal 3-token windows still collide by construction and the
    # prefix filter's recall holds for ANY tie-break (pigeonhole over
    # any ⌊(1−τ)n⌋+1 subset), so the verified pair set is unchanged.
    sh = (
        reps.select("id", F.expr("transform(split(text, ' '), t -> xxhash64(t))").alias("th"))
        .select(
            "id",
            F.expr(
                "CASE WHEN size(th) >= 3 "
                "THEN array_distinct(transform("
                "sequence(1, size(th) - 2), "
                "i -> xxhash64(element_at(th, i), element_at(th, i + 1), "
                "element_at(th, i + 2)))) "
                "ELSE CAST(array() AS ARRAY<BIGINT>) END"
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    ex = sh.select("id", F.size("s").alias("n"), F.explode("s").alias("shingle"))
    # Global shingle rarity: ONE exchange of the exploded table (window
    # count over the shingle key), then the per-doc df-ascending prefix.
    wdf = Window.partitionBy("shingle")
    exdf = ex.withColumn("df", F.count(F.lit(1)).over(wdf))
    prefix = (
        exdf.groupBy("id", "n")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("os"))
        .select(
            "id",
            F.expr(
                "transform(slice(os, 1, CAST(n - (4*n + 4) DIV 5 + 1 AS INT)), "
                "x -> x.shingle)"
            ).alias("pre"),
        )
        .select("id", F.explode("pre").alias("shingle"))
    )
    cand = (
        prefix.alias("a")
        .join(ex.select("id", "shingle").alias("b"), "shingle")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("s").alias("sa")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("s").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("n_shared"),
            F.size("sa").cast("long").alias("n_a"),
        )
        # n_a > 0 guard: a <3-token doc has an empty shingle set; without
        # the guard 5·0 ≥ 4·0 holds and the oracle would pair it with every
        # doc (and divide by zero in contain_millis). The prefix filter can
        # never emit such pairs, so the guard keeps both sides aligned.
        .filter((F.col("n_a") > 0) & (5 * F.col("n_shared") >= 4 * F.col("n_a")))
    )
    return verified.select(
        "id_a",
        "id_b",
        "n_shared",
        "n_a",
        F.expr("CAST((1000 * n_shared) DIV n_a AS BIGINT)").alias("contain_millis"),
    )


# --------------------------------------------------------------------------
# Token-budget mixture planning — given per-source token counts, fixed
# mixture weights (portable md5 hash of the source name → 1..5), a
# global token budget (2× the corpus), and an epoch cap of 4, compute
# each source's allocation, its capped epoch count (exact milli-epochs)
# and the tokens the plan will actually draw. This is the arithmetic a
# DoReMi/Pile-style mixing step runs before sampling; everything is
# exact integer DIV so the plan is reproducible bit-for-bit. Two tiny
# aggregates (per-source rollup + a broadcast 1-row total); token
# counting is the only corpus-sized work.
# --------------------------------------------------------------------------

_EPOCH_ORACLE = f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             ({_hexpoly_sql("md5(source)", 4)}) % 5 + 1 AS weight
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(n_tokens) * 2 AS BIGINT) AS budget,
             CAST(SUM(weight) AS BIGINT) AS wsum
      FROM s),
    plan AS (
      SELECT source, n_tokens, weight,
             CAST((budget * weight) // wsum AS BIGINT) AS alloc_tokens
      FROM s, tot)
    SELECT source, n_tokens, weight, alloc_tokens,
           CAST(LEAST((1000 * alloc_tokens) // n_tokens, 4000) AS BIGINT)
             AS epoch_millis,
           CAST(LEAST(alloc_tokens, 4 * n_tokens) AS BIGINT) AS planned_tokens
    FROM plan
    """


@query("sample_epoch_plan", oracle=_EPOCH_ORACLE)
def sample_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mixture plan: token counts, hash-derived
    mixture weight, budget allocation, epoch-capped draw — exact
    integer arithmetic end to end."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.first("source")), 1, 4), 16, 10).cast("long")
            % 5
            + 1
        ).alias("weight"),
    )
    tot = s.agg(
        (F.sum("n_tokens") * 2).cast("long").alias("budget"),
        F.sum("weight").cast("long").alias("wsum"),
    )
    plan = s.crossJoin(F.broadcast(tot)).withColumn(
        "alloc_tokens", F.expr("CAST((budget * weight) DIV wsum AS BIGINT)")
    )
    return plan.select(
        "source",
        "n_tokens",
        "weight",
        "alloc_tokens",
        F.expr(
            "CAST(LEAST((1000 * alloc_tokens) DIV n_tokens, 4000) AS BIGINT)"
        ).alias("epoch_millis"),
        F.expr("CAST(LEAST(alloc_tokens, 4 * n_tokens) AS BIGINT)").alias(
            "planned_tokens"
        ),
    )
