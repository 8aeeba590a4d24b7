"""LLM-data-pipeline queries (SURVEY.md §2.12): dedup, text analysis,
similarity search, multimodal plumbing — over `documents`/`embeddings`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators import dedup as dd
from jhu_data_parser_spark.operators import similarity as sim
from jhu_data_parser_spark.operators import text as tx
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table


# --- exact dedup -----------------------------------------------------------
@query(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(d)


@query(
    "dedup_exact_survivors",
    oracle="""
    SELECT doc_id, lang, source FROM documents d
    WHERE doc_id = (
      SELECT MIN(doc_id) FROM documents d2
      WHERE md5(lower(trim(regexp_replace(d2.text, '\\s+', ' ', 'g'))))
          = md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
    )
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(d).select("doc_id", "lang", "source")


# --- fingerprint / text stats ---------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_m,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS mean_token_len,
           CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','an','of','and','to','in','is','it','for')))
                AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = tx.quality_features("text")
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars_m"),
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.bpe_ish_token_count("text").alias("n_bpe_tokens"))


@query(
    "text_lang_distribution",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# Deterministic stratified sampling — balanced per-class caps for
# training-data curation: at most N docs per language, selected by a
# content-hash order so the "random" sample is reproducible across
# runs, engines, and partitionings (never rand()/sample(), which no
# oracle can replay). WindowGroupLimit keeps the per-class cap partial.
@query(
    "sample_stratified_by_lang",
    oracle="""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
          FROM documents)
    WHERE rn <= 50
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


# Corpus n-gram statistics (SURVEY §2.12 "ngram counts via
# explode+groupBy"): top bigrams across the corpus, deterministic
# tie-break. explode → two-level partial-agg'd count → TakeOrdered.
@query(
    "text_top_bigrams",
    oracle="""
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT t.toks[i] || ' ' || t.toks[i+1] AS bigram
      FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents) t,
           LATERAL (SELECT unnest(range(1, len(t.toks))) AS i) g
    )
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"
    )
    return (
        d.select(toks.alias("toks"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


# TF-IDF top terms per document — explode to (doc, term, tf), document
# frequency per term, idf = ln((N+1)/(df+1)); both engines compute the
# same IEEE ln/division. Top-3 terms per doc with deterministic
# tie-break; WindowGroupLimit keeps the per-doc top-k partial.
@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    # idf constant as a 1-row agg broadcast-cross-joined in — keeps the
    # whole query a single job (no driver-side d.count() action; r01
    # verdict item 2).
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"))
    )


# Quality scoring as the actual pipeline operation: keep documents
# passing composite thresholds (the LLM-corpus filter step). Oracle
# replays the same feature math.
@query(
    "text_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ('the','a','an','of','and','to','in','is','it','for')))
                  AS DOUBLE) / len(string_split(text, ' ')) AS sw_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_tok
      FROM documents
    )
    WHERE n_tok >= 20 AND sw_ratio >= 0.05 AND mean_tok BETWEEN 2.0 AND 12.0
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = tx.quality_features("text")
    return (
        d.withColumn("n_tok", feats["n_tokens"])
        .withColumn("sw_ratio", feats["stopword_ratio"])
        .withColumn("mean_tok", feats["mean_token_len"])
        .filter(
            (F.col("n_tok") >= 20)
            & (F.col("sw_ratio") >= 0.05)
            & F.col("mean_tok").between(2.0, 12.0)
        )
        .select("doc_id", "lang", "n_chars")
    )


# Winnowed rolling-hash fingerprints (MOSS scheme): k-gram polynomial
# rolling hash → sliding-window minima → distinct. Exact int64
# arithmetic (no modulus, codepoints capped mod 256) so the DuckDB twin
# replicates the formula verbatim as list comprehensions.
_RH_K, _RH_W, _RH_B = 8, 4, 131
_RH_POWS = ", ".join(str(_RH_B ** (_RH_K - 1 - j)) for j in range(_RH_K))


@query(
    "text_rolling_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             [ CAST(list_sum([ (ascii(text[i+j]) % 256) * ([{_RH_POWS}])[j+1]
                               for j in range(0, {_RH_K}) ]) AS BIGINT)
               for i in range(1, length(text) - {_RH_K} + 2) ] AS grams
      FROM documents
      WHERE length(text) >= {_RH_K}
    ),
    w AS (
      SELECT doc_id,
             list_distinct([ list_min(grams[i:i+{_RH_W - 1}])
                             for i in range(1, len(grams) - {_RH_W} + 2) ]) AS fps
      FROM g WHERE len(grams) >= {_RH_W}
    )
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
)
def text_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.explode(tx.rolling_fingerprints("text", k=_RH_K, window=_RH_W, base=_RH_B)).alias(
            "fp"
        ),
    )


# Marker-vote language ID — deterministic native exprs, so the oracle
# replays the vote in SQL: per-language marker-hit counts, argmax via
# struct comparison (lexicographic on both engines, ties break on the
# language code), 'und' when nothing matches. Behavioral coverage on
# real multilingual strings lives in tests/test_operators.py.
def _langid_oracle_sql() -> str:
    structs = ", ".join(
        "{'score': len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains({list(markers)!r}, x))), 'lang': '{lang}'}}"
        for lang, markers in tx._LANG_MARKERS.items()
    )
    return f"""
    SELECT doc_id, lang,
           CASE WHEN best['score'] > 0 THEN best['lang'] ELSE 'und' END AS lang_guess
    FROM (SELECT doc_id, lang, list_max([{structs}]) AS best FROM documents) t
    """


@query("text_langid_heuristic", oracle=_langid_oracle_sql())
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # marker-vote scoring is CPU-bound map work: guard against
    # single-file layouts (0.73 s -> 0.32 s at sf0.1, measured)
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang", tx.langid_heuristic("text").alias("lang_guess"))


# Char-trigram profile language ID (Cavnar-Trenkle) — set-intersection
# Cavnar-Trenkle trigram-profile language ID, fully oracle-paired: the
# profile tables fold into literal arrays, the trigram set build and
# profile-overlap argmax (first-language-wins ties, >= 3 hits threshold
# — byte-for-byte the pandas-UDF operator's semantics, parity-tested in
# tests/test_operators.py) are set ops both engines evaluate identically.
def _langid_profile_lits(quote: str = "'") -> dict[str, str]:
    return {
        lang: ", ".join(
            quote + t.replace(quote, quote * 2) + quote
            for t in tx._TRIGRAM_PROFILES[lang]
        )
        for lang in sorted(tx._TRIGRAM_PROFILES)
    }


def _langid_ngram_oracle() -> str:
    p = _langid_profile_lits()
    return f"""
    WITH s AS (
      SELECT doc_id, lang,
             ' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || ' ' AS s
      FROM documents),
    g AS (
      SELECT doc_id, lang,
             CASE WHEN length(s) >= 3
                  THEN list_distinct(list_transform(range(1, length(s) - 1),
                                                    i -> substr(s, i, 3)))
                  ELSE CAST([] AS VARCHAR[]) END AS g
      FROM s),
    sc AS (
      SELECT doc_id, lang,
             len(list_intersect(g, [{p['de']}])) AS s_de,
             len(list_intersect(g, [{p['en']}])) AS s_en,
             len(list_intersect(g, [{p['es']}])) AS s_es,
             len(list_intersect(g, [{p['fr']}])) AS s_fr
      FROM g)
    SELECT doc_id, lang,
           CASE WHEN m < 3 THEN 'und'
                WHEN s_de = m THEN 'de'
                WHEN s_en = m THEN 'en'
                WHEN s_es = m THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS m FROM sc)
    """


@query("text_langid_ngram", oracle=_langid_ngram_oracle())
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    p = _langid_profile_lits()
    s = d.select(
        "doc_id",
        "lang",
        F.expr(
            "concat(' ', trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"
        ).alias("s"),
    )
    g = s.select(
        "doc_id",
        "lang",
        F.expr(
            "CASE WHEN length(s) >= 3 THEN array_distinct(transform("
            "sequence(1, length(s) - 2), i -> substring(s, i, 3))) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("g"),
    )
    sc = g.select(
        "doc_id",
        "lang",
        *[
            F.expr(f"size(array_intersect(g, array({p[lang]})))").alias(f"s_{lang}")
            for lang in sorted(tx._TRIGRAM_PROFILES)
        ],
    )
    langs = sorted(tx._TRIGRAM_PROFILES)
    m = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    guess = F.when(m < 3, F.lit("und"))
    for lang in langs:  # first-language-wins tie order, as the UDF scores
        guess = guess.when(F.col(f"s_{lang}") == m, F.lit(lang))
    return sc.select("doc_id", "lang", guess.otherwise(F.lit("und")).alias("lang_guess"))


# --- near-dup family (rows-only: LSH banding isn't SQL-expressible) -------
@query("dedup_minhash_candidates", oracle=None)
def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs, exact-collapsed first (identical texts have
    identical signatures, so every intra-group pair is a candidate by
    construction and cross-group candidacy depends only on the
    representatives — the expanded set is precisely the uncollapsed
    one, at a fraction of the banding work on duplicate-dense corpora:
    137 s → seconds at 100× replication)."""
    d = load_table(spark, sf_dir, "documents")
    reps, members = dd.exact_collapse(d)
    cands = dd.minhash_candidates(reps, spread=False)
    return dd.expand_collapsed_pairs(cands, members)


@query("dedup_near_pairs", oracle=None)
def dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.near_dup_pairs_minhash(d, threshold=0.5)


# Engine-portable MinHash — the ORACLE-PAIRED variant of the near-dup
# pipeline. The production path (dedup_near_pairs) hashes with xxhash64
# + crc32 (fast, JVM/numpy-side) which no other engine reproduces, so it
# carries a rows-only gate; this twin swaps the hash for md5-hex-prefix
# strings (byte-identical in Spark and DuckDB) so the ENTIRE pipeline —
# shingling, K minhashes, banding, bucket pairing, Jaccard verify —
# replays in the oracle and the driver value-hash proves every stage.
_PORTABLE_MH_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM t),
    hs AS (
      SELECT doc_id,
             list_transform(sh, x ->
               md5('0:' || x) || md5('1:' || x)
               || md5('2:' || x) || md5('3:' || x)) AS hs
      FROM s),
    m AS (
      SELECT doc_id,
             list_transform(range(0, 16), j ->
               list_min(list_transform(hs, h -> substr(h, j * 8 + 1, 8)))) AS mh
      FROM hs),
    b AS (
      SELECT doc_id, g.b AS band,
             md5(array_to_string(mh[g.b * 4 + 1 : g.b * 4 + 4], '|')) AS band_sig
      FROM m, (SELECT unnest(range(0, 4)) AS b) g),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM b a JOIN b c
        ON a.band = c.band AND a.band_sig = c.band_sig AND a.doc_id < c.doc_id)
    SELECT id_a, id_b,
           CAST(len(list_intersect(list_distinct(ta.toks), list_distinct(tb.toks)))
                AS DOUBLE)
             / len(list_distinct(list_concat(ta.toks, tb.toks))) AS jaccard
    FROM cand
    JOIN t ta ON ta.doc_id = cand.id_a
    JOIN t tb ON tb.doc_id = cand.id_b
    WHERE CAST(len(list_intersect(list_distinct(ta.toks), list_distinct(tb.toks)))
               AS DOUBLE)
            / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.5
    """


@query("dedup_minhash_portable_pairs", oracle=_PORTABLE_MH_ORACLE)
def dedup_minhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with an engine-portable MinHash (16 hashes,
    4 bands × 4 rows, threshold 0.5): each permutation hash is the first
    8 md5-hex chars of ``j:shingle`` and the min is the LEXICOGRAPHIC
    string min — identical bytes in any engine with md5; the signature
    pass costs ~10× the xxhash production path (``dedup_near_pairs``),
    which is the price of a full cross-engine value-hash gate over
    every stage.

    Same plan shape as the production path for banding onward: exact
    collapse first (dd.exact_collapse — r05: identical texts verify
    once, measured 236 s → seconds at 100× replication), then the
    density-proof banded SELF-JOIN on (band, band_sig) with
    first-colliding-band exactly-once emission via unrolled literal
    element_at comparisons (codegen), Jaccard verification via two
    hash joins, and membership expansion (intra pairs at exactly 1.0).
    The signature pass itself is the codegen explode+min-aggregate form
    (``dd.minhash_signature_portable`` — measured 4× over the
    interpreted-HOF formulation at sf0.1). The oracle replays the
    identical algorithm in DuckDB (self-join + DISTINCT instead of
    first-band) — the pair set is emission- and collapse-invariant."""
    rep_pairs, members = _portable_mh_rep_pairs(spark, sf_dir)
    return dd.expand_collapsed_pairs(rep_pairs, members, {"jaccard": 1.0})


def _portable_mh_rep_pairs(spark: SparkSession, sf_dir: str):
    """(rep-level verified pairs, member table) — the pre-expansion core
    of :func:`dedup_minhash_portable_pairs`, shared with consumers that
    need GRAPH structure rather than the pair listing (the leakage-safe
    split runs connected components over the rep graph and expands
    through membership — on a dup-dense corpus the expanded cliques are
    quadratic in copy count while the rep graph is not)."""
    d = load_table(spark, sf_dir, "documents")
    reps, members = dd.exact_collapse(d, "doc_id", "text")
    t = reps.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
    bs = F.expr(
        "transform(sequence(0, 3), b -> "
        "md5(cast(concat_ws('|', slice(mh, b * 4 + 1, 4)) AS binary)))"
    )
    banded = (
        dd.minhash_signature_portable(t)
        .select(F.col("doc_id").alias("id"), bs.alias("bs"))
        .select("id", "bs", F.posexplode("bs").alias("band", "band_sig"))
        .select("id", "band", "band_sig", F.expr("slice(bs, 1, band)").alias("prev"))
        .localCheckpoint(eager=False)
    )
    a = banded.alias("a")
    b = banded.alias("b")
    no_earlier = F.lit(True)
    for v in range(1, 4):
        differs_all = F.lit(True)
        for j in range(v):
            differs_all = differs_all & (
                F.expr(f"element_at(a.prev, {j + 1}) != element_at(b.prev, {j + 1})")
            )
        no_earlier = F.when(F.col("a.band") == v, differs_all).otherwise(no_earlier)
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(no_earlier)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    jac = F.expr(
        "CAST(size(array_intersect(array_distinct(toks_a), array_distinct(toks_b)))"
        " AS DOUBLE) / size(array_distinct(concat(toks_a, toks_b)))"
    )
    rep_pairs = (
        cands.join(
            t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a")),
            "id_a",
        )
        .join(
            t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b")),
            "id_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    return rep_pairs, members


@query("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", dd.simhash_hex("text").alias("simhash"))


# Engine-portable SimHash (the oracle-paired twin of dedup_simhash, same
# role as dedup_minhash_portable_pairs for the minhash family): token
# bit-vectors come from md5 hex NIBBLES — hex char i >= '8' is exactly
# the nibble's high bit, so two 32-char salted digests per token yield a
# 64-bit signature with nothing but substr/compare, identical bytes in
# any engine with md5. 64 bits (like the production operator) matter at
# density, not just fidelity: 16-bit band chunks give 65536 bucket
# values where a 32-bit/8-bit-chunk layout collapses a 5k-doc corpus
# into ~256 buckets per band (measured: a 3253-doc bucket and 7.5M
# candidate combos — quadratic blowup by construction). The signed
# accumulation is an integer sum (order-independent), the packed
# signature a '0'/'1' string.
_SIMHASH_PORTABLE_SIG_CTE = """
    t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    bits AS (
      SELECT doc_id, g.i,
             CASE WHEN substr(md5('0:' || tok) || md5('1:' || tok), g.i, 1) >= '8'
                  THEN 1 ELSE -1 END AS v
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t),
           (SELECT unnest(range(1, 65)) AS i) g),
    acc AS (SELECT doc_id, i, SUM(v) AS s FROM bits GROUP BY 1, 2),
    sig AS (
      SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY i)
               AS simhash
      FROM acc GROUP BY doc_id)"""


def _simhash_portable_sig_col() -> "F.Column":
    """64-bit portable SimHash as a '0'/'1' string column (one SQL
    expression; per-row fold over the token array, no shuffle).

    Each token is md5-hashed ONCE into a 64-char two-digest pre-hash
    (the ``transform`` below) and all 64 bits read off that string —
    hashing inside the per-bit lambda instead would re-evaluate md5 on
    every iteration (no CSE across HOF lambdas; measured 30× slower at
    sf0.1)."""
    return F.expr(
        "concat_ws('', transform("
        "aggregate(transform(split(lower(text), ' '), t -> "
        "concat(md5(cast(concat('0:', t) AS binary)), "
        "md5(cast(concat('1:', t) AS binary)))), "
        "array_repeat(0, 64), "
        "(a, h) -> zip_with(a, transform(sequence(1, 64), i -> "
        "IF(substring(h, i, 1) >= '8', 1, -1)), "
        "(x, y) -> x + y)), "
        "v -> IF(v > 0, '1', '0')))"
    )


@query(
    "dedup_simhash_portable",
    oracle=f"""
    WITH {_SIMHASH_PORTABLE_SIG_CTE}
    SELECT doc_id, simhash FROM sig
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document portable SimHash signature; the driver value-hash
    gate proves the whole construction (tokenization → per-token md5
    nibble bits → signed accumulation → sign pack) cross-engine."""
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # Spark folds per-row over the token array (no explode, no shuffle);
    # the oracle recomputes the classic way (unnest -> GROUP BY) — two
    # independent formulations must agree bit-for-bit.
    expr = _simhash_portable_sig_col()
    return d.select("doc_id", expr.alias("simhash"))


@query(
    "dedup_simhash_portable_candidates",
    oracle=f"""
    WITH {_SIMHASH_PORTABLE_SIG_CTE},
    b AS (
      SELECT doc_id, simhash, g.b AS band,
             substr(simhash, g.b * 16 + 1, 16) AS chunk
      FROM sig, (SELECT unnest(range(0, 4)) AS b) g),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             a.simhash AS sa, c.simhash AS sb
      FROM b a JOIN b c
        ON a.band = c.band AND a.chunk = c.chunk AND a.doc_id < c.doc_id)
    SELECT id_a, id_b,
           CAST(len(list_filter(range(1, 65),
                i -> substr(sa, i, 1) <> substr(sb, i, 1))) AS INT) AS hamming
    FROM cand
    WHERE len(list_filter(range(1, 65),
              i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= 3
    """,
)
def dedup_simhash_portable_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at Hamming ≤ 3 over the portable 64-bit SimHash —
    pigeonhole banding (4 bands × 16 bits: distance ≤ 3 forces ≥ 1 equal
    chunk) as the banded SELF-JOIN of ``operators/dedup.
    banded_hamming_pairs``: an equi-join on (band, lane) whose task
    memory is the sort-merge per-bucket buffer — dense duplicate
    clusters stream instead of OOMing the old collect_list + generator
    expansion (which held whole-bucket arrays per anchor row: 22 s on
    the 10× replicated layout vs ~2 s for this form). First-colliding-
    band exactly-once emission and the Hamming verify are codegen
    shift/xor/bit_count arithmetic on the ONE packed 64-bit signature;
    the ORACLE builds the same pair set its own way (DISTINCT over a
    band join), so the value-hash gate is emission-strategy-independent.
    Banding on 16-bit chunks leaves ~85× more candidates than survivors
    on this corpus, so the per-pair verify is the hot loop — two
    XOR-popcounts per candidate."""
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sig = d.select("doc_id", _simhash_portable_sig_col().alias("simhash"))
    packed = sig.select(
        "doc_id",
        F.expr(
            "shiftleft(CAST(conv(substring(simhash, 1, 32), 2, 10) AS BIGINT), 32)"
            " | CAST(conv(substring(simhash, 33, 32), 2, 10) AS BIGINT)"
        ).alias("sh"),
    )
    return dd.banded_hamming_pairs(
        packed, id_col="doc_id", hash_col="sh", bands=4, max_hamming=3
    )


# n-gram (token-set) Jaccard against a fixed probe document — oracle-able
# because the probe is a literal and set ops exist on both engines.
_PROBE = "spark join merge sort window batch stream data table query"


@query(
    "text_jaccard_vs_probe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                                   string_split('{_PROBE}', ' '))) AS DOUBLE)
           / len(list_distinct(list_concat(list_distinct(string_split(lower(text), ' ')),
                                           string_split('{_PROBE}', ' ')))) AS jaccard
    FROM documents
    """,
)
def text_jaccard_vs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    probe = F.split(F.lit(_PROBE), " ")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    return d.select("doc_id", dd.jaccard_tokens(toks, probe).alias("jaccard"))


# --- similarity search -----------------------------------------------------
def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch the probe vector (one tiny lookup — the query input, not a
    data-path collect)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


_TOPK_ORACLE = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id, e.label,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, label FROM sims ORDER BY sim DESC, vec_id LIMIT 10
    """


@query("sim_cosine_topk", oracle=_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return (
        sim.topk_cosine(e.filter(F.col("vec_id") != 0), qv, k=10)
        .select("vec_id", "label")
    )


# RP-LSH top-k — oracle-paired: the hyperplanes are deterministic
# (seeded), so they inline as SQL literals; the oracle recomputes every
# bucket, the query vector's bucket, and the Hamming<=1 multiprobe set
# (bit_count(xor(...))), then scores candidates exactly — the same
# algorithm, independently evaluated.
def _lsh_oracle_sql(n_planes: int = 8, dim: int = 64, seed: int = 42, k: int = 10) -> str:
    planes = sim._rp_planes(dim, n_planes, seed)
    plane_lits = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in planes
    )
    bucket_of = lambda col: " + ".join(  # noqa: E731
        f"(CASE WHEN list_dot_product({col}, pl.p[{i + 1}]) > 0.0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    # DOUBLE[] casts: DuckDB's float-list dot accumulates in float.
    return f"""
    WITH pl AS (SELECT [{plane_lits}]::DOUBLE[][] AS p),
    q AS (SELECT qe, ({bucket_of('qe')}) AS qb
          FROM (SELECT CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id = 0), pl),
    b AS (SELECT e.vec_id, e.label, e.emb, ({bucket_of('e.emb')}) AS bucket
          FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings WHERE vec_id <> 0) e, pl),
    cand AS (
      SELECT b.vec_id, b.label,
             list_dot_product(b.emb, q.qe)
               / (sqrt(list_dot_product(b.emb, b.emb))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS sim
      FROM b, q
      WHERE bit_count(xor(b.bucket::BIGINT, q.qb::BIGINT)) <= 1
    )
    SELECT vec_id, label FROM cand ORDER BY sim DESC, vec_id LIMIT {k}
    """


@query("sim_cosine_topk_lsh", oracle=_lsh_oracle_sql())
def sim_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return sim.topk_cosine_lsh(
        e.filter(F.col("vec_id") != 0), qv, dim=len(qv), k=10, n_planes=8
    ).select("vec_id", "label")


# Batch multi-query top-k — the ANN serving shape: one corpus scan
# scores every query in the request batch; row_number()<=k compiles to
# WindowGroupLimit (per-task partial top-k before the shuffle).
@query(
    "sim_cosine_topk_multi",
    oracle="""
    SELECT query_id, vec_id, CAST(rank AS INT) AS rank
    FROM (
      SELECT q.vec_id AS query_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(e.emb, q.emb)
                 / (sqrt(list_dot_product(e.emb, e.emb))
                    * sqrt(list_dot_product(q.emb, q.emb))) DESC,
                 e.vec_id
             ) AS rank
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id >= 5) e,
           (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 5) q
    )
    WHERE rank <= 5
    """,
)
def sim_cosine_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 5)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.topk_cosine_many(corpus, queries, k=5)


# IVF (inverted-file) ANN — spherical-kmeans cells, probe the nearest
# n_probe cells, exact cosine inside. With n_probe == n_centroids the
# search is exhaustive, so the exact-top-k oracle applies: the approximate
# index degrades gracefully to the exact answer, which is the property
# worth gating. The recall-vs-probe tradeoff is tested behaviorally in
# tests/test_operators.py.
#
# Serving shape: the PRE-BUILT partitionBy(cell) index (assignment runs
# once at build; cached per corpus fingerprint), so the per-query plan
# is a pruned parquet scan + exact scorer — no per-row K·D assignment
# expression on the serving path (the r04 bench regression). The query
# row itself is excluded post-scan via row_filter, letting one index
# serve the filtered view.
@query("sim_cosine_topk_ivf", oracle=_TOPK_ORACLE)
def sim_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return sim.topk_cosine_ivf_indexed(
        e,
        qv,
        k=10,
        n_centroids=8,
        n_probe=8,
        row_filter=F.col("vec_id") != 0,
    ).select("vec_id", "label")


# Embedding-column analytics: per-dimension distribution stats across
# the corpus (the drift/health check run before trusting an index).
# posexplode over the vector → groupBy dimension; scaled-long exact sums.
@query(
    "sim_dimension_stats",
    oracle="""
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
              / 1000000.0 / COUNT(*)) AS mean_v,
           MIN(v) AS min_v,
           MAX(v) AS max_v
    FROM (
      SELECT g.i - 1 AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS v
      FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) g
    )
    GROUP BY dim
    """,
)
def sim_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("v") * 1_000_000 + F.lit(0.5)).cast("long")).cast("double")
            / F.lit(1_000_000.0)
            / F.count(F.lit(1))
        ).alias("mean_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "sim_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings
    """,
)
def sim_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.round(sim.l2_norm(F.col("embedding")), 6).alias("l2_norm")
    )


# Embedding near-duplicate pairs via LSH buckets + exact cosine — the
# embedding-cosine near-dup detector. Oracle-paired like the LSH top-k:
# plane literals → bucket per vector → same-bucket pair join → exact
# cosine filter, all re-evaluated in SQL.
# The synthetic embeddings are near-uniform random (top pairwise cosine
# ≈ 0.5) — a production 0.9 near-dup threshold matches nothing, which
# would make the pair/cluster oracles vacuous. 0.2 exercises the same
# pipeline against this corpus's actual similarity tail.
_EMB_PAIR_THRESHOLD = 0.2


def _emb_pairs_cte(n_planes: int = 12, dim: int = 64, seed: int = 42) -> str:
    """Shared CTE body: LSH-bucketed embedding near-dup candidate pairs
    with exact cosine filter, as replayable SQL."""
    planes = sim._rp_planes(dim, n_planes, seed)
    plane_lits = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in planes
    )
    bucket_of = " + ".join(
        f"(CASE WHEN list_dot_product(embedding, pl.p[{i + 1}]) > 0.0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    # CAST to DOUBLE[] everywhere: DuckDB's list_dot_product on FLOAT
    # lists accumulates in float (≈1e-7 error) — double-cast inputs make
    # it bit-identical to the engine's sequential-double dot.
    bucket_of = bucket_of.replace("embedding", "emb")
    return f"""
    pl AS (SELECT [{plane_lits}]::DOUBLE[][] AS p),
    b AS (
      SELECT vec_id, emb, ({bucket_of}) AS bucket
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), pl
    ),
    allpairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             list_dot_product(a.emb, c.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(c.emb, c.emb))) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ),
    pairs AS (SELECT id_a, id_b, cos FROM allpairs WHERE cos > {_EMB_PAIR_THRESHOLD})
    """


def _emb_pairs_oracle_sql() -> str:
    return f"""
    WITH {_emb_pairs_cte()}
    SELECT id_a, id_b, ROUND(cos, 6) AS cos FROM pairs
    """


# Duplicate-cluster formation: connected components over the embedding
# near-dup pairs — Spark side by iterative min-label propagation
# (operators/dedup.connected_components); oracle recomputes the SAME
# pair set from plane literals, then takes the transitive closure with
# a recursive CTE. Pairs (A,B),(B,C) ⇒ one cluster {A,B,C}, survivor A.
_EMB_GROUPS_ORACLE = f"""
    WITH RECURSIVE {_emb_pairs_cte()},
    edges(x, y) AS (
      SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
    ),
    reach(x, y) AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
    ),
    nodes(x) AS (SELECT DISTINCT x FROM edges)
    SELECT n.x AS id, LEAST(n.x, MIN(r.y)) AS component
    FROM nodes n LEFT JOIN reach r ON r.x = n.x
    GROUP BY n.x
    """


@query("dedup_embedding_groups", oracle=_EMB_GROUPS_ORACLE)
def dedup_embedding_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.dedup import connected_components

    pairs = dedup_embedding_pairs(spark, sf_dir)
    return connected_components(pairs)


# The same clustering through the O(log² n)-round star-contraction path
# (the at-scale algorithm for adversarial-diameter graphs) — same
# recursive-CTE oracle, so the driver proves both implementations
# produce identical components.
@query("dedup_embedding_groups_contraction", oracle=_EMB_GROUPS_ORACLE)
def dedup_embedding_groups_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.dedup import (
        connected_components_contraction,
    )

    pairs = dedup_embedding_pairs(spark, sf_dir)
    return connected_components_contraction(pairs)


@query("dedup_embedding_pairs", oracle=_emb_pairs_oracle_sql())
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Exact (sequential-double) bucket expression — bit-reproducible
    # against the oracle's SQL plane replay; the numpy matmul bucketing
    # can flip near-zero projection signs (BLAS accumulation order).
    b = e.withColumn("bucket", sim.rp_bucket_expr("embedding", n_planes=12, dim=64))
    left = b.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    right = b.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    pairs = left.join(right, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", sim.cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") > _EMB_PAIR_THRESHOLD)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# --- multimodal plumbing ---------------------------------------------------
@query(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_binary

    d = attach_binary(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", F.octet_length("media").cast("long").alias("n_bytes"))


# The stub-decode path is deterministic from the payload length (the
# documented fake for formats without a vendored codec), and the
# payload here is the document's UTF-8 bytes over an ASCII corpus — so
# the whole output replays from length(text) and the driver value-hash
# gate proves the mapInPandas plumbing delivered every payload intact.
@query(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           'image' AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) % 1920 + 1 AS INT) AS width,
           CAST(length(text) % 1080 + 1 AS INT) AS height,
           CAST(length(text) % 30 + 1 AS INT) AS n_frames,
           16000 AS sample_rate
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_binary, extract_media_meta

    d = attach_binary(load_table(spark, sf_dir, "documents"))
    return extract_media_meta(d)


# REAL image decode (r01 verdict item 4): synthesize valid BMP/PPM
# payloads whose dims are a function of doc_id, then *parse the byte
# stream* with the vendored pure-python codecs. The oracle recomputes
# the expected dims (and the exact BMP file size incl. 4-byte row
# padding) from doc_id arithmetic alone — it never sees the bytes, so a
# hash match proves the decoder actually read the headers.
@query(
    "multimodal_decode_image",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS media_type,
           CAST(doc_id % 64 + 16 AS INT) AS width,
           CAST(doc_id % 48 + 16 AS INT) AS height,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(54 + ((doc_id % 64 + 16) * 3 + 3) // 4 * 4
                          * (doc_id % 48 + 16) AS BIGINT)
                ELSE CAST(NULL AS BIGINT) END AS bmp_file_bytes
    FROM documents
    """,
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_image, extract_media_meta

    d = attach_image(load_table(spark, sf_dir, "documents"))
    meta = extract_media_meta(d, strict=True)  # vendored codecs must handle every row
    return meta.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.when(F.col("media_type") == "bmp", F.col("n_bytes")).alias("bmp_file_bytes"),
    )


# REAL audio decode: synthesize valid RIFF/WAVE PCM16 payloads whose
# properties (sample count, rate, waveform values) are integer functions
# of doc_id, then *parse the byte stream* — chunk walk, fmt validation,
# int16 sample decode. The oracle recomputes every output, including
# Σ|sample| over the full waveform, from doc_id arithmetic alone
# (generate_series cross join — it never sees a byte), so a hash match
# proves the decoder read both the header AND the PCM data.
@query(
    "multimodal_decode_audio",
    oracle="""
    WITH wave AS (
      SELECT d.doc_id,
             CAST(SUM(abs((d.doc_id * 7919 + g.i * 104729) % 65536 - 32768))
                  AS BIGINT) AS abs_amplitude_sum
      FROM documents d CROSS JOIN generate_series(0, 255) g(i)
      WHERE g.i < d.doc_id % 192 + 64
      GROUP BY d.doc_id)
    SELECT d.doc_id,
           'wav' AS media_type,
           CAST(CASE d.doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(16 AS INT) AS bit_depth,
           CAST(d.doc_id % 192 + 64 AS BIGINT) AS n_samples,
           CAST((d.doc_id % 192 + 64) * 1000000
                // CASE d.doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                   ELSE 44100 END AS BIGINT) AS duration_us,
           wave.abs_amplitude_sum
    FROM documents d JOIN wave USING (doc_id)
    """,
)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_audio, extract_audio_meta

    d = attach_audio(load_table(spark, sf_dir, "documents"))
    return extract_audio_meta(d)


# Resize plumbing, oracle-checkable on its observable contract: output
# byte length is the deterministic function of (input length, target
# area) the stub defines, and the dims are recorded.
@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(LEAST(
             CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE)
               / greatest(octet_length(encode(text)) // 16, 1)) AS BIGINT),
             16) AS INT) AS n_resized_bytes,
           CAST(128 AS INT) AS width, CAST(128 AS INT) AS height
    FROM documents WHERE length(text) > 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_binary, resize_stub

    d = attach_binary(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    out = resize_stub(d, width=128, height=128)
    return out.select(
        "doc_id",
        F.octet_length("media").cast("int").alias("n_resized_bytes"),
        "width",
        "height",
    )


# Media → embedding feature extraction, composed straight into the ANN
# surface: embed every document's payload, return each one's L2 norm
# (== 1.0 by construction) and vector arity — the schema/batch contract
# the similarity operators consume. Pure-stub features → rows-only.
# The featurizer runs in Arrow-batched numpy (mapInPandas), but its
# content is GATED: the media payload is the UTF-8 text bytes and the
# corpus is ASCII, so the byte-bigram histogram replays exactly in SQL
# (ascii(char) == byte) — top bucket + count are integer facts both
# engines must agree on, proving the featurizer read the real bytes.
@query(
    "multimodal_embed_features",
    oracle="""
    WITH bg AS (
      SELECT doc_id,
             (ascii(substr(text, g.i, 1)) * 256
              + ascii(substr(text, g.i + 1, 1))) % 64 AS b
      FROM documents, LATERAL (SELECT unnest(range(1, length(text))) AS i) g
      WHERE length(text) >= 2),
    h AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, b, c,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS rn
      FROM h)
    SELECT d.doc_id,
           64 AS dim,
           CAST(COALESCE(t.b, 0) AS INT) AS top_bucket,
           CAST(COALESCE(t.c, 1) AS BIGINT) AS top_count,
           1.0 AS l2_norm
    FROM documents d LEFT JOIN (SELECT * FROM top WHERE rn = 1) t
      ON d.doc_id = t.doc_id
    """,
)
def multimodal_embed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_binary, embed_media_stub

    d = attach_binary(load_table(spark, sf_dir, "documents"))
    emb = embed_media_stub(d, dim=64, with_stats=True)
    return emb.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        "top_bucket",
        "top_count",
        F.round(sim.l2_norm(F.col("embedding")), 4).alias("l2_norm"),
    )


# Int8-quantized top-k — the memory/bandwidth scale path (4× smaller
# index, integer dot products). FULLY oracle-paired: every quantization
# step is a single IEEE op (abs/max/mul/div/floor), the dot is exact
# integer arithmetic, and the two scale multiplies happen in the same
# order in both engines — so even the SCORES hash-match, not just the
# ranking. Recall vs exact cosine is pinned in tests/test_operators.py.
_INT8_Q = """
    (SELECT list_transform(qe, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)) AS qq,
            m / 127.0 AS qs
     FROM (SELECT qe, CASE WHEN list_max(list_transform(qe, y -> abs(y))) > 0.0
                           THEN list_max(list_transform(qe, y -> abs(y)))
                           ELSE 1.0 END AS m
           FROM (SELECT CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id = 0)))
"""


@query(
    "sim_cosine_topk_int8",
    oracle=f"""
    WITH q AS {_INT8_Q},
    c AS (SELECT vec_id, label,
                 list_transform(emb, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)) AS qv,
                 m / 127.0 AS s
          FROM (SELECT vec_id, label, emb,
                       CASE WHEN list_max(list_transform(emb, y -> abs(y))) > 0.0
                            THEN list_max(list_transform(emb, y -> abs(y)))
                            ELSE 1.0 END AS m
                FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
                      FROM embeddings WHERE vec_id <> 0)))
    SELECT vec_id, label,
           CAST(list_sum(list_transform(list_zip(c.qv, q.qq), z -> z[1] * z[2]))
                AS DOUBLE) * c.s * q.qs AS qscore
    FROM c, q
    ORDER BY qscore DESC, vec_id LIMIT 10
    """,
)
def sim_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    return sim.topk_quantized(e.filter(F.col("vec_id") != 0), qv, k=10).select(
        "vec_id", "label", "qscore"
    )


# Benchmark decontamination — the n-gram-overlap flagging step run
# before any LLM training job: docs with doc_id % 97 == 0 stand in for
# the benchmark/eval set; every OTHER doc sharing a k-token shingle
# with it is flagged with its overlap count. The benchmark's distinct
# shingle set is broadcast (eval sets are small), so the corpus is one
# map-side probe — no corpus-shingle shuffle (operators/text.py).
# k=4 here so the synthetic corpus exhibits observable overlap (8 docs
# at sf0.01); production decontamination uses k=8..13 — same plan.
@query(
    "text_decontaminate_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS shingle
      FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS u(i)),
    probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM sh s JOIN probe p USING (shingle)
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def text_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ensure_parallelism: the corpus-side shingle explode is the CPU-heavy
    # stage; a single-file layout would run it as one task (measured
    # 2.3 s -> sub-second at sf0.1 with the guard).
    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    benchmark = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return tx.contamination_hits(corpus, benchmark, k=4)


# PII redaction — the scrubbing pass every training corpus gets before
# use. Deterministic PII (an email and a phone built from doc_id) is
# planted into each doc, then redacted with the same regexes in both
# engines; the oracle hash-matches the md5 of the REDACTED text plus
# the match counts, so the gate proves both engines found and replaced
# the same spans. Pure regexp_replace/extract_all — whole-stage
# codegen, no UDF, shuffle-free.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@query(
    "text_redact_pii",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents)
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INT) AS n_phones
    FROM aug
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.md5(t).alias("redacted_md5"),
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0)).alias("n_phones"),
    )


# REAL video (animated GIF) decode: valid multi-frame GIF89a payloads
# synthesized per doc, then the block list is genuinely walked —
# extensions skipped, image descriptors counted through their LZW data
# sub-blocks (frame count CANNOT be derived from payload length; 0x2C
# bytes occur inside pixel data). Oracle recomputes dims + frame count
# from doc_id arithmetic; parser independently validated against the
# canonical public 1x1 GIF test vector in pytest.
@query(
    "multimodal_decode_video",
    oracle="""
    SELECT doc_id, 'gif' AS media_type,
           CAST(doc_id % 32 + 8 AS INT) AS width,
           CAST(doc_id % 24 + 8 AS INT) AS height,
           CAST(doc_id % 7 + 1 AS INT) AS n_frames
    FROM documents
    """,
)
def multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_video, extract_video_meta

    return extract_video_meta(attach_video(load_table(spark, sf_dir, "documents")))


# REAL frame sampling over the parsed container: one row per every-2nd
# frame of each GIF's genuine frame count — the 1→N expansion shape of
# video pipelines, with N read out of the byte stream.
@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id, CAST(g.i AS INT) AS frame_no,
           CAST(d.doc_id % 32 + 8 AS INT) AS width,
           CAST(d.doc_id % 24 + 8 AS INT) AS height
    FROM documents d CROSS JOIN generate_series(0, 6) g(i)
    WHERE g.i < d.doc_id % 7 + 1 AND g.i % 2 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_video, frame_sample_gif

    return frame_sample_gif(
        attach_video(load_table(spark, sf_dir, "documents")), every_nth=2
    )


# SimHash banded candidates (pigeonhole: hamming <= bands-1 implies an
# exact match on >= 1 signature chunk — one shuffle, no all-pairs;
# verified with exact Hamming). xxhash64-based signature is not
# SQL-portable -> rows-only; pigeonhole recall pinned in pytest.
@query("dedup_simhash_candidates", oracle=None)
def dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_candidates(d, bands=8)


# REAL image resize: BMP payloads decoded to pixel arrays, nearest-
# neighbor resampled to half dims, re-encoded as valid BMPs. Oracle
# recomputes the output dims AND the exact output file size (incl.
# 4-byte row padding) from doc_id arithmetic; pixel-level correctness
# vs a direct numpy reference is pinned in pytest (the resampled bytes
# themselves aren't SQL-reachable).
@query(
    "multimodal_resize_real",
    oracle="""
    SELECT doc_id,
           CAST((doc_id % 64 + 16) // 2 AS INT) AS width,
           CAST((doc_id % 48 + 16) // 2 AS INT) AS height,
           CAST(54 + ((doc_id % 64 + 16) // 2 * 3 + 3) // 4 * 4
                * ((doc_id % 48 + 16) // 2) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jhu_data_parser_spark.operators.multimodal import attach_image, resize_image_real

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    out = resize_image_real(attach_image(d), scale_den=2)
    return out.select(
        "doc_id", "width", "height", F.octet_length("media").cast("long").alias("n_bytes")
    )


# --- exact n-gram Jaccard similarity join (prefix filtering) ---------------
# The deterministic member of the near-dup family: AllPairs-style prefix
# filtering (Bayardo et al., WWW'07) gives EXACT Jaccard >= tau with
# 100% recall by construction — no banding probability, no sketch. The
# ORACLE is the opposite plan (quadratic brute force over the full
# shingle sets), so the driver's value-hash gate PROVES the recall
# claim: any pair the prefix filter missed would hash-mismatch.
_JACCARD_PREFIX_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                  ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a, s b
    WHERE a.doc_id < b.doc_id
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """


@query("dedup_jaccard_prefix_pairs", oracle=_JACCARD_PREFIX_ORACLE)
def dedup_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard >= 0.5 pairs via AllPairs prefix filtering
    (see :func:`operators.dedup.jaccard_prefix_pairs`). The quadratic
    oracle is recall ground truth: a missed pair hash-mismatches."""
    d = load_table(spark, sf_dir, "documents")
    return dd.jaccard_prefix_pairs(d, threshold=0.5)


# CC + survivor selection over the EXACT pair set — the full n-gram
# dedup deliverable (pairs -> duplicate clusters -> deduped corpus).
# Shared recursive-CTE oracle, same shape as _EMB_GROUPS_ORACLE but
# with the quadratic exact-Jaccard edge set.
_JACCARD_EDGES_CTE = """
    t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                  ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a, s b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
    edges(x, y) AS (
      SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
    reach(x, y) AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
    nodes(x) AS (SELECT DISTINCT x FROM edges)
"""

_JACCARD_GROUPS_ORACLE = f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTE}
    SELECT n.x AS id, LEAST(n.x, MIN(r.y)) AS component
    FROM nodes n LEFT JOIN reach r ON r.x = n.x
    GROUP BY n.x
    """


@query("dedup_jaccard_groups", oracle=_JACCARD_GROUPS_ORACLE)
def dedup_jaccard_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the exact n-gram-Jaccard relation: CC
    min-label propagation on 100%-recall edges — deterministic
    duplicate groups (no banding probability anywhere in the chain).
    Routed through :func:`dd.jaccard_groups`, which clusters over the
    rep-level pair list plus linear membership stars instead of the
    quadratic member pair listing (duplicate-dense corpora); the
    quadratic oracle proves the sparsification exact."""
    d = load_table(spark, sf_dir, "documents")
    return dd.jaccard_groups(d, threshold=0.5)


_JACCARD_SURVIVORS_ORACLE = f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTE},
    comp AS (
      SELECT n.x AS id, LEAST(n.x, MIN(r.y)) AS component
      FROM nodes n LEFT JOIN reach r ON r.x = n.x
      GROUP BY n.x)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    LEFT JOIN comp c ON c.id = d.doc_id
    WHERE c.id IS NULL OR c.component = d.doc_id
    """


@query("dedup_jaccard_survivors", oracle=_JACCARD_SURVIVORS_ORACLE)
def dedup_jaccard_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped corpus: keep the min-id member of every exact-Jaccard
    duplicate cluster plus all unclustered docs — the actual training-
    corpus deliverable of the n-gram dedup family. Anti-join of the
    corpus against non-keeper cluster members; the membership table is
    |clustered docs| rows (tiny vs corpus), so the join broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    groups = dedup_jaccard_groups(spark, sf_dir)
    losers = groups.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return d.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "source")
