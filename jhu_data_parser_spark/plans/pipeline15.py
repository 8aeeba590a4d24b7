"""Catalog wave 15 — round 9 continuation: Kneser-Ney LM perplexity,
Matryoshka prefix-dim ANN, fuzzy entity-resolution dedup, privacy /
robust-statistics reports, and multi-touch attribution.

Reference parity note: the reference (/root/reference, src/parser.py:
28-102, src/parser2.py:28-139) has no analytics surface — these are
[extension] operators of the LLM-data-pipeline and analytics families
the brief ranks first-class. House exactness discipline throughout:
every hash gate rides on integers — exact int64 rationals where a
probability or score crosses engines, one IEEE ÷ / ln / sqrt on
exactly-representable (< 2^53) integer operands, floor(1e6·x) /
floor(1e9·x) fixed points, and integer DIV bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators import similarity as sim
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.plans.llm import _query_vec
from jhu_data_parser_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram perplexity — the smoothing family the
# CCNet / Wenzek et al. 2020 filter actually ships (KenLM is modified
# Kneser-Ney; text_bigram_perplexity's add-one is the strawman twin).
#
#   P_KN(w | prev) = (max(c(prev,w) - D, 0) + D·N1+(prev·)·P_cont(w))
#                    / c(prev)
#   P_cont(w)      = N1+(·w) / N1+(··)
#
# with discount D = 3/4 (a fixed rational, so the whole probability is
# an exact int64 ratio after scaling by 4·B where B = N1+(··)):
#
#   num = max(4·c(prev,w) - 3, 0)·B + 3·n1p(prev)·n1w(w)
#   den = 4·c(prev)·B
#   nll_micro = floor(1e6 · ln(den / num))
#
# Exactness: num, den are exact int64 (c ≤ corpus bigrams ~1e6 at
# sf0.1, B ≤ distinct bigrams ~1e6 → den ≤ 4e12 < 2^53); the DOUBLE
# casts, one ÷ and one ln see bit-identical operands in both engines
# (the pipeline10 fixed-point-ln pattern). Per-doc sums and the bucket
# DIV are integer.
#
# Scale posture (same shape as text_bigram_perplexity, which this
# upgrades): one explode produces the (prev, cur) stream; the bigram
# count table is the only possibly-huge model side and JOINS BACK ON
# THE BIGRAM KEY (shuffle join — bigram vocab does not reliably fit a
# broadcast at 100 TB); the per-prev totals/continuation counts and
# per-word predecessor counts are unigram-vocab-bounded and broadcast;
# B is a 1-row scalar. Per-doc sums shuffle uniform doc_id keys once;
# output is ≤ |langs|·|buckets|.
# --------------------------------------------------------------------------

_KN_BUCKET_MICRO = 250_000  # 0.25 nats/token per bucket

_KN_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id, lang, z[1] AS prev, z[2] AS cur
      FROM (SELECT doc_id, lang,
                   unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z
            FROM d WHERE len(w) >= 2)),
    cb AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
           FROM bg GROUP BY 1, 2),
    cp AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cp,
                  CAST(COUNT(DISTINCT cur) AS BIGINT) AS n1p
           FROM bg GROUP BY 1),
    cw AS (SELECT cur, CAST(COUNT(DISTINCT prev) AS BIGINT) AS n1w
           FROM bg GROUP BY 1),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM cb),
    nll AS (
      SELECT bg.doc_id, bg.lang,
             CAST(floor(1000000.0 * ln(
               CAST(4 * cp.cp * b.b AS DOUBLE) /
               CAST(greatest(4 * cb.cb - 3, 0) * b.b
                    + 3 * cp.n1p * cw.n1w AS DOUBLE))) AS BIGINT)
               AS nll_micro
      FROM bg JOIN cb USING (prev, cur) JOIN cp USING (prev)
              JOIN cw USING (cur), b),
    pd AS (
      SELECT doc_id, lang,
             CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS ppx_micro
      FROM nll GROUP BY 1, 2)
    SELECT lang,
           CAST(ppx_micro // {_KN_BUCKET_MICRO} AS BIGINT) AS ppx_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ppx_micro) AS BIGINT) AS sum_ppx_micro,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM pd GROUP BY 1, 2
    """


def _kn_doc_ppx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Kneser-Ney micro-nat perplexity (doc_id, lang,
    ppx_micro) — the shared core of the bucket report and the CCNet
    shard split."""
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
                    " (a, b) -> struct(a AS prev, b AS cur))"
                )
            ).alias("z"),
        )
        .select("doc_id", "lang", "z.prev", "z.cur")
    )
    # Model tables: the bigram counts are the only possibly-huge side
    # (shuffle join on the bigram key); prev-totals + continuation
    # fan-outs and word predecessor fan-ins are unigram-vocab-bounded
    # and broadcast; B is a 1-row scalar. ALL of cp/n1p/n1w/B re-
    # aggregate from cb rather than the raw stream: every KN statistic
    # except cp is a DISTINCT count, and countDistinct on the raw
    # stream rebuilds the (prev, cur) table internally — measured 2.8×
    # at the 100× layout (25.5 → 9.1 s warm). This INVERTS the
    # pipeline10 add-one A/B (re-aggregation slower), which had no
    # distinct counts to amortize.
    # One lazy localCheckpoint on the bigram model table: cb feeds FOUR
    # plan branches (the nll join + cp + cw + B) and AQE does not reuse
    # its exchange across them — the same multi-branch materialization
    # rule as sketch_kmv_set_ops. Measured at the 100× layout: 9.1 →
    # 6.8 s warm; at 100 TB the model table is built once per corpus,
    # not once per branch.
    cb = (
        bg.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
        .localCheckpoint(eager=False)
    )
    cp = cb.groupBy("prev").agg(
        F.sum("cb").cast("long").alias("cp"),
        F.count(F.lit(1)).cast("long").alias("n1p"),
    )
    cw = cb.groupBy("cur").agg(F.count(F.lit(1)).cast("long").alias("n1w"))
    b = cb.agg(F.count(F.lit(1)).cast("long").alias("b"))
    nll = (
        bg.join(cb, ["prev", "cur"])
        .join(F.broadcast(cp), "prev")
        .join(F.broadcast(cw), "cur")
        .crossJoin(F.broadcast(b))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "CAST(floor(1000000.0 * ln("
                "CAST(4 * cp * b AS DOUBLE) /"
                " CAST(greatest(4 * cb - 3, 0) * b + 3 * n1p * n1w AS DOUBLE)"
                ")) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    return nll.groupBy("doc_id", "lang").agg(
        F.expr("CAST(SUM(nll_micro) DIV COUNT(*) AS BIGINT)").alias("ppx_micro")
    )


_KN_PD_CHAIN = _KN_ORACLE.split("SELECT lang,")[0].rstrip().rstrip(",")


@query("text_kn_perplexity", oracle=_KN_ORACLE)
def text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney (D=3/4) bigram perplexity buckets per
    language — the KenLM-grade smoothing behind the CCNet filter,
    exact by 4·B-scaled int64 rationals."""
    pd = _kn_doc_ppx(spark, sf_dir)
    return pd.groupBy(
        "lang",
        F.expr(f"CAST(ppx_micro DIV {_KN_BUCKET_MICRO} AS BIGINT)").alias(
            "ppx_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ppx_micro").cast("long").alias("sum_ppx_micro"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# Matryoshka (MRL, Kusupati et al. 2022) prefix-dim ANN — embeddings
# trained with matryoshka loss rank usefully under PREFIX truncation,
# so serving scans only the first m dims and re-ranks a shortlist with
# the full vector. The same shortlist+refine shape as PQ/binary, with
# truncation instead of quantization.
#
# Exactness: the shortlist boundary rides on the prefix cosine — both
# engines fold the dot product sequentially left-to-right over exact
# DOUBLE casts (house-verified: sim.dot ≡ list_dot_product), with a
# vec_id tiebreak; the hash gate rides on floor(1e9·cosine) over the
# full vector, same bit-identical inputs.
# --------------------------------------------------------------------------

_MRL_PREFIX = 16
_MRL_SHORTLIST = 32


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))"
    )


_MRL_TOPK_ORACLE = f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE vec_id <> 0),
    pre AS (SELECT c.vec_id, c.label, c.emb,
                   {_cos_sql(f'c.emb[1:{_MRL_PREFIX}]', f'q.qe[1:{_MRL_PREFIX}]')}
                     AS psim
            FROM c, q),
    short AS (SELECT * FROM pre ORDER BY psim DESC, vec_id
              LIMIT {_MRL_SHORTLIST}),
    rr AS (SELECT s.vec_id, s.label,
                  CAST(floor(1000000000.0 * ({_cos_sql('s.emb', 'q.qe')}))
                    AS BIGINT) AS sim_nano
           FROM short s, q)
    SELECT vec_id, label, sim_nano,
           CAST(row_number() OVER (ORDER BY sim_nano DESC, vec_id) AS INT)
             AS rank
    FROM rr ORDER BY sim_nano DESC, vec_id LIMIT 10
    """


@query("sim_cosine_topk_matryoshka", oracle=_MRL_TOPK_ORACLE)
def sim_cosine_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by exact cosine over a 32-row shortlist ranked on the
    16-dim Matryoshka prefix. Scale posture: at 100 TB the prefix is
    STORED as its own column (a shuffle-free ingest projection), so the
    shortlist scan reads 16/64 of the vector bytes and compiles to
    TakeOrderedAndProject (no full sort); the exact re-rank touches
    only the 32 shortlisted full vectors."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir, 0)
    qpre = F.array(*[F.lit(float(x)) for x in qv[:_MRL_PREFIX]])
    qfull = F.array(*[F.lit(float(x)) for x in qv])
    short = (
        e.withColumn(
            "psim",
            sim.cosine(F.slice(F.col("embedding"), 1, _MRL_PREFIX), qpre),
        )
        .orderBy(F.col("psim").desc(), F.col("vec_id"))
        .limit(_MRL_SHORTLIST)
    )
    rr = short.select(
        "vec_id",
        "label",
        F.floor(1e9 * sim.cosine(F.col("embedding"), qfull))
        .cast("long")
        .alias("sim_nano"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("sim_nano").desc(), F.col("vec_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy(F.col("sim_nano").desc(), F.col("vec_id"))
        .limit(10)
    )


_MRL_PREFIXES = (8, 16, 32)


def _mrl_recall_oracle() -> str:
    pre_ctes = ",\n    ".join(
        f"p{m} AS (SELECT {m} AS prefix_dims, vec_id FROM "
        f"(SELECT c.vec_id, {_cos_sql(f'c.emb[1:{m}]', f'q.qe[1:{m}]')} AS ps"
        f" FROM c, q ORDER BY ps DESC, vec_id LIMIT 10))"
        for m in _MRL_PREFIXES
    )
    unions = " UNION ALL ".join(f"SELECT * FROM p{m}" for m in _MRL_PREFIXES)
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE vec_id <> 0),
    full10 AS (SELECT vec_id FROM
      (SELECT c.vec_id, {_cos_sql('c.emb', 'q.qe')} AS s
       FROM c, q ORDER BY s DESC, vec_id LIMIT 10)),
    {pre_ctes},
    allp AS ({unions})
    SELECT a.prefix_dims,
           CAST(COUNT(f.vec_id) AS BIGINT) AS n_hits,
           CAST(COALESCE(SUM(f.vec_id), 0) AS BIGINT) AS hit_checksum
    FROM allp a LEFT JOIN full10 f USING (vec_id)
    GROUP BY 1
    """


@query("sim_matryoshka_recall", oracle=_mrl_recall_oracle())
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of prefix-only ranking vs the exact full-dim top-10,
    per Matryoshka prefix length (8/16/32 dims) — the report that picks
    the serving truncation. Four TakeOrderedAndProject passes over the
    same columnar scan (one per prefix + the exact baseline); nothing
    shuffles more than 10 rows."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir, 0)
    qfull = F.array(*[F.lit(float(x)) for x in qv])
    full10 = (
        e.withColumn("s", sim.cosine(F.col("embedding"), qfull))
        .orderBy(F.col("s").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    parts = []
    for m in _MRL_PREFIXES:
        qpre = F.array(*[F.lit(float(x)) for x in qv[:m]])
        parts.append(
            e.withColumn(
                "ps", sim.cosine(F.slice(F.col("embedding"), 1, m), qpre)
            )
            .orderBy(F.col("ps").desc(), F.col("vec_id"))
            .limit(10)
            .select(F.lit(m).cast("int").alias("prefix_dims"), "vec_id")
        )
    allp = parts[0].unionByName(parts[1]).unionByName(parts[2])
    hit = allp.join(
        F.broadcast(full10.withColumnRenamed("vec_id", "f_vec_id")),
        allp["vec_id"] == F.col("f_vec_id"),
        "left",
    )
    return hit.groupBy("prefix_dims").agg(
        F.count("f_vec_id").cast("long").alias("n_hits"),
        F.coalesce(F.sum("f_vec_id"), F.lit(0)).cast("long").alias("hit_checksum"),
    )


# --------------------------------------------------------------------------
# Fuzzy entity-resolution pairs via SymSpell deletion-neighborhood
# blocking (Garbe's FastSS/SymSpell family): two strings at edit
# distance <= 1 MUST share a member of {self} ∪ {all length-1
# deletions}, so candidate generation is an EQUI-JOIN on the deletion
# key — the same banded one-shuffle discipline as MinHash/SimHash, no
# quadratic all-pairs scan. Verification is one levenshtein per
# DISTINCT candidate pair.
#
# Dense-duplicate guard (house rule): identical names exact-collapse to
# a (rep = min key, member count) BEFORE key generation, so a corpus
# where the same name repeats 100× (the replicated scale layout) costs
# 1 key set, not 100, and never expands identical-pair cliques;
# multiplicity is carried as pair_weight = cnt_a · cnt_b.
#
# Caveat: DuckDB levenshtein is byte-level, Spark's is char-level —
# identical on this ASCII name corpus; non-ASCII entity columns would
# need a canonicalizing transliteration first (documented boundary).
# --------------------------------------------------------------------------

_SYMSPELL_ORACLE = """
    WITH g AS (
      SELECT c_name, CAST(MIN(c_custkey) AS BIGINT) AS rep,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1),
    keys AS (
      SELECT rep, c_name, cnt,
             unnest(list_prepend(c_name,
               list_transform(range(len(c_name)),
                 i -> substr(c_name, 1, i) || substr(c_name, i + 2)))) AS k
      FROM g),
    cand AS (
      SELECT DISTINCT a.rep AS a_key, b.rep AS b_key,
             a.c_name AS an, b.c_name AS bn,
             a.cnt * b.cnt AS pair_weight
      FROM keys a JOIN keys b ON a.k = b.k AND a.rep < b.rep)
    SELECT a_key, b_key, CAST(pair_weight AS BIGINT) AS pair_weight
    FROM cand WHERE levenshtein(an, bn) <= 1
    """


@query("dedup_fuzzy_symspell_pairs", oracle=_SYMSPELL_ORACLE)
def dedup_fuzzy_symspell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-<=1 entity pairs over customer names via SymSpell
    deletion-key blocking: exact-collapse → one explode (len+1 keys per
    distinct name) → one equi-join shuffle on the deletion key →
    distinct → one levenshtein per candidate. Linear in distinct names;
    bucket sizes are bounded by the digit-family structure, and the
    skew-join path (AQE) covers pathological buckets."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_name").agg(
        F.min("c_custkey").cast("long").alias("rep"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    keys = g.select(
        "rep",
        "c_name",
        "cnt",
        F.explode(
            F.expr(
                # sequence(0, -1) DESCENDS (verify-skill gotcha) — guard
                # the empty-name edge explicitly to mirror range(0) = [].
                # array_distinct: deleting any char of an equal-char RUN
                # yields the SAME deletion key (digit-heavy entity names
                # collapse 19 keys → ~15), so the distinct array emits
                # fewer posting rows and quadratically fewer in-bucket
                # candidates — the pair set is unchanged because
                # duplicate (name, key) rows only duplicate candidates
                # the terminal distinct collapses anyway (measured:
                # 1.46M → 0.98M candidate rows at sf0.1).
                "array_distinct(concat(array(c_name), IF(length(c_name) > 0,"
                " transform(sequence(0, length(c_name) - 1),"
                " i -> concat(substring(c_name, 1, i),"
                " substring(c_name, i + 2, length(c_name)))), array())))"
            )
        ).alias("k"),
    ).localCheckpoint(eager=False)
    # The explicit repartition by the join key pins the join's
    # parallelism (guide §2.5): the key table is only ~few MB, so AQE
    # coalesces the plain join shuffle to 1-3 tasks — and then the
    # EXPLODING join (~1M candidate rows out of 223k in) and the
    # per-candidate levenshtein verify run nearly serially (measured
    # 7.4 s min-of-3 at sf0.1). A user repartition is exempt from AQE
    # coalescing; sized from defaultParallelism so it scales with the
    # cluster instead of hard-coding the local core count. The lazy
    # localCheckpoint above makes the two join branches share ONE
    # evaluation of the groupBy+explode. Measured min-of-3: 7.4 → 1.1 s.
    n_part = spark.sparkContext.defaultParallelism
    keys = keys.repartition(n_part, "k")
    a = keys.select(
        F.col("rep").alias("a_key"),
        F.col("c_name").alias("an"),
        F.col("cnt").alias("a_cnt"),
        "k",
    )
    b = keys.select(
        F.col("rep").alias("b_key"),
        F.col("c_name").alias("bn"),
        F.col("cnt").alias("b_cnt"),
        "k",
    )
    # levenshtein BEFORE distinct (guide §2.3 — shuffle fewer bytes):
    # the deletion-key join emits ~1.46M candidate rows at sf0.1 and
    # the old distinct-then-filter order shuffled all of them (two
    # ~18-char names per row) only to drop ~99% in the cheap codegen
    # levenshtein right after. Filtering first is result-identical
    # (filter is deterministic per row, so distinct∘filter ≡
    # filter∘distinct), and the distinct key shrinks to
    # (a_key, b_key, pair_weight) — names and weight are functions of
    # the rep keys (rep ↔ name is bijective by construction), so the
    # narrower distinct has the same cardinality. Measured min-of-3 at
    # sf0.1: 7.6 → 2.6 s; plan: the 1.46M-row Exchange over 5 columns
    # became a post-filter Exchange over 3 longs.
    cand = (
        a.join(b, "k")
        .filter(
            (F.col("a_key") < F.col("b_key"))
            & (F.levenshtein("an", "bn") <= 1)
        )
        .select(
            "a_key",
            "b_key",
            (F.col("a_cnt") * F.col("b_cnt")).cast("long").alias("pair_weight"),
        )
        .distinct()
    )
    return cand


# --------------------------------------------------------------------------
# Privacy: k-anonymity report over quasi-identifiers — the audit that
# precedes releasing a training corpus with user-linked metadata
# (Sweeney 2002). Quasi-identifier = (nation, market segment, account-
# balance kilobucket); the report is the k-class histogram plus the
# suppression verdict at k < 5.
#
# Exactness: the bucket is floor(acctbal / 1000) — both engines floor
# the SAME double quotient of the SAME parquet double (the verify-skill
# floor rule); everything downstream is integer counts.
# --------------------------------------------------------------------------

_KANON_ORACLE = """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_kbucket
      FROM customer),
    grp AS (
      SELECT c_nationkey, c_mktsegment, bal_kbucket,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM qi GROUP BY 1, 2, 3)
    SELECT k AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(k < 5 AS BOOLEAN) AS is_suppressed
    FROM grp GROUP BY 1
    """


@query("privacy_k_anonymity", oracle=_KANON_ORACLE)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity histogram over (nation, segment, balance kilobucket)
    quasi-identifiers with the k<5 suppression verdict. Two map-side-
    combined aggregates; output is <= |distinct k| rows."""
    c = load_table(spark, sf_dir, "customer")
    grp = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_kbucket"),
    ).groupBy("c_nationkey", "c_mktsegment", "bal_kbucket").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return grp.groupBy(F.col("k").alias("group_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    ).withColumn("is_suppressed", F.col("group_size") < 5)


# --------------------------------------------------------------------------
# Wilson-lower-bound ranking (Agresti–Coull / "how not to sort by
# average rating"): rank suppliers by the z=2 Wilson score lower bound
# of their NON-RETURN rate (l_returnflag <> 'R'), not the raw rate —
# small-n suppliers stop outranking large-n ones.
#
# With z = 2 the bound is the exact expression
#   LB = (w + 2 - 2·sqrt((w·(n-w) + n) / n)) / (n + 4)
# whose sqrt argument is ONE double quotient of exact int64 operands
# (w·(n-w) + n < 2^53 at any plausible per-supplier n), so both engines
# see bit-identical doubles; the gate rides on floor(1e9·LB).
# --------------------------------------------------------------------------

_WILSON_SQL = (
    "CAST(floor(1000000000.0 * ("
    "(CAST(w + 2 AS DOUBLE) - 2.0 * sqrt("
    "CAST(w * (n - w) + n AS DOUBLE) / CAST(n AS DOUBLE)))"
    " / CAST(n + 4 AS DOUBLE))) AS BIGINT)"
)

_WILSON_ORACLE = f"""
    WITH s AS (
      SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (l_returnflag <> 'R') AS BIGINT)
               AS w
      FROM lineitem GROUP BY 1)
    SELECT suppkey, n, w, {_WILSON_SQL} AS wilson_lb_nano
    FROM s ORDER BY wilson_lb_nano DESC, suppkey LIMIT 25
    """


@query("quality_wilson_nonreturn_rank", oracle=_WILSON_ORACLE)
def quality_wilson_nonreturn_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 suppliers by the z=2 Wilson lower bound of non-return
    rate.
    One map-side-combined aggregate over lineitem (the only full-table
    pass), a per-supplier scalar expression, and a
    TakeOrderedAndProject top-k — no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_suppkey").cast("long").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
        .cast("long")
        .alias("w"),
    )
    return (
        s.withColumn("wilson_lb_nano", F.expr(_WILSON_SQL))
        .orderBy(F.col("wilson_lb_nano").desc(), F.col("suppkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution — each purchase distributes 1,000,000
# integer micro-credits equally over its click/view touches in the
# preceding 3 days (same user); the remainder goes to the earliest
# touches (largest-remainder rule), so credit is EXACTLY conserved:
# every purchase with >= 1 touch contributes exactly 1e6 micro-credits.
#
# Scale posture: the touch<->purchase pairing is an equi-join on
# user_id (per-user activity is bounded — the natural key of event
# streams), filtered to the 3-day window; at 100 TB the join shuffles
# on uniform user_id keys once, the per-purchase ranking is a bounded
# per-key window, and the rollup output is <= |touch types| · |days|.
# --------------------------------------------------------------------------

_ATTR_WINDOW_SEC = 3 * 86400
_ATTR_CREDIT = 1_000_000

_ATTR_ORACLE = f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')),
    pairs AS (
      SELECT p.p_id, t.t_id, t.touch_type, t.t_ts,
             CAST(row_number() OVER (PARTITION BY p.p_id
                                     ORDER BY t.t_ts, t.t_id) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY p.p_id) AS BIGINT) AS n_touch
      FROM p JOIN t USING (user_id)
      WHERE t.t_ts < p.p_ts
        AND t.t_ts >= p.p_ts - INTERVAL {_ATTR_WINDOW_SEC} SECONDS),
    credit AS (
      SELECT touch_type, t_id,
             {_ATTR_CREDIT} // n_touch
               + CASE WHEN rk <= {_ATTR_CREDIT} % n_touch THEN 1 ELSE 0 END
               AS micro
      FROM pairs)
    SELECT touch_type,
           CAST(SUM(micro) AS BIGINT) AS micro_credits,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(t_id) AS BIGINT) AS id_checksum
    FROM credit GROUP BY 1
    """


@query("events_attribution_linear", oracle=_ATTR_ORACLE)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution with exact integer micro-credit
    conservation (largest-remainder to the earliest touches): total
    micro-credits, touch counts, and an id checksum per touch type."""
    from pyspark.sql import Window

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
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_SEC} SECONDS"))
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
                f"CAST({_ATTR_CREDIT} DIV n_touch"
                f" + IF(rk <= {_ATTR_CREDIT} % n_touch, 1, 0) AS BIGINT)"
            ).alias("micro"),
        )
    )
    return credit.groupBy("touch_type").agg(
        F.sum("micro").cast("long").alias("micro_credits"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("t_id").cast("long").alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# EWMA anomaly flags with EXACT rational decay — the monitoring twin of
# events_decayed_engagement. Per user, the last event's value is
# compared to the exponentially weighted moving average of its (up to)
# 8 predecessors with ratio 9/10. The weights are the exact integers
# w_j = 9^(j-1)·10^(8-j) (common denominator 10^7·Σ), values enter as
# floor(1e6·value) (same double in both engines), so the weighted
# numerator and the final integer DIV are exact int64 arithmetic —
# no float accumulation crosses engines.
#
# Scale posture: one groupBy(user_id) with bounded per-user arrays
# (array_sort + a JVM HOF fold over <= 9 elements); linear, one shuffle.
# --------------------------------------------------------------------------

_EWMA_WEIGHTS = [10_000_000, 9_000_000, 8_100_000, 7_290_000,
                 6_561_000, 5_904_900, 5_314_410, 4_782_969]
_EWMA_DEV_FLAG_MICRO = 2_000_000  # |deviation| > 2.0 value units

_EWMA_ORACLE = f"""
    WITH mv AS (
      SELECT user_id, ts, event_id,
             CAST(floor(1000000.0 * value) AS BIGINT) AS m
      FROM events),
    arr AS (
      SELECT user_id,
             list(m ORDER BY ts, event_id) AS vs,
             list(event_id ORDER BY ts, event_id) AS ids
      FROM mv GROUP BY 1),
    calc AS (
      SELECT user_id,
             ids[len(ids)] AS last_event_id,
             vs[len(vs)] AS last_m,
             list_reverse(vs[greatest(len(vs) - 8, 1):len(vs) - 1]) AS priors
      FROM arr WHERE len(vs) >= 2),
    ew AS (
      SELECT user_id, last_event_id, last_m,
             CAST(list_sum(list_transform(range(len(priors)),
               j -> priors[j + 1] * ([{', '.join(str(w) for w in _EWMA_WEIGHTS)}])[j + 1]))
               AS BIGINT) AS num,
             CAST(list_sum(list_transform(range(len(priors)),
               j -> ([{', '.join(str(w) for w in _EWMA_WEIGHTS)}])[j + 1]))
               AS BIGINT) AS den
      FROM calc)
    SELECT user_id, last_event_id,
           CAST(num // den AS BIGINT) AS ewma_micro,
           CAST(last_m - num // den AS BIGINT) AS deviation_micro,
           CAST(abs(last_m - num // den) > {_EWMA_DEV_FLAG_MICRO} AS BOOLEAN)
             AS is_anomaly
    FROM ew
    """


@query("events_ewma_anomaly", oracle=_EWMA_ORACLE)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (ratio 9/10 over up to 8 predecessors) anomaly
    flag on the last event's value, exact by integer weights
    9^j·10^(7-j) and a single integer DIV."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(floor(1000000.0 * value) AS BIGINT)").alias("m"),
    )
    arr = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "m"))
        ).alias("evs")
    )
    wlit = "array(" + ", ".join(f"{w}L" for w in _EWMA_WEIGHTS) + ")"
    calc = arr.filter(F.size("evs") >= 2).select(
        "user_id",
        F.expr("element_at(evs, -1).event_id").alias("last_event_id"),
        F.expr("element_at(evs, -1).m").alias("last_m"),
        F.expr(
            "reverse(transform(slice(evs, greatest(size(evs) - 8, 1),"
            " size(evs) - greatest(size(evs) - 8, 1)), e -> e.m))"
        ).alias("priors"),
    )
    ew = calc.select(
        "user_id",
        "last_event_id",
        "last_m",
        F.expr(
            "CAST(aggregate(zip_with(priors,"
            f" slice({wlit}, 1, size(priors)), (p, w) -> p * w),"
            " 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("num"),
        F.expr(
            f"CAST(aggregate(slice({wlit}, 1, size(priors)),"
            " 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("den"),
    )
    return ew.select(
        "user_id",
        "last_event_id",
        F.expr("CAST(num DIV den AS BIGINT)").alias("ewma_micro"),
        F.expr("CAST(last_m - num DIV den AS BIGINT)").alias("deviation_micro"),
        F.expr(
            f"abs(last_m - num DIV den) > {_EWMA_DEV_FLAG_MICRO}"
        ).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# Privacy metadata strip over media payloads — the image-side twin of
# text_redact_pii: remove every ancillary PNG chunk (tEXt Author/
# Software here; EXIF/XMP in production) and PROVE the cleaned stream
# still decodes by replaying the first scanline through inflate +
# unfilter. The oracle reconstructs, from doc_id arithmetic alone, the
# removed-chunk byte counts (keyword + NUL + value framing), the exact
# stored-deflate clean file size, and the decoded scanline sum — a
# hash match shows the strip removed exactly the ancillary bytes and
# left the pixel stream untouched.
# --------------------------------------------------------------------------

_STRIP_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             doc_id % 64 + 16 AS w,
             doc_id % 48 + 16 AS h
      FROM documents),
    r0 AS (
      SELECT d.doc_id,
             CAST(SUM(
               ((((g.i + d.doc_id)::HUGEINT * 6364136223846793005
                  + 1442695040888963407) % 18446744073709551616::HUGEINT)
                // 8589934592) % 256) AS BIGINT) AS row0_sum
      FROM dims d CROSS JOIN generate_series(0, 240) g(i)
      WHERE g.i < d.w * 3
      GROUP BY d.doc_id)
    SELECT d.doc_id,
           CAST(2 AS BIGINT) AS n_removed,
           CAST(24 + len(CAST(d.doc_id % 97 AS VARCHAR)) + 32 AS BIGINT)
             AS bytes_removed,
           CAST(63 + 5 * (((3 * d.w + 1) * d.h + 65534) // 65535)
                + (3 * d.w + 1) * d.h AS BIGINT) AS clean_bytes,
           r0.row0_sum,
           'Author,Software' AS keywords
    FROM dims d JOIN r0 USING (doc_id)
    """


@query("multimodal_strip_metadata", oracle=_STRIP_ORACLE)
def multimodal_strip_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip ancillary metadata chunks from tagged PNGs and verify the
    cleaned stream still decodes (first-scanline sum through the real
    inflate + unfilter). One Arrow-batched mapInPandas pass, no
    shuffle; at 100 TB this is the embarrassingly-parallel shape —
    per-file work, zero exchange."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_png_tagged,
        strip_metadata_report,
    )

    d = attach_png_tagged(load_table(spark, sf_dir, "documents"))
    return strip_metadata_report(d)


# --------------------------------------------------------------------------
# Streaming Wilson quality gate — per-batch (n, w) partials merged by
# addition (the mergeable-statistic discipline: the Wilson bound is
# applied ONCE at read-back over the exact merged integers, never to
# partials), so stream ≡ batch ≡ SQL bit-identically.
# --------------------------------------------------------------------------

_STREAM_WILSON_ORACLE = f"""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (value > 100.0) AS BIGINT) AS w
      FROM events GROUP BY 1)
    SELECT event_type, n, w, {_WILSON_SQL} AS wilson_lb_nano
    FROM s
    """


@query("stream_wilson_value_rate", oracle=_STREAM_WILSON_ORACLE)
def stream_wilson_value_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z=2 Wilson lower bound of the high-value rate (value > 100) per
    event type, computed as a REAL availableNow stream of additive
    (n, w) partials."""
    from jhu_data_parser_spark.streaming.jobs import run_wilson_value_stream

    return run_wilson_value_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# CCNet head/middle/tail sharding — the actual corpus split Wenzek et
# al. 2020 publish: per language, documents ranked by LM perplexity
# and cut into terciles (head = most fluent third). The rank and the
# tercile boundary are pure integer arithmetic ((3·(rank−1)) DIV n per
# language, doc_id tiebreak), so the shard assignment is exact.
#
# Scale posture: the per-doc KN table shuffles once on lang for the
# rank (per-lang sort — the same distributed-sort shape as
# sample_curriculum_phases; a skewed mega-language falls back to the
# global-rank quantile bucketing documented there); output is
# |langs|·3 rows.
# --------------------------------------------------------------------------

_CCNET_ORACLE = f"""{_KN_PD_CHAIN},
    ranked AS (
      SELECT doc_id, lang, ppx_micro,
             CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY ppx_micro, doc_id) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
      FROM pd)
    SELECT lang,
           CASE (3 * (rk - 1)) // nl WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ppx_micro) AS BIGINT) AS sum_ppx_micro,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM ranked GROUP BY 1, 2
    """


@query("text_ccnet_shards", oracle=_CCNET_ORACLE)
def text_ccnet_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language head/middle/tail terciles under the
    Kneser-Ney perplexity, with exact integer tercile boundaries."""
    from pyspark.sql import Window

    pd = _kn_doc_ppx(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("ppx_micro", "doc_id")
    ranked = pd.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "nl", F.count(F.lit(1)).over(Window.partitionBy("lang")).cast("long")
    )
    shard = F.expr(
        "CASE (3 * (rk - 1)) DIV nl WHEN 0 THEN 'head'"
        " WHEN 1 THEN 'middle' ELSE 'tail' END"
    )
    return ranked.groupBy("lang", shard.alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ppx_micro").cast("long").alias("sum_ppx_micro"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination — the scale path of
# text_decontaminate_overlap: when the benchmark n-gram set is too
# large to broadcast exactly, broadcast a fixed-size Bloom bitmap
# instead (m = 65536 bits as 2048 32-bit words, k = 2 md5-derived
# hashes). The report probes the corpus through the bitmap AND through
# the exact set, so the hash gate pins the false-positive accounting —
# the number a production run uses to size m.
#
# Exactness: both hash positions are 48-bit md5 prefixes mod m (the
# house _hexpoly/conv portable-hash pair); bitmap words are sums of
# DISTINCT powers of two (pow(2, b) is IEEE-exact for b <= 31); the
# probe is integer DIV/% arithmetic — no engine-private hashing.
#
# Scale posture: the bitmap build is one distinct + one <= 2048-row
# aggregate on the (small) benchmark side; the corpus probes via TWO
# broadcast joins on word index (the bitmap never exceeds 8 KiB no
# matter how large the benchmark grows — that is the point); the exact
# twin join stays for calibration only.
# --------------------------------------------------------------------------

_BLOOM_BITS = 65536
_BLOOM_WORDS = _BLOOM_BITS // 32

from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql  # noqa: E402


def _bloom_oracle() -> str:
    h1 = _hexpoly_sql("substr(md5(shingle), 1, 12)", 12) + f" % {_BLOOM_BITS}"
    h2 = _hexpoly_sql("substr(md5(shingle), 13, 12)", 12) + f" % {_BLOOM_BITS}"
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS shingle
      FROM toks, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS u(i)),
    hashed AS (
      SELECT doc_id, shingle, ({h1}) AS p1, ({h2}) AS p2 FROM sh),
    bench AS (SELECT DISTINCT shingle, p1, p2 FROM hashed
              WHERE doc_id % 97 = 0),
    pos AS (SELECT DISTINCT pos FROM
            (SELECT p1 AS pos FROM bench UNION ALL SELECT p2 FROM bench)),
    words AS (
      SELECT pos // 32 AS word_idx,
             CAST(SUM(CAST(pow(2.0, pos % 32) AS BIGINT)) AS BIGINT) AS word
      FROM pos GROUP BY 1),
    corp AS (SELECT * FROM hashed WHERE doc_id % 97 <> 0),
    probed AS (
      SELECT c.doc_id, c.shingle,
             CASE WHEN w1.word IS NOT NULL AND w2.word IS NOT NULL
                   AND (w1.word // CAST(pow(2.0, c.p1 % 32) AS BIGINT)) % 2 = 1
                   AND (w2.word // CAST(pow(2.0, c.p2 % 32) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE 0 END AS bloom_hit,
             CASE WHEN c.shingle IN (SELECT shingle FROM bench)
                  THEN 1 ELSE 0 END AS exact_hit
      FROM corp c
      LEFT JOIN words w1 ON c.p1 // 32 = w1.word_idx
      LEFT JOIN words w2 ON c.p2 // 32 = w2.word_idx)
    SELECT doc_id,
           CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(exact_hit) AS BIGINT) AS n_exact_hits,
           CAST(SUM(bloom_hit) - SUM(exact_hit) AS BIGINT) AS n_false_pos
    FROM probed GROUP BY 1 HAVING SUM(bloom_hit) > 0
    """


def _bloom_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(corpus doc, shingle) Bloom + exact probe flags — the shared
    core of the calibration report and the funnel-v4 decontamination
    stage."""
    from jhu_data_parser_spark.operators import dedup as dd

    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("t"),
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "IF(size(t) > 3, transform(sequence(1, size(t) - 3),"
                    " i -> array_join(slice(t, i, 4), ' ')), array())"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    h1 = (
        F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("long")
        % _BLOOM_BITS
    )
    h2 = (
        F.conv(F.substring(F.md5("shingle"), 13, 12), 16, 10).cast("long")
        % _BLOOM_BITS
    )
    hashed = sh.select("doc_id", "shingle", h1.alias("p1"), h2.alias("p2"))
    bench = hashed.filter(F.col("doc_id") % 97 == 0).select(
        "shingle", "p1", "p2"
    ).distinct()
    pos = (
        bench.select(F.col("p1").alias("pos"))
        .unionAll(bench.select(F.col("p2").alias("pos")))
        .distinct()
    )
    words = pos.groupBy(F.expr("pos DIV 32").alias("word_idx")).agg(
        F.expr("CAST(SUM(CAST(pow(2.0, pos % 32) AS BIGINT)) AS BIGINT)").alias(
            "word"
        )
    )
    corp = hashed.filter(F.col("doc_id") % 97 != 0)
    w1 = words.select(
        F.col("word_idx").alias("w1_idx"), F.col("word").alias("word1")
    )
    w2 = words.select(
        F.col("word_idx").alias("w2_idx"), F.col("word").alias("word2")
    )
    bench_sh = bench.select("shingle").distinct()
    probed = (
        corp.join(F.broadcast(w1), F.expr("p1 DIV 32") == F.col("w1_idx"), "left")
        .join(F.broadcast(w2), F.expr("p2 DIV 32") == F.col("w2_idx"), "left")
        .join(
            F.broadcast(bench_sh.withColumn("exact_hit", F.lit(1))),
            "shingle",
            "left",
        )
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN word1 IS NOT NULL AND word2 IS NOT NULL"
                " AND (word1 DIV CAST(pow(2.0, p1 % 32) AS BIGINT)) % 2 = 1"
                " AND (word2 DIV CAST(pow(2.0, p2 % 32) AS BIGINT)) % 2 = 1"
                " THEN 1 ELSE 0 END"
            ).alias("bloom_hit"),
            F.coalesce(F.col("exact_hit"), F.lit(0)).alias("exact_hit"),
        )
    )
    return probed


@query("text_decontaminate_bloom_report", oracle=_bloom_oracle())
def text_decontaminate_bloom_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through a broadcast 8 KiB Bloom bitmap (k=2,
    m=65536) with exact-join calibration: per contaminated-candidate
    doc, bloom hits vs exact hits vs false positives."""
    probed = _bloom_probed(spark, sf_dir)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.sum("bloom_hit").cast("long").alias("n_bloom_hits"),
            F.sum("exact_hit").cast("long").alias("n_exact_hits"),
            (F.sum("bloom_hit") - F.sum("exact_hit"))
            .cast("long")
            .alias("n_false_pos"),
        )
        .filter(F.col("n_bloom_hits") > 0)
    )


def bloom_flagged_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct corpus doc_ids with at least one Bloom hit — the
    drop set of the funnel-v4 decontamination stage."""
    probed = _bloom_probed(spark, sf_dir)
    return (
        probed.filter(F.col("bloom_hit") == 1).select("doc_id").distinct()
    )


# --------------------------------------------------------------------------
# Privacy: l-diversity report — k-anonymity's companion audit (Machana-
# vajjhala et al. 2007): a group can be k-large yet reveal its sensitive
# attribute if every member shares it. Quasi-identifier = (nation,
# balance kilobucket); sensitive attribute = market segment; report =
# the l-class histogram (l = distinct sensitive values per QI group)
# with the l < 2 disclosure verdict. Same exactness discipline as
# privacy_k_anonymity (shared floored bucket, integer counts).
# --------------------------------------------------------------------------

_LDIV_ORACLE = """
    WITH qi AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_kbucket,
             c_mktsegment
      FROM customer),
    grp AS (
      SELECT c_nationkey, bal_kbucket,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
      FROM qi GROUP BY 1, 2)
    SELECT l AS diversity,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(l < 2 AS BOOLEAN) AS is_disclosing
    FROM grp GROUP BY 1
    """


@query("privacy_l_diversity", oracle=_LDIV_ORACLE)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram over (nation, balance kilobucket) QI
    groups with market segment as the sensitive attribute; l<2 flags
    disclosing groups. Two map-side-combined aggregates."""
    c = load_table(spark, sf_dir, "customer")
    grp = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_kbucket"),
        "c_mktsegment",
    ).groupBy("c_nationkey", "bal_kbucket").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.countDistinct("c_mktsegment").cast("long").alias("l"),
    )
    return grp.groupBy(F.col("l").alias("diversity")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    ).withColumn("is_disclosing", F.col("diversity") < 2)
