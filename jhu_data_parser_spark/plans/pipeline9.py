"""Round-7 third-wave catalog queries: three published corpus-curation
methods a training-data pipeline runs at scale — DSIR importance
resampling (Xie et al., NeurIPS 2023), SemDeDup semantic dedup (Abbas
et al. 2023), and reciprocal-rank-fusion hybrid retrieval (Cormack et
al., SIGIR 2009).

Reference parity note: the reference (src/parser.py:28-102,
src/parser2.py:28-139) has no analytics surface — these extend the
engine along SURVEY.md §2's "LLM data pipeline" axis, each paired with
a DuckDB oracle replaying the identical arithmetic.

Exactness discipline shared by the module: every cross-engine hash
gate rides on integers — md5-prefix bucket hashes, fixed-point
log-ratios (floor(1e6·ln(r)) of an exactly-representable rational),
quantized-integer dot products, and integer-division RRF
contributions. The only float ops are single ln/÷/sqrt applications on
identical inputs (IEEE-identical across engines; the 1-ulp ln
tolerance sits 10 orders of magnitude inside the 1e-6 floor grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators.similarity import int_dot
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.plans.pipeline4 import _bm25_contrib_sql
from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql
from jhu_data_parser_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Score every raw document by how target-like its hashed n-gram
# distribution is: features are unigrams + adjacent bigrams hashed into
# B buckets; the weight table lr(b) = log(p_target(b) / p_raw(b)) is
# LEARNED from the corpus itself (add-1 smoothed bucket counts over the
# target slice vs the full corpus); a document's importance weight is
# the sum of its features' log-ratios; the resample takes the global
# top-K by weight.
#
# Scale posture: ONE shuffle builds the (≤B)-row weight table (bucket
# counts with map-side combine; the target flag is a codegen predicate,
# so target and raw counts come out of the SAME aggregate), the table
# broadcasts back onto the exploded feature stream, and the per-doc sum
# shuffles uniform doc_id keys once. Totals are a 1-row aggregate
# cross-joined in. The top-K is TakeOrderedAndProject (per-partition
# partial top-k, no global sort) and the rank window runs on the K-row
# shortlist only — nothing driver-side, nothing single-partition at
# corpus width.
#
# Exactness: bucket counts and totals are integers; the log-ratio is
# floor(1e6 · ln((ct+1)(NR+B) / ((cr+1)(NT+B)))) where numerator and
# denominator are exact int64 products cast to double (< 2^53, exact),
# divided once (IEEE-exact), ln'd once; per-doc weights are INTEGER
# sums of the fixed-point ratios, so aggregation order cannot move the
# hash.
# --------------------------------------------------------------------------

_DSIR_B = 1024
_DSIR_TOPK = 100

# Identical op-chain text evaluated by both engines (ct/cr/nt/nr are
# exact BIGINT columns in scope where this is spliced).
_DSIR_LR_SQL = (
    f"CAST(floor(1000000.0 * ln("
    f"CAST((ct + 1) * (nr + {_DSIR_B}) AS DOUBLE)"
    f" / CAST((cr + 1) * (nt + {_DSIR_B}) AS DOUBLE))) AS BIGINT)"
)

# unigram + bigram feature chain over a pre-split token column `w`
# (r14: callers project split(text, ' ') AS w first, evaluating the
# tokenization once per doc instead of five times per row)
_FEATS_SQL_SPARK_W = (
    "concat(w, "
    "zip_with(slice(w, 1, size(w) - 1), "
    "slice(w, 2, size(w) - 1), "
    "(a, b) -> concat(a, '_', b)))"
)

_DSIR_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    f AS (
      SELECT doc_id, source,
             unnest(w || list_transform(
               list_zip(w[1:len(w)-1], w[2:len(w)]),
               z -> z[1] || '_' || z[2])) AS feat
      FROM d),
    b AS (
      SELECT doc_id, source,
             ({_hexpoly_sql("md5(feat)", 8)}) % {_DSIR_B} AS bucket,
             CASE WHEN ({_hexpoly_sql("md5(source)", 4)}) % 4 = 0
                  THEN 1 ELSE 0 END AS is_t
      FROM f),
    bc AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(SUM(is_t) AS BIGINT) AS ct
      FROM b GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
      FROM bc),
    lr AS (SELECT bucket, {_DSIR_LR_SQL} AS lr_micro FROM bc, tot),
    pd AS (
      SELECT b.doc_id, b.source,
             CAST(SUM(lr.lr_micro) AS BIGINT) AS dsir_micro
      FROM b JOIN lr USING (bucket) GROUP BY 1, 2)
    SELECT doc_id, source, dsir_micro,
           CAST(row_number() OVER (ORDER BY dsir_micro DESC, doc_id)
                AS BIGINT) AS sel_rank
    FROM pd ORDER BY dsir_micro DESC, doc_id LIMIT {_DSIR_TOPK}
    """


@query("curation_dsir_weights", oracle=_DSIR_ORACLE)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: learn hashed-bigram log-ratio weights
    (target slice = sources whose md5 draw lands in the 25% "target
    mix"; raw = whole corpus) and select the top-100 most target-like
    documents."""
    d = load_table(spark, sf_dir, "documents")
    # is_t and the token array are DOC-level values: computing them
    # before the explode evaluates md5(source) and split(text) once per
    # document instead of once per exploded feature row (~300× fewer
    # md5 calls at sf0.1; measured 2.8 → 2.5 s min-of-3, identical
    # top-100)
    feats = d.select(
        "doc_id",
        "source",
        F.when(
            F.conv(F.substring(F.md5("source"), 1, 4), 16, 10).cast("long") % 4
            == 0,
            1,
        )
        .otherwise(0)
        .alias("is_t"),
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "source",
        "is_t",
        F.explode(F.expr(_FEATS_SQL_SPARK_W)).alias("feat"),
    )
    b = feats.select(
        "doc_id",
        "source",
        "is_t",
        (
            F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("long")
            % _DSIR_B
        ).alias("bucket"),
    )
    bc = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cr"),
        F.sum("is_t").cast("long").alias("ct"),
    )
    tot = bc.agg(
        F.sum("cr").cast("long").alias("nr"), F.sum("ct").cast("long").alias("nt")
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "bucket", F.expr(_DSIR_LR_SQL).alias("lr_micro")
    )
    pd = (
        b.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr_micro").cast("long").alias("dsir_micro"))
    )
    short = pd.orderBy(F.col("dsir_micro").desc(), "doc_id").limit(_DSIR_TOPK)
    w = Window.orderBy(F.col("dsir_micro").desc(), "doc_id")
    return short.select(
        "doc_id",
        "source",
        "dsir_micro",
        F.row_number().over(w).cast("long").alias("sel_rank"),
    )


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023) — semantic dedup via within-cluster
# embedding similarity: k-means the corpus, then inside each cluster
# prune every vector that has a ≥τ-cosine neighbour with a smaller id
# (keep-first; the published greedy rule). Near-duplicates are planted
# deterministically (every id%7 vector gets a twin with +1 on the first
# quantized component — cosine ≈ 1) so the prune has real work; the
# twins inherit their source's cluster (an ε-perturbation lands in the
# same cell).
#
# Scale posture: clustering bounds the candidate set — pairs form only
# WITHIN a cluster (salted self-join on the cluster key: k alone gives
# at most k tasks, so the left side buckets by id%S and the right side
# replicates across the S buckets — every a<b pair lands exactly once
# at salt = ida % S), so cost is Σ|c|²/2, and in a real deployment k
# grows with the corpus to hold |c| constant (the operator takes k as
# a parameter; the catalog query pins k=10 for the oracle). Norms are
# computed ONCE per row before the join; the per-pair test is the
# shared int_dot zip_with/aggregate dot against the integer threshold
# 100·dot² ≥ 81·|a|²·|b|² (τ=0.9), all int64-exact at the 1e3
# quantization. (NOT an unrolled per-component sum: a 64-term codegen
# expression exceeds HotSpot's JIT method budget and runs bytecode-
# interpreted — measured 6× slower than the HOF on this stage.)
# --------------------------------------------------------------------------

_SEM_K = 10
_SEM_ITERS = 3
_SEM_SCALE = 1_000
_SEM_DIM = 64  # oracle-side only; the operator reads the real width
_SEM_TWIN_OFF = 10_000_000


def _sem_oracle() -> str:
    from jhu_data_parser_spark.plans.clustering import _kmeans_ctes

    dot = " + ".join(f"a.q[{i + 1}] * b.q[{i + 1}]" for i in range(_SEM_DIM))
    n2 = " + ".join(f"q[{i + 1}] * q[{i + 1}]" for i in range(_SEM_DIM))
    return f"""
    WITH {_kmeans_ctes(_SEM_K, _SEM_ITERS)},
    asg AS (SELECT id, cid FROM a{_SEM_ITERS}),
    q3 AS (SELECT vec_id AS id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(ROUND(x * {_SEM_SCALE}, 0) AS BIGINT)) AS q
           FROM embeddings),
    corpus AS (
      SELECT id, q, id AS src FROM q3
      UNION ALL
      SELECT id + {_SEM_TWIN_OFF}, list_concat([q[1] + 1], q[2:len(q)]), id
      FROM q3 WHERE id % 7 = 0),
    cc AS (SELECT c.id, c.q, CAST({n2} AS BIGINT) AS n2, a.cid
           FROM corpus c JOIN asg a ON a.id = c.src),
    prs AS (
      SELECT a.cid, b.id AS idb
      FROM cc a JOIN cc b ON a.cid = b.cid AND a.id < b.id
      WHERE CAST({dot} AS BIGINT) >= 0
        AND 100 * CAST({dot} AS BIGINT) * CAST({dot} AS BIGINT)
            >= 81 * a.n2 * b.n2),
    pruned AS (SELECT DISTINCT cid, idb AS id FROM prs)
    SELECT c.cid AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(p.id) AS BIGINT) AS n_pruned,
           CAST(COUNT(*) - COUNT(p.id) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(p.id), 0) AS BIGINT) AS pruned_id_sum
    FROM cc c LEFT JOIN pruned p ON p.cid = c.cid AND p.id = c.id
    GROUP BY 1
    """


@query("curation_semdedup_prune", oracle=_sem_oracle())
def curation_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings corpus + planted near-dup twins:
    k=10 k-means cells, keep-first prune at cosine ≥ 0.9, per-cluster
    (n_points, n_pruned, n_kept, pruned-id checksum)."""
    from jhu_data_parser_spark.operators.clustering import (
        kmeans_assign,
        quantize_vectors,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # collapse_duplicates: replicated corpora fit over distinct vectors
    # with multiplicities (bit-identical — Lloyd's integer sums
    # factorize over copies), keeping the fit on the driver-local path.
    asg = kmeans_assign(
        quantize_vectors(e),
        k=_SEM_K,
        iterations=_SEM_ITERS,
        collapse_duplicates=True,
    )
    q3 = quantize_vectors(e, scale=_SEM_SCALE)
    twins = q3.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + _SEM_TWIN_OFF).alias("id"),
        F.expr(
            "concat(array(element_at(q, 1) + 1L), slice(q, 2, size(q) - 1))"
        ).alias("q"),
        F.col("id").alias("src"),
    )
    corpus = q3.select("id", "q", F.col("id").alias("src")).unionByName(twins)
    cc = corpus.join(
        asg.select(F.col("id").alias("src"), F.col("cluster").alias("cid")),
        "src",
    ).select("id", "q", int_dot(F.col("q"), F.col("q")).alias("n2"), "cid")
    # Distinct-vector collapse (the round-6 exact-collapse lesson,
    # applied to vectors): identical vectors always share a cluster
    # (the assignment is a deterministic function of q), and the
    # keep-first rule factorizes exactly over copies — every copy but
    # the min-id one is pruned by its identical twin (dot = |v|², so
    # 100·dot² ≥ 81·|v|⁴ always passes, including |v|=0), and the
    # min-id copy is pruned iff some OTHER vector in the cell passes
    # the threshold with a smaller min-id. So the quadratic pair stage
    # runs on DISTINCT vectors only; copy counts/id-sums fold back in
    # the final aggregate. On a dup-dense corpus (the 100× replicated
    # layout: 200k points, ~2k distinct) this is the difference
    # between ~5e7 and ~5e11 pair evaluations. The lazy checkpoint
    # materializes the kmeans+collapse chain ONCE for its three
    # consumers (two pair sides + the final rollup).
    reps = (
        cc.groupBy("cid", "q", "n2")
        .agg(
            F.min("id").alias("rid"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sum("id").alias("id_sum"),
        )
        .localCheckpoint(eager=False)
    )
    # Salted self-join: the cluster key alone has only k distinct
    # values, so AQE coalesces the pair stage to ~1 task locally (and
    # to ≤k tasks at best). Bucketing the left side by rid and
    # replicating the right side across the S buckets spreads each
    # cluster's pair block over k·S tasks; every (a < b) pair still
    # appears exactly once, at salt = rida % S. (At real scale k grows
    # with the corpus to hold |cluster| constant — the salt is the
    # local-k complement, same trick as operators/skew.py.)
    salt_n = 8
    a = reps.select(
        "cid",
        (F.col("rid") % salt_n).cast("int").alias("salt"),
        F.col("rid").alias("ida"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    bt = reps.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias("salt64"),
        F.col("rid").alias("idb"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    ).select(
        "cid",
        F.col("salt64").cast("int").alias("salt"),
        "idb",
        "qb",
        "nb2",
    )
    pairs = (
        a.join(bt, ["cid", "salt"])
        .filter(F.col("ida") < F.col("idb"))
        .withColumn("dot", int_dot(F.col("qa"), F.col("qb")))
        .filter(
            (F.col("dot") >= 0)
            & (
                100 * F.col("dot") * F.col("dot")
                >= 81 * F.col("na2") * F.col("nb2")
            )
        )
    )
    rep_pruned = pairs.select("cid", F.col("idb").alias("rid")).distinct()
    hit = F.when(F.col("hit").isNotNull(), 1).otherwise(0)
    return (
        reps.join(
            rep_pruned.withColumn("hit", F.lit(1)), ["cid", "rid"], "left"
        )
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.sum("n_copies").cast("long").alias("n_points"),
            F.sum(F.col("n_copies") - 1 + hit).cast("long").alias("n_pruned"),
            F.sum(1 - hit).cast("long").alias("n_kept"),
            F.sum(F.col("id_sum") - (1 - hit) * F.col("rid"))
            .cast("long")
            .alias("pruned_id_sum"),
        )
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion (Cormack et al. 2009) — the hybrid-retrieval
# join: fuse a lexical BM25 ranking with a dense cosine ranking via
# score(d) = Σ_lists 1/(60 + rank_list(d)), the standard RRF with k=60.
# Documents and embeddings are aligned on doc_id = vec_id.
#
# Scale posture: each side is a full-corpus scan into a per-partition
# partial top-k (TakeOrderedAndProject) — no global sort, no index.
# Rank assignment and the fusion join run on the two 50-row shortlists
# (bounded, broadcastable); output is the fused top-20.
#
# Exactness: BM25 rides the 1e-6 fixed-point per-term contribution
# (pipeline4._bm25_contrib_sql — literally identical op chain in both
# engines); cosine similarity is bit-identical (DOUBLE[]-cast dots,
# exact IEEE ÷ and sqrt); RRF contributions are INTEGER division
# 1e9 // (60 + rank), so the fused score is an exact integer sum.
# --------------------------------------------------------------------------

_RRF_TERMS = ("merge", "query", "scan")
_RRF_SHORTLIST = 50
_RRF_TOPK = 20
_RRF_K = 60


def _rrf_oracle() -> str:
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
    bmr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY score_fp DESC, doc_id) AS r
            FROM bm),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = 0),
    cs AS (SELECT e.vec_id AS doc_id,
                  list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.qe)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(qv.qe, qv.qe))) AS sim
           FROM embeddings e, qv WHERE e.vec_id <> 0
           ORDER BY sim DESC, doc_id LIMIT {_RRF_SHORTLIST}),
    csr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS r
            FROM cs),
    fused AS (
      SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
             CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS in_bm25,
             CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS in_cos,
             CAST(COALESCE(1000000000 // ({_RRF_K} + b.r), 0)
                  + COALESCE(1000000000 // ({_RRF_K} + c.r), 0) AS BIGINT)
               AS rrf_nano
      FROM bmr b FULL OUTER JOIN csr c ON b.doc_id = c.doc_id)
    SELECT doc_id, CAST(in_bm25 AS INT) AS in_bm25,
           CAST(in_cos AS INT) AS in_cos, rrf_nano,
           CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
                AS BIGINT) AS fused_rank
    FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT {_RRF_TOPK}
    """


@query("retrieval_rrf_hybrid", oracle=_rrf_oracle())
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 (terms 'merge query scan') and dense
    cosine (query = vec 0) shortlists fused by reciprocal-rank fusion,
    top-20."""
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
        F.row_number()
        .over(Window.orderBy(F.col("score_fp").desc(), "doc_id"))
        .alias("r_bm"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    cs = sim.topk_cosine(
        e.filter(F.col("vec_id") != 0), qv, k=_RRF_SHORTLIST
    ).select(F.col("vec_id").alias("doc_id"), "sim")
    csr = cs.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "doc_id"))
        .alias("r_cs"),
    )
    fused = (
        bmr.join(csr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("r_bm").isNotNull(), 1).otherwise(0).alias("in_bm25"),
            F.when(F.col("r_cs").isNotNull(), 1).otherwise(0).alias("in_cos"),
            (
                F.coalesce(
                    F.expr(f"1000000000 div ({_RRF_K} + r_bm)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 div ({_RRF_K} + r_cs)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_nano"),
        )
        .orderBy(F.col("rrf_nano").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )
    return fused.select(
        "doc_id",
        "in_bm25",
        "in_cos",
        "rrf_nano",
        F.row_number()
        .over(Window.orderBy(F.col("rrf_nano").desc(), "doc_id"))
        .cast("long")
        .alias("fused_rank"),
    )
