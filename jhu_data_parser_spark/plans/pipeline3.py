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
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
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
    return scored.filter(draw < thresh)
