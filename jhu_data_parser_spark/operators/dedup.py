"""Deduplication operators (SURVEY.md §2.12): exact, MinHash+LSH near-dup,
SimHash, n-gram Jaccard.

Scale design:

- Exact dedup groups on a 128-bit fingerprint, never the raw text — the
  shuffle moves 16-byte keys, not documents.
- MinHash+LSH is the classic shingle → K minhashes → B bands → bucket
  join pipeline: candidate generation is an equi-join on (band, band
  hash), so total work is linear in documents + candidate pairs; no
  all-pairs comparison ever happens. All hashing uses xxhash64 with
  integer salts — deterministic across runs, JVM-side, no UDFs.
- SimHash packs a 64-bit signature per doc via higher-order array folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators.text import fingerprint

__all__ = [
    "exact_dedup",
    "exact_dedup_groups",
    "token_shingles",
    "minhash_signature",
    "minhash_candidates",
    "near_dup_pairs_minhash",
    "simhash_bits",
    "simhash_hex",
    "hamming_distance",
    "jaccard_tokens",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct (normalized) text — the lowest id wins,
    making the survivor deterministic under any partitioning."""
    fp = fingerprint(text_col).alias("__fp")
    w = df.select("*", fp)
    keeper = w.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return w.join(keeper, [id_col, "__fp"], "left_semi").drop("__fp")


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: fingerprint → (keeper id, group size)."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def token_shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles as strings: contiguous token windows joined by a
    separator. Built with sequence + transform + slice — native, no UDF,
    no explode (the array stays inside the row)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    n = F.size(toks)
    # positions 1..n-k+1 (1-based for slice); short docs get the whole doc
    # as a single shingle.
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for salt j, min over shingles of
    xxhash64(j, shingle). Deterministic, JVM-side; K passes over the
    in-row shingle array, no shuffle."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, j=j: F.xxhash64(F.lit(j), s)))
            for j in range(num_hashes)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: equal band-hash in any band.

    Pipeline: signature (in-row) → explode to B rows/doc → group by
    (band, hash of the band's rows) → pairs within buckets. The only
    shuffle is on band hashes; bucket sizes are bounded in practice (and
    a skew-safe cap can drop degenerate buckets — `max_bucket`
    guards against e.g. empty-text clusters at 100 TB).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(token_shingles(text_col, shingle_k), num_hashes)
    with_sig = df.select(F.col(id_col), sig.alias("sig"))
    banded = with_sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Token-set Jaccard similarity of two token arrays (native set ops)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def near_dup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified with exact token-set
    Jaccard. Verification joins the (small) candidate pair list back to
    the docs — two broadcast-or-shuffle hash joins on doc ids, then an
    in-row set comparison. Nothing quadratic anywhere."""
    cands = minhash_candidates(df, id_col, text_col, num_hashes, bands, shingle_k)
    toks = df.select(
        F.col(id_col), F.array_distinct(F.split(F.lower(text_col), r"\s+")).alias("toks")
    )
    return (
        cands.join(toks.withColumnsRenamed({id_col: "id_a", "toks": "toks_a"}), "id_a")
        .join(toks.withColumnsRenamed({id_col: "id_b", "toks": "toks_b"}), "id_b")
        .withColumn("jaccard", jaccard_tokens(F.col("toks_a"), F.col("toks_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bits(col: Column | str, nbits: int = 64) -> Column:
    """SimHash bit vector (array<int> of 0/1, slot i = bit i).

    Per token: a 64-bit xxhash; each signature bit accumulates +1/-1 by
    the token's bit; the sign of each accumulator is the output bit.
    Implemented as one higher-order aggregate over the token array with a
    64-slot accumulator — per-row sequential, across rows embarrassingly
    parallel, no shuffle, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    zeros = F.array_repeat(F.lit(0), nbits)
    acc = F.aggregate(
        toks,
        zeros,
        lambda a, t: F.transform(
            a,
            lambda v, i: v + F.when(F.bit_get(F.xxhash64(t), i) == 1, 1).otherwise(-1),
        ),
    )
    return F.transform(acc, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_hex(col: Column | str, nbits: int = 64) -> Column:
    """SimHash packed as a fixed-width hex string (MSB = bit nbits-1) —
    compact to store, groupable, engine-portable (avoids signed-long
    overflow for bit 63)."""
    bits = simhash_bits(col, nbits)
    binstr = F.concat_ws("", F.transform(F.reverse(bits), lambda b: b.cast("string")))
    return F.lpad(F.conv(binstr, 2, 16), nbits // 4, "0")


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.size(F.filter(F.zip_with(bits_a, bits_b, lambda a, b: a != b), lambda x: x))
