"""Multimodal column plumbing (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codec step is stubbed (the image/audio libraries are not in this
container) behind ``decode_stub``: a deterministic fake that derives
"metadata" from the bytes, or ``NotImplementedError`` in strict mode.

At 100 TB: binary payloads dominate partition size — Arrow batches of
multi-MB blobs blow Python-worker memory if partitions are sized for
scalar rows. :func:`repartition_for_payload` right-sizes partitions from
sampled payload sizes before any Python stage; metadata extraction
projects the binary column away as early as possible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary",
    "MEDIA_META_SCHEMA",
    "extract_media_meta",
    "frame_sample_stub",
    "repartition_for_payload",
]

# Typed metadata contract for decoded media.
MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, width int, height int, "
    "n_frames int, sample_rate int"
)


def attach_binary(df: DataFrame, text_col: str = "text", media_col: str = "media") -> DataFrame:
    """Synthesize an opaque binary payload column (UTF-8 bytes of the text
    in tests; in production this is the raw image/audio bytes read via
    ``spark.read.format('binaryFile')``)."""
    return df.withColumn(media_col, F.encode(F.col(text_col), "UTF-8"))


def repartition_for_payload(
    df: DataFrame,
    media_col: str = "media",
    target_mb: int = 64,
    sample_rows: int = 1_000,
) -> DataFrame:
    """Partition-size the frame for binary payloads: estimate average
    payload bytes from a bounded sample, target ``target_mb`` of payload
    per partition, repartition round-robin.

    One bounded sample + one count — layout-time cost, not per-query.
    (When reading real media via ``binaryFile`` the file source already
    sizes splits by bytes; this helper covers payloads synthesized or
    joined in mid-pipeline, where Spark only counts rows.)"""
    sample = df.select(F.octet_length(media_col).alias("n")).limit(sample_rows)
    avg = sample.agg(F.avg("n")).first()[0] or 1.0
    total = df.count() * avg
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    current = df.rdd.getNumPartitions()
    min_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(max(n_parts, min(min_parts, current)))


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    media_type: str = "image",
    strict: bool = False,
) -> DataFrame:
    """Decode media metadata with ``mapInPandas`` (Arrow batches).

    The decode itself is a STUB: real deployments replace `_decode_one`
    with PIL/ffmpeg calls; everything around it — batch iteration, output
    schema, early projection of the heavy binary column — is the real
    production shape.
    """

    def _decode_one(payload: bytes) -> tuple[int, int, int, int]:
        if strict:
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "swap in PIL/ffmpeg for real decode"
            )
        # Deterministic fake: derive dimensions from the byte length so
        # tests can assert exact values without a codec.
        n = len(payload)
        return (n % 1920) + 1, (n % 1080) + 1, (n % 30) + 1, 16000

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_one(p) for p in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": media_type,
                    "n_bytes": [len(p) for p in pdf[media_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "sample_rate": [m[3] for m in metas],
                }
            )

    return df.select(id_col, media_col).mapInPandas(_map, MEDIA_META_SCHEMA)


def frame_sample_stub(
    df: DataFrame,
    every_nth: int = 10,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame,
    frame payload stubbed as a deterministic byte slice. Demonstrates the
    1→N mapInPandas expansion shape (row explosion happens Python-side in
    Arrow batches, then Spark repartitions downstream)."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_frames, out_payloads = [], [], []
            for did, payload in zip(pdf[id_col], pdf[media_col]):
                n_frames = (len(payload) % 30) + 1
                for f in range(0, n_frames, every_nth):
                    out_ids.append(did)
                    out_frames.append(f)
                    out_payloads.append(bytes(payload[f : f + 16]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_no": out_frames, "frame_bytes": out_payloads}
            )

    return df.select(id_col, media_col).mapInPandas(
        _map, "doc_id bigint, frame_no int, frame_bytes binary"
    )
