"""JSONL ingest with corrupt-record quarantine (S-family extension).

The training-data landing pattern: newline-delimited JSON arrives from
crawlers/exports with a known fraction of malformed lines. Failing the
job (FAILFAST) or silently dropping them (DROPMALFORMED) both lose
information; the production shape is PERMISSIVE parse + explicit
quarantine split — good rows flow on typed, bad rows land in a
quarantine sink with the raw line preserved for replay.

Reference parity note: the reference's CSV path has no malformed-row
handling at all (``csv.DictReader`` raises mid-file); this module is
the extension-surface equivalent of its log-and-continue URL handling
(``/root/reference/src/parser.py:43-55``) applied to records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_jsonl_quarantine"]

_CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with an explicit schema; return ``(good, quarantine)``.

    ``good`` has exactly the caller's schema. ``quarantine`` has one
    ``raw`` string column holding the offending line verbatim. The scan
    stays a single pass: PERMISSIVE mode parses what it can and routes
    the raw text of failed lines into the corrupt column; both outputs
    are projections of that one scan (Spark caches nothing — at scale
    each output is its own pushdown-pruned read, with the corrupt column
    only materialized for the quarantine branch).

    Implementation: text source + ``from_json`` rather than the JSON
    reader — Spark disallows projecting ONLY the internal corrupt
    column from a raw JSON scan (UNSUPPORTED_FEATURE
    QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the text form additionally
    preserves the offending line byte-verbatim. A line that parses but
    mismatches the declared types populates the corrupt field the same
    way a syntax error does — both quarantine.
    """
    read_schema = f"{schema}, {_CORRUPT_COL} string"
    lines = spark.read.text(path)
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
        ).alias("j"),
    )
    good = (
        parsed.filter(F.col(f"j.{_CORRUPT_COL}").isNull() & F.col("j").isNotNull())
        .select("j.*")
        .drop(_CORRUPT_COL)
    )
    quarantine = parsed.filter(
        F.col(f"j.{_CORRUPT_COL}").isNotNull() | F.col("j").isNull()
    ).select(F.col("value").alias("raw"))
    return good, quarantine
