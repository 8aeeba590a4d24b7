"""HTTP CSV staging source (SURVEY.md §2.1 S1).

Spark has no HTTP file source; the idiomatic pattern is driver-side
staging: fetch once to a local/shared path, then let every executor scan
the staged file. The reference fetched with ``urllib`` per run and
logged-then-continued on failure (``src/parser.py:43-55``); here a fetch
failure raises — silently continuing with a missing source corrupts the
downstream join semantics.

At 100 TB source scale you would not HTTP-fetch at all (the lake lands
via bulk transfer); this source exists for parity with the reference's
daily-feed shape.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from jhu_data_parser_spark.sources.csv_source import read_csv_dictreader

__all__ = ["stage_url", "read_http_csv"]


def stage_url(url: str, staging_dir: str | None = None, timeout: int = 60) -> str:
    """Download ``url`` to a staging file; returns the local path.
    Supports file:// URLs (used by tests) and https://."""
    if staging_dir is None:
        staging_dir = tempfile.mkdtemp(prefix="jdps_http_")
    os.makedirs(staging_dir, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1] or "download.csv"
    dest = os.path.join(staging_dir, name)
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(dest, "wb") as out:
        out.write(resp.read())
    return dest


def read_http_csv(spark: SparkSession, url: str, staging_dir: str | None = None) -> DataFrame:
    """GET a CSV and expose it as a DictReader-compatible DataFrame."""
    return read_csv_dictreader(spark, stage_url(url, staging_dir))
