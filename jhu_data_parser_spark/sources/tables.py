"""Parquet scan of the synthetic test tables (SURVEY.md §2.1 S7).

The driver's TPC-H-ish star schema lives at ``/root/testdata/sf*/``
(``TESTDATA.md``). At 100 TB the same call reads a cloud-storage prefix —
parquet scans get column pruning + predicate pushdown + vectorized
reading from Spark for free, so this module stays a thin path mapper.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views", "default_sf_dir"]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_nanos_ts(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize event timestamps to TimestampType regardless of how the
    feed stored them. Two physical encodings have been observed:

    - parquet TIMESTAMP(NANOS) → nanosecond longs (via
      ``spark.sql.legacy.parquet.nanosAsLong``): convert with µs
      truncation — the same truncation every µs-based consumer
      (including the DuckDB oracle's Python fetch) applies.
    - parquet ``timestamp[us]`` without tz → Spark TIMESTAMP_NTZ: cast
      to TimestampType. Under the pinned-UTC session (``session.py``)
      the wall-clock reinterpretation is the identity on epoch µs, so
      the cast is exact — and it restores every downstream numeric
      cast / ``unix_micros`` / ``withWatermark`` use, all of which
      Spark rejects on NTZ at analysis time.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # Integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's
            # 2^53 mantissa, so float division + floor is off by ±1 µs on
            # roughly half of all values (caught by the scd2 epoch_us
            # oracle; second-granularity consumers masked it).
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Session-scoped DataFrame cache: `spark.read.parquet` costs 60-85 ms
# of driver-side listing + footer schema resolution PER CALL (measured
# warm); queries that load a table twice pay it twice. The test tables
# are immutable, so the analyzed (lazy) DataFrame is reusable — this is
# the catalog-metadata cache any real engine keeps. Keyed by session id
# so a restarted SparkSession re-resolves.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Deterministic timestamp semantics even under a HARNESS-OWNED
    # session (the driver builds its own SparkSession without our
    # engine config): the NTZ→timestamp normalization and every
    # epoch-based output (unix_micros, epoch-second frames) are exact
    # only when the session interprets wall-clock as UTC — the same
    # convention the DuckDB oracle's naive timestamps use. Pinning it
    # at the load choke point makes correctness independent of host TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_nanos_ts(df)
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register the tables as temp views so ``spark.sql`` works over them —
    the engine's replacement for the reference's Glue/Athena catalog
    (``src/README.md:5,11``)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
