"""Reference-parity ETL pipelines (SURVEY.md §3.1–3.2), Spark-first.

Two pipelines mirror the reference's two entry points:

- :func:`category_pipeline` ≙ ``parser.py:main_handler``: per-category
  wide CSV → U1 nested reshape → J1 first-match lookup enrich →
  Hive-partitioned JSON lake (``type=<category>/``).
- :func:`combined_pipeline` ≙ ``parser2.py:main_handler``: confirmed ⋈
  deaths ⋈ recovered on (country, province) → U2 zipped nested reshape
  with default-0 → J3 iso2 enrich → flat JSON lake.

The observable contract is the emitted *records* (SURVEY.md §1.3): same
fields, same values, same absent-on-miss behavior, same partition
layout. The control flow is entirely different — one declarative
distributed plan per pipeline instead of O(n·m) nested re-parsing loops
(``src/parser.py:62-70``, ``src/parser2.py:101-124``), and one
distributed write instead of one HTTPS PUT per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators.reshape import (
    date_columns,
    wide_to_nested,
    zip_to_nested,
)
from jhu_data_parser_spark.sink import write_flat_json, write_partitioned_json
from jhu_data_parser_spark.sources.csv_source import (
    read_csv_dictreader,
    read_csv_with_file_order,
)

__all__ = [
    "load_lookup",
    "enrich_country_lookup",
    "category_pipeline",
    "combined_pipeline",
]

_PARITY_SCALARS = ["province/state", "country/region", "lat", "long"]


def load_lookup(spark: SparkSession, path: str) -> DataFrame:
    """The JHU lookup dimension with file order captured — the reference
    always takes the FIRST matching row in file order (country aggregate
    rows precede province rows; ``src/parser.py:70`` break)."""
    return read_csv_with_file_order(spark, path)


def _first_per_key(lookup: DataFrame, key: str = "Country_Region") -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.col("__file_order").asc())
    return (
        lookup.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__file_order")
    )


def enrich_country_lookup(
    fact: DataFrame, lookup: DataFrame, fields: tuple[str, ...] = ("iso2", "lat", "long")
) -> DataFrame:
    """J1/J3: first-match left enrich from the lookup dimension.

    Copies ``iso2 → country-iso2``, ``float(Lat) → country-lat``,
    ``float(Long_) → country-long`` (``src/parser.py:66-69``) — or only
    ``iso2`` for the parser2 contract (``src/parser2.py:131``). Misses
    leave NULLs, which the JSON writer drops → fields absent, exactly
    the reference's silent-miss behavior.

    The deduped lookup is broadcast: a few thousand countries join
    against any number of fact rows with zero shuffle.
    """
    first = _first_per_key(lookup)
    cols = []
    if "iso2" in fields:
        cols.append(F.col("iso2").alias("country-iso2" if "lat" in fields else "iso2"))
    if "lat" in fields:
        cols.append(F.col("Lat").cast("double").alias("country-lat"))
    if "long" in fields:
        cols.append(F.col("Long_").cast("double").alias("country-long"))
    dim = first.select("Country_Region", *cols)
    return fact.join(
        F.broadcast(dim), fact["country/region"] == dim["Country_Region"], "left"
    ).drop("Country_Region")


def category_pipeline(
    spark: SparkSession,
    category_paths: dict[str, str],
    lookup_path: str,
    out_dir: str | None = None,
) -> DataFrame:
    """parser.py contract: every (category CSV row) → one nested record
    under partition ``type=<category>``.

    Record shape (``src/parser.py:28-41,63-77``): ``time_series`` array
    of ``{date:'YYYY-MM-DD 00:00:00', value:int}`` in column (= chrono)
    order, lowercased scalars, lookup enrich fields when matched.

    The reference ran three sequential full passes; here the categories
    union into ONE distributed job and the partitioned write fans them
    back out — the lookup is parsed once, not once per fact row.
    """
    lookup = load_lookup(spark, lookup_path)
    parts = []
    for category, path in category_paths.items():
        wide = read_csv_dictreader(spark, path)
        nested = wide_to_nested(wide)  # U1: no shuffle
        enriched = enrich_country_lookup(nested, lookup)  # J1: broadcast
        parts.append(
            enriched.select(
                "time_series",
                *_PARITY_SCALARS,
                "country-iso2",
                "country-lat",
                "country-long",
                F.lit(category).alias("type"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if out_dir is not None:
        write_partitioned_json(out, out_dir)
    return out


def combined_pipeline(
    spark: SparkSession,
    confirmed_path: str,
    deaths_path: str,
    recovered_path: str,
    lookup_path: str,
    out_dir: str | None = None,
) -> DataFrame:
    """parser2.py contract: one record per confirmed-CSV row with a
    zipped ``{date, confirmed, deaths, recovered}`` series.

    The reference's triple-nested loop re-parses deaths and recovered
    per outer row — O(C·D·R) (``src/parser2.py:101-124``). Here: two
    left equi-joins on (country, province). A whole-family join miss
    leaves that family's date columns NULL, and the per-element coalesce
    defaults every value to 0 — bit-matching the reference's
    ``fix_record(c, {}, {})`` paths (``src/parser2.py:116-124``).
    """
    confirmed = read_csv_dictreader(spark, confirmed_path)
    deaths = read_csv_dictreader(spark, deaths_path)
    recovered = read_csv_dictreader(spark, recovered_path)
    keys = ["Country/Region", "Province/State"]

    d_dates = date_columns(deaths)
    r_dates = date_columns(recovered)
    deaths_n = deaths.select(*keys, *[F.col(d).alias(f"d__{d}") for d in d_dates])
    recovered_n = recovered.select(*keys, *[F.col(d).alias(f"r__{d}") for d in r_dates])

    joined = confirmed.join(deaths_n, keys, "left").join(recovered_n, keys, "left")

    nested = zip_to_nested(
        joined,
        metric_cols={"confirmed": "{d}", "deaths": "d__{d}", "recovered": "r__{d}"},
        scalar_cols=[c for c in confirmed.columns if c not in date_columns(confirmed)],
        date_names=date_columns(confirmed),
    )
    # Lowercase scalars + float coords (src/parser2.py:49-51).
    nested = nested.select(
        "time_series",
        F.col("Province/State").alias("province/state"),
        F.col("Country/Region").alias("country/region"),
        F.col("Lat").cast("double").alias("lat"),
        F.col("Long").cast("double").alias("long"),
    )
    lookup = load_lookup(spark, lookup_path)
    enriched = enrich_country_lookup(nested, lookup, fields=("iso2",))
    out = enriched.select("time_series", *_PARITY_SCALARS, "iso2")
    if out_dir is not None:
        write_flat_json(out, out_dir)
    return out
