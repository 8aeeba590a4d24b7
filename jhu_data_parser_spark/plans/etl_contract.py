"""ETL-contract driver rows (SURVEY.md §3.1-3.2) — the reference's two
record contracts replayed on the driver's oracle-checkable tables.

The byte-exact JHU-CSV contract is golden-tested in
tests/test_etl_golden.py, but for three rounds it had no driver row:
the golden fixtures are repo-local CSVs the driver's DuckDB oracle
never sees. These two queries close that gap by deriving a JHU-shaped
wide frame *deterministically from the `nation` table* in BOTH engines
and running the REAL pipeline operators over it:

- ``etl_category_records`` ≙ ``parser.py:main_handler``
  (``src/parser.py:28-41,63-77``): U1 ``wide_to_nested`` (date-named
  columns → ordered ``{date, value:int}`` structs, lowercased scalars,
  Lat/Long → double) + J1 first-match lookup enrich (file-order first
  wins, miss → NULL). The synthesized lookup carries a DECOY second
  row per country (higher file order, wrong values) so the hash gate
  actually proves first-match, and omits every 5th country so it
  proves silent-miss.
- ``etl_combined_records`` ≙ ``parser2.py:main_handler``
  (``src/parser2.py:28-52,101-124``): U2 ``zip_to_nested`` over three
  metric families joined on (country, province) with the reference's
  try/except-KeyError→0 semantics — odd countries are absent from the
  deaths feed (whole-family join miss → 0), the recovered feed is
  missing its last date column entirely (missing-column → 0), plus
  the iso2-only enrich.

Both surfaces explode ``time_series`` back to rows so the driver's
multiset value hash covers every struct element (same strategy as
``nested_zip_metrics_roundtrip``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.etl import enrich_country_lookup
from jhu_data_parser_spark.operators.reshape import (
    date_columns,
    wide_to_nested,
    zip_to_nested,
)
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

# One date per year-rule branch: two 20xx dates, one 69 → 1969 (POSIX
# two-digit-year pivot, src/parser.py:23-26), one 21.
_DATES = [
    ("1/22/20", "2020-01-22 00:00:00"),
    ("2/3/20", "2020-02-03 00:00:00"),
    ("12/31/69", "1969-12-31 00:00:00"),
    ("3/15/21", "2021-03-15 00:00:00"),
]

def _k() -> Column:
    # Lazy: building a Column requires an active SparkContext, which
    # does not exist at import (catalog registration) time.
    return F.col("n_nationkey")


def _prov() -> Column:
    # Every 3rd country reports at country level → empty-string province
    # (the reference's P3 empty-string predicate shape).
    return F.when(_k() % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit("Prov "), _k().cast("string"))
    )


_PROV_SQL = "CASE WHEN n_nationkey % 3 = 0 THEN '' ELSE 'Prov ' || n_nationkey END"


def _synth_lookup(n: DataFrame) -> DataFrame:
    """The JHU lookup dimension, derived from `nation`: a real row per
    country (file order = nationkey) plus a DECOY row (file order =
    nationkey + 100, wrong iso2/coords) that first-match must skip;
    every 5th country is absent entirely (miss → NULL enrich)."""
    present = n.filter(_k() % 5 != 4)
    real = present.select(
        F.col("n_name").alias("Country_Region"),
        F.upper(F.substring("n_name", 1, 2)).alias("iso2"),
        (_k() + 0.5).cast("string").alias("Lat"),
        (_k() * 2 + 0.25).cast("string").alias("Long_"),
        _k().cast("long").alias("__file_order"),
    )
    decoy = present.select(
        F.col("n_name").alias("Country_Region"),
        F.lit("ZZ").alias("iso2"),
        F.lit("-99.0").alias("Lat"),
        F.lit("-99.0").alias("Long_"),
        (_k() + 100).cast("long").alias("__file_order"),
    )
    return real.unionByName(decoy)


_LOOKUP_ENRICH_SQL = """
  CASE WHEN n_nationkey % 5 = 4 THEN NULL ELSE upper(substr(n_name, 1, 2)) END
"""


@query(
    "etl_category_records",
    oracle=f"""
    WITH dates(ds, mul, addend) AS (VALUES
      ('2020-01-22 00:00:00', 3, 1),
      ('2020-02-03 00:00:00', 5, 2),
      ('1969-12-31 00:00:00', 7, 3),
      ('2021-03-15 00:00:00', 11, 4))
    SELECT
      {_PROV_SQL} AS "province/state",
      n_name AS "country/region",
      CAST(n_nationkey * 0.25 - 3.0 AS DOUBLE) AS lat,
      CAST(n_nationkey * 0.5 - 6.0 AS DOUBLE) AS long,
      {_LOOKUP_ENRICH_SQL} AS "country-iso2",
      CASE WHEN n_nationkey % 5 = 4 THEN NULL
           ELSE CAST(n_nationkey + 0.5 AS DOUBLE) END AS "country-lat",
      CASE WHEN n_nationkey % 5 = 4 THEN NULL
           ELSE CAST(n_nationkey * 2 + 0.25 AS DOUBLE) END AS "country-long",
      'confirmed' AS type,
      d.ds AS series_date,
      CAST(n_nationkey * d.mul + d.addend AS INT) AS series_value
    FROM nation, dates d
    """,
)
def etl_category_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parser.py record contract on driver data: wide date columns →
    nested series (U1), lowercased scalars, first-match lookup enrich
    (J1), partition tag — exploded so every element is value-hashed."""
    n = load_table(spark, sf_dir, "nation")
    wide = n.select(
        _prov().alias("Province/State"),
        F.col("n_name").alias("Country/Region"),
        # JHU CSVs arrive as strings (DictReader semantics) — build the
        # wide frame as strings and let the operator do the casting.
        (_k() * 0.25 - 3.0).cast("string").alias("Lat"),
        (_k() * 0.5 - 6.0).cast("string").alias("Long"),
        *[
            (_k() * mul + add).cast("string").alias(name)
            for (name, _), (mul, add) in zip(_DATES, [(3, 1), (5, 2), (7, 3), (11, 4)])
        ],
    )
    nested = wide_to_nested(wide)  # U1: zero shuffle
    enriched = enrich_country_lookup(nested, _synth_lookup(n))  # J1: broadcast
    tagged = enriched.withColumn("type", F.lit("confirmed"))
    return tagged.select(
        "province/state",
        "country/region",
        "lat",
        "long",
        "country-iso2",
        "country-lat",
        "country-long",
        "type",
        F.explode("time_series").alias("e"),
    ).select(
        "province/state",
        "country/region",
        "lat",
        "long",
        "country-iso2",
        "country-lat",
        "country-long",
        "type",
        F.col("e.date").alias("series_date"),
        F.col("e.value").alias("series_value"),
    )


@query(
    "etl_combined_records",
    oracle=f"""
    WITH dates(ds, i, has_r) AS (VALUES
      ('2020-01-22 00:00:00', 1, 1),
      ('2020-02-03 00:00:00', 2, 1),
      ('1969-12-31 00:00:00', 3, 0))
    SELECT
      {_PROV_SQL} AS "province/state",
      n_name AS "country/region",
      CAST(n_nationkey * 0.25 - 3.0 AS DOUBLE) AS lat,
      CAST(n_nationkey * 0.5 - 6.0 AS DOUBLE) AS long,
      {_LOOKUP_ENRICH_SQL} AS iso2,
      d.ds AS series_date,
      CAST(n_nationkey * 2 + d.i AS INT) AS confirmed,
      CAST(CASE WHEN n_nationkey % 2 = 0 THEN n_nationkey * 3 + d.i
                ELSE 0 END AS INT) AS deaths,
      CAST(CASE WHEN n_nationkey % 3 <> 1 AND d.has_r = 1
                THEN n_nationkey * 5 + d.i ELSE 0 END AS INT) AS recovered
    FROM nation, dates d
    """,
)
def etl_combined_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parser2.py record contract on driver data: three metric families
    zipped per (country, province) with default-0 on BOTH miss shapes —
    whole-family join miss (odd countries absent from deaths,
    ``src/parser2.py:116-124`` fix_record(c, {}, {})) and missing date
    column (recovered feed lacks the third date) — plus iso2-only
    first-match enrich, exploded for the value hash."""
    n = load_table(spark, sf_dir, "nation")
    keys = ["Country/Region", "Province/State"]

    def feed(mul: int, dates: list[tuple[str, str]], flt: Column | None) -> DataFrame:
        src = n.filter(flt) if flt is not None else n
        return src.select(
            _prov().alias("Province/State"),
            F.col("n_name").alias("Country/Region"),
            (_k() * 0.25 - 3.0).cast("string").alias("Lat"),
            (_k() * 0.5 - 6.0).cast("string").alias("Long"),
            *[
                (_k() * mul + i).cast("string").alias(name)
                for i, (name, _) in enumerate(dates, start=1)
            ],
        )

    confirmed = feed(2, _DATES[:3], None)
    deaths = feed(3, _DATES[:3], _k() % 2 == 0)
    recovered = feed(5, _DATES[:2], _k() % 3 != 1)  # third date column absent

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
    nested = nested.select(
        "time_series",
        F.col("Province/State").alias("province/state"),
        F.col("Country/Region").alias("country/region"),
        F.col("Lat").cast("double").alias("lat"),
        F.col("Long").cast("double").alias("long"),
    )
    enriched = enrich_country_lookup(nested, _synth_lookup(n), fields=("iso2",))
    return enriched.select(
        "province/state",
        "country/region",
        "lat",
        "long",
        "iso2",
        F.explode("time_series").alias("e"),
    ).select(
        "province/state",
        "country/region",
        "lat",
        "long",
        "iso2",
        F.col("e.date").alias("series_date"),
        F.col("e.confirmed").alias("confirmed"),
        F.col("e.deaths").alias("deaths"),
        F.col("e.recovered").alias("recovered"),
    )
