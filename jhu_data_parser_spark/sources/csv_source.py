"""DictReader-compatible CSV scan (SURVEY.md §2.1 S2, §2.2 P3).

The reference reads CSVs with ``csv.DictReader`` — header-driven field
names and every value a *string*, with blank fields as ``''`` (never
None). Spark's CSV reader differs in exactly one observable way: blank
fields become NULL. That divergence silently changes record keys and
join matches downstream (SURVEY.md §7 hard-part a), so this source
normalizes NULL→'' right at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_csv_dictreader", "read_csv_with_file_order"]


def read_csv_dictreader(spark: SparkSession, path: str) -> DataFrame:
    """Header-named, all-string, ''-for-blank CSV scan — semantics
    identical to ``csv.DictReader`` over the same bytes
    (``src/parser.py:61``, ``src/parser2.py:97``). No ``inferSchema``:
    type casts are explicit plan steps (SURVEY.md §1.2), exactly like the
    reference's per-field ``int()``/``float()`` calls."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        # Python csv escapes a quote by doubling it ("" inside a quoted
        # field); Spark's default escape is backslash — set escape=quote
        # to match DictReader byte-for-byte on fields like
        # "Quoted ""inner"" name".
        .option("escape", '"')
        .csv(path)
    )
    return df.select(*[F.coalesce(F.col(f"`{c}`"), F.lit("")).alias(c) for c in df.columns])


def read_csv_with_file_order(
    spark: SparkSession, path: str, order_col: str = "__file_order"
) -> DataFrame:
    """Same scan plus a monotonically increasing id capturing file order
    — needed where the reference's semantics depend on "first row in the
    file" (the first-match lookup join, ``src/parser.py:70``). The id is
    (partition << 33) + row-in-partition; for contiguously-split single
    files its sort order equals file order."""
    return read_csv_dictreader(spark, path).withColumn(
        order_col, F.monotonically_increasing_id()
    )
