"""The signature reshape operators (SURVEY.md §2.11 U1/U2 + §2.4 A2).

The reference's heart is ``fix_record`` (``src/parser.py:28-41``,
``src/parser2.py:28-52``): each wide CSV row — fixed location columns
plus one column per date — becomes one nested JSON record whose
``time_series`` key holds an array of per-date structs.

Two distributed forms, both shuffle-free for the wide input:

- :func:`wide_to_nested` — the direct columnar build: ``F.array`` of
  ``F.struct`` literals over the date columns. Zero shuffle, zero UDF;
  per-row cost is linear in #date columns inside whole-stage codegen.
- :func:`wide_to_long` — the relational (unpivot) form used by the query
  layer; ``DataFrame.unpivot`` is Catalyst-native.

And the inverse for the vertical representation:

- :func:`long_to_nested` — ``groupBy(key).agg(sort_array(collect_list(
  struct(...))))``; one shuffle on the entity key.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DATE_COL_RE",
    "date_columns",
    "wide_to_nested",
    "wide_to_long",
    "long_to_nested",
]

# Same discovery rule as the reference (src/parser.py:32): date-shaped
# column NAMES, applied at plan-build time to df.columns.
DATE_COL_RE = re.compile(r"^\d{1,2}/\d{1,2}/\d{2}$")


def date_columns(df: DataFrame) -> list[str]:
    """Date-shaped column names in header order (chronological order for
    JHU feeds — the reference relies on dict insertion order,
    src/parser.py:31-36; we rely on df.columns order, same contract)."""
    return [c for c in df.columns if DATE_COL_RE.match(c)]


def _fmt_date(name: str) -> str:
    """'1/22/20' → '2020-01-22 00:00:00' — the reference's serialized form
    (str(datetime) after strptime '%m/%d/%y', src/parser.py:23-26,34).
    strptime's POSIX two-digit-year rule: 00-68 → 2000s, 69-99 → 1900s."""
    m, d, y = (int(x) for x in name.split("/"))
    year = 2000 + y if y < 69 else 1900 + y
    return f"{year:04d}-{m:02d}-{d:02d} 00:00:00"


def wide_to_nested(
    df: DataFrame,
    value_name: str = "value",
    scalar_cols: Sequence[str] | None = None,
    array_name: str = "time_series",
) -> DataFrame:
    """U1: wide date columns → one ``array<struct<date,value>>`` column.

    Mirrors ``fix_record`` (src/parser.py:28-41): non-date columns are
    lowercased scalars (Lat/Long cast to double, others strings), date
    columns become ordered ``{date, value:int}`` structs. Purely
    column-level — no shuffle at any scale.
    """
    dates = date_columns(df)
    if scalar_cols is None:
        scalar_cols = [c for c in df.columns if c not in dates]
    scalars = []
    for c in scalar_cols:
        lc = c.lower()
        if lc in ("lat", "long"):
            scalars.append(F.col(c).cast("double").alias(lc))
        else:
            scalars.append(F.col(c).alias(lc))
    elements = [
        F.struct(
            F.lit(_fmt_date(d)).alias("date"),
            F.col(d).cast("int").alias(value_name),
        )
        for d in dates
    ]
    return df.select(*scalars, F.array(*elements).alias(array_name))


def zip_to_nested(
    df: DataFrame,
    metric_cols: dict[str, str],
    scalar_cols: Sequence[str],
    array_name: str = "time_series",
    date_names: Sequence[str] | None = None,
) -> DataFrame:
    """U2: several metric families of date columns → one array of
    ``{date, <metric1>, <metric2>, ...}`` structs.

    ``metric_cols`` maps metric name → column-name *template* with ``{d}``
    placeholder (e.g. ``{"confirmed": "{d}", "deaths": "deaths_{d}"}``).
    Missing values default to 0 — the reference's try/except-KeyError→0
    (src/parser2.py:35-46); a whole-family join miss yields all-null date
    columns which coalesce to 0 per element (SURVEY.md §7 hard-part d).
    """
    if date_names is None:
        date_names = date_columns(df)
    elements = []
    for d in date_names:
        fields = [F.lit(_fmt_date(d)).alias("date")]
        for metric, template in metric_cols.items():
            col_name = template.format(d=d)
            if col_name in df.columns:
                fields.append(F.coalesce(F.col(col_name).cast("int"), F.lit(0)).alias(metric))
            else:
                fields.append(F.lit(0).alias(metric))
        elements.append(F.struct(*fields))
    scalars = [F.col(c) for c in scalar_cols]
    return df.select(*scalars, F.array(*elements).alias(array_name))


def wide_to_long(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str] | None = None,
    var_name: str = "date",
    value_name: str = "value",
) -> DataFrame:
    """U1 long form: Catalyst-native unpivot (Spark ≥3.4). Output rows =
    |input| × |value_cols| but still no shuffle — unpivot is a generate-
    style projection."""
    if value_cols is None:
        value_cols = date_columns(df)
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def long_to_nested(
    df: DataFrame,
    key_cols: Sequence[str],
    order_field: str,
    struct_fields: Sequence[str],
    array_name: str = "time_series",
) -> DataFrame:
    """A2 vertical form: group the long representation back into one
    sorted ``array<struct>`` per entity. ``sort_array`` (on the leading
    struct field = ``order_field``) makes the result deterministic
    regardless of shuffle arrival order."""
    struct_col = F.struct(F.col(order_field), *[F.col(f) for f in struct_fields])
    return df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(struct_col)).alias(array_name)
    )
