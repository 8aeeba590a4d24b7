"""Local re-implementation of the driver's DuckDB-oracle comparison:
row-count + schema-shape + order-insensitive value hash, columns sorted
by name. Strict (exact equality after canonicalization) — if a query
passes here it passes any laxer driver check.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb
from pyspark.sql import DataFrame

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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # a table may be one file (driver layout) or a directory of
        # part files (the alt differential layout / any real lake)
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr keeps full double precision; engines must agree bit-for-bit.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _row_multiset(rows: list[tuple], colnames: list[str]) -> Counter:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_rows = [tuple(r) for r in rel.fetchall()]
    duck_cols = list(rel.columns)

    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(c.lower() for c in spark_cols),
        "cols_duck": sorted(c.lower() for c in duck_cols),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_duck"]
    result["cols_match"] = result["cols_spark"] == result["cols_duck"]
    if not (result["rows_match"] and result["cols_match"]):
        result["values_match"] = False
        return result

    ms_spark = _row_multiset(spark_rows, spark_cols)
    ms_duck = _row_multiset(duck_rows, duck_cols)
    result["values_match"] = ms_spark == ms_duck
    if not result["values_match"]:
        only_spark = ms_spark - ms_duck
        only_duck = ms_duck - ms_spark
        result["example_only_spark"] = list(only_spark.items())[:3]
        result["example_only_duck"] = list(only_duck.items())[:3]
    return result
