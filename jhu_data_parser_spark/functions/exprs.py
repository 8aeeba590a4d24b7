"""Expression builders shared by the query catalog.

Oracle-stable floating-point aggregation
----------------------------------------
``SUM(double)`` is order-dependent in the last ulps, and Spark and DuckDB
sum in different orders — so raw double sums never hash-match. The engine
instead casts each row value to an exact ``DECIMAL`` first, sums the
decimals (exact, order-independent), and casts the total back to DOUBLE:

    Spark : SUM(CAST(x AS DECIMAL(18,s)))  → CAST(... AS DOUBLE)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)

The double→decimal cast rounds the *same binary double* in both engines,
so the per-row decimals are identical, the sums are exact, and the final
doubles are bit-identical. Averages divide that stable double by the
group count (double÷bigint is deterministic IEEE math on both sides).

This is a *test-oracle* discipline, not a perf hack: at 100 TB the same
expressions still aggregate JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec_sum", "dec_avg", "day_str", "revenue", "DEC_SUM_SQL", "DEC_AVG_SQL"]


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM of a double column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: stable decimal sum ÷ count, both as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))


def DEC_SUM_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def DEC_AVG_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dec_avg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*))"


def day_str(col: Column | str) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (oracle twin: strftime(ts, '%Y-%m-%d'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def revenue() -> Column:
    """The TPC-H revenue expression; per-row IEEE double product, identical
    on both engines."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1.0 - l_discount)"
