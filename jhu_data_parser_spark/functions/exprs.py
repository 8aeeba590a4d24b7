"""Expression builders shared by the query catalog.

Oracle-stable floating-point aggregation
----------------------------------------
``SUM(double)`` is order-dependent in the last ulps, and Spark and DuckDB
sum in different orders — so raw double sums never hash-match. The engine
instead scales each row value to an integer unit count (cents for
scale 2), sums exact BIGINTs, and divides the total back down once:

    Spark : SUM(CAST(floor(x * 100 + 0.5) AS LONG)) / 100.0
    DuckDB: CAST(SUM(CAST(floor(x * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0

``x * 100 + 0.5`` and ``floor`` are single IEEE ops — bit-identical on
both engines — so the per-row integers match, the integer sums are
exact and order-independent, and the one final division maps the same
integer to the same double on both sides.

Why not DECIMAL casts: a long sum whole-stage-codegens to a single
integer add per row, measured >4× faster than Spark's decimal
aggregation path on the same data — and the bench hot path uses these
expressions. Overflow bound: int64 holds ~9.2e18 scaled units — at
scale 2 that is ~9e16 in value units (e.g. 10^12 rows of ~$90k),
at scale 4 ~9e14. Beyond that, shard the sum (group first) or drop to
DECIMAL(38) for the final reduce; the per-query choice is explicit in
the catalog.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dec_sum",
    "dec_avg",
    "scaled_long",
    "day_str",
    "revenue",
    "DEC_SUM_SQL",
    "DEC_AVG_SQL",
    "SCALED_LONG_SQL",
]


def scaled_long(col: Column | str, scale: int = 2) -> Column:
    """Row value → exact integer unit count (cents at scale 2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("long")


def SCALED_LONG_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`scaled_long` (floor() is DOUBLE there)."""
    return f"CAST(floor(({expr}) * {10 ** scale} + 0.5) AS BIGINT)"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM of a double column (see module docstring)."""
    return F.sum(scaled_long(col, scale)) / F.lit(float(10**scale))


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact scaled-integer sum ÷ count."""
    return dec_sum(col, scale) / F.count(F.lit(1))


def DEC_SUM_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dec_sum`."""
    return (
        f"(CAST(SUM({SCALED_LONG_SQL(expr, scale)}) AS DOUBLE) / {10 ** scale}.0)"
    )


def DEC_AVG_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dec_avg`."""
    return f"({DEC_SUM_SQL(expr, scale)} / COUNT(*))"


def day_str(col: Column | str) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (oracle twin: strftime(ts, '%Y-%m-%d'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def revenue() -> Column:
    """The TPC-H revenue expression; per-row IEEE double product, identical
    on both engines."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1.0 - l_discount)"
