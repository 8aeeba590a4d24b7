"""Registry for the named-query catalog.

Usage::

    @query("q1_pricing_summary", oracle=\"\"\"SELECT ... \"\"\")
    def q1_pricing_summary(spark, sf_dir):
        ...

Queries whose semantics are not ANSI-SQL-expressible (nested
array<struct> builds, LSH bucketing, stateful streaming) register with
``oracle=None`` — the driver then applies its weaker rows-only check and
our own pytest goldens carry the correctness burden (SURVEY.md §5).

Contract notes (driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):

- Alias every computed column identically in the DataFrame plan and in
  the oracle SQL.
- Cast aggregate outputs explicitly: DuckDB ``SUM(BIGINT)`` yields
  HUGEINT and ``SUM(INT)`` yields INT128 — always ``CAST(... AS BIGINT)``
  / keep doubles as doubles on both sides.
- Never raw ``SUM(double)``: summation order differs between engines.
  Use the exact scaled-long discipline (``functions/exprs.py``) for
  sums/avgs; ``ROUND(x, n)`` on both sides only where the underlying
  doubles are already bit-identical (it cannot rescue an order-dependent
  value — see the float dot-product gotcha in the verify skill).
- Avoid LIMIT ties: every top-k orders by a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QUERIES", "ORACLES", "NO_ORACLE", "query", "get_queries", "get_oracles"]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
NO_ORACLE: set[str] = set()


def query(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as catalog entry ``name`` with its DuckDB twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        else:
            NO_ORACLE.add(name)
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
