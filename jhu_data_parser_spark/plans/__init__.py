"""The named-query catalog.

Every operator from SURVEY.md §2 that the engine implements is exposed
here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus —
when the semantics are ANSI-SQL-expressible — a DuckDB oracle SQL twin
used by the driver's correctness gate. Importing this package registers
the full catalog.
"""

from jhu_data_parser_spark.plans.catalog import (
    QUERIES,
    ORACLES,
    NO_ORACLE,
    query,
    get_queries,
    get_oracles,
)

# Import for registration side effects — each module fills the catalog.
from jhu_data_parser_spark.plans import core  # noqa: E402,F401
from jhu_data_parser_spark.plans import windows  # noqa: E402,F401
from jhu_data_parser_spark.plans import reshape  # noqa: E402,F401
from jhu_data_parser_spark.plans import scalars  # noqa: E402,F401
from jhu_data_parser_spark.plans import llm  # noqa: E402,F401
from jhu_data_parser_spark.plans import streaming_batch  # noqa: E402,F401
from jhu_data_parser_spark.plans import extra  # noqa: E402,F401
from jhu_data_parser_spark.plans import pipeline2  # noqa: E402,F401
from jhu_data_parser_spark.plans import graph  # noqa: E402,F401
from jhu_data_parser_spark.plans import clustering  # noqa: E402,F401
from jhu_data_parser_spark.plans import pipeline3  # noqa: E402,F401
from jhu_data_parser_spark.plans import pipeline4  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "ORACLES",
    "NO_ORACLE",
    "query",
    "get_queries",
    "get_oracles",
]
