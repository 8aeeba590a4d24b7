"""The backbone test: every catalog query with an oracle must hash-match
DuckDB at sf0.001 (the driver runs the same comparison at sf0.01).
Queries without an oracle get a rows-runnable smoke check.
"""

from __future__ import annotations

import pytest

from jhu_data_parser_spark import plans
from tests.oracle_compare import compare, duckdb_con
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMOKE)
    yield c
    c.close()


ORACLE_NAMES = sorted(plans.ORACLES)
ROWS_ONLY_NAMES = sorted(plans.NO_ORACLE)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, con, name):
    df = plans.QUERIES[name](spark, SF_SMOKE)
    result = compare(df, con, plans.ORACLES[name])
    assert result["rows_match"], f"{name}: row count {result}"
    assert result["cols_match"], f"{name}: columns {result}"
    assert result["values_match"], f"{name}: values {result}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    df = plans.QUERIES[name](spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    # stable schema: re-running yields the same columns
    df2 = plans.QUERIES[name](spark, SF_SMOKE)
    assert df.columns == df2.columns
