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


def test_gate_catches_wrong_results(spark, con):
    """Meta-test: the comparator must FAIL on a deliberately corrupted
    query — value drift, row drift, and column drift each detected (a
    vacuous gate would pass everything)."""
    from pyspark.sql import functions as F

    good = plans.QUERIES["global_count"](spark, SF_SMOKE)
    sql = plans.ORACLES["global_count"]
    assert compare(good, con, sql)["values_match"]

    col = good.columns[0]
    wrong_value = good.select((F.col(col) + 1).alias(col))
    assert not compare(wrong_value, con, sql)["values_match"]

    wrong_rows = good.union(good)
    assert not compare(wrong_rows, con, sql)["rows_match"]

    wrong_cols = good.withColumn("extra", F.lit(1))
    assert not compare(wrong_cols, con, sql)["cols_match"]

    # float canonicalization is bit-strict: an off-by-1-ulp double fails
    base = plans.QUERIES["agg_pricing_summary"](spark, SF_SMOKE)
    drifted = base.withColumn("sum_qty", F.col("sum_qty") * (1 + 1e-15))
    assert not compare(drifted, con, plans.ORACLES["agg_pricing_summary"])["values_match"]
