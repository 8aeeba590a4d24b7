"""Delta-lite protocol layer: commit/replay semantics beyond what the
two catalog queries pin — empty-table errors, history, unsupported
protocol requirements failing loudly, and schema fidelity through the
committed schemaString."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from jhu_data_parser_spark.sources.delta_lite import (
    read_delta,
    table_history,
    write_delta,
)


def test_commit_replay_and_history(spark):
    df1 = spark.range(0, 10).selectExpr("id", "CAST(id*2 AS DOUBLE) AS v")
    df2 = spark.range(10, 15).selectExpr("id", "CAST(id*2 AS DOUBLE) AS v")
    with tempfile.TemporaryDirectory() as t:
        assert write_delta(df1, t, "overwrite") == 0
        assert write_delta(df2, t, "append") == 1
        assert write_delta(df2, t, "overwrite") == 2
        assert {r.id for r in read_delta(spark, t).collect()} == set(
            range(10, 15)
        )
        assert {r.id for r in read_delta(spark, t, version=1).collect()} == set(
            range(15)
        )
        assert {r.id for r in read_delta(spark, t, version=0).collect()} == set(
            range(10)
        )
        h = table_history(t)
        assert [x["version"] for x in h] == [0, 1, 2]
        assert h[2]["removes"] > 0  # the overwrite logged removes
        # committed schema survives (types, not inference)
        assert dict(read_delta(spark, t).dtypes)["v"] == "double"
        with pytest.raises(ValueError, match="version 7"):
            read_delta(spark, t, version=7)


def test_unsupported_reader_version_fails_loudly(spark):
    df = spark.range(3)
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")
        log = os.path.join(t, "_delta_log", f"{0:020d}.json")
        lines = open(log).read().splitlines()
        actions = [json.loads(l) for l in lines]
        actions[0]["protocol"]["minReaderVersion"] = 3
        with open(log, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(NotImplementedError, match="reader version"):
            read_delta(spark, t)


def test_not_a_table_errors(spark):
    with tempfile.TemporaryDirectory() as t:
        with pytest.raises(ValueError, match="not a table"):
            read_delta(spark, t)
