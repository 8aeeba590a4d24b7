"""Structured Streaming tests (SURVEY.md §2.9): availableNow windowed
agg equals the batch answer, stateful dedup, foreachBatch partitioned
JSON sink mirrors the lake layout."""

from __future__ import annotations

import glob
import itertools
import json
import os

from pyspark.sql import functions as F

_ids = itertools.count()


def test_stream_daily_counts_equals_batch(spark, sf_dir):
    from jhu_data_parser_spark.sources.tables import load_table
    from jhu_data_parser_spark.streaming.jobs import run_daily_counts_availablenow

    table = f"t_daily_{next(_ids)}"
    streamed = run_daily_counts_availablenow(spark, sf_dir, table)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    assert {tuple(r) for r in streamed.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_dedup(spark, sf_dir):
    from jhu_data_parser_spark.sources.tables import load_table
    from jhu_data_parser_spark.streaming.jobs import run_dedup_stream

    table = f"t_dedup_{next(_ids)}"
    deduped = run_dedup_stream(spark, sf_dir, table)
    n_src = load_table(spark, sf_dir, "events").count()
    n_out = deduped.count()
    assert n_out == n_src  # event_ids are unique in the source
    assert deduped.select("event_id").distinct().count() == n_out


def test_stream_json_sink_partitioned(spark, sf_dir, tmp_path):
    from jhu_data_parser_spark.streaming.jobs import (
        read_events_stream,
        write_json_partitioned_stream,
    )

    out = str(tmp_path / "stream_lake")
    q = write_json_partitioned_stream(read_events_stream(spark, sf_dir), out)
    q.awaitTermination()
    # Hive-style event_type= partitions, mirroring the reference's
    # type= layout (src/parser.py:73-75).
    parts = {os.path.basename(p) for p in glob.glob(os.path.join(out, "event_type=*"))}
    assert parts == {
        "event_type=click",
        "event_type=error",
        "event_type=purchase",
        "event_type=signup",
        "event_type=view",
    }
    # records are valid JSON with the expected fields
    sample_file = glob.glob(os.path.join(out, "event_type=click", "part-*"))[0]
    with open(sample_file) as f:
        rec = json.loads(f.readline())
    assert {"event_id", "ts", "user_id", "value", "props"} <= set(rec)
