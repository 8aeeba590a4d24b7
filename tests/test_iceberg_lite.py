"""Iceberg-lite v1 table layer: the metadata walk (version-hint →
metadata.json → Avro manifest list → Avro manifests → data files),
snapshot semantics (append reuses manifests, overwrite drops reach,
time travel), identity-partition pruning from manifests alone, and
loud failure on unsupported format versions."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from jhu_data_parser_spark.sources.iceberg_lite import (
    _load_metadata,
    _read_avro_records,
    expire_snapshots,
    iceberg_snapshots,
    read_iceberg,
    write_iceberg,
)


def test_roundtrip_append_overwrite_time_travel(spark):
    df = spark.range(10).select("id", (F.col("id") * 2.0).alias("v"))
    df2 = spark.range(10, 15).select("id", (F.col("id") * 2.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        s0 = write_iceberg(df, t, "overwrite")
        s1 = write_iceberg(df2, t, "append")
        s2 = write_iceberg(df2, t, "overwrite")
        assert {r.id for r in read_iceberg(spark, t).collect()} == set(
            range(10, 15)
        )
        assert {
            r.id for r in read_iceberg(spark, t, snapshot_id=s1).collect()
        } == set(range(15))
        assert {
            r.id for r in read_iceberg(spark, t, snapshot_id=s0).collect()
        } == set(range(10))
        # committed schema, not inference
        assert dict(read_iceberg(spark, t).dtypes)["v"] == "double"
        ops = [s["operation"] for s in iceberg_snapshots(t)]
        assert ops == ["overwrite", "append", "overwrite"]
        assert s2 == iceberg_snapshots(t)[-1]["snapshot-id"]
        with pytest.raises(ValueError, match="snapshot 99"):
            read_iceberg(spark, t, snapshot_id=99)


def test_append_reuses_previous_manifests(spark):
    """The spec's metadata economy: an append's manifest list contains
    the NEW manifest plus the previous snapshot's manifests verbatim —
    old metadata is never rewritten."""
    df = spark.range(5).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_iceberg(df, t, "overwrite")
        meta0 = _load_metadata(t)
        list0 = _read_avro_records(
            os.path.join(t, meta0["snapshots"][0]["manifest-list"])
        )
        write_iceberg(df.withColumn("id", F.col("id") + 10), t, "append")
        meta1 = _load_metadata(t)
        list1 = _read_avro_records(
            os.path.join(t, meta1["snapshots"][1]["manifest-list"])
        )
        assert len(list1) == len(list0) + 1
        assert {m["manifest_path"] for m in list0} <= {
            m["manifest_path"] for m in list1
        }
        # both snapshots' data readable; manifests are proper Avro
        # containers decoded by the vendored codec
        entries = _read_avro_records(
            os.path.join(t, list1[0]["manifest_path"])
        )
        assert all(
            e["data_file"]["file_path"].startswith("data/") for e in entries
        )
        assert all(e["data_file"]["record_count"] > 0 for e in entries)


def test_identity_partition_pruning_from_manifests(spark):
    df = spark.range(90).select(
        "id", (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    with tempfile.TemporaryDirectory() as t:
        write_iceberg(df, t, "overwrite", partition_by="k")
        full = read_iceberg(spark, t)
        assert full.count() == 90
        # the partition column is IN the data files (Iceberg, not Hive)
        assert full.filter(F.col("k") == 1).count() == 30
        pruned = read_iceberg(spark, t, partition_filter=("k", 1))
        assert len(pruned.inputFiles()) < len(full.inputFiles())
        assert pruned.filter(F.col("k") == 1).count() == 30
        # appends inherit the committed spec; conflicts reject
        write_iceberg(df.withColumn("id", F.col("id") + 100), t, "append")
        with pytest.raises(ValueError, match="partitioned by"):
            write_iceberg(df, t, "append", partition_by="id")
        assert read_iceberg(spark, t, partition_filter=("k", 1)).filter(
            F.col("k") == 1
        ).count() == 60


def test_bounds_pruning_from_manifests(spark):
    """Manifest entries carry per-column lower/upper bounds (spec
    Appendix D binary encoding, keyed by field id, aggregated from
    parquet footers at commit); bounds_filter prunes data files from
    the manifests alone and never drops a possible match."""
    df = (
        spark.range(1000)
        .select("id", (F.col("id") * 2.0).alias("v"))
        .repartitionByRange(10, "id")
    )
    with tempfile.TemporaryDirectory() as t:
        write_iceberg(df, t, "overwrite")
        meta = _load_metadata(t)
        list0 = _read_avro_records(
            os.path.join(t, meta["snapshots"][0]["manifest-list"])
        )
        entries = _read_avro_records(
            os.path.join(t, list0[0]["manifest_path"])
        )
        assert all(e["data_file"]["lower_bounds"] for e in entries)
        full = read_iceberg(spark, t)
        assert len(full.inputFiles()) == 10
        skinny = read_iceberg(spark, t, bounds_filter=[("id", ">=", 950)])
        assert len(skinny.inputFiles()) < 4
        assert skinny.filter(F.col("id") >= 950).count() == 50
        point = read_iceberg(spark, t, bounds_filter=[("id", "=", 123)])
        assert len(point.inputFiles()) == 1
        assert point.filter(F.col("id") == 123).count() == 1
        # double column prunes too; unknown column is loud
        dv = read_iceberg(spark, t, bounds_filter=[("v", "<", 100.0)])
        assert len(dv.inputFiles()) == 1
        with pytest.raises(ValueError, match="no column"):
            read_iceberg(spark, t, bounds_filter=[("zz", "=", 1)])


def test_unsupported_format_version_fails_loudly(spark):
    df = spark.range(3).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_iceberg(df, t, "overwrite")
        mpath = os.path.join(t, "metadata", "v1.metadata.json")
        meta = json.load(open(mpath))
        meta["format-version"] = 2
        json.dump(meta, open(mpath, "w"))
        with pytest.raises(NotImplementedError, match="format-version 2"):
            read_iceberg(spark, t)


def test_expire_snapshots_keeps_shared_files(spark):
    """Expiring old snapshots deletes only what THEY alone reach:
    appends reuse manifests, so a kept snapshot's shared data files
    must survive; an overwritten-away snapshot's files go."""
    df = spark.range(10).select("id")
    with tempfile.TemporaryDirectory() as t:
        s0 = write_iceberg(df, t, "overwrite")
        write_iceberg(df.withColumn("id", F.col("id") + 10), t, "overwrite")
        s2 = write_iceberg(df.withColumn("id", F.col("id") + 20), t, "append")
        deleted = expire_snapshots(t, keep_last=2)
        # s0's data + manifest + manifest list are unreachable: gone
        assert deleted
        assert all(d.startswith(("data/", "metadata/")) for d in deleted)
        # kept snapshots read in full (shared manifests survived)
        assert read_iceberg(spark, t).count() == 20
        assert {s["snapshot-id"] for s in iceberg_snapshots(t)} == {
            iceberg_snapshots(t)[0]["snapshot-id"],
            s2,
        }
        with pytest.raises(ValueError, match=f"snapshot {s0}"):
            read_iceberg(spark, t, snapshot_id=s0)
        # idempotent; keeping more than exists is a no-op
        assert expire_snapshots(t, keep_last=2) == []
        with pytest.raises(ValueError, match="keep_last"):
            expire_snapshots(t, keep_last=0)


def test_iceberg_append_stream_idempotent(spark):
    """Re-running the streaming append over the same table must not
    add snapshots: the jdps-batch-id summary ledger recognizes every
    re-delivered batch (the spec's commit-metadata channel)."""
    import tempfile as _tf

    from jhu_data_parser_spark.streaming.jobs import (
        run_iceberg_append_stream,
    )

    sf = "/root/testdata/sf0.001"
    table = _tf.mkdtemp(prefix="jdps_ice_stream_t_")
    os.rmdir(table)
    first = {
        tuple(r)
        for r in run_iceberg_append_stream(spark, sf, table=table).collect()
    }
    n_snaps = len(iceberg_snapshots(table))
    again = {
        tuple(r)
        for r in run_iceberg_append_stream(spark, sf, table=table).collect()
    }
    assert first == again
    assert len(iceberg_snapshots(table)) == n_snaps  # nothing re-committed


def test_schema_mismatch_rejected(spark):
    df = spark.range(3).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_iceberg(df, t, "overwrite")
        with pytest.raises(ValueError, match="schema mismatch"):
            write_iceberg(
                df.withColumn("x", F.lit(1)), t, "append"
            )
