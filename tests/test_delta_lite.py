"""Delta-lite protocol layer: commit/replay semantics beyond what the
catalog queries pin — empty-table errors, history, unsupported
protocol requirements failing loudly, schema fidelity through the
committed schemaString, partitioned tables (layout, partitionValues,
planning-time pruning), and checkpoint parquet replay (log-tail
seeding, log cleanup, txn high-water marks)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from jhu_data_parser_spark.sources.delta_lite import (
    _checkpoint_versions,
    delete_delta,
    last_txn_version,
    latest_version,
    merge_delta,
    optimize_delta,
    read_delta,
    read_delta_changes,
    table_history,
    vacuum_delta,
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


def test_partitioned_table_layout_and_pruning(spark):
    df = spark.range(90).select(
        "id",
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 2.0).alias("v"),
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite", partition_by=["k"])
        # Hive-style layout + partitionValues recorded in the add log
        assert sorted(
            d for d in os.listdir(t) if d != "_delta_log"
        ) == ["k=0", "k=1", "k=2"]
        adds = [
            json.loads(l)["add"]
            for l in open(os.path.join(t, "_delta_log", f"{0:020d}.json"))
            if '"add"' in l
        ]
        assert all(a["partitionValues"].get("k") in "012" for a in adds)
        assert all(a["path"].startswith("k=") for a in adds)
        # appends inherit the committed partitioning; conflicts reject
        write_delta(df.withColumn("id", F.col("id") + 100), t, "append")
        with pytest.raises(ValueError, match="partitioned by"):
            write_delta(df, t, "append", partition_by=["id"])
        back = read_delta(spark, t)
        assert back.count() == 180
        # partition column reconstructed with the COMMITTED type
        assert dict(back.dtypes)["k"] == "string"
        assert back.filter(F.col("k") == "1").count() == 60
        # planning-time pruning: the partition filter reaches the scan
        plan = (
            back.filter(F.col("k") == "1")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "k#" in pf[0].split("PartitionFilters")[1].split("]")[0]
        # time travel on a partitioned table
        assert read_delta(spark, t, version=0).count() == 90


def test_checkpoint_replay_and_log_cleanup(spark):
    base = spark.range(10).select("id", F.lit(1.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        write_delta(base, t, "overwrite", txn=("app", 0))
        for i in range(1, 13):
            write_delta(
                base.withColumn("id", F.col("id") + F.lit(i * 10)),
                t,
                "append",
                txn=("app", i),
            )
        # checkpoint at the protocol's 10-commit convention + pointer
        assert _checkpoint_versions(t) == [10]
        ptr = json.load(
            open(os.path.join(t, "_delta_log", "_last_checkpoint"))
        )
        assert ptr["version"] == 10
        assert latest_version(t) == 12
        assert read_delta(spark, t).count() == 130
        assert last_txn_version(t, "app") == 12
        # log cleanup: delete every JSON commit <= the checkpoint; the
        # snapshot must rebuild from checkpoint + tail alone
        logdir = os.path.join(t, "_delta_log")
        for f in os.listdir(logdir):
            if f.endswith(".json") and int(f[:-5]) <= 10:
                os.remove(os.path.join(logdir, f))
        assert read_delta(spark, t).count() == 130
        # txn high-water survives via the checkpoint's txn rows
        assert last_txn_version(t, "app") == 12
        # idempotent re-delivery still recognized after cleanup
        v_before = latest_version(t)
        write_delta(base, t, "append", txn=("app", 3))
        assert latest_version(t) == v_before
        # time travel to the checkpoint version itself works; a
        # pre-checkpoint version whose log is gone fails loudly
        assert read_delta(spark, t, version=10).count() == 110
        with pytest.raises(ValueError, match="version 5"):
            read_delta(spark, t, version=5)


def test_checkpoint_preserves_removes_and_partitioning(spark):
    """An overwrite BEFORE the checkpoint must not resurrect removed
    files when replay seeds from the checkpoint; partitionColumns ride
    the checkpoint's metaData row."""
    df = spark.range(20).select(
        "id", (F.col("id") % 2).cast("string").alias("k")
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite", partition_by=["k"])  # v0
        for i in range(1, 5):
            write_delta(
                df.withColumn("id", F.col("id") + F.lit(i * 100)),
                t,
                "append",
            )
        # v5 overwrite drops everything before it
        write_delta(
            df.withColumn("id", F.col("id") + F.lit(999)), t, "overwrite"
        )
        for i in range(6, 11):  # v6..v10 (checkpoint fires at v10)
            write_delta(
                df.withColumn("id", F.col("id") + F.lit(i * 1000)),
                t,
                "append",
            )
        assert _checkpoint_versions(t) == [10]
        logdir = os.path.join(t, "_delta_log")
        for f in os.listdir(logdir):
            if f.endswith(".json"):
                os.remove(os.path.join(logdir, f))
        back = read_delta(spark, t)
        # only v5..v10 rows: 6 commits x 20 rows
        assert back.count() == 120
        assert back.filter(F.col("id") < 999).count() == 0
        # partitioning survived the checkpoint round trip
        assert dict(back.dtypes)["k"] == "string"
        assert back.filter(F.col("k") == "1").count() == 60


def _adds(table, version):
    return [
        json.loads(l)["add"]
        for l in open(
            os.path.join(table, "_delta_log", f"{version:020d}.json")
        )
        if '"add"' in l
    ]


def test_add_stats_and_data_skipping(spark):
    """Every add carries footer-aggregated stats; read_delta(skip=…)
    prunes files the min/max ranges exclude — from the LOG alone,
    before any file is opened — and never prunes a possible match."""
    df = spark.range(1000).select(
        "id", (F.col("id") * 2.0).alias("v")
    )
    with tempfile.TemporaryDirectory() as t:
        # range-partitioned write → disjoint id ranges per file
        write_delta(df.repartitionByRange(10, "id"), t, "overwrite")
        adds = _adds(t, 0)
        assert len(adds) == 10
        for a in adds:
            st = json.loads(a["stats"])
            assert st["numRecords"] == 100
            assert st["minValues"]["id"] <= st["maxValues"]["id"]
            assert st["nullCount"]["id"] == 0
        full = read_delta(spark, t)
        assert len(full.inputFiles()) == 10
        # ~1 of 10 files can hold id >= 950
        skinny = read_delta(spark, t, skip=[("id", ">=", 950)])
        assert len(skinny.inputFiles()) < 4
        assert skinny.filter(F.col("id") >= 950).count() == 50
        # equality point lookup
        point = read_delta(spark, t, skip=[("id", "=", 123)])
        assert len(point.inputFiles()) == 1
        assert point.filter(F.col("id") == 123).count() == 1
        # conjunct that excludes everything
        none = read_delta(spark, t, skip=[("id", ">", 99999)])
        assert none.count() == 0
        # skipping is a pruning hint: rows outside the predicate are
        # still present in kept files (callers apply the real filter)
        assert skinny.count() >= 50


def test_data_skipping_conservative_on_strings_and_partitions(spark):
    """String columns carry no stats (truncation hazard) so string
    predicates keep every file; partition-value equality prunes."""
    df = spark.range(100).select(
        "id",
        F.format_string("s%03d", F.col("id")).alias("s"),
        (F.col("id") % 4).cast("string").alias("k"),
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite", partition_by=["k"])
        adds = _adds(t, 0)
        for a in adds:
            st = json.loads(a["stats"])
            assert "s" not in st["minValues"]  # strings: no stats
            assert "id" in st["minValues"]
        all_files = len(read_delta(spark, t).inputFiles())
        kept = read_delta(spark, t, skip=[("s", ">=", "s050")])
        assert len(kept.inputFiles()) == all_files  # conservative
        one = read_delta(spark, t, skip=[("k", "=", "2")])
        assert len(one.inputFiles()) < all_files
        assert one.filter(F.col("k") == "2").count() == 25


def test_merge_upsert_rewrites_only_touched_files(spark):
    df = spark.range(1000).select("id", (F.col("id") * 1.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        write_delta(df.repartitionByRange(10, "id"), t, "overwrite")
        # updates hit ids 0-49 (one file's range); inserts are new keys
        src = spark.range(50).select(
            "id", F.lit(-1.0).alias("v")
        ).unionByName(
            spark.range(2000, 2010).select("id", F.lit(9.0).alias("v"))
        )
        v = merge_delta(spark, t, src, on=["id"])
        assert v == 1
        # only the touched file(s) were removed — not the table
        log = open(os.path.join(t, "_delta_log", f"{1:020d}.json")).read()
        removes = log.count('"remove"')
        assert 1 <= removes <= 2
        back = read_delta(spark, t)
        assert back.count() == 1010
        assert back.filter(F.col("v") == -1.0).count() == 50
        assert back.filter(F.col("id") >= 2000).count() == 10
        # untouched rows intact
        assert back.filter(
            (F.col("id") >= 50) & (F.col("id") < 1000) & (F.col("v") < 0)
        ).count() == 0
        # pre-merge snapshot still time-travelable
        assert read_delta(spark, t, version=0).filter(
            F.col("v") == -1.0
        ).count() == 0
        # no-match merge inserts only, removes nothing
        src2 = spark.range(3000, 3003).select(
            "id", F.lit(7.0).alias("v")
        )
        merge_delta(spark, t, src2, on=["id"])
        log2 = open(os.path.join(t, "_delta_log", f"{2:020d}.json")).read()
        assert '"remove"' not in log2
        assert read_delta(spark, t).count() == 1013
        # schema mismatch fails loudly
        with pytest.raises(ValueError, match="source columns"):
            merge_delta(spark, t, spark.range(3), on=["id"])


def test_optimize_compacts_without_data_change(spark):
    df = spark.range(500).select("id", (F.col("id") % 7.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        for i in range(5):  # 5 small appends → many small files
            write_delta(
                df.filter(F.col("id") % 5 == i), t,
                "overwrite" if i == 0 else "append",
            )
        before = read_delta(spark, t)
        n_before = len(before.inputFiles())
        total = before.count()
        v = optimize_delta(spark, t, target_files=1)
        after = read_delta(spark, t)
        assert len(after.inputFiles()) < n_before
        assert after.count() == total
        assert set(r.id for r in after.collect()) == set(range(500))
        # reorganization commit: dataChange false on adds AND removes
        log = open(os.path.join(t, "_delta_log", f"{v:020d}.json")).read()
        for line in log.splitlines():
            a = json.loads(line)
            act = a.get("add") or a.get("remove")
            assert act is not None and act["dataChange"] is False


def test_optimize_zorder_enables_two_column_skipping(spark):
    """After Z-ORDER on (x, y), file-level min/max ranges are narrow
    on BOTH columns — skip prunes files for predicates on either."""
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    with tempfile.TemporaryDirectory() as t:
        # shuffled initial layout: every file spans ~the full x/y range
        write_delta(df.repartition(8), t, "overwrite")
        all_x = read_delta(spark, t, skip=[("x", ">=", 60)])
        assert len(all_x.inputFiles()) == 8  # no clustering, no pruning
        v = optimize_delta(spark, t, zorder_by=["x", "y"], target_files=16)
        zx = read_delta(spark, t, skip=[("x", ">=", 60)])
        zy = read_delta(spark, t, skip=[("y", ">=", 60)])
        assert len(zx.inputFiles()) < 16
        assert len(zy.inputFiles()) < 16
        # content identical after the rewrite
        back = read_delta(spark, t)
        assert back.count() == 4096
        assert back.agg(F.sum("payload")).collect()[0][0] == sum(range(4096))
        assert read_delta(spark, t, version=v - 1).count() == 4096


def test_cdf_incremental_reads_skip_reorganization(spark):
    df = spark.range(10).select("id", (F.col("id") * 1.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")  # v0
        write_delta(df.withColumn("id", F.col("id") + 100), t, "append")
        write_delta(df.withColumn("id", F.col("id") + 200), t, "append")
        v_opt = optimize_delta(spark, t, target_files=1)  # v3, no change
        write_delta(df.withColumn("id", F.col("id") + 300), t, "append")
        ch = read_delta_changes(spark, t, from_version=1)
        got = {
            r["_commit_version"]: r["n"]
            for r in ch.groupBy("_commit_version")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # v3 (OPTIMIZE, dataChange=false) contributes NOTHING —
        # its adds re-contain old rows; CDF must skip them
        assert got == {1: 10, 2: 10, 4: 10}
        assert v_opt == 3
        # version attribution is per-commit, not per-file-order
        assert read_delta_changes(spark, t, 4, 4).agg(
            F.min("id")
        ).collect()[0][0] == 300
        # a data-rewriting commit in range fails loudly, never lies
        write_delta(df, t, "overwrite")  # v5
        with pytest.raises(NotImplementedError, match="append-only"):
            read_delta_changes(spark, t, from_version=1)
        # empty range on a fresh high-water mark
        assert read_delta_changes(spark, t, 6, 5).count() == 0


def test_schema_evolution_append(spark):
    df = spark.range(10).select("id", (F.col("id") * 1.0).alias("v"))
    df2 = spark.range(10, 20).select(
        "id", (F.col("id") * 1.0).alias("v"), F.lit("x").alias("tag")
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")
        # new column without opt-in: loud
        with pytest.raises(ValueError, match="merge_schema"):
            write_delta(df2, t, "append")
        write_delta(df2, t, "append", merge_schema=True)
        back = read_delta(spark, t)
        assert dict(back.dtypes)["tag"] == "string"
        assert back.count() == 20
        # old files read the new column as null
        assert back.filter(F.col("tag").isNull()).count() == 10
        assert back.filter(F.col("tag") == "x").count() == 10
        # time travel sees the pre-evolution schema
        assert "tag" not in read_delta(spark, t, version=0).columns
        # dropped column / type change stay loud
        with pytest.raises(ValueError, match="missing committed"):
            write_delta(df2.drop("v"), t, "append", merge_schema=True)
        with pytest.raises(ValueError, match="type"):
            write_delta(
                df2.withColumn("v", F.col("v").cast("int")),
                t,
                "append",
                merge_schema=True,
            )


def test_vacuum_reclaims_below_cutoff(spark):
    df = spark.range(10).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")  # v0
        write_delta(df.withColumn("id", F.col("id") + 10), t, "overwrite")
        write_delta(df.withColumn("id", F.col("id") + 20), t, "append")
        deleted = vacuum_delta(t, keep_from_version=1)
        assert deleted  # v0's files were only referenced below cutoff
        # kept versions still read in full
        assert read_delta(spark, t).count() == 20
        assert read_delta(spark, t, version=1).count() == 10
        # history is still listable; the vacuumed snapshot is not
        assert [h["version"] for h in table_history(t)] == [0, 1, 2]
        with pytest.raises(Exception):
            read_delta(spark, t, version=0).collect()
        # idempotent
        assert vacuum_delta(t, keep_from_version=1) == []


def test_delete_where_rewrites_only_touched_files(spark):
    df = spark.range(1000).select("id", (F.col("id") * 1.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        write_delta(df.repartitionByRange(10, "id"), t, "overwrite")
        # stripe covers one file fully (100..199) and one partially
        v = delete_delta(
            spark, t, "id >= 100 AND id < 250", skip=[("id", "<", 250)]
        )
        assert v == 1
        back = read_delta(spark, t)
        assert back.count() == 850
        assert back.filter((F.col("id") >= 100) & (F.col("id") < 250)).count() == 0
        assert back.filter(F.col("id") == 99).count() == 1
        log = open(os.path.join(t, "_delta_log", f"{1:020d}.json")).read()
        removes = log.count('"remove"')
        assert removes <= 3  # only the stripe's files, not the table
        # fully-covered files are dropped without a rewrite: the new
        # adds hold only the partial file's survivors
        adds = _adds(t, 1)
        assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 50
        # no-match delete: no commit at all (idempotent no-op)
        assert delete_delta(spark, t, "id = 123456") == 1
        assert latest_version(t) == 1
        # pre-delete snapshot still travels
        assert read_delta(spark, t, version=0).count() == 1000


def test_delete_keeps_null_predicate_rows(spark):
    """SQL DELETE semantics: a row whose predicate evaluates to NULL
    is NOT deleted — it must survive the touched-file rewrite (a bare
    ~predicate filter would silently drop it; review-pass regression)."""
    from jhu_data_parser_spark.sources.delta_lite import delete_delta

    df = spark.range(10).select(
        "id",
        F.when(F.col("id") < 3, F.col("id")).alias("c"),  # c NULL for id>=3
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df.coalesce(1), t, "overwrite")
        delete_delta(spark, t, "c = 1")
        back = read_delta(spark, t)
        assert back.count() == 9  # only c=1 deleted
        assert back.filter(F.col("c").isNull()).count() == 7  # all kept


def test_partition_value_pruning_is_type_conservative(spark):
    """Hive dir strings encode booleans lowercase and doubles with a
    decimal point; equality pruning must match them numerically /
    spec-exactly, never via str(value) (review-pass regression)."""
    df = spark.range(20).select(
        "id",
        (F.col("id") % 2 == 0).alias("b"),
        (F.col("id") % 2).cast("double").alias("x"),
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite", partition_by=["b"])
        kept = read_delta(spark, t, skip=[("b", "=", True)])
        assert kept.filter(F.col("b")).count() == 10  # not over-pruned
        assert len(kept.inputFiles()) < len(read_delta(spark, t).inputFiles())
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite", partition_by=["x"])
        kept = read_delta(spark, t, skip=[("x", "=", 1)])  # int vs "1.0"
        assert kept.filter(F.col("x") == 1.0).count() == 10


def test_check_constraints_enforced_every_commit(spark):
    df = spark.range(10).select("id", (F.col("id") * 1.0).alias("v"))
    with tempfile.TemporaryDirectory() as t:
        write_delta(
            df, t, "overwrite", constraints={"v_nonneg": "v >= 0"}
        )
        # violating append fails loudly and commits nothing
        with pytest.raises(ValueError, match="v_nonneg"):
            write_delta(
                df.withColumn("v", F.col("v") - 100.0), t, "append"
            )
        assert latest_version(t) == 0
        # NULL never satisfies a CHECK (SQL semantics via coalesce)
        with pytest.raises(ValueError, match="v_nonneg"):
            write_delta(
                df.withColumn("v", F.lit(None).cast("double")),
                t,
                "append",
            )
        write_delta(df, t, "append")  # clean append passes
        # constraints survive the checkpoint round trip
        for i in range(2, 12):
            write_delta(df, t, "append")
        logdir = os.path.join(t, "_delta_log")
        for f in os.listdir(logdir):
            if f.endswith(".json") and int(f[:-5]) <= 10:
                os.remove(os.path.join(logdir, f))
        with pytest.raises(ValueError, match="v_nonneg"):
            write_delta(
                df.withColumn("v", F.col("v") - 100.0), t, "append"
            )
        # late constraint creation is rejected (creation-time only)
        with pytest.raises(ValueError, match="table creation"):
            write_delta(df, t, "append", constraints={"x": "id >= 0"})


def test_concurrent_appends_retry_and_conflicts_raise(spark, monkeypatch):
    """A writer losing the version race MID-FLIGHT (its link(2) claim
    hits an existing log file) must RETRY blind appends at the next
    version (both commits land, nothing clobbered) and RAISE for
    non-commuting commits (overwrite; rewrites whose removed files the
    winner also touched). The steal is injected between the loser's
    replay and its claim via an os.link hook — the actual race
    window."""
    from jhu_data_parser_spark.sources import delta_lite as dl

    df = spark.range(10).select("id")

    def steal_once(content: str):
        orig_link = os.link
        state = {"stolen": False}

        def hooked(src, dst, *a, **kw):
            if not state["stolen"] and dst.endswith(".json"):
                state["stolen"] = True
                with open(dst, "w") as fh:
                    fh.write(content)
            return orig_link(src, dst, *a, **kw)

        monkeypatch.setattr(dl.os, "link", hooked)
        return state

    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")  # v0
        # blind append: v1 stolen mid-flight → lands at v2
        st = steal_once('{"add": {"path": "ghost.parquet", '
                        '"partitionValues": {}, "dataChange": true}}\n')
        v = write_delta(df.withColumn("id", F.col("id") + 10), t, "append")
        assert st["stolen"] and v == 2
        assert latest_version(t) == 2
        monkeypatch.undo()
        # overwrite does not commute: loud conflict
        steal_once("")
        with pytest.raises(dl.ConcurrentWriteConflict):
            write_delta(df, t, "overwrite")
        monkeypatch.undo()
        # a rewrite (remove_paths commit) racing ANY concurrent commit
        # is loud — even if its removed files are all still active,
        # the winner may have added rows the rewrite should have read
        cur = latest_version(t)
        victim = sorted(dl._replay(t, cur).active)[0]
        steal_once('{"add": {"path": "other.parquet", '
                   '"partitionValues": {}, "dataChange": true}}\n')
        with pytest.raises(
            dl.ConcurrentWriteConflict, match="invalidated"
        ):
            write_delta(
                df.limit(0),
                t,
                "append",
                remove_paths=[victim],
                read_version=cur,
            )


def test_rewrite_stale_snapshot_conflict(spark):
    """A rewrite computed at version v must NOT commit if ANY commit
    landed before it claims v+1 — the widest race window (the whole
    Spark job runs between snapshot read and commit), closed by the
    read_version check rather than the link(2) same-version race."""
    from jhu_data_parser_spark.sources import delta_lite as dl

    df = spark.range(10).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")  # v0
        victim = sorted(dl._replay(t, 0).active)[0]
        # a concurrent append lands AFTER the rewrite read its
        # snapshot (v0) but BEFORE the rewrite commits
        write_delta(df.withColumn("id", F.col("id") + 100), t, "append")
        with pytest.raises(
            dl.ConcurrentWriteConflict, match="recompute"
        ):
            write_delta(
                df.limit(0),
                t,
                "append",
                remove_paths=[victim],
                read_version=0,
            )
        # remove_paths without read_version is a programming error
        with pytest.raises(ValueError, match="read_version"):
            write_delta(
                df.limit(0), t, "append", remove_paths=[victim]
            )


def test_retry_append_schema_changed_conflict(spark, monkeypatch):
    """A blind append that loses the link(2) race to a commit that
    EVOLVED the schema must raise (Delta's MetadataChangedException):
    retrying silently would commit files validated against the old
    schema, surfacing the new columns as null without consent."""
    from jhu_data_parser_spark.sources import delta_lite as dl

    df = spark.range(5).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_delta(df, t, "overwrite")  # v0
        orig_link = os.link
        state = {"stolen": False}

        def hooked(src, dst, *a, **kw):
            if not state["stolen"] and dst.endswith(".json"):
                state["stolen"] = True
                evolved = df.withColumn("extra", F.lit(1).cast("long"))
                with open(dst, "w") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "metaData": {
                                    "id": "x",
                                    "format": {
                                        "provider": "parquet",
                                        "options": {},
                                    },
                                    "schemaString": evolved.schema.json(),
                                    "partitionColumns": [],
                                    "configuration": {},
                                }
                            }
                        )
                        + "\n"
                    )
            return orig_link(src, dst, *a, **kw)

        monkeypatch.setattr(dl.os, "link", hooked)
        with pytest.raises(
            dl.ConcurrentWriteConflict, match="schema"
        ):
            write_delta(df.withColumn("id", F.col("id") + 10), t, "append")
        assert state["stolen"]


def test_concurrent_appends_threaded(spark):
    """N threads appending concurrently: every append lands exactly
    once at a distinct version — the optimistic-retry loop under real
    contention."""
    import threading

    df10 = spark.range(10).select("id")
    with tempfile.TemporaryDirectory() as t:
        write_delta(df10, t, "overwrite")
        errs = []

        def appender(k):
            try:
                write_delta(
                    df10.withColumn("id", F.col("id") + 100 * (k + 1)),
                    t,
                    "append",
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=appender, args=(k,)) for k in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs
        assert latest_version(t) == 4
        assert read_delta(spark, t).count() == 50


def test_update_where_simultaneous_assignment(spark):
    from jhu_data_parser_spark.sources.delta_lite import update_delta

    df = spark.range(100).select(
        "id", (F.col("id") * 1.0).alias("a"), (F.col("id") * 2.0).alias("b")
    )
    with tempfile.TemporaryDirectory() as t:
        write_delta(df.repartitionByRange(5, "id"), t, "overwrite")
        # swap a/b on a stripe: SQL simultaneous-assignment semantics
        v = update_delta(
            spark,
            t,
            {"a": "b", "b": "a"},
            "id >= 40 AND id < 60",
            skip=[("id", ">=", 40), ("id", "<", 60)],
        )
        assert v == 1
        back = read_delta(spark, t)
        r50 = back.filter(F.col("id") == 50).collect()[0]
        assert (r50["a"], r50["b"]) == (100.0, 50.0)  # swapped
        r10 = back.filter(F.col("id") == 10).collect()[0]
        assert (r10["a"], r10["b"]) == (10.0, 20.0)  # untouched
        assert back.count() == 100
        # only the stripe's files rewrote
        log = open(os.path.join(t, "_delta_log", f"{1:020d}.json")).read()
        assert 1 <= log.count('"remove"') <= 2
        # no-match update commits nothing; unknown column is loud
        assert update_delta(spark, t, {"a": "0.0"}, "id = 99999") == 1
        with pytest.raises(ValueError, match="unknown columns"):
            update_delta(spark, t, {"zz": "1"}, "id = 1")


def test_cdf_merge_rollup_idempotent_under_redelivery(spark):
    """Re-delivering already-merged versions (the checkpoint-replay
    failure mode) must change NOTHING in the downstream table: the
    txn high-water mark recognizes them before any join work."""
    import tempfile as _tf

    from jhu_data_parser_spark.streaming.jobs import (
        run_delta_cdf_merge_stream,
    )

    sf = "/root/testdata/sf0.001"
    clean = {
        tuple(r)
        for r in run_delta_cdf_merge_stream(spark, sf).collect()
    }
    res = _tf.mkdtemp(prefix="jdps_cdfres_t_")
    replayed = {
        tuple(r)
        for r in run_delta_cdf_merge_stream(
            spark, sf, reprocess_versions=(1, 3, 0, 4), results=res
        ).collect()
    }
    assert clean == replayed
    # the re-deliveries committed nothing: 5 result versions only
    # (v0 bootstrap overwrite + 4 merges), no extra commits
    assert latest_version(res) == 4
