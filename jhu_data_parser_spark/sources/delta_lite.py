"""Minimal Delta-Lake-protocol table layer (pure Python, no jar).

The delta-spark connector is absent from this distribution, but the
Delta transaction protocol is PUBLIC (delta.io PROTOCOL.md) and its
log is plain JSON — so the table layer a modern lake user expects
(ACID-ish commits, appends, snapshot reads, time travel) is vendored
directly, the same precedent as the Avro codec:

- data files are ordinary parquet written by a DISTRIBUTED Spark job
  into a staging dir, then moved into the table dir by the driver —
  exactly Delta's execution model (executors write data, the driver
  commits metadata);
- ``_delta_log/{version:020d}.json`` holds one action per line:
  ``protocol`` / ``metaData`` (with Spark's own schemaString) on the
  first commit, ``add`` entries per data file, ``remove`` entries on
  overwrite;
- a snapshot at version V replays actions 0..V: active files =
  adds − removes; the reader feeds that file list plus the committed
  schema straight to the parquet scan, so Catalyst pushdown/pruning
  work unchanged.

Scope (documented, loud): single-writer commits (no concurrent-commit
arbitration), no checkpoint parquet (fine for harness-scale logs; a
real deployment writes one every 10 commits), no partitionColumns /
deletion vectors. Unsupported protocol requirements fail with
``NotImplementedError`` — never a wrong read.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def _versions(table: str) -> list[int]:
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".json"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def last_txn_version(table: str, app_id: str) -> int:
    """Highest committed ``txn`` version for ``app_id`` (−1 if none) —
    the protocol's idempotent-streaming-sink handshake: a re-delivered
    micro-batch is recognized and skipped by its (appId, version)."""
    last = -1
    for v in _versions(table):
        with open(_log_path(table, v)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                t = a.get("txn")
                if t and t.get("appId") == app_id:
                    last = max(last, int(t["version"]))
    return last


def write_delta(
    spark_df: DataFrame,
    table: str,
    mode: str = "overwrite",
    txn: tuple[str, int] | None = None,
) -> int:
    """Commit the DataFrame to the Delta-lite table; returns the new
    version (or the current one when an idempotent txn is skipped).
    ``overwrite`` removes all previously-active files in the commit
    (log-only — old data files stay for time travel, the Delta
    semantics); ``append`` adds alongside them. The data write is one
    distributed parquet job to a staging dir; only the file RENAMES
    and the log append are driver-side (metadata-sized).

    ``txn=(app_id, version)`` records the protocol's ``txn`` action
    with the commit and SKIPS the whole write when that (appId,
    version) is already committed — exactly-once streaming appends
    under checkpoint replay / upstream re-delivery."""
    import shutil
    import tempfile

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode {mode!r}")
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    versions = _versions(table)
    if txn is not None and versions:
        if int(txn[1]) <= last_txn_version(table, txn[0]):
            return versions[-1]  # idempotent re-delivery: no-op
    version = (versions[-1] + 1) if versions else 0

    stage = tempfile.mkdtemp(prefix="jdps_delta_stage_")
    try:
        spark_df.write.mode("overwrite").parquet(stage)
        adds = []
        for i, f in enumerate(
            sorted(p for p in os.listdir(stage) if p.endswith(".parquet"))
        ):
            name = f"part-{i:05d}-{uuid.uuid4().hex}-v{version}.parquet"
            src = os.path.join(stage, f)
            dst = os.path.join(table, name)
            shutil.move(src, dst)
            adds.append(
                {
                    "add": {
                        "path": name,
                        "partitionValues": {},
                        "size": os.path.getsize(dst),
                        "modificationTime": int(
                            os.path.getmtime(dst) * 1000
                        ),
                        "dataChange": True,
                    }
                }
            )
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": spark_df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    elif mode == "overwrite":
        # re-read current active set to emit removes
        active, _schema = _replay(table, versions[-1])
        for pth in sorted(active):
            actions.append(
                {"remove": {"path": pth, "dataChange": True}}
            )
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1])}}
        )
    actions.extend(adds)
    # single-writer commit: write-then-rename so a torn write never
    # surfaces as a half-commit
    tmp = _log_path(table, version) + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.rename(tmp, _log_path(table, version))
    return version


def _replay(table: str, version: int) -> tuple[set, str]:
    """Active file set + schemaString at the given version."""
    active: set = set()
    schema_string = None
    for v in _versions(table):
        if v > version:
            break
        with open(_log_path(table, v)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "protocol" in a:
                    if a["protocol"].get("minReaderVersion", 1) > 1:
                        raise NotImplementedError(
                            "delta-lite: reader version "
                            f"{a['protocol']['minReaderVersion']} not "
                            "supported"
                        )
                elif "metaData" in a:
                    schema_string = a["metaData"]["schemaString"]
                    if a["metaData"].get("partitionColumns"):
                        raise NotImplementedError(
                            "delta-lite: partitioned tables not vendored"
                        )
                elif "add" in a:
                    active.add(a["add"]["path"])
                elif "remove" in a:
                    active.discard(a["remove"]["path"])
    if schema_string is None:
        raise ValueError(f"delta-lite: no metaData in log at {table}")
    return active, schema_string


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (optionally time-traveled to ``version``): replay
    the log, feed the active file list + the COMMITTED schema to the
    parquet scan — pushdown, pruning and column projection are the
    ordinary Catalyst paths over exactly the committed files."""
    versions = _versions(table)
    if not versions:
        raise ValueError(f"delta-lite: not a table: {table}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"delta-lite: version {v} not in {versions}")
    active, schema_string = _replay(table, v)
    schema = StructType.fromJson(json.loads(schema_string))
    if not active:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, p) for p in sorted(active)]
    return spark.read.schema(schema).parquet(*paths)


def table_history(table: str) -> list[dict]:
    """Per-version commit summary (files added/removed) — the DESCRIBE
    HISTORY analogue."""
    out = []
    for v in _versions(table):
        adds = removes = 0
        with open(_log_path(table, v)) as fh:
            for line in fh:
                if '"add"' in line:
                    adds += 1
                elif '"remove"' in line:
                    removes += 1
        out.append({"version": v, "adds": adds, "removes": removes})
    return out
