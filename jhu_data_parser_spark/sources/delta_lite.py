"""Minimal Delta-Lake-protocol table layer (pure Python, no jar).

The delta-spark connector is absent from this distribution, but the
Delta transaction protocol is PUBLIC (delta.io PROTOCOL.md) and its
log is plain JSON — so the table layer a modern lake user expects
(ACID-ish commits, appends, snapshot reads, time travel, checkpoints,
partitioned tables) is vendored directly, the same precedent as the
Avro codec:

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
  work unchanged;
- every ``_CHECKPOINT_INTERVAL`` (10, the protocol's convention)
  commits the writer emits ``{version:020d}.checkpoint.parquet`` —
  the fully-replayed state (protocol, metaData, active adds, txn
  high-water marks) as one parquet file — plus the ``_last_checkpoint``
  pointer file. Replay then seeds from the newest checkpoint ≤ the
  target version and applies only the JSON log TAIL, so snapshot
  construction is O(interval), not O(commit count), and JSON logs at
  or below a checkpoint may be deleted (log cleanup) without losing
  the latest snapshot;
- ``partition_by=[cols]`` lays data files out in Hive-style
  ``col=value/`` dirs, records ``partitionColumns`` in ``metaData``
  and per-file ``partitionValues`` in each ``add`` (the protocol
  shape), and the snapshot read hands Spark the file list plus the
  table ``basePath`` — Catalyst reconstructs the partition columns
  from the layout and a filter on them becomes ``PartitionFilters``
  (file groups pruned at planning time), the Athena-partition-pruning
  story of ``/root/reference/src/parser.py:73-75`` carried into the
  table layer.

Scope (documented, loud): single-writer commits (no concurrent-commit
arbitration), no deletion vectors / column mapping (reader version >1
fails with ``NotImplementedError`` — never a wrong read). Removed
files are never vacuumed (all versions stay time-travelable); since
checkpoints are always taken (interval 10), replay cost is bounded
regardless of commit count.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"
_CHECKPOINT_INTERVAL = 10
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def _checkpoint_path(table: str, version: int) -> str:
    return os.path.join(
        table, _LOG_DIR, f"{version:020d}.checkpoint.parquet"
    )


def _versions(table: str) -> list[int]:
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".json") and not f.startswith("_"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _checkpoint_versions(table: str) -> list[int]:
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    suffix = ".checkpoint.parquet"
    for f in os.listdir(log):
        if f.endswith(suffix):
            try:
                out.append(int(f[: -len(suffix)]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table: str) -> int:
    """Highest committed version — max over JSON commits AND
    checkpoints, so a table whose pre-checkpoint JSON logs were
    cleaned up still reports correctly."""
    vs = _versions(table)
    cps = _checkpoint_versions(table)
    if not vs and not cps:
        raise ValueError(f"delta-lite: not a table: {table}")
    return max(vs + cps)


class _Snapshot:
    """Fully-replayed table state at one version."""

    __slots__ = ("active", "schema_string", "partition_columns", "txns")

    def __init__(self) -> None:
        self.active: dict[str, dict] = {}  # rel path -> add action dict
        self.schema_string: str | None = None
        self.partition_columns: list[str] = []
        self.txns: dict[str, int] = {}  # appId -> high-water version


def _apply_action(state: _Snapshot, a: dict) -> None:
    if "protocol" in a:
        if a["protocol"].get("minReaderVersion", 1) > 1:
            raise NotImplementedError(
                "delta-lite: reader version "
                f"{a['protocol']['minReaderVersion']} not supported"
            )
    elif "metaData" in a:
        state.schema_string = a["metaData"]["schemaString"]
        state.partition_columns = list(
            a["metaData"].get("partitionColumns") or []
        )
    elif "add" in a:
        state.active[a["add"]["path"]] = a["add"]
    elif "remove" in a:
        state.active.pop(a["remove"]["path"], None)
    elif "txn" in a:
        t = a["txn"]
        prev = state.txns.get(t["appId"], -1)
        state.txns[t["appId"]] = max(prev, int(t["version"]))


def _load_checkpoint(table: str, cp_version: int) -> _Snapshot:
    import pyarrow.parquet as pq

    state = _Snapshot()
    tbl = pq.read_table(_checkpoint_path(table, cp_version))
    for row in tbl.to_pylist():
        for kind in ("protocol", "metaData", "add", "txn"):
            if row.get(kind) is not None:
                a = {kind: dict(row[kind])}
                if kind == "add":
                    # pyarrow surfaces map<string,string> as a list of
                    # (k, v) tuples — normalize back to the dict shape
                    # every other code path carries
                    a["add"]["partitionValues"] = dict(
                        a["add"].get("partitionValues") or []
                    )
                _apply_action(state, a)
    if state.schema_string is None:
        raise ValueError(
            f"delta-lite: checkpoint {cp_version} at {table} has no metaData"
        )
    return state


def _write_checkpoint(table: str, version: int, state: _Snapshot) -> None:
    """One parquet file with the replayed state: nullable struct
    columns ``protocol`` / ``metaData`` / ``add`` / ``txn``, one
    action per row (the protocol's checkpoint shape, minus remove
    tombstones — this layer never vacuums, so expired removes need
    not ride along). Driver-side and metadata-sized by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    txn_t = pa.struct([("appId", pa.string()), ("version", pa.int64())])

    rows: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": uuid.uuid4().hex,
                "schemaString": state.schema_string,
                "partitionColumns": state.partition_columns,
            }
        },
    ]
    for app_id in sorted(state.txns):
        rows.append({"txn": {"appId": app_id, "version": state.txns[app_id]}})
    for path in sorted(state.active):
        a = state.active[path]
        rows.append(
            {
                "add": {
                    "path": a["path"],
                    "partitionValues": sorted(
                        (a.get("partitionValues") or {}).items()
                    ),
                    "size": int(a.get("size", 0)),
                    "modificationTime": int(a.get("modificationTime", 0)),
                    "dataChange": bool(a.get("dataChange", True)),
                }
            }
        )
    schema = pa.schema(
        [
            ("protocol", protocol_t),
            ("metaData", meta_t),
            ("add", add_t),
            ("txn", txn_t),
        ]
    )
    cols = {
        name: [r.get(name) for r in rows]
        for name in ("protocol", "metaData", "add", "txn")
    }
    arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
    cp = _checkpoint_path(table, version)
    pq.write_table(pa.Table.from_arrays(arrays, schema=schema), cp)
    # pointer file (protocol: _delta_log/_last_checkpoint, JSON body),
    # write-then-rename so readers never see a torn pointer
    ptr = os.path.join(table, _LOG_DIR, "_last_checkpoint")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    os.rename(tmp, ptr)


def _replay(table: str, version: int) -> _Snapshot:
    """State at ``version``: seed from the newest checkpoint ≤ version
    (so replay is O(log tail), and JSON logs at/below a checkpoint may
    have been cleaned up), then apply the JSON tail."""
    state = _Snapshot()
    start = -1
    cps = [c for c in _checkpoint_versions(table) if c <= version]
    if cps:
        start = cps[-1]
        state = _load_checkpoint(table, start)
    for v in _versions(table):
        if v <= start or v > version:
            continue
        with open(_log_path(table, v)) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))
    if state.schema_string is None:
        raise ValueError(f"delta-lite: no metaData in log at {table}")
    return state


def last_txn_version(table: str, app_id: str) -> int:
    """Highest committed ``txn`` version for ``app_id`` (−1 if none) —
    the protocol's idempotent-streaming-sink handshake: a re-delivered
    micro-batch is recognized and skipped by its (appId, version).
    Checkpoint-seeded, so the cost is the log tail, not the full log."""
    try:
        v = latest_version(table)
    except ValueError:
        return -1
    return _replay(table, v).txns.get(app_id, -1)


def _partition_values_from_rel(rel: str) -> dict[str, str | None]:
    """Parse Hive-style ``col=value/`` components of a relative data
    file path into the add action's ``partitionValues`` (unescaped;
    the Hive null sentinel maps to JSON null per the protocol)."""
    from urllib.parse import unquote

    values: dict[str, str | None] = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" not in comp:
            raise ValueError(
                f"delta-lite: non-partition dir {comp!r} in staged layout"
            )
        k, _, v = comp.partition("=")
        values[unquote(k)] = None if v == _HIVE_NULL else unquote(v)
    return values


def write_delta(
    spark_df: DataFrame,
    table: str,
    mode: str = "overwrite",
    txn: tuple[str, int] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Commit the DataFrame to the Delta-lite table; returns the new
    version (or the current one when an idempotent txn is skipped).
    ``overwrite`` removes all previously-active files in the commit
    (log-only — old data files stay for time travel, the Delta
    semantics); ``append`` adds alongside them. The data write is one
    distributed parquet job to a staging dir; only the file RENAMES
    and the log append are driver-side (metadata-sized).

    ``partition_by`` (first commit only; later commits inherit the
    committed ``partitionColumns`` and reject a conflicting value)
    partitions the data files Hive-style and records per-file
    ``partitionValues`` — snapshot reads then partition-prune.

    ``txn=(app_id, version)`` records the protocol's ``txn`` action
    with the commit and SKIPS the whole write when that (appId,
    version) is already committed — exactly-once streaming appends
    under checkpoint replay / upstream re-delivery.

    Every ``_CHECKPOINT_INTERVAL`` versions the commit also writes the
    checkpoint parquet + ``_last_checkpoint`` pointer, bounding every
    later replay to the log tail."""
    import shutil
    import tempfile

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode {mode!r}")
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    versions = _versions(table)
    cps = _checkpoint_versions(table)
    current = max(versions + cps) if (versions or cps) else None

    prev_state: _Snapshot | None = None
    if current is not None:
        prev_state = _replay(table, current)
        committed_parts = prev_state.partition_columns
        if partition_by is not None and list(partition_by) != committed_parts:
            raise ValueError(
                f"delta-lite: table is partitioned by {committed_parts}, "
                f"got partition_by={list(partition_by)}"
            )
        parts = committed_parts
        if txn is not None and int(txn[1]) <= prev_state.txns.get(
            txn[0], -1
        ):
            return current  # idempotent re-delivery: no-op
    else:
        parts = list(partition_by or [])
    version = (current + 1) if current is not None else 0

    stage = tempfile.mkdtemp(prefix="jdps_delta_stage_")
    try:
        writer = spark_df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(stage)
        staged: list[str] = []
        for root, _dirs, files in os.walk(stage):
            for f in files:
                if f.endswith(".parquet"):
                    staged.append(
                        os.path.relpath(os.path.join(root, f), stage)
                    )
        adds = []
        for i, rel in enumerate(sorted(staged)):
            part_dir = os.path.dirname(rel)
            name = f"part-{i:05d}-{uuid.uuid4().hex}-v{version}.parquet"
            rel_dst = os.path.join(part_dir, name) if part_dir else name
            dst = os.path.join(table, rel_dst)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(os.path.join(stage, rel), dst)
            adds.append(
                {
                    "add": {
                        "path": rel_dst,
                        "partitionValues": _partition_values_from_rel(
                            rel_dst
                        ),
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
                    "partitionColumns": parts,
                    "configuration": {},
                }
            }
        )
    elif mode == "overwrite":
        assert prev_state is not None
        for pth in sorted(prev_state.active):
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

    if version > 0 and version % _CHECKPOINT_INTERVAL == 0:
        _write_checkpoint(table, version, _replay(table, version))
    return version


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (optionally time-traveled to ``version``): replay
    the log (checkpoint-seeded), feed the active file list + the
    COMMITTED schema to the parquet scan — pushdown, pruning and
    column projection are the ordinary Catalyst paths over exactly the
    committed files. Partitioned tables read with ``basePath`` so the
    Hive layout reconstructs the partition columns and a filter on
    them becomes ``PartitionFilters`` (planning-time file pruning)."""
    v = latest_version(table) if version is None else version
    if version is not None:
        known = set(_versions(table)) | set(_checkpoint_versions(table))
        if v not in known:
            raise ValueError(
                f"delta-lite: version {v} not in {sorted(known)}"
            )
    state = _replay(table, v)
    schema = StructType.fromJson(json.loads(state.schema_string))
    if not state.active:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, p) for p in sorted(state.active)]
    reader = spark.read.schema(schema)
    if state.partition_columns:
        reader = reader.option("basePath", table)
    return reader.parquet(*paths)


def table_history(table: str) -> list[dict]:
    """Per-version commit summary (files added/removed) — the DESCRIBE
    HISTORY analogue. Covers the JSON commits still on disk (pre-
    checkpoint logs may have been cleaned up)."""
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
