"""Minimal Apache-Iceberg-v1 table layer (pure Python, no jar).

The iceberg-spark runtime is absent from this distribution, but the
Iceberg table spec is PUBLIC (iceberg.apache.org/spec) and its
metadata tree is plain JSON + Avro — and this repo already vendors a
spec-complete Avro container codec (``sources/avro_container.py``),
so the second major open table format is vendored directly, the same
precedent as the Delta-lite layer:

- ``metadata/v{N}.metadata.json`` — table metadata: schema (Iceberg
  JSON types, converted to/from Spark ``StructType``), partition
  spec, the snapshot log, and ``current-snapshot-id``;
  ``metadata/version-hint.text`` points at the latest N (the
  HadoopCatalog convention);
- each snapshot's ``manifest-list`` (``snap-{id}-*.avro``) is an Avro
  container of manifest-file entries — read and written by the
  vendored codec;
- each manifest (``*-m{k}.avro``) is an Avro container of
  ``manifest_entry`` records (status ADDED/EXISTING/DELETED + a
  nested ``data_file`` record with path, format, a typed ``partition``
  struct, record count, size) — the codec's nested-record branch
  carries the whole tree;
- a snapshot = the union of data files its manifest list reaches with
  status != DELETED. APPEND snapshots reference the previous
  snapshot's manifests plus one new manifest; OVERWRITE snapshots
  reference only the new manifest (prior files drop out of reach —
  and stay readable via time travel, exactly Iceberg's immutable-
  snapshot model);
- identity partitioning: the partition struct in each manifest entry
  carries the column's value, so a reader prunes data files from the
  MANIFESTS alone (Iceberg's defining trick: file pruning without
  listing or opening anything) — data files still contain the column
  (Iceberg semantics, unlike Hive layouts).

Execution split mirrors the real thing (and Delta-lite): data files
are written by a DISTRIBUTED Spark job; manifests and metadata are
driver-side and metadata-sized.

Scope (documented, loud): format-version 1 only (v2 metadata raises
``NotImplementedError`` — never a wrong read), identity transforms
only, single partition column, no schema evolution.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ADDED, _EXISTING, _DELETED = 1, 0, 2

_SPARK_TO_ICE = {
    T.LongType(): "long",
    T.IntegerType(): "int",
    T.StringType(): "string",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.DateType(): "date",
    T.BinaryType(): "binary",
}
_ICE_TO_SPARK = {v: k for k, v in _SPARK_TO_ICE.items()}


def _ice_type(dt: T.DataType) -> str:
    if dt in _SPARK_TO_ICE:
        return _SPARK_TO_ICE[dt]
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    raise NotImplementedError(
        f"iceberg-lite: unsupported column type {dt.simpleString()}"
    )


def _spark_type(t: str) -> T.DataType:
    if t in _ICE_TO_SPARK:
        return _ICE_TO_SPARK[t]
    if t == "timestamptz":
        return T.TimestampType()
    if t == "timestamp":
        return T.TimestampNTZType()
    if t.startswith("decimal("):
        p, s = t[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    raise NotImplementedError(f"iceberg-lite: unsupported type {t!r}")


def _schema_to_iceberg(schema: T.StructType) -> dict:
    return {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {
                "id": i + 1,
                "name": f.name,
                "required": False,
                "type": _ice_type(f.dataType),
            }
            for i, f in enumerate(schema.fields)
        ],
    }


def _schema_from_iceberg(ice: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), True)
            for f in ice["fields"]
        ]
    )


def _avro_primitive(ice_type: str) -> object:
    """Avro schema fragment for an identity-partition value of the
    given Iceberg type (nullable union, as the spec's partition
    structs are)."""
    base = {
        "long": "long",
        "int": "int",
        "string": "string",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
    }.get(ice_type)
    if base is None:
        raise NotImplementedError(
            f"iceberg-lite: partition type {ice_type!r} unsupported"
        )
    return base


def _bound_encode(v, ice_type: str) -> bytes | None:
    """Single-value binary serialization for manifest ``lower_bounds``
    / ``upper_bounds`` (spec: Appendix D, little-endian)."""
    import struct

    if v is None:
        return None
    try:
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
    except (struct.error, ValueError, TypeError):
        return None
    return None  # strings/other: no bounds (truncation rules omitted)


def _bound_decode(raw: bytes, ice_type: str):
    import struct

    fmt = {"long": "<q", "int": "<i", "double": "<d", "float": "<f"}.get(
        ice_type
    )
    if fmt is None or raw is None or len(raw) != struct.calcsize(fmt):
        return None
    return struct.unpack(fmt, raw)[0]


def _manifest_entry_schema(part_field: tuple[str, str] | None) -> dict:
    """Avro schema for ``manifest_entry`` (spec: Manifests) with a
    typed identity-partition struct. Field ids ride as ``field-id``
    attributes per the spec; the vendored codec ignores unknown
    attributes, as any conforming Avro reader must."""
    part_fields = []
    if part_field is not None:
        name, ice_type = part_field
        part_fields.append(
            {
                "name": name,
                "type": ["null", _avro_primitive(ice_type)],
                "default": None,
                "field-id": 1000,
            }
        )
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": part_fields,
                            },
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "lower_bounds",
                            "field-id": 125,
                            "default": None,
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "logicalType": "map",
                                    "items": {
                                        "type": "record",
                                        "name": "k126_v127",
                                        "fields": [
                                            {
                                                "name": "key",
                                                "type": "int",
                                                "field-id": 126,
                                            },
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                                "field-id": 127,
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                        {
                            "name": "upper_bounds",
                            "field-id": 128,
                            "default": None,
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "logicalType": "map",
                                    "items": {
                                        "type": "record",
                                        "name": "k129_v130",
                                        "fields": [
                                            {
                                                "name": "key",
                                                "type": "int",
                                                "field-id": 129,
                                            },
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                                "field-id": 130,
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                    ],
                },
            },
        ],
    }


_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {
            "name": "added_snapshot_id",
            "type": ["null", "long"],
            "default": None,
            "field-id": 503,
        },
        {
            "name": "added_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 504,
        },
        {
            "name": "existing_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 505,
        },
        {
            "name": "deleted_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 506,
        },
    ],
}


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _hint_path(table: str) -> str:
    return os.path.join(_meta_dir(table), "version-hint.text")


def _load_metadata(table: str, version: int | None = None) -> dict:
    if version is None:
        try:
            with open(_hint_path(table)) as fh:
                version = int(fh.read().strip())
        except FileNotFoundError:
            raise ValueError(f"iceberg-lite: not a table: {table}")
    path = os.path.join(_meta_dir(table), f"v{version}.metadata.json")
    with open(path) as fh:
        meta = json.load(fh)
    if meta.get("format-version", 1) != 1:
        raise NotImplementedError(
            f"iceberg-lite: format-version {meta['format-version']} "
            "not supported"
        )
    return meta


def _read_avro_records(path: str) -> list[dict]:
    from jhu_data_parser_spark.sources.avro_container import (
        iter_container_records,
    )

    with open(path, "rb") as fh:
        return list(iter_container_records(fh.read()))


def _write_avro_records(path: str, schema: dict, records: list) -> None:
    from jhu_data_parser_spark.sources.avro_container import write_container

    write_container(path, json.dumps(schema), records)


def _snapshot_entries(table: str, meta: dict, snapshot_id: int) -> list[dict]:
    """All manifest entries reachable from the snapshot's manifest
    list, statuses preserved (driver-side, metadata-sized — the same
    split as real Iceberg planning)."""
    snap = next(
        (s for s in meta.get("snapshots", []) if s["snapshot-id"] == snapshot_id),
        None,
    )
    if snap is None:
        known = [s["snapshot-id"] for s in meta.get("snapshots", [])]
        raise ValueError(
            f"iceberg-lite: snapshot {snapshot_id} not in {known}"
        )
    entries: list[dict] = []
    for mf in _read_avro_records(os.path.join(table, snap["manifest-list"])):
        entries.extend(
            _read_avro_records(os.path.join(table, mf["manifest_path"]))
        )
    return entries


def write_iceberg(
    spark_df: DataFrame,
    table: str,
    mode: str = "overwrite",
    partition_by: str | None = None,
    summary_props: dict | None = None,
) -> int:
    """Commit the DataFrame as a new Iceberg-v1 snapshot; returns the
    snapshot id. ``overwrite`` snapshots reference only the new
    manifest (prior files leave reach but stay time-travelable);
    ``append`` snapshots reference the previous manifests plus the new
    one — manifests are immutable and REUSED across snapshots, the
    spec's core economy (an append never rewrites old metadata).
    ``partition_by`` (identity transform, one column, first commit
    only) records each file's partition value in its manifest entry so
    readers prune from manifests alone."""
    import shutil
    import tempfile

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode {mode!r}")
    os.makedirs(_meta_dir(table), exist_ok=True)
    data_dir = os.path.join(table, "data")
    os.makedirs(data_dir, exist_ok=True)

    prev_meta: dict | None = None
    version = 1
    if os.path.isfile(_hint_path(table)):
        prev_meta = _load_metadata(table)
        with open(_hint_path(table)) as fh:
            version = int(fh.read().strip()) + 1
        committed_part = None
        spec = prev_meta["partition-specs"][0]["fields"]
        if spec:
            committed_part = spec[0]["name"]
        if partition_by is not None and partition_by != committed_part:
            raise ValueError(
                f"iceberg-lite: table is partitioned by {committed_part}, "
                f"got {partition_by}"
            )
        partition_by = committed_part
        ice_schema = prev_meta["schemas"][0]
        if _schema_from_iceberg(ice_schema) != T.StructType(
            [
                T.StructField(f.name, f.dataType, True)
                for f in spark_df.schema.fields
            ]
        ):
            raise ValueError("iceberg-lite: schema mismatch (no evolution)")
    else:
        ice_schema = _schema_to_iceberg(spark_df.schema)
    if partition_by is not None and partition_by not in spark_df.columns:
        raise ValueError(f"iceberg-lite: no column {partition_by!r}")

    # distributed data write (files keep the partition column IN the
    # data — Iceberg semantics; the layout need not be Hive-style)
    stage = tempfile.mkdtemp(prefix="jdps_ice_stage_")
    if partition_by is not None:
        # partitionBy strips the column from the data files; Iceberg
        # KEEPS it — stage the layout under a throwaway duplicate so
        # the walk sees per-partition dirs while the files stay whole
        writer = (
            spark_df.withColumn("__pt", spark_df[partition_by])
            .write.mode("overwrite")
            .partitionBy("__pt")
        )
    else:
        writer = spark_df.write.mode("overwrite")
    writer.parquet(stage)

    import pyarrow.parquet as pq

    part_type = None
    if partition_by is not None:
        part_type = next(
            f["type"]
            for f in ice_schema["fields"]
            if f["name"] == partition_by
        )
    snapshot_id = int(time.time() * 1000) * 1000 + version
    entries = []
    idx = 0
    for root, _dirs, files in os.walk(stage):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(root, f)
            part_val = None
            if partition_by is not None:
                comp = os.path.relpath(root, stage)
                raw = comp.split("=", 1)[1]
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    part_val = None
                else:
                    part_val = _partition_value(raw, part_type)
            md = pq.ParquetFile(src).metadata
            if md.num_rows == 0:
                continue  # empty task outputs never reach a manifest
            name = f"{uuid.uuid4().hex}-{idx:05d}.parquet"
            idx += 1
            dst = os.path.join(data_dir, name)
            lowers, uppers = _footer_bounds(md, ice_schema)
            shutil.move(src, dst)
            entries.append(
                {
                    "status": _ADDED,
                    "snapshot_id": snapshot_id,
                    "data_file": {
                        "file_path": os.path.join("data", name),
                        "file_format": "PARQUET",
                        "partition": (
                            {partition_by: part_val}
                            if partition_by is not None
                            else {}
                        ),
                        "record_count": md.num_rows,
                        "file_size_in_bytes": os.path.getsize(dst),
                        "lower_bounds": lowers,
                        "upper_bounds": uppers,
                    },
                }
            )
    shutil.rmtree(stage, ignore_errors=True)

    part_field = (partition_by, part_type) if partition_by else None
    manifest_name = f"{uuid.uuid4().hex}-m0.avro"
    manifest_rel = os.path.join("metadata", manifest_name)
    _write_avro_records(
        os.path.join(table, manifest_rel),
        _manifest_entry_schema(part_field),
        entries,
    )

    manifests = [
        {
            "manifest_path": manifest_rel,
            "manifest_length": os.path.getsize(
                os.path.join(table, manifest_rel)
            ),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
        }
    ]
    if mode == "append" and prev_meta is not None:
        cur = prev_meta.get("current-snapshot-id", -1)
        if cur != -1:
            snap = next(
                s
                for s in prev_meta["snapshots"]
                if s["snapshot-id"] == cur
            )
            manifests.extend(
                _read_avro_records(os.path.join(table, snap["manifest-list"]))
            )

    list_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro"
    list_rel = os.path.join("metadata", list_name)
    _write_avro_records(
        os.path.join(table, list_rel), _MANIFEST_FILE_SCHEMA, manifests
    )

    snapshots = list(prev_meta["snapshots"]) if prev_meta else []
    snapshots.append(
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": int(time.time() * 1000),
            # summary properties are the spec's commit-metadata channel
            # (real Iceberg streaming sinks store their epoch id here
            # for exactly-once resume — the snapshot log IS the ledger)
            "summary": {"operation": mode, **(summary_props or {})},
            "manifest-list": list_rel,
        }
    )
    spec_fields = (
        [
            {
                "name": partition_by,
                "transform": "identity",
                "source-id": next(
                    f["id"]
                    for f in ice_schema["fields"]
                    if f["name"] == partition_by
                ),
                "field-id": 1000,
            }
        ]
        if partition_by
        else []
    )
    meta = {
        "format-version": 1,
        "table-uuid": (
            prev_meta["table-uuid"] if prev_meta else uuid.uuid4().hex
        ),
        "location": table,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(ice_schema["fields"]),
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
    }
    with open(
        os.path.join(_meta_dir(table), f"v{version}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    tmp = _hint_path(table) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, _hint_path(table))
    return snapshot_id


def _footer_bounds(md, ice_schema: dict):
    """Per-column lower/upper bounds for a manifest entry, aggregated
    from the parquet FOOTER row-group statistics (metadata-only; no
    second data pass — the Delta-lite stats discipline, keyed by the
    spec's field ids and binary-encoded per Appendix D). Numeric
    columns only; a column missing stats in any row group gets no
    bounds (a possibly-inexact bound must never prune a file)."""
    by_name = {f["name"]: (f["id"], f["type"]) for f in ice_schema["fields"]}
    mins: dict = {}
    maxs: dict = {}
    skip: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in by_name or name in skip:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                skip.add(name)
                continue
            lo, hi = st.min, st.max
            if _bound_encode(lo, by_name[name][1]) is None:
                skip.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    lowers = [
        {"key": by_name[n][0], "value": _bound_encode(v, by_name[n][1])}
        for n, v in sorted(mins.items())
        if n not in skip
    ]
    uppers = [
        {"key": by_name[n][0], "value": _bound_encode(v, by_name[n][1])}
        for n, v in sorted(maxs.items())
        if n not in skip
    ]
    return (lowers or None), (uppers or None)


def _partition_value(raw: str, ice_type: str):
    """Typed partition value from the staged Hive dir component."""
    from urllib.parse import unquote

    raw = unquote(raw)
    if ice_type == "long" or ice_type == "int":
        return int(raw)
    if ice_type == "double" or ice_type == "float":
        return float(raw)
    if ice_type == "boolean":
        return raw == "true"
    return raw  # string / date ride as strings in the dir name


def _entry_may_match(entry: dict, conjuncts: list, ice_schema: dict) -> bool:
    """Range pruning from a manifest entry's lower/upper bounds: can
    the file hold a row satisfying ALL ``(col, op, value)`` conjuncts
    (op in < <= > >= =)? Missing bounds keep the file — pruning must
    never drop a potential match."""
    by_name = {f["name"]: (f["id"], f["type"]) for f in ice_schema["fields"]}
    df = entry["data_file"]
    lowers = {kv["key"]: kv["value"] for kv in (df.get("lower_bounds") or [])}
    uppers = {kv["key"]: kv["value"] for kv in (df.get("upper_bounds") or [])}
    for col, op, value in conjuncts:
        if col not in by_name:
            raise ValueError(f"iceberg-lite: no column {col!r}")
        fid, ice_type = by_name[col]
        lo = _bound_decode(lowers.get(fid), ice_type)
        hi = _bound_decode(uppers.get(fid), ice_type)
        if lo is None or hi is None:
            continue
        if op in (">", ">="):
            if (hi < value) or (op == ">" and hi == value):
                return False
        elif op in ("<", "<="):
            if (lo > value) or (op == "<" and lo == value):
                return False
        elif op in ("=", "=="):
            if value < lo or value > hi:
                return False
        else:
            raise ValueError(f"iceberg-lite: unsupported op {op!r}")
    return True


def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    partition_filter: tuple | None = None,
    bounds_filter: list | None = None,
) -> DataFrame:
    """Snapshot read (optionally time-traveled to ``snapshot_id``):
    walk metadata.json → manifest list (Avro) → manifests (Avro) →
    live data files, then feed exactly those files plus the COMMITTED
    schema to the parquet scan — the entire plan comes from the
    metadata tree, no directory listing anywhere (Iceberg's defining
    property; at 100 TB listing is the enemy). ``partition_filter``
    ``(col, value)`` prunes files from the manifests' identity-
    partition values; ``bounds_filter`` ``[(col, op, value), ...]``
    prunes from the entries' per-column lower/upper bounds — both
    BEFORE any file is opened, and both pruning hints only (callers
    still apply the real predicate)."""
    meta = _load_metadata(table)
    sid = (
        meta.get("current-snapshot-id")
        if snapshot_id is None
        else snapshot_id
    )
    ice_schema = meta["schemas"][0]
    schema = _schema_from_iceberg(ice_schema)
    entries = _snapshot_entries(table, meta, sid)
    files = []
    for e in entries:
        if e["status"] == _DELETED:
            continue
        if partition_filter is not None:
            col, val = partition_filter
            pv = (e["data_file"].get("partition") or {}).get(col)
            if pv is not None and pv != val:
                continue
        if bounds_filter and not _entry_may_match(
            e, bounds_filter, ice_schema
        ):
            continue
        files.append(os.path.join(table, e["data_file"]["file_path"]))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*sorted(files))


def iceberg_snapshots(table: str) -> list[dict]:
    """The snapshot log (id, timestamp, operation) — the table's
    audit trail, straight from metadata.json."""
    meta = _load_metadata(table)
    return [
        {
            "snapshot-id": s["snapshot-id"],
            "timestamp-ms": s["timestamp-ms"],
            "operation": s.get("summary", {}).get("operation"),
            "summary": dict(s.get("summary", {})),
        }
        for s in meta.get("snapshots", [])
    ]


def expire_snapshots(table: str, keep_last: int) -> list[str]:
    """Expire all but the newest ``keep_last`` snapshots (the spec's
    maintenance operation — the snapshot log grows per commit and
    old snapshots pin every data file they reach): writes a new
    metadata version carrying only the kept snapshots, then deletes
    manifest lists, manifests, and DATA files reachable ONLY from
    expired snapshots (files shared with kept snapshots survive —
    appends reuse manifests, so sharing is the norm). Returns deleted
    relative paths. Expired snapshot ids stop being time-travelable,
    by definition."""
    if keep_last < 1:
        raise ValueError("iceberg-lite: keep_last must be >= 1")
    with open(_hint_path(table)) as fh:
        version = int(fh.read().strip())
    meta = _load_metadata(table, version)
    snaps = meta.get("snapshots", [])
    if len(snaps) <= keep_last:
        return []
    kept, expired = snaps[-keep_last:], snaps[:-keep_last]
    if meta["current-snapshot-id"] not in {s["snapshot-id"] for s in kept}:
        raise ValueError("iceberg-lite: cannot expire the current snapshot")

    def reach(snapshot_list):
        lists, manifests, data = set(), set(), set()
        for s in snapshot_list:
            lists.add(s["manifest-list"])
            for mf in _read_avro_records(
                os.path.join(table, s["manifest-list"])
            ):
                manifests.add(mf["manifest_path"])
                for e in _read_avro_records(
                    os.path.join(table, mf["manifest_path"])
                ):
                    data.add(e["data_file"]["file_path"])
        return lists, manifests, data

    k_lists, k_manifests, k_data = reach(kept)
    e_lists, e_manifests, e_data = reach(expired)
    doomed = sorted(
        (e_lists - k_lists) | (e_manifests - k_manifests) | (e_data - k_data)
    )
    meta = dict(meta)
    meta["snapshots"] = kept
    meta["last-updated-ms"] = int(time.time() * 1000)
    with open(
        os.path.join(_meta_dir(table), f"v{version + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    tmp = _hint_path(table) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(version + 1))
    os.rename(tmp, _hint_path(table))
    deleted = []
    for rel in doomed:
        p = os.path.join(table, rel)
        if os.path.isfile(p):
            os.remove(p)
            deleted.append(rel)
    return deleted
