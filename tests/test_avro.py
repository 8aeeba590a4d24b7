"""Vendored Avro object-container codec: golden-byte pins for the
binary encoding (zigzag varints are where hand-rolled Avro goes
wrong), full-type-surface roundtrips under both vendored codecs,
corruption detection, the strict not-vendored boundary, and the
distributed Spark write→binaryFile→mapInPandas read path."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from jhu_data_parser_spark.sources.avro_container import (
    ContainerWriter,
    Reader,
    compile_datum_reader,
    compile_datum_writer,
    encode_long,
    flat_block_encoder,
    iter_container_blocks,
    iter_container_records,
    read_avro,
    write_avro,
    write_container,
)


def _enc(n: int) -> bytes:
    out = bytearray()
    encode_long(n, out)
    return bytes(out)


def test_zigzag_varint_golden():
    # the spec's own example table (Avro 1.11 "Binary Encoding")
    assert _enc(0) == b"\x00"
    assert _enc(-1) == b"\x01"
    assert _enc(1) == b"\x02"
    assert _enc(-2) == b"\x03"
    assert _enc(2) == b"\x04"
    assert _enc(-64) == b"\x7f"
    assert _enc(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**31 - 1, -(2**31), 2**62, -(2**62)):
        assert Reader(_enc(n)).read_long() == n


def test_datum_golden_bytes():
    schema = json.dumps(
        {
            "type": "record",
            "name": "t",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "u", "type": ["null", "int"]},
            ],
        }
    )
    w = compile_datum_writer(schema)
    out = bytearray()
    w({"a": 1, "s": "ab", "u": None}, out)
    # long 1 → \x02; string "ab" → len 2 (\x04) + bytes; union null → \x00
    assert bytes(out) == b"\x02\x04ab\x00"
    out2 = bytearray()
    w({"a": -2, "s": "", "u": 3}, out2)
    assert bytes(out2) == b"\x03\x00\x02\x06"
    r = compile_datum_reader(schema)
    assert r(Reader(bytes(out))) == {"a": 1, "s": "ab", "u": None}
    assert r(Reader(bytes(out2))) == {"a": -2, "s": "", "u": 3}


_FULL_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "everything",
        "namespace": "jdps",
        "fields": [
            {"name": "f_null", "type": "null"},
            {"name": "f_bool", "type": "boolean"},
            {"name": "f_int", "type": "int"},
            {"name": "f_long", "type": "long"},
            {"name": "f_float", "type": "float"},
            {"name": "f_double", "type": "double"},
            {"name": "f_bytes", "type": "bytes"},
            {"name": "f_str", "type": "string"},
            {"name": "f_union", "type": ["null", "string"]},
            {
                "name": "f_enum",
                "type": {"type": "enum", "name": "col", "symbols": ["R", "G"]},
            },
            {
                "name": "f_fixed",
                "type": {"type": "fixed", "name": "fx4", "size": 4},
            },
            {"name": "f_arr", "type": {"type": "array", "items": "long"}},
            {"name": "f_map", "type": {"type": "map", "values": "int"}},
            {
                "name": "f_nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "double"}],
                },
            },
            # named-type REFERENCE after definition
            {"name": "f_enum2", "type": "col"},
        ],
    }
)


def _full_rows(n: int) -> list[dict]:
    return [
        {
            "f_null": None,
            "f_bool": i % 2 == 0,
            "f_int": i - 5,
            "f_long": i * 10**12,
            "f_float": 0.5,
            "f_double": i / 7.0,
            "f_bytes": bytes([i % 256, 0, 255]),
            "f_str": f"řow-{i}",
            "f_union": None if i % 3 == 0 else f"u{i}",
            "f_enum": "R" if i % 2 else "G",
            "f_fixed": i.to_bytes(4, "big"),
            "f_arr": list(range(i % 4)),
            "f_map": {f"k{j}": j for j in range(i % 3)},
            "f_nested": {"x": float(i)},
            "f_enum2": "G",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    rows = _full_rows(257)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        n = write_container(path, _FULL_SCHEMA, rows, codec, block_records=100)
        assert n == 257
        raw = open(path, "rb").read()
        # 257 rows at block_records=100 → 3 blocks (memory-bounding unit)
        assert len(list(iter_container_blocks(raw))) == 3
        assert list(iter_container_records(raw)) == rows


def test_container_rewrite_is_byte_identical():
    rows = _full_rows(10)
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a.avro"), os.path.join(d, "b.avro")
        write_container(p1, _FULL_SCHEMA, rows)
        write_container(p2, _FULL_SCHEMA, rows)
        assert open(p1, "rb").read() == open(p2, "rb").read()


def test_corrupt_sync_detected():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        write_container(path, _FULL_SCHEMA, _full_rows(5), codec="null")
        raw = bytearray(open(path, "rb").read())
        raw[-1] ^= 0xFF  # flip a sync byte
        with pytest.raises(ValueError, match="sync"):
            list(iter_container_records(bytes(raw)))


def test_unvendored_codec_fails_loudly():
    import io

    with pytest.raises(NotImplementedError, match="snappy"):
        ContainerWriter(io.BytesIO(), _FULL_SCHEMA, codec="snappy")


def test_spark_write_read_roundtrip(spark):
    df = spark.range(0, 1000, 1, 4).selectExpr(
        "CAST(id AS STRING) AS k",
        "CAST(id * 1.5 AS DOUBLE) AS v",
        "id AS n",
    )
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": ["null", "string"]},
                {"name": "v", "type": ["null", "double"]},
                {"name": "n", "type": ["null", "long"]},
            ],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        manifest = write_avro(df, d, schema_json).collect()
        assert sum(r.n_rows for r in manifest) == 1000
        assert len(manifest) == 4  # one container per partition
        back = read_avro(spark, d, "k string, v double, n long")
        got = {(r.k, r.v, r.n) for r in back.collect()}
    want = {(str(i), i * 1.5, i) for i in range(1000)}
    assert got == want


def test_logical_types_roundtrip():
    """date / timestamp-micros / decimal logical types (the lake trio)
    survive the container roundtrip as their logical Python values."""
    import datetime as dt
    from decimal import Decimal

    schema = json.dumps(
        {
            "type": "record",
            "name": "lt",
            "fields": [
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "ts",
                    "type": {
                        "type": "long",
                        "logicalType": "timestamp-micros",
                    },
                },
                {
                    "name": "m",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 12,
                        "scale": 2,
                    },
                },
            ],
        }
    )
    rows = [
        {
            "d": dt.date(2024, 2, 29),
            "ts": dt.datetime(2024, 2, 29, 12, 34, 56, 789012),
            "m": Decimal("-12345.67"),
        },
        {
            "d": dt.date(1969, 12, 31),
            "ts": dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
            "m": Decimal("0.01"),
        },
        {
            "d": dt.date(1970, 1, 1),
            "ts": dt.datetime(1970, 1, 1),
            "m": Decimal("99999999.99"),
        },
    ]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        write_container(path, schema, rows)
        back = list(iter_container_records(open(path, "rb").read()))
    assert back == rows
    # raw integer inputs pass through the date/ts writers unchanged
    w = compile_datum_writer(schema)
    out = bytearray()
    w({"d": 0, "ts": 0, "m": Decimal("0.00")}, out)
    r = compile_datum_reader(schema)
    got = r(Reader(bytes(out)))
    assert got["d"] == dt.date(1970, 1, 1) and got["ts"] == dt.datetime(
        1970, 1, 1
    )


def test_timestamp_millis_roundtrip():
    import datetime as dt

    schema = json.dumps(
        {
            "type": "record",
            "name": "tm",
            "fields": [
                {
                    "name": "ts",
                    "type": {
                        "type": "long",
                        "logicalType": "timestamp-millis",
                    },
                }
            ],
        }
    )
    rows = [
        {"ts": dt.datetime(2024, 2, 29, 12, 34, 56, 789000)},
        {"ts": dt.datetime(1969, 12, 31, 23, 59, 59, 1000)},
    ]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        write_container(path, schema, rows)
        back = list(iter_container_records(open(path, "rb").read()))
    assert back == rows


def test_pandas_missing_values_take_null_branch(spark):
    """pandas hands missing values to the writer as NaT/NaN, not None —
    the union writer must route them to the null branch (NaT.value is
    INT64_MIN and would silently encode as a year-290000-BC timestamp;
    a nullable long becomes float NaN and int(nan) would crash)."""
    df = spark.sql(
        """SELECT * FROM VALUES
             (1L, TIMESTAMP'2024-01-02 03:04:05', 7L, 1.5D),
             (2L, CAST(NULL AS TIMESTAMP), CAST(NULL AS LONG),
              CAST(NULL AS DOUBLE))
           AS t(id, ts, n, v)"""
    )
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "ts",
                    "type": [
                        "null",
                        {"type": "long", "logicalType": "timestamp-micros"},
                    ],
                },
                {"name": "n", "type": ["null", "long"]},
                {"name": "v", "type": ["null", "double"]},
            ],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        write_avro(df.coalesce(1), d, schema_json).collect()
        back = {
            r.id: (r.ts, r.n, r.v)
            for r in read_avro(
                spark, d, "id long, ts timestamp, n long, v double"
            ).collect()
        }
    assert back[2] == (None, None, None)
    assert back[1][1:] == (7, 1.5)
    assert back[1][0] is not None


def test_decimal_over_fixed_roundtrip():
    """decimal backed by a FIXED base (what Java/Hive/Flink writers
    emit) must roundtrip, registering the named type."""
    from decimal import Decimal

    schema = json.dumps(
        {
            "type": "record",
            "name": "fx",
            "fields": [
                {
                    "name": "m",
                    "type": {
                        "type": "fixed",
                        "name": "amt",
                        "size": 8,
                        "logicalType": "decimal",
                        "precision": 18,
                        "scale": 2,
                    },
                }
            ],
        }
    )
    rows = [{"m": Decimal("-12345.67")}, {"m": Decimal("99999999999.99")}]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        write_container(path, schema, rows)
        raw = open(path, "rb").read()
        assert list(iter_container_records(raw)) == rows


def test_read_avro_missing_column_fails_loudly(spark):
    df = spark.range(3).selectExpr("id AS a")
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "a", "type": "long"}],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        write_avro(df.coalesce(1), d, schema_json).collect()
        with pytest.raises(Exception, match="not in"):
            read_avro(spark, d, "a_typo long").collect()


def test_oversize_varint_rejected():
    raw = bytes([0x80] * 10 + [0x01])  # 11-byte varint (Avro max is 10)
    with pytest.raises(ValueError, match="varint"):
        Reader(raw).read_long()


def test_varint_64bit_overflow_rejected():
    # 10 bytes whose 10th carries payload bits past the 64-bit zigzag
    # range: decodes without "too long" but must still fail loudly
    raw = bytes([0xFF] * 9 + [0x7F])
    with pytest.raises(ValueError, match="overflow"):
        Reader(raw).read_long()


def test_sync_marker_split_read(spark):
    """One container, many blocks, read across byte-range splits: the
    split plan must cover every block exactly once at ANY split size
    (boundaries landing mid-block, on a sync, inside the header), and
    the decode must genuinely run in >1 task."""
    from jhu_data_parser_spark.sources.avro_container import (
        plan_avro_splits,
        write_container,
    )

    schema_json = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "v", "type": "double"},
            ],
        }
    )
    rows = [{"id": i, "v": i * 0.5} for i in range(5000)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "part-00000.avro")
        # small blocks so a single file has many split points
        write_container(path, schema_json, rows, block_records=100)
        size = os.path.getsize(path)
        expected = sorted((r["id"], r["v"]) for r in rows)
        # sweep split sizes incl. pathological ones (smaller than the
        # header, prime-ish, one byte below/above a power of two)
        for split_bytes in (37, 101, 1000, 4093, 1 << 14, size, 10 * size):
            df = read_avro(
                spark, d, "id long, v double", split_bytes=split_bytes
            )
            got = sorted((r.id, r.v) for r in df.collect())
            assert got == expected, f"split_bytes={split_bytes}"
        # the plan actually fans one file out to many tasks
        splits = plan_avro_splits(d, 1000)
        assert len(splits) > 10
        n_parts = read_avro(
            spark, d, "id long, v double", split_bytes=1000
        ).rdd.getNumPartitions()
        assert n_parts == len(splits)


def test_split_read_multi_file_deflate(spark):
    """Splits compose with the directory layout and the deflate codec
    (block payloads compressed, framing offsets still byte-exact)."""
    df = spark.range(20000).selectExpr(
        "id", "CAST(id % 97 AS DOUBLE) AS v", "repeat('x', 50) AS pad"
    )
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "v", "type": "double"},
                {"name": "pad", "type": "string"},
            ],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        write_avro(df.repartition(4), d, schema_json, codec="deflate").collect()
        back = read_avro(
            spark, d, "id long, v double", split_bytes=5000
        )
        assert back.rdd.getNumPartitions() > 4
        agg = back.selectExpr(
            "count(*) AS n", "sum(id) AS s", "sum(v) AS sv"
        ).collect()[0]
        assert (agg.n, agg.s) == (20000, 20000 * 19999 // 2)


def test_flat_block_encoder_byte_identical_to_datum_writer():
    """The column-vectorized fast encode (write_avro's hot path) must
    produce the EXACT byte stream of the compiled per-record writer —
    same union indexes, varints, IEEE LE floats, and the documented
    NaN→null coercion on null-union branches."""
    import pandas as pd

    cases = [
        (  # the format-roundtrip shape: nullable string + doubles,
           # with nulls, NaN, -0.0, huge magnitudes, unicode, empty
            [
                {"name": "s", "type": ["null", "string"]},
                {"name": "d", "type": ["null", "double"]},
                {"name": "q", "type": ["null", "double"]},
            ],
            {
                "s": ["a", None, "", "é" * 300, "word"],
                "d": [1.5, float("nan"), -0.0, 1e308, None],
                "q": [0.25, 2.0, 3.0, 4.0, 5.0],
            },
        ),
        (  # plain (non-null) primitives: NaN must stay a real NaN
            [
                {"name": "d", "type": "double"},
                {"name": "f", "type": "float"},
                {"name": "l", "type": "long"},
                {"name": "i", "type": "int"},
                {"name": "b", "type": "boolean"},
                {"name": "s", "type": "string"},
            ],
            {
                "d": [float("nan"), 2.5],
                "f": [1.5, -2.5],
                "l": [-1, 2**62],
                "i": [0, -(2**31)],
                "b": [True, False],
                "s": ["", "hello"],
            },
        ),
        (  # nullable varint/boolean (nulls arrive as pandas NaN/None)
            [
                {"name": "l", "type": ["null", "long"]},
                {"name": "b", "type": ["null", "boolean"]},
                {"name": "x", "type": ["null", "bytes"]},
            ],
            {
                "l": [1.0, None, -63.0],
                "b": [True, None, False],
                "x": [b"\x00\x01", None, b""],
            },
        ),
    ]
    for schema_fields, data in cases:
        schema_json = json.dumps(
            {"type": "record", "name": "t", "fields": schema_fields}
        )
        fields = [f["name"] for f in schema_fields]
        fast = flat_block_encoder(schema_json)
        assert fast is not None
        pdf = pd.DataFrame(data)
        got = fast([pdf[n] for n in fields])
        wd = compile_datum_writer(schema_json)
        body = bytearray()
        cols = [pdf[n].tolist() for n in fields]
        for vals in zip(*cols):
            wd(dict(zip(fields, vals)), body)
        assert got == bytes(body)


def test_flat_block_encoder_bails_on_complex_schemas():
    """Everything the fast path cannot encode byte-identically must
    return None (generic closure-tree path), never approximate."""
    for bad in (
        [{"name": "a", "type": {"type": "array", "items": "long"}}],
        [{"name": "a", "type": ["null", "string", "long"]}],
        [{"name": "a", "type": ["string", "null"]}],  # non-canonical order
        [{"name": "a", "type": {"type": "long", "logicalType": "timestamp-micros"}}],
        [{"name": "a", "type": {"type": "record", "name": "n", "fields": []}}],
    ):
        sj = json.dumps({"type": "record", "name": "t", "fields": bad})
        assert flat_block_encoder(sj) is None


def test_flat_block_encoder_raises_like_per_record_writer():
    """Schema-violating input must fail loudly, exactly where the
    per-record writer fails (ADVICE r14): None in a NON-nullable
    double/float column raises TypeError (never silently NaN), and a
    finite double outside float32 range raises OverflowError (never
    silently inf). A genuine inf survives both paths."""
    import struct

    sj = json.dumps(
        {
            "type": "record",
            "name": "t",
            "fields": [{"name": "a", "type": "double"}],
        }
    )
    enc = flat_block_encoder(sj)
    with pytest.raises(TypeError):
        enc([[1.0, None]])

    sjf = json.dumps(
        {
            "type": "record",
            "name": "t",
            "fields": [{"name": "a", "type": "float"}],
        }
    )
    encf = flat_block_encoder(sjf)
    with pytest.raises(OverflowError):
        encf([[1e40]])
    # a true infinity is representable and must still encode
    assert encf([[float("inf")]]) == struct.pack("<f", float("inf"))
