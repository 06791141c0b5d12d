"""Avro OCF source: decode parity against the INDEPENDENT writer in
tests/avro_writer.py, schema mapping, codec/boundary raises, the
DataFrame reader plan, and the catalog endpoint."""

from __future__ import annotations

import datetime
import decimal
import json

import pytest

from sample_dms_kinesis_rds_mariadb_spark.sources.avro import (
    AvroError,
    avro_schema_to_spark,
    decode_ocf,
    parse_ocf_header,
    read_avro,
)
from tests.avro_writer import write_ocf, zigzag

SIMPLE = {
    "type": "record", "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
        {"name": "note", "type": ["null", "string"]},
    ],
}

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True,
     "payload": b"\x00\x01", "note": "n1"},
    {"id": -2, "name": "βeta", "score": -0.25, "ok": False,
     "payload": b"", "note": None},
    {"id": 2**40, "name": "", "score": 0.0, "ok": True,
     "payload": b"\xff" * 5, "note": "n3"},
    {"id": 4, "name": "delta", "score": 2.0**-300, "ok": False,
     "payload": b"d", "note": None},
]


def test_header_and_simple_roundtrip():
    blob = write_ocf(SIMPLE, ROWS)
    meta, sync, _pos = parse_ocf_header(blob)
    assert json.loads(meta["avro.schema"]) == SIMPLE
    assert sync == b"S" * 16
    schema_json, rows = decode_ocf(blob)
    assert len(rows) == 4
    for got, want in zip(rows, ROWS):
        assert got == tuple(want[f["name"]] for f in SIMPLE["fields"])


def test_multi_block_and_deflate():
    many = [dict(ROWS[0], id=i) for i in range(50)]
    for codec in ("null", "deflate"):
        blob = write_ocf(SIMPLE, many, codec=codec, block_size=7)
        _, rows = decode_ocf(blob)
        assert [r[0] for r in rows] == list(range(50))


def test_nested_complex_types():
    schema = {
        "type": "record", "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "counts", "type": {"type": "map", "values": "long"}},
            {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                      "symbols": ["A", "B", "C"]}},
            {"name": "digest", "type": {"type": "fixed", "name": "D16",
                                        "size": 4}},
            {"name": "inner", "type": {
                "type": "record", "name": "Inner",
                "fields": [{"name": "x", "type": "float"},
                           {"name": "y", "type": ["null", "long"]}],
            }},
            {"name": "inner2", "type": "Inner"},  # named-type REUSE
        ],
    }
    recs = [{
        "id": 7, "tags": ["a", "b"], "counts": {"k1": 10, "k2": -3},
        "kind": "B", "digest": b"\x01\x02\x03\x04",
        "inner": {"x": 1.5, "y": 9}, "inner2": {"x": -2.0, "y": None},
    }, {
        "id": 8, "tags": [], "counts": {}, "kind": "C", "digest": b"yyyy",
        "inner": {"x": 0.0, "y": None}, "inner2": {"x": 3.5, "y": 1},
    }]
    blob = write_ocf(schema, recs)
    _, rows = decode_ocf(blob)
    assert rows[0] == (7, ["a", "b"], {"k1": 10, "k2": -3}, "B",
                       b"\x01\x02\x03\x04", {"x": 1.5, "y": 9},
                       {"x": -2.0, "y": None})
    assert rows[1][1] == [] and rows[1][2] == {}
    # spark schema mapping incl. the reused named record
    st = avro_schema_to_spark(json.dumps(schema))
    assert st["inner"].dataType == st["inner2"].dataType
    assert st["kind"].dataType.simpleString() == "string"
    assert st["tags"].dataType.simpleString() == "array<string>"
    assert st["counts"].dataType.simpleString() == "map<string,bigint>"


def test_logical_types():
    schema = {
        "type": "record", "name": "L",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
        ],
    }
    # the independent writer encodes the raw base values; only the
    # schema's logicalType annotations tell the reader to lift them
    day = (datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)).days
    micros = 1_700_000_000_123_456
    unscaled = 12345  # 123.45
    blob = write_ocf(schema, [{
        "d": day, "ts": micros,
        "amt": unscaled.to_bytes(2, "big", signed=True),
    }])
    _, rows = decode_ocf(blob)
    d, ts, amt = rows[0]
    assert d == datetime.date(2024, 3, 1)
    assert ts == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert amt == decimal.Decimal("123.45")
    st = avro_schema_to_spark(json.dumps(schema))
    assert st["d"].dataType.simpleString() == "date"
    assert st["ts"].dataType.simpleString() == "timestamp"
    assert st["amt"].dataType.simpleString() == "decimal(10,2)"


def test_boundaries_raise_precisely():
    blob = write_ocf(SIMPLE, ROWS)
    with pytest.raises(AvroError, match="bad magic"):
        decode_ocf(b"NOPE" + blob[4:])
    with pytest.raises(AvroError, match="sync marker mismatch"):
        corrupt = blob[:-8] + b"X" * 8
        decode_ocf(corrupt)
    with pytest.raises(AvroError, match="truncated"):
        decode_ocf(blob[:-20])
    with pytest.raises(AvroError, match="not supported"):
        decode_ocf(write_ocf(SIMPLE, ROWS, codec="snappy"))
    general_union = {
        "type": "record", "name": "U",
        "fields": [{"name": "u", "type": ["int", "string"]}],
    }
    with pytest.raises(AvroError, match="general unions"):
        avro_schema_to_spark(json.dumps(general_union))
    recursive = {
        "type": "record", "name": "Node",
        "fields": [{"name": "next", "type": ["null", "Node"]}],
    }
    with pytest.raises(AvroError, match="recursive"):
        avro_schema_to_spark(json.dumps(recursive))
    not_record = json.dumps({"type": "array", "items": "int"})
    with pytest.raises(AvroError, match="must be a record"):
        avro_schema_to_spark(not_record)


def test_read_avro_dataframe(spark, tmp_path):
    d = tmp_path / "events_avro"
    d.mkdir()
    rows_a = [dict(ROWS[0], id=i) for i in range(10)]
    rows_b = [dict(ROWS[1], id=100 + i, note=None) for i in range(5)]
    (d / "part-0.avro").write_bytes(write_ocf(SIMPLE, rows_a, codec="deflate"))
    (d / "part-1.avro").write_bytes(write_ocf(SIMPLE, rows_b))
    (d / "ignore.txt").write_text("not avro")
    df = read_avro(spark, str(d))
    assert df.schema["id"].dataType.simpleString() == "bigint"
    assert df.schema["note"].nullable
    got = df.orderBy("id").collect()
    assert len(got) == 15
    assert got[0]["name"] == "alpha" and got[0]["payload"] == bytearray(b"\x00\x01")
    assert got[14]["id"] == 104 and got[14]["note"] is None
    # the plan is a binaryFile scan + ArrowEvalPython-free mapInPandas
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_read_avro_schema_mismatch_raises(spark, tmp_path):
    d = tmp_path / "mixed_avro"
    d.mkdir()
    (d / "a.avro").write_bytes(write_ocf(SIMPLE, ROWS[:1]))
    other = dict(SIMPLE, fields=SIMPLE["fields"][:2])
    (d / "b.avro").write_bytes(write_ocf(other, [
        {"id": 1, "name": "x"}
    ]))
    df = read_avro(spark, str(d))
    with pytest.raises(Exception, match="differs from the table schema"):
        df.collect()


def test_catalog_avro_endpoint(spark, tmp_path):
    from sample_dms_kinesis_rds_mariadb_spark.catalog import SourceCatalog
    from sample_dms_kinesis_rds_mariadb_spark.spec import EndpointSpec

    d = tmp_path / "avro_src"
    d.mkdir()
    (d / "events.avro").write_bytes(write_ocf(SIMPLE, ROWS))
    cat = SourceCatalog(spark)
    cat.register_endpoint(EndpointSpec(
        name="avro-src", engine="avro",
        options={"path": str(d), "schema_name": "crawl"},
    ))
    assert cat.list_tables("avro-src") == [("crawl", "events")]
    df = cat.load("avro-src", "crawl", "events")
    assert df.count() == 4
    assert {r["name"] for r in df.collect()} == {"alpha", "βeta", "", "delta"}


def test_zigzag_against_spec_examples():
    # Avro spec "Binary Encoding" worked examples
    assert zigzag(0) == b"\x00"
    assert zigzag(-1) == b"\x01"
    assert zigzag(1) == b"\x02"
    assert zigzag(-2) == b"\x03"
    assert zigzag(2) == b"\x04"
    assert zigzag(-64) == b"\x7f"
    assert zigzag(64) == b"\x80\x01"


def test_header_peek_glob_and_truncation_diagnosis(spark, tmp_path):
    """Review fixes: a glob path resolves locally for the header peek;
    a non-matching path raises AvroError (not FileNotFoundError)
    telling the caller to pass schema_json; a truncated small file is
    diagnosed as truncated, not 'header larger than 8 MiB'."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.avro import (
        _read_local_header,
    )

    d = tmp_path / "g"
    d.mkdir()
    (d / "part-0.avro").write_bytes(write_ocf(SIMPLE, ROWS[:2]))
    (d / "part-1.avro").write_bytes(write_ocf(SIMPLE, ROWS[2:]))
    # the documented glob form works end-to-end without schema_json
    df = read_avro(spark, str(d / "part-*.avro"))
    assert df.count() == 4
    # no match -> a precise AvroError, not a driver FileNotFoundError
    with pytest.raises(AvroError, match="schema_json"):
        read_avro(spark, str(d / "nope-*.avro"))
    # truncated small file: diagnosed as truncated, never 'header > 8 MiB'
    truncated = d / "cut.avro"
    truncated.write_bytes(write_ocf(SIMPLE, ROWS[:1])[:30])
    with pytest.raises(AvroError, match="truncated OCF file"):
        _read_local_header(str(truncated))


def test_timestamp_integer_exact_far_from_epoch():
    """r12 ADVICE: the float64 fromtimestamp path can be off by 1 us
    for timestamps far from the epoch; the decoder must be
    integer-exact, including pre-1970 negatives."""
    schema = {
        "type": "record", "name": "T",
        "fields": [
            {"name": "us", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "ms", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
        ],
    }
    cases = [
        4102444800_000_001,      # 2100-01-01T00:00:00.000001
        -1,                      # 1969-12-31T23:59:59.999999
        253402300799_999_999,    # 9999-12-31T23:59:59.999999
    ]
    blob = write_ocf(schema, [
        {"us": v, "ms": v // 1_000_000} for v in cases
    ])
    _, rows = decode_ocf(blob)
    epoch = datetime.datetime(1970, 1, 1)
    for (us, ms), v in zip(rows, cases):
        assert us == epoch + datetime.timedelta(microseconds=v)
        assert ms == epoch + datetime.timedelta(milliseconds=v // 1_000_000)


def test_schema_equality_is_canonical(spark, tmp_path):
    """r12 ADVICE: files written with the same logical schema but
    different doc/aliases/default/namespace spellings must NOT fail
    the per-file schema check — while a logicalType difference (which
    changes decoded values) still must."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.avro import canonical_form

    a = {
        "type": "record", "name": "R", "namespace": "com.example",
        "doc": "first writer",
        "fields": [
            {"name": "id", "type": "long", "doc": "pk"},
            {"name": "note", "type": ["null", "string"], "default": None,
             "aliases": ["comment"]},
        ],
    }
    b = {
        "type": "record", "name": "com.example.R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
    assert canonical_form(a) == canonical_form(b)
    c = {
        "type": "record", "name": "com.example.R",
        "fields": [
            {"name": "id", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
    assert canonical_form(a) != canonical_form(c)

    d = tmp_path / "canon_avro"
    d.mkdir()
    (d / "a.avro").write_bytes(write_ocf(a, [{"id": 1, "note": "x"}]))
    (d / "b.avro").write_bytes(write_ocf(b, [{"id": 2, "note": None}]))
    got = read_avro(spark, str(d)).orderBy("id").collect()
    assert [r["id"] for r in got] == [1, 2]


def test_long_outside_int64_raises_precisely():
    """r12 ADVICE: a 10-byte varint can carry 70 bits; values outside
    int64 must raise the module's AvroError, not a downstream Arrow
    conversion error."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.avro import _Reader

    # zigzag(2^63) = 2^64: nine continuation bytes + 0x02
    data = b"\x80" * 9 + b"\x02"
    with pytest.raises(AvroError, match="int64"):
        _Reader(data).long()
    # int64 extremes still decode: zigzag(-2^63) = 2^64 - 1
    data = b"\xff" * 9 + b"\x01"
    assert _Reader(data).long() == -(1 << 63)


def test_canonical_form_unwraps_single_attribute_types():
    """r13 self-review fix: {"type": "string"} and "string" are the
    same schema — the verbose spelling must not hash-mismatch."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.avro import canonical_form

    a = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": {"type": "string"}}]}
    b = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "string"}]}
    assert canonical_form(a) == canonical_form(b)
    # but a dict that carries MORE than the type (logicalType) stays
    c = {"type": "record", "name": "R",
         "fields": [{"name": "s",
                     "type": {"type": "long",
                              "logicalType": "timestamp-micros"}}]}
    d = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "long"}]}
    assert canonical_form(c) != canonical_form(d)
