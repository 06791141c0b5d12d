"""Avro Object Container File (OCF) source — spec-derived, pure
Python + Arrow, no external package.

Why it exists: Avro is the other interchange format raw corpora and
CDC dumps actually arrive in (alongside the jsonl/csv/parquet/orc the
catalog already reads), and this environment's Spark has no avro jar —
so the reader implements the PUBLIC Avro 1.11 specification directly:
the OCF framing (magic ``Obj\\x01``, metadata map carrying
``avro.schema`` JSON + ``avro.codec``, 16-byte sync marker, counted
blocks) and the binary encoding (zigzag varint longs, little-endian
IEEE floats, length-prefixed bytes/strings, block-encoded arrays/maps
with the negative-count size form, union index prefix, record fields
in declaration order).

Supported schema surface → Spark types: null/boolean/int/long/float/
double/bytes/string primitives, record → struct, array, map,
enum → string (symbol), fixed → binary, the nullable-union idiom
``["null", X]`` in either order, and the common logical types
(date, timestamp-millis/micros, time-millis/micros passed through as
their base types where Spark has no analog). General unions, recursive
records, and the ``duration`` logical type raise precisely — the
deterministic-boundary posture every reader in this repo follows.
Codecs: ``null`` and ``deflate`` (raw RFC-1951, stdlib zlib);
``snappy``/``zstandard`` raise (no codec in this environment).

At scale: parallelism is per FILE (``binaryFile`` scan → Arrow
``mapInPandas`` decode), the right unit for the many-file layout
corpus dumps ship in; intra-file block splitting (OCF is sync-marker
splittable) is a documented non-goal here — a single multi-TB OCF file
should be re-sharded upstream. Block decode is streaming per payload
with a per-block inflation cap, so a hostile container costs one
precise raise, never an OOM. The schema comes from ONE header read
(driver-side, bounded bytes), never a data scan — the explicit-schema
stance the jsonl/csv endpoints document.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
MAX_BLOCK_BYTES = 256 * 1024 * 1024


class AvroError(ValueError):
    """Malformed or unsupported Avro container/schema/encoding."""


# --------------------------------------------------------------------------
# binary primitives (Avro spec "Binary Encoding")
# --------------------------------------------------------------------------


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise AvroError("truncated Avro data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """zigzag varint."""
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.data):
                raise AvroError("truncated varint")
            byte = self.data[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("varint too long")
        val = (acc >> 1) ^ -(acc & 1)
        # a 10-byte varint carries up to 70 bits; reject values outside
        # int64 HERE with the module's precise error instead of letting
        # a big Python int fail later in the Arrow conversion (r12
        # ADVICE)
        if not -(1 << 63) <= val < (1 << 63):
            raise AvroError("long outside int64 range")
        return val

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroError("negative bytes length")
        return self.read(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


# --------------------------------------------------------------------------
# schema → Spark type + value decoder
# --------------------------------------------------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


_TYPE_KEYWORDS = frozenset(
    ("record", "enum", "array", "map", "fixed", "union")
) | frozenset(_PRIMITIVES)


def canonical_form(schema, namespace: str = ""):
    """Structural normal form for schema equality (r12 ADVICE): strip
    decode-irrelevant attributes (doc, aliases, default, order), resolve
    short names against the enclosing namespace, and keep only the
    fields that change what a reader decodes — the spirit of Avro
    Parsing Canonical Form, except ``logicalType``/``precision``/
    ``scale`` are KEPT because this reader materializes logical types
    into Python values (two schemas differing there decode to different
    columns and must not compare equal)."""
    if isinstance(schema, str):
        if schema in _TYPE_KEYWORDS or "." in schema or not namespace:
            return schema
        return f"{namespace}.{schema}"
    if isinstance(schema, list):
        return [canonical_form(s, namespace) for s in schema]
    ns = schema.get("namespace", namespace)
    out = {}
    for k in ("type", "name", "fields", "items", "values", "size",
              "symbols", "logicalType", "precision", "scale"):
        if k not in schema:
            continue
        v = schema[k]
        if k == "name":
            out[k] = v if "." in v else (f"{ns}.{v}" if ns else v)
        elif k == "fields":
            out[k] = [
                {"name": f["name"],
                 "type": canonical_form(f["type"], ns)}
                for f in v
            ]
        elif k in ("type", "items", "values"):
            out[k] = canonical_form(v, ns)
        else:
            out[k] = v
    # Parsing Canonical Form's first rule: the single-attribute dict
    # spelling {"type": "string"} reduces to the bare name "string"
    # (r13 self-review fix — the verbose spelling must not
    # hash-mismatch the terse one)
    if set(out) == {"type"} and isinstance(out["type"], str):
        return out["type"]
    return out


def _normalize(schema, names: dict):
    """Resolve named-type references and dict-wrapped primitives."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroError(f"unknown type reference {schema!r}")
    return schema


def avro_type_to_spark(
    schema, names: dict | None = None, _open: frozenset = frozenset()
) -> tuple[T.DataType, bool]:
    """Avro schema node → (Spark type, nullable). ``names`` carries
    previously-declared named types for reference resolution; ``_open``
    tracks records still being defined (true recursion, which Spark's
    closed struct types cannot express — reuse of a COMPLETED record
    definition is fine)."""
    names = names if names is not None else {}
    schema = _normalize(schema, names)
    if isinstance(schema, str):
        return _PRIMITIVES[schema], schema == "null"
    if isinstance(schema, list):  # union
        nonnull = [s for s in schema if s != "null"]
        if len(nonnull) == 1 and len(schema) <= 2:
            inner, _ = avro_type_to_spark(nonnull[0], names, _open)
            return inner, True
        raise AvroError(
            f"general unions are not supported (got {len(schema)} branches)"
        )
    if not isinstance(schema, dict):
        raise AvroError(f"bad schema node: {schema!r}")
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical:
        if logical == "date" and t == "int":
            return T.DateType(), False
        if logical == "timestamp-millis" and t == "long":
            return T.TimestampType(), False
        if logical == "timestamp-micros" and t == "long":
            return T.TimestampType(), False
        if logical in ("time-millis", "time-micros", "local-timestamp-millis",
                       "local-timestamp-micros", "uuid"):
            pass  # carried as the base type
        elif logical == "decimal":
            prec = schema.get("precision", 38)
            scale = schema.get("scale", 0)
            return T.DecimalType(prec, scale), False
        else:
            raise AvroError(f"logical type {logical!r} not supported")
    if t in _PRIMITIVES:
        return _PRIMITIVES[t], False
    if t == "record":
        name = schema.get("name")
        if name in _open:
            raise AvroError(f"recursive record {name!r} not supported")
        fields = []
        if name:
            names[name] = schema
            _open = _open | {name}
        for f in schema["fields"]:
            ftype, fnull = avro_type_to_spark(f["type"], names, _open)
            fields.append(T.StructField(f["name"], ftype, fnull))
        return T.StructType(fields), False
    if t == "array":
        item, inull = avro_type_to_spark(schema["items"], names, _open)
        return T.ArrayType(item, inull), False
    if t == "map":
        val, vnull = avro_type_to_spark(schema["values"], names, _open)
        return T.MapType(T.StringType(), val, vnull), False
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return T.StringType(), False
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        return T.BinaryType(), False
    raise AvroError(f"avro type {t!r} not supported")


def avro_schema_to_spark(schema_json: str) -> T.StructType:
    """Top-level OCF schema (must be a record) → Spark StructType."""
    schema = json.loads(schema_json)
    names: dict = {}
    spark_type, _ = avro_type_to_spark(schema, names)
    if not isinstance(spark_type, T.StructType):
        raise AvroError("top-level Avro schema must be a record")
    return spark_type


def _decode_value(r: _Reader, schema, names: dict):
    schema = _normalize(schema, names)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) != b"\x00"
        if schema in ("int", "long"):
            return r.long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return r.bytes_()
        if schema == "string":
            return r.string()
        raise AvroError(f"bad primitive {schema!r}")
    if isinstance(schema, list):  # the validated nullable union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode_value(r, schema[idx], names)
    t = schema["type"]
    logical = schema.get("logicalType")
    if t in _PRIMITIVES:
        base = _decode_value(r, t, names)
        if logical == "date":
            import datetime

            return datetime.date(1970, 1, 1) + datetime.timedelta(days=base)
        # integer-exact epoch arithmetic (r12 ADVICE): the float64
        # fromtimestamp path can be off by 1 µs far from the epoch
        if logical == "timestamp-millis":
            import datetime

            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                milliseconds=base
            )
        if logical == "timestamp-micros":
            import datetime

            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=base
            )
        if logical == "decimal":
            import decimal

            unscaled = int.from_bytes(base, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-schema.get("scale", 0))
        return base
    if t == "record":
        if schema.get("name"):
            names.setdefault(schema["name"], schema)
        # dicts, not tuples: Arrow's struct conversion in the
        # mapInPandas hop accepts mappings for nested struct cells
        return {
            f["name"]: _decode_value(r, f["type"], names)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block-size form
                n = -n
                r.long()  # byte size (skippable hint)
            for _ in range(n):
                out.append(_decode_value(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                key = r.string()
                out[key] = _decode_value(r, schema["values"], names)
    if t == "enum":
        idx = r.long()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "fixed":
        if logical == "decimal":
            import decimal

            raw = r.read(schema["size"])
            unscaled = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-schema.get("scale", 0))
        return r.read(schema["size"])
    raise AvroError(f"avro type {t!r} not supported")


# --------------------------------------------------------------------------
# container framing
# --------------------------------------------------------------------------


def parse_ocf_header(data: bytes) -> tuple[dict, bytes, int]:
    """OCF header → (metadata dict, 16-byte sync marker, body offset)."""
    if data[:4] != MAGIC:
        raise AvroError("not an Avro object container (bad magic)")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            key = r.string()
            meta[key] = r.bytes_()
    sync = r.read(16)
    if "avro.schema" not in meta:
        raise AvroError("container carries no avro.schema")
    return meta, sync, r.pos


def _decompress_block(raw: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return raw
    if codec == "deflate":
        try:
            out = zlib.decompressobj(wbits=-15).decompress(
                raw, MAX_BLOCK_BYTES + 1
            )
        except zlib.error as exc:
            raise AvroError(f"bad deflate block: {exc}") from exc
        if len(out) > MAX_BLOCK_BYTES:
            raise AvroError(f"block exceeds cap {MAX_BLOCK_BYTES}")
        return out
    raise AvroError(f"avro codec {codec!r} not supported (no codec here)")


def decode_ocf(data: bytes) -> tuple[str, list[tuple]]:
    """Whole-container decode → (schema JSON, rows as tuples in field
    order). Raises :class:`AvroError` on any malformation — container
    payloads are all-or-nothing, unlike the per-member archive funnel."""
    meta, sync, pos = parse_ocf_header(data)
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    schema = json.loads(schema_json)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroError("top-level Avro schema must be a record")
    names: dict = {}
    # validate the full schema surface upfront AND build the named-type
    # registry the decoder resolves string references against
    avro_type_to_spark(schema, names)
    field_order = [f["name"] for f in schema["fields"]]
    rows: list[tuple] = []
    r = _Reader(data, pos)
    while r.pos < len(data):
        count = r.long()
        if count < 0:
            raise AvroError("negative block row count")
        block = _decompress_block(r.bytes_(), codec)
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block boundary)")
        br = _Reader(block)
        for _ in range(count):
            rec = _decode_value(br, schema, names)
            rows.append(tuple(rec[name] for name in field_order))
        if br.pos != len(block):
            raise AvroError("trailing bytes in block")
    return schema_json, rows


# --------------------------------------------------------------------------
# DataFrame reader
# --------------------------------------------------------------------------


def _read_local_header(path: str) -> str:
    """One bounded driver-side read for the schema — never a data
    scan. 64 KiB covers any sane metadata map; grows once if not."""
    for size in (64 * 1024, 8 * 1024 * 1024):
        with open(path, "rb") as fh:
            head = fh.read(size)
        try:
            meta, _, _ = parse_ocf_header(head)
            return meta["avro.schema"].decode("utf-8")
        except AvroError as exc:
            if "truncated" not in str(exc):
                raise
            if len(head) < size:
                # the WHOLE file fit in the buffer and the header still
                # ran out of bytes: the file itself is truncated — a
                # bigger read cannot change that diagnosis
                raise AvroError(f"truncated OCF file: {path}") from exc
    raise AvroError(f"OCF header larger than 8 MiB in {path}")


def read_avro(
    spark: SparkSession,
    path: str,
    schema_json: str | None = None,
) -> DataFrame:
    """Directory (or single file / glob) of ``.avro`` OCF files → a
    DataFrame. The Avro schema comes from ``schema_json`` or one header
    peek at the first file; every file is decoded against it (the
    single-schema-per-table contract the other endpoints share).

    Plan shape: ``binaryFile`` scan (one task per file) → Arrow
    ``mapInPandas`` decode — partition-parallel, nothing collected.
    """
    import pandas as pd

    if schema_json is None:
        if os.path.isdir(path):
            candidates = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".avro")
            )
        elif any(ch in os.path.basename(path) for ch in "*?["):
            import glob as _glob

            candidates = sorted(_glob.glob(path))
        else:
            candidates = [path]
        first = next((c for c in candidates if os.path.isfile(c)), None)
        if first is None:
            raise AvroError(
                f"cannot peek an OCF header at {path!r} (no local .avro "
                "file matches — non-POSIX paths need schema_json passed "
                "explicitly)"
            )
        schema_json = _read_local_header(first)
    out_schema = avro_schema_to_spark(schema_json)
    field_names = [f.name for f in out_schema.fields]
    expected = json.dumps(
        canonical_form(json.loads(schema_json)), sort_keys=True
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for blob in pdf["content"]:
                got_schema, rows = decode_ocf(bytes(blob))
                got = json.dumps(
                    canonical_form(json.loads(got_schema)), sort_keys=True
                )
                if got != expected:
                    raise AvroError(
                        "file schema differs from the table schema — "
                        "re-shard or pass schema_json explicitly"
                    )
                yield pd.DataFrame(rows, columns=field_names)

    return files.mapInPandas(_decode, schema=out_schema)
