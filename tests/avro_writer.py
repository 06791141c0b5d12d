"""INDEPENDENT Avro OCF writer for the avro reader tests — its own
zigzag/varint encoder, block framing, and per-type serializers derived
from the public Avro 1.11 specification, sharing no code with the
reader under test."""

from __future__ import annotations

import io
import json
import struct
import zlib


def zigzag(v: int) -> bytes:
    n = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _bytes(b: bytes) -> bytes:
    return zigzag(len(b)) + b


def _string(s: str) -> bytes:
    return _bytes(s.encode("utf-8"))


def encode_value(schema, value, names: dict) -> bytes:
    if isinstance(schema, str) and schema not in (
        "null", "boolean", "int", "long", "float", "double", "bytes", "string"
    ):
        schema = names[schema]
    if isinstance(schema, list):  # union: pick the matching branch
        if value is None and "null" in schema:
            return zigzag(schema.index("null"))
        idx = next(i for i, s in enumerate(schema) if s != "null")
        return zigzag(idx) + encode_value(schema[idx], value, names)
    if isinstance(schema, str):
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if value else b"\x00"
        if schema in ("int", "long"):
            return zigzag(value)
        if schema == "float":
            return struct.pack("<f", value)
        if schema == "double":
            return struct.pack("<d", value)
        if schema == "bytes":
            return _bytes(value)
        if schema == "string":
            return _string(value)
        raise AssertionError(schema)
    t = schema["type"]
    if t in ("null", "boolean", "int", "long", "float", "double",
             "bytes", "string"):
        return encode_value(t, value, names)
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        return b"".join(
            encode_value(f["type"], value[f["name"]], names)
            for f in schema["fields"]
        )
    if t == "array":
        out = b""
        if value:
            out += zigzag(len(value))
            out += b"".join(encode_value(schema["items"], v, names)
                            for v in value)
        return out + zigzag(0)
    if t == "map":
        out = b""
        if value:
            out += zigzag(len(value))
            out += b"".join(_string(k) + encode_value(schema["values"], v, names)
                            for k, v in value.items())
        return out + zigzag(0)
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return zigzag(schema["symbols"].index(value))
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        assert len(value) == schema["size"]
        return value
    raise AssertionError(t)


def write_ocf(
    schema: dict,
    records: list[dict],
    codec: str = "null",
    block_size: int = 3,
    sync: bytes = b"S" * 16,
    extra_meta: dict | None = None,
) -> bytes:
    names: dict = {}
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    meta.update(extra_meta or {})
    buf.write(zigzag(len(meta)))
    for k, v in meta.items():
        buf.write(_string(k))
        buf.write(_bytes(v))
    buf.write(zigzag(0))
    buf.write(sync)
    for i in range(0, len(records), block_size) or ([0] if not records else []):
        chunk = records[i : i + block_size]
        if not chunk:
            continue
        body = b"".join(encode_value(schema, rec, names) for rec in chunk)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        buf.write(zigzag(len(chunk)))
        buf.write(_bytes(body))
        buf.write(sync)
    return buf.getvalue()
