"""Minimal pure-Python Apache Avro object-container codec.

Implements exactly the subset the Apache Iceberg metadata layer needs
(manifest lists and manifest files are Avro container files): the
binary encoding for null / boolean / int / long / float / double /
bytes / string / fixed / enum / record / array / map / union, and the
object container framing (magic, file-metadata map, sync-marked data
blocks, ``null`` and ``deflate`` codecs).

Written against the PUBLIC Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) — no code derives
from any Avro implementation. The reader is schema-driven from the
WRITER schema embedded in the file header, so it decodes manifests
produced by any spec-conforming writer, not only this module's own;
the writer is primarily the Iceberg test-fixture generator (this
container has no Iceberg or Avro jars to produce fixtures with).

Out of scope, by construction: schema resolution/evolution between a
reader schema and the writer schema (Iceberg readers here always take
the writer's view and pick fields by name), snappy/zstd codecs (the
libraries are absent in this environment — a clear error names the
codec), and logical-type conversion (callers see raw primitives, e.g.
timestamp-micros as long — Iceberg metadata consumers want exactly
that).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO, names: dict):
    """Decode one datum of ``schema`` (parsed JSON) from ``buf``.

    ``names`` maps fully-unqualified record/fixed/enum names seen so far
    to their definitions (Avro allows referencing a named type by name
    after its first definition — Iceberg's r2/k101-style nested names
    rely on this)."""
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _decode(names[t], buf, names)
        if t == "null":
            return None
        if t == "boolean":
            b = buf.read(1)
            if not b:
                raise EOFError("truncated boolean")
            return b[0] != 0
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unknown avro type: {t!r}")
    if isinstance(schema, list):  # union: branch index then datum
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        return {
            f["name"]: _decode(f["type"], buf, names)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
    if t == "fixed":
        names[schema["name"]] = schema
        return buf.read(schema["size"])
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][_read_long(buf)]
    # type may itself be a nested complex schema (e.g. {"type": {...}})
    return _decode(t, buf, names)


# ---------------------------------------------------------------------------
# schema-driven encode
# ---------------------------------------------------------------------------


def _union_branch(schema_list, value) -> int:
    """Pick the union branch for a python value: None -> the null
    branch, anything else -> the first non-null branch (Iceberg
    metadata unions are always [null, X])."""
    for i, s in enumerate(schema_list):
        if (s == "null") == (value is None):
            return i
    raise ValueError(f"no union branch for {value!r} in {schema_list}")


def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _encode(names[t], value, out, names)
        if t == "null":
            return None
        if t == "boolean":
            out.append(1 if value else 0)
            return None
        if t in ("int", "long"):
            _write_long(out, int(value))
            return None
        if t == "float":
            out.extend(struct.pack("<f", float(value)))
            return None
        if t == "double":
            out.extend(struct.pack("<d", float(value)))
            return None
        if t == "bytes":
            _write_bytes(out, bytes(value))
            return None
        if t == "string":
            _write_bytes(out, value.encode("utf-8"))
            return None
        raise ValueError(f"unknown avro type: {t!r}")
    if isinstance(schema, list):
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        return _encode(schema[idx], value, out, names)
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            try:
                _encode(f["type"], value[f["name"]], out, names)
            except KeyError:
                raise ValueError(
                    f"record {schema['name']}: missing field {f['name']!r}"
                ) from None
        return None
    if t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_long(out, 0)
        return None
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return None
    if t == "fixed":
        names[schema["name"]] = schema
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.extend(value)
        return None
    if t == "enum":
        names[schema["name"]] = schema
        _write_long(out, schema["symbols"].index(value))
        return None
    return _encode(t, value, out, names)


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def read_container(path: str) -> tuple[dict, list, dict]:
    """-> (writer_schema, records, file_metadata) from an Avro object
    container file. Codecs: null, deflate."""
    with open(path, "rb") as fh:
        data = fh.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    sync = buf.read(16)
    records = []
    names: dict = {}
    while buf.tell() < len(data):
        n_records = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(
                f"avro codec {codec!r} (no {codec} library in this "
                "environment; supported: null, deflate)"
            )
        if buf.read(16) != sync:
            raise ValueError(f"avro sync marker mismatch in {path}")
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            records.append(_decode(schema, bbuf, names))
    return schema, records, {
        k: v for k, v in meta.items() if not k.startswith("avro.")
    }


def write_container(
    path: str,
    schema: dict,
    records: list,
    metadata: dict | None = None,
    codec: str = "deflate",
) -> None:
    """Write an Avro object container file (one data block). ``metadata``
    values may be str or bytes; Iceberg stamps e.g. ``format-version``."""
    body = bytearray()
    names: dict = {}
    for rec in records:
        _encode(schema, rec, body, names)
    block = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r}")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    out = bytearray(_MAGIC)
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    # deterministic sync marker: content-derived, no clock/rng (resume
    # safety and byte-reproducible fixtures)
    import hashlib

    sync = hashlib.md5(bytes(block[:64]) + os.fsencode(path)).digest()
    out.extend(sync)
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.extend(sync)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)
