"""Minimal Apache Avro binary codec (spec-conformant subset).

The Iceberg table format stores its manifest lists and manifest files as
Avro object-container files, and neither an Avro library nor the
spark-avro module exists in this environment — so the Iceberg export
face (:mod:`.iceberg_export`) carries its own encoder/decoder for the
subset of Avro the Iceberg spec uses: null / boolean / int / long /
float / double / string / bytes / fixed / record / union / array / map,
single-block object-container files, ``null`` codec.

Encoder and decoder are deliberately independent of any specific schema:
``read_container`` resolves values against the WRITER schema embedded in
the file header (exactly how a real Avro reader starts), so a round-trip
through these functions exercises the container layout, the header
metadata map, sync markers and the zigzag-varint record encoding — not a
private in-memory shortcut.

Reference: the Avro 1.11 specification, "Binary encoding" and "Object
Container Files" (public spec; no Avro source consulted).
"""

from __future__ import annotations

import io
import json
import struct


# -- primitive codecs -------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    if not -(1 << 63) <= n < (1 << 63):
        # Python ints are unbounded; an out-of-range value would
        # otherwise zigzag into garbage a reader decodes as some OTHER
        # number — fail loudly instead (found by the paimon manifest
        # round-trip property test)
        raise ValueError(f"avro long out of range: {n}")
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# -- schema-driven value codec ----------------------------------------------

def encode_value(buf: io.BytesIO, value, schema) -> None:
    """Encode ``value`` per the (JSON-decoded) Avro ``schema``."""
    if isinstance(schema, list):  # union: long index + encoded branch
        for i, branch in enumerate(schema):
            bname = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bname == "null":
                write_long(buf, i)
                return
            if value is not None and bname != "null":
                write_long(buf, i)
                encode_value(buf, value, branch)
                return
        raise ValueError(f"value {value!r} fits no union branch {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            encode_value(buf, value[f["name"]], f["type"])
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode_value(buf, item, schema["items"])
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                _write_bytes(buf, k.encode("utf-8"))
                encode_value(buf, v, schema["values"])
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode_value(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        return decode_value(buf, schema[read_long(buf)])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return _read_bytes(buf)
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode_value(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


# -- object container files --------------------------------------------------

_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(path: str, schema: dict, records: list[dict],
                    metadata: dict[str, bytes] | None = None) -> int:
    """Write one single-block Avro object-container file; returns its
    byte length. The sync marker is derived from the path (deterministic
    output for a given export — no RNG in the write path)."""
    import hashlib

    sync = hashlib.md5(path.encode("utf-8")).digest()  # 16 bytes
    body = io.BytesIO()
    for r in records:
        encode_value(body, r, schema)
    data = body.getvalue()

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null"}
    meta.update(metadata or {})
    encode_value(out, meta, _META_SCHEMA)
    out.write(sync)
    if records:
        write_long(out, len(records))
        write_long(out, len(data))
        out.write(data)
        out.write(sync)
    blob = out.getvalue()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object-container file, resolving records against the
    WRITER schema embedded in its header. Returns (schema, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container")
    meta = decode_value(buf, _META_SCHEMA)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"{path}: unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records = []
    while True:
        probe = buf.read(1)
        if not probe:
            return schema, records
        buf.seek(-1, io.SEEK_CUR)
        n = read_long(buf)
        read_long(buf)  # block byte size
        for _ in range(n):
            records.append(decode_value(buf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
