"""MySQL binlog v4 row-event parser (the MySQL CDC wire format).

The reference's MySQL pipeline source tails the binary log
(``MySqlDataSource.java`` via Debezium's binlog client). The network
replication handshake needs a live server, but the binlog FILE FORMAT is
publicly documented (MySQL internals: "Binary Log Versions" / "Row Based
Replication"), and this module implements the row-replication subset for
real: FORMAT_DESCRIPTION, TABLE_MAP, WRITE/UPDATE/DELETE_ROWS (v2), XID
and ROTATE events, with typed column decode (LONG / LONGLONG / FLOAT /
DOUBLE / VARCHAR) — parsed distributed (one binlog blob per task, Arrow
batches out) into the engine's standard +I/-U/+U/-D changelog.

With :mod:`.pgoutput` this closes the byte-level half of the perennial
"live wire protocol" gap for BOTH dialects; what remains sandbox-bound is
only the server handshake (auth + COM_BINLOG_DUMP / START_REPLICATION).
Golden-byte tests hand-assembled from the documented layout pin the
format so the paired fixture encoder and this parser cannot drift
together unnoticed.

Layout implemented (binlog v4, checksum off):

- file magic ``FE 62 69 6E`` ("\\xfebin");
- event header (19 bytes, all little-endian): timestamp u32, type u8,
  server_id u32, event_size u32 (incl. header), log_pos u32, flags u16;
- FORMAT_DESCRIPTION (type 15): binlog_version u16, server_version
  char[50], create_ts u32, header_length u8, post-header length table;
- TABLE_MAP (19): table_id u48, flags u16, schema (u8 len + bytes + NUL),
  table (u8 len + bytes + NUL), column_count lenenc, column type bytes,
  metadata (lenenc length + per-type metadata), null bitmap;
- WRITE/UPDATE/DELETE_ROWS v2 (30/31/32): table_id u48, flags u16,
  extra_data_len u16 (self-inclusive), width lenenc, present-columns
  bitmap (×2 for UPDATE), then per row: null bitmap over present
  columns + values (UPDATE: before/after image pairs);
- XID (16): u64 transaction id; ROTATE (4): u64 position + next name.

Column type codes / value encodings (docs "Table_map_event column
types"): LONG=3 (i32le), FLOAT=4 (f32le, metadata 4), DOUBLE=5 (f64le,
metadata 8), LONGLONG=8 (i64le), VARCHAR=15 (metadata u16 max length;
value length prefix is 1 byte when max ≤ 255 else 2 bytes).
"""

from __future__ import annotations

import io
import struct

from pyspark.sql import DataFrame, types as T

from .events import OP_COLUMN, SEQ_COLUMN

MAGIC = b"\xfebin"

FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V2 = 30
UPDATE_ROWS_EVENT_V2 = 31
DELETE_ROWS_EVENT_V2 = 32
ROTATE_EVENT = 4

GTID_LOG_EVENT = 33

MYSQL_TYPE_LONG = 3
MYSQL_TYPE_FLOAT = 4
MYSQL_TYPE_DOUBLE = 5
MYSQL_TYPE_LONGLONG = 8
MYSQL_TYPE_DATETIME2 = 18
MYSQL_TYPE_VARCHAR = 15
MYSQL_TYPE_NEWDECIMAL = 246

_METADATA_BYTES = {MYSQL_TYPE_LONG: 0, MYSQL_TYPE_FLOAT: 1,
                   MYSQL_TYPE_DOUBLE: 1, MYSQL_TYPE_LONGLONG: 0,
                   MYSQL_TYPE_VARCHAR: 2, MYSQL_TYPE_NEWDECIMAL: 2,
                   MYSQL_TYPE_DATETIME2: 1}

# myisam-style packed decimal: bytes needed for n leading/trailing
# digits within one 9-digit group (docs "How MySQL stores DECIMAL")
_DEC_LEFTOVER_BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _dec_bytes(digits: int) -> int:
    return (digits // 9) * 4 + _DEC_LEFTOVER_BYTES[digits % 9]

HEADER_LEN = 19


def _lenenc(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _read_lenenc(buf: io.BytesIO) -> int:
    b = buf.read(1)[0]
    if b < 251:
        return b
    if b == 0xFC:
        return struct.unpack("<H", buf.read(2))[0]
    if b == 0xFD:
        return struct.unpack("<I", buf.read(3) + b"\x00")[0]
    return struct.unpack("<Q", buf.read(8))[0]


def _bitmap_get(bm: bytes, i: int) -> bool:
    return bool(bm[i // 8] & (1 << (i % 8)))


def _decode_newdecimal(raw: bytes, precision: int, scale: int):
    """MySQL packed DECIMAL (docs "How MySQL Stores DECIMAL Values"):
    magnitude digits in big-endian 9-digit/4-byte groups with partial
    leading/trailing groups, first byte's MSB = sign (1 = non-negative),
    negative values stored as the one's complement."""
    from decimal import Decimal

    positive = bool(raw[0] & 0x80)
    b = bytearray(raw if positive else bytes(x ^ 0xFF for x in raw))
    b[0] ^= 0x80
    buf = io.BytesIO(bytes(b))

    def read_digits(ndigits: int, lead_partial: bool) -> str:
        out = ""
        rem = ndigits % 9
        full = ndigits // 9
        if lead_partial and rem:
            n = _DEC_LEFTOVER_BYTES[rem]
            out += str(int.from_bytes(buf.read(n), "big")).zfill(rem)
        for _ in range(full):
            out += str(int.from_bytes(buf.read(4), "big")).zfill(9)
        if not lead_partial and rem:
            n = _DEC_LEFTOVER_BYTES[rem]
            out += str(int.from_bytes(buf.read(n), "big")).zfill(rem)
        return out or "0"

    ip = read_digits(precision - scale, lead_partial=True)
    fp = read_digits(scale, lead_partial=False) if scale else ""
    s = (ip.lstrip("0") or "0") + (("." + fp) if scale else "")
    return Decimal(("-" if not positive else "") + s)


def _encode_newdecimal(value, precision: int, scale: int) -> bytes:
    from decimal import Context, Decimal

    # MySQL DECIMAL goes to 65 digits; the default context's 28 would
    # raise InvalidOperation on quantize
    d = Decimal(str(value)).quantize(Decimal(1).scaleb(-scale),
                                     context=Context(prec=70))
    # copy_abs/is_signed are context-free — abs()/comparisons round
    # through the default 28-digit context and corrupt wide decimals
    negative = d.is_signed()
    digits = format(d.copy_abs(), "f")
    ip, _, fp = digits.partition(".")
    ip = ip.zfill(precision - scale)[-(precision - scale):] \
        if precision > scale else ""
    fp = fp.ljust(scale, "0")[:scale]

    out = bytearray()

    def write_digits(s: str, lead_partial: bool) -> None:
        rem = len(s) % 9
        if lead_partial and rem:
            out.extend(int(s[:rem]).to_bytes(
                _DEC_LEFTOVER_BYTES[rem], "big"))
            s = s[rem:]
        tail = s[len(s) - rem:] if (not lead_partial and rem) else ""
        body = s[:len(s) - len(tail)]
        for i in range(0, len(body), 9):
            out.extend(int(body[i:i + 9]).to_bytes(4, "big"))
        if tail:
            out.extend(int(tail).to_bytes(
                _DEC_LEFTOVER_BYTES[rem], "big"))

    write_digits(ip, lead_partial=True)
    if scale:
        write_digits(fp, lead_partial=False)
    out[0] ^= 0x80
    if negative:
        out = bytearray(x ^ 0xFF for x in out)
    return bytes(out)


def _decode_datetime2(raw5: bytes, frac: bytes, fsp: int) -> str:
    """DATETIME2 (docs "Date and Time Data Type Representation"): 40-bit
    big-endian packed fields — 1 sign bit (always set for valid dates),
    17 bits year*13+month, 5 bits day, 5 bits hour, 6 bits minute,
    6 bits second — plus ceil(fsp/2) bytes of fractional seconds in
    units of 10^-fsp s."""
    v = int.from_bytes(raw5, "big")
    ym = (v >> 22) & 0x1FFFF
    year, month = divmod(ym, 13)
    day = (v >> 17) & 0x1F
    hour = (v >> 12) & 0x1F
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    s = f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"
    if fsp:
        micros = int.from_bytes(frac, "big") * 10 ** (6 - fsp)
        s += f".{micros:06d}"
    return s


def _encode_datetime2(dt, fsp: int) -> bytes:
    ym = dt.year * 13 + dt.month
    v = (1 << 39) | (ym << 22) | (dt.day << 17) | (dt.hour << 12) \
        | (dt.minute << 6) | dt.second
    out = v.to_bytes(5, "big")
    if fsp:
        frac = dt.microsecond // 10 ** (6 - fsp)
        out += frac.to_bytes((fsp + 1) // 2, "big")
    return out


def _read_value(buf: io.BytesIO, col_type: int, meta: bytes):
    if col_type == MYSQL_TYPE_LONG:
        return struct.unpack("<i", buf.read(4))[0]
    if col_type == MYSQL_TYPE_LONGLONG:
        return struct.unpack("<q", buf.read(8))[0]
    if col_type == MYSQL_TYPE_FLOAT:
        return struct.unpack("<f", buf.read(4))[0]
    if col_type == MYSQL_TYPE_DOUBLE:
        return struct.unpack("<d", buf.read(8))[0]
    if col_type == MYSQL_TYPE_VARCHAR:
        (max_len,) = struct.unpack("<H", meta)
        if max_len > 255:
            (ln,) = struct.unpack("<H", buf.read(2))
        else:
            ln = buf.read(1)[0]
        return buf.read(ln).decode("utf-8")
    if col_type == MYSQL_TYPE_NEWDECIMAL:
        precision, scale = meta[0], meta[1]
        n = _dec_bytes(precision - scale) + _dec_bytes(scale)
        return _decode_newdecimal(buf.read(n), precision, scale)
    if col_type == MYSQL_TYPE_DATETIME2:
        fsp = meta[0]
        raw5 = buf.read(5)
        frac = buf.read((fsp + 1) // 2) if fsp else b""
        return _decode_datetime2(raw5, frac, fsp)
    raise ValueError(f"unsupported mysql column type {col_type}")


def _read_row(buf: io.BytesIO, cols: list[tuple[int, bytes]],
              present: bytes) -> list:
    n_present = sum(1 for i in range(len(cols))
                    if _bitmap_get(present, i))
    null_bm = buf.read((n_present + 7) // 8)
    vals = []
    j = 0
    for i, (ctype, meta) in enumerate(cols):
        if not _bitmap_get(present, i):
            vals.append(None)
            continue
        if _bitmap_get(null_bm, j):
            vals.append(None)
        else:
            vals.append(_read_value(buf, ctype, meta))
        j += 1
    return vals


class WireFormatError(ValueError):
    """Malformed binlog bytes — raised (never a bare struct.error /
    IndexError / UnicodeDecodeError escaping) so a consumer can fail one
    segment loudly and deliberately."""


def parse_binlog(data: bytes) -> list[dict]:
    """Parse one binlog blob (with or without the file magic) into a
    list of tagged event dicts — pure function, runs on executors.
    Malformed bytes raise :class:`WireFormatError`."""
    try:
        return _parse_binlog(data)
    except WireFormatError:
        raise
    except (struct.error, IndexError, KeyError, UnicodeDecodeError,
            EOFError, OverflowError) as e:
        raise WireFormatError(f"malformed binlog blob: {e}") from e


def _parse_binlog(data: bytes) -> list[dict]:
    pos = 0
    if data[:4] == MAGIC:
        pos = 4
    table_cols: dict[int, list[tuple[int, bytes]]] = {}
    table_names: dict[int, tuple[str, str]] = {}
    events: list[dict] = []
    while pos + HEADER_LEN <= len(data):
        ts, etype, server_id, esize, log_pos, flags = struct.unpack(
            "<IBIIIH", data[pos:pos + HEADER_LEN])
        if esize < HEADER_LEN:
            # a zero/short event_size would loop forever
            raise WireFormatError(
                f"event_size {esize} < header length at offset {pos}")
        body = data[pos + HEADER_LEN:pos + esize]
        pos += esize
        buf = io.BytesIO(body)
        if etype == FORMAT_DESCRIPTION_EVENT:
            (binlog_version,) = struct.unpack("<H", buf.read(2))
            server_version = buf.read(50).rstrip(b"\x00").decode()
            events.append({"kind": "format_description",
                           "binlog_version": binlog_version,
                           "server_version": server_version,
                           "log_pos": log_pos})
            if binlog_version != 4:
                raise ValueError(
                    f"unsupported binlog version {binlog_version}")
        elif etype == ROTATE_EVENT:
            (position,) = struct.unpack("<Q", buf.read(8))
            events.append({"kind": "rotate", "position": position,
                           "next_log": buf.read().decode(),
                           "log_pos": log_pos})
        elif etype == XID_EVENT:
            (xid,) = struct.unpack("<Q", buf.read(8))
            events.append({"kind": "xid", "xid": xid,
                           "log_pos": log_pos})
        elif etype == GTID_LOG_EVENT:
            # Gtid_log_event: u8 flags, 16-byte SID (server UUID),
            # u64le GNO (transaction number); 5.7+ logical timestamps
            # follow and are ignored here
            (gflags,) = struct.unpack("<B", buf.read(1))
            sid = buf.read(16)
            (gno,) = struct.unpack("<q", buf.read(8))
            u = sid.hex()
            uuid_str = (f"{u[0:8]}-{u[8:12]}-{u[12:16]}-"
                        f"{u[16:20]}-{u[20:32]}")
            events.append({"kind": "gtid", "flags": gflags,
                           "sid": uuid_str, "gno": gno,
                           "log_pos": log_pos})
        elif etype == TABLE_MAP_EVENT:
            table_id = int.from_bytes(buf.read(6), "little")
            buf.read(2)  # flags
            slen = buf.read(1)[0]
            schema = buf.read(slen).decode()
            buf.read(1)  # NUL
            tlen = buf.read(1)[0]
            table = buf.read(tlen).decode()
            buf.read(1)  # NUL
            ncols = _read_lenenc(buf)
            ctypes = list(buf.read(ncols))
            _read_lenenc(buf)  # metadata block length
            cols = []
            for ct in ctypes:
                nb = _METADATA_BYTES.get(ct)
                if nb is None:
                    raise ValueError(f"unsupported column type {ct}")
                if ct == MYSQL_TYPE_FLOAT or ct == MYSQL_TYPE_DOUBLE:
                    meta = buf.read(1)
                else:
                    meta = buf.read(nb)
                cols.append((ct, meta))
            table_cols[table_id] = cols
            table_names[table_id] = (schema, table)
            events.append({"kind": "table_map", "table_id": table_id,
                           "schema": schema, "table": table,
                           "column_types": ctypes, "log_pos": log_pos})
        elif etype in (WRITE_ROWS_EVENT_V2, UPDATE_ROWS_EVENT_V2,
                       DELETE_ROWS_EVENT_V2):
            table_id = int.from_bytes(buf.read(6), "little")
            buf.read(2)  # flags
            (extra_len,) = struct.unpack("<H", buf.read(2))
            buf.read(extra_len - 2)
            width = _read_lenenc(buf)
            bm_len = (width + 7) // 8
            present1 = buf.read(bm_len)
            present2 = (buf.read(bm_len)
                        if etype == UPDATE_ROWS_EVENT_V2 else None)
            cols = table_cols[table_id]
            rows = []
            while buf.tell() < len(body):
                mark = buf.tell()
                if etype == UPDATE_ROWS_EVENT_V2:
                    before = _read_row(buf, cols, present1)
                    after = _read_row(buf, cols, present2)
                    rows.append((before, after))
                else:
                    rows.append(_read_row(buf, cols, present1))
                if buf.tell() == mark:
                    # a zero-width row (malformed width/bitmaps) would
                    # loop forever — caught by the wire fuzz tests
                    raise WireFormatError(
                        "rows event makes no byte progress")
            kind = {WRITE_ROWS_EVENT_V2: "write_rows",
                    UPDATE_ROWS_EVENT_V2: "update_rows",
                    DELETE_ROWS_EVENT_V2: "delete_rows"}[etype]
            schema, table = table_names[table_id]
            events.append({"kind": kind, "table_id": table_id,
                           "schema": schema, "table": table,
                           "rows": rows, "log_pos": log_pos,
                           "timestamp": ts})
        else:
            events.append({"kind": "unknown", "type": etype,
                           "log_pos": log_pos})
    return events


# -- fixture encoder ----------------------------------------------------------

def _event(etype: int, body: bytes, log_pos: int, ts: int = 0,
           server_id: int = 1) -> bytes:
    size = HEADER_LEN + len(body)
    return struct.pack("<IBIIIH", ts, etype, server_id, size,
                       log_pos, 0) + body


def encode_fde(log_pos: int = 120) -> bytes:
    body = struct.pack("<H", 4) + b"8.0.0".ljust(50, b"\x00")
    body += struct.pack("<I", 0) + bytes([HEADER_LEN])
    body += bytes(38)  # post-header length table (loosely parsed)
    return _event(FORMAT_DESCRIPTION_EVENT, body, log_pos)


def _col_meta(col: tuple[int, object]) -> bytes:
    ctype, arg = col
    if ctype == MYSQL_TYPE_VARCHAR:
        return struct.pack("<H", arg or 255)
    if ctype in (MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE):
        return bytes([4 if ctype == MYSQL_TYPE_FLOAT else 8])
    if ctype == MYSQL_TYPE_NEWDECIMAL:
        precision, scale = arg  # type: ignore[misc]
        return bytes([precision, scale])
    if ctype == MYSQL_TYPE_DATETIME2:
        return bytes([arg or 0])  # type: ignore[list-item]
    return b""


def encode_table_map(table_id: int, schema: str, table: str,
                     cols: list[tuple[int, int | None]],
                     log_pos: int) -> bytes:
    body = table_id.to_bytes(6, "little") + struct.pack("<H", 1)
    body += bytes([len(schema)]) + schema.encode() + b"\x00"
    body += bytes([len(table)]) + table.encode() + b"\x00"
    body += _lenenc(len(cols)) + bytes(c for c, _ in cols)
    meta = b"".join(_col_meta(c) for c in cols)
    body += _lenenc(len(meta)) + meta
    body += bytes((len(cols) + 7) // 8)  # nullability bitmap
    return _event(TABLE_MAP_EVENT, body, log_pos)


def _encode_value(v, col: tuple[int, int | None]) -> bytes:
    ctype, arg = col
    if ctype == MYSQL_TYPE_LONG:
        return struct.pack("<i", v)
    if ctype == MYSQL_TYPE_LONGLONG:
        return struct.pack("<q", v)
    if ctype == MYSQL_TYPE_FLOAT:
        return struct.pack("<f", v)
    if ctype == MYSQL_TYPE_DOUBLE:
        return struct.pack("<d", v)
    if ctype == MYSQL_TYPE_VARCHAR:
        b = v.encode("utf-8")
        if (arg or 255) > 255:
            return struct.pack("<H", len(b)) + b
        return bytes([len(b)]) + b
    if ctype == MYSQL_TYPE_NEWDECIMAL:
        precision, scale = arg  # type: ignore[misc]
        return _encode_newdecimal(v, precision, scale)
    if ctype == MYSQL_TYPE_DATETIME2:
        return _encode_datetime2(v, arg or 0)  # type: ignore[arg-type]
    raise ValueError(f"unsupported column type {ctype}")


def _encode_row(vals, cols) -> bytes:
    nbm = bytearray((len(cols) + 7) // 8)
    out = b""
    for i, (v, c) in enumerate(zip(vals, cols)):
        if v is None:
            nbm[i // 8] |= 1 << (i % 8)
        else:
            out += _encode_value(v, c)
    return bytes(nbm) + out


def _rows_event(etype: int, table_id: int, cols, rows_blob: bytes,
                log_pos: int, n_images: int = 1) -> bytes:
    body = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
    body += struct.pack("<H", 2)  # extra_data_len (self-inclusive)
    body += _lenenc(len(cols))
    present = bytes([0xFF] * ((len(cols) + 7) // 8))
    body += present * n_images
    return _event(etype, body + rows_blob, log_pos)


def encode_write_rows(table_id: int, cols, rows, log_pos: int) -> bytes:
    blob = b"".join(_encode_row(r, cols) for r in rows)
    return _rows_event(WRITE_ROWS_EVENT_V2, table_id, cols, blob, log_pos)


def encode_delete_rows(table_id: int, cols, rows, log_pos: int) -> bytes:
    blob = b"".join(_encode_row(r, cols) for r in rows)
    return _rows_event(DELETE_ROWS_EVENT_V2, table_id, cols, blob,
                       log_pos)


def encode_update_rows(table_id: int, cols, pairs, log_pos: int) -> bytes:
    blob = b"".join(_encode_row(b, cols) + _encode_row(a, cols)
                    for b, a in pairs)
    return _rows_event(UPDATE_ROWS_EVENT_V2, table_id, cols, blob,
                       log_pos, n_images=2)


def encode_xid(xid: int, log_pos: int) -> bytes:
    return _event(XID_EVENT, struct.pack("<Q", xid), log_pos)


def encode_gtid(sid_uuid: str, gno: int, log_pos: int) -> bytes:
    sid = bytes.fromhex(sid_uuid.replace("-", ""))
    return _event(GTID_LOG_EVENT,
                  struct.pack("<B", 1) + sid + struct.pack("<q", gno),
                  log_pos)


def gtid_set_from_events(events: list[dict]) -> str:
    """Fold the GTID events of a parsed segment into a GTID-set string
    (``uuid:a-b[:c-d...][,uuid2:...]``) — the resume token a
    ``scan.startup.mode=specific-offset`` startup pins
    (MySqlDataSourceOptions.java:123 surface; the polling source's
    ``resume_from_offset`` consumes the same shape). Contiguous GNO runs
    merge into intervals, like a real @@gtid_executed."""
    by_sid: dict[str, list[int]] = {}
    for e in events:
        if e["kind"] == "gtid":
            by_sid.setdefault(e["sid"], []).append(e["gno"])
    parts = []
    for sid in sorted(by_sid):
        gnos = sorted(set(by_sid[sid]))
        ivals = []
        lo = hi = gnos[0]
        for g in gnos[1:]:
            if g == hi + 1:
                hi = g
            else:
                ivals.append((lo, hi))
                lo = hi = g
        ivals.append((lo, hi))
        parts.append(sid + ":" + ":".join(
            f"{a}-{b}" if a != b else str(a) for a, b in ivals))
    return ",".join(parts)


# -- distributed decode into the standard changelog ---------------------------

def decode_binlog(df: DataFrame, payload_schema: T.StructType,
                  blob_col: str = "value",
                  table: str | None = None) -> DataFrame:
    """(binlog-blob) frame → +I/-U/+U/-D changelog. One blob (a file or
    a contiguous event run starting with its FORMAT_DESCRIPTION +
    TABLE_MAPs) per input row; the byte parse runs Arrow-batched on
    executors. ``__seq`` = log_pos·2 (+1 for after-images) — the same
    LWW bias as the Debezium/pgoutput decodes. ``table`` filters to one
    table when a blob carries several."""
    from pyspark.sql import functions as F

    names = [f.name for f in payload_schema.fields]
    out_schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
        + [T.StructField(OP_COLUMN, T.StringType()),
           T.StructField("__pos", T.LongType()),
           T.StructField("__after", T.IntegerType())])

    def fmt(v):
        return None if v is None else str(v)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for e in parse_binlog(bytes(blob)):
                    if table is not None and e.get("table") not in (
                            None, table):
                        continue
                    pos = e["log_pos"]
                    if e["kind"] == "write_rows":
                        for r in e["rows"]:
                            rows.append([*map(fmt, r), "+I", pos, 1])
                    elif e["kind"] == "delete_rows":
                        for r in e["rows"]:
                            rows.append([*map(fmt, r), "-D", pos, 1])
                    elif e["kind"] == "update_rows":
                        for before, after in e["rows"]:
                            rows.append([*map(fmt, before), "-U", pos, 0])
                            rows.append([*map(fmt, after), "+U", pos, 1])
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in out_schema.fields])

    raw = df.mapInPandas(decode, out_schema)
    casted = [F.col(f.name).cast(f.dataType).alias(f.name)
              for f in payload_schema.fields]
    return raw.select(
        *casted,
        F.col(OP_COLUMN),
        (F.col("__pos") * 2 + F.col("__after")).cast("long")
        .alias(SEQ_COLUMN))


_BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                       "length long, content binary")


def binlog_file_stream(spark, path: str, payload_schema: T.StructType,
                       table: str | None = None,
                       reader_options: dict | None = None) -> DataFrame:
    """File-backed binlog STREAM — the hermetic stand-in for a live
    COM_BINLOG_DUMP connection: each binary file under ``path`` is one
    contiguous binlog segment (magic + FDE + TABLE_MAP + row events),
    picked up by Spark's binaryFile streaming source and decoded by
    :func:`decode_binlog` on executors. The decode path is byte-for-byte
    the one a live tail would use; only the socket is missing."""
    from pyspark.sql import functions as F

    reader = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA))
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)  # e.g. maxFilesPerTrigger=1
    raw = reader.load(path).select(F.col("content").alias("value"))
    return decode_binlog(raw, payload_schema, table=table)
