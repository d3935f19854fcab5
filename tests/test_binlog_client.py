"""MySQL replication client proven against an in-process FAKE server
speaking the real client/server protocol bytes: handshake v10 → auth
(mysql_native_password verified server-side) → COM_REGISTER_SLAVE →
COM_BINLOG_DUMP → one-event-per-packet stream → binlog.parse_binlog."""

from __future__ import annotations

import hashlib
import socket
import struct
import threading

import pytest

from flink_cdc_dsql_master_spark.binlog import (MYSQL_TYPE_LONGLONG,
                                                MYSQL_TYPE_VARCHAR,
                                                WireFormatError,
                                                encode_fde,
                                                encode_table_map,
                                                encode_write_rows,
                                                encode_xid)
from flink_cdc_dsql_master_spark.binlog_client import (
    BinlogClient, build_handshake_response, decode_handshake_v10,
    native_password_scramble, read_packet, write_packet)

from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer as _F
SCRAMBLE = _F.SCRAMBLE  # 20 deterministic bytes
USER, PASSWORD = "repl", "s3cret"


def _handshake_v10_payload() -> bytes:
    """Spec-shaped HandshakeV10: proto 10, version cstr, thread id,
    8-byte auth part 1, filler, caps low, charset, status, caps high,
    auth len, 10 reserved, 13-byte auth part 2 (12 + NUL), plugin."""
    caps = 0x00000001 | 0x00000200 | 0x00008000 | 0x00080000
    out = bytes([10]) + b"8.0.0-fake\x00"
    out += struct.pack("<I", 99)
    out += SCRAMBLE[:8] + b"\x00"
    out += struct.pack("<H", caps & 0xFFFF)
    out += bytes([0x21]) + struct.pack("<H", 2)
    out += struct.pack("<H", caps >> 16)
    out += bytes([21])          # auth data len (20 + NUL)
    out += bytes(10)
    out += SCRAMBLE[8:] + b"\x00"
    out += b"mysql_native_password\x00"
    return out


COLS = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 10)]


def _event_stream() -> list[bytes]:
    return [encode_fde(120),
            encode_table_map(5, "db", "t", COLS, 200),
            encode_write_rows(5, COLS, [[1, "a"], [2, "b"]], 300),
            encode_xid(7, 400)]


def test_client_full_protocol_roundtrip():
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    events = _event_stream()
    srv = FakeMySQLReplicaServer(events, username=USER,
                                 password=PASSWORD).start()
    cli = BinlogClient(
        lambda: socket.create_connection(("127.0.0.1", srv.port)),
        username=USER, password=PASSWORD, server_id=3)
    hs = cli.connect()
    assert hs["server_version"] == "8.0.0-fake"
    assert hs["auth_plugin"] == "mysql_native_password"
    assert hs["scramble"] == SCRAMBLE
    parsed = list(cli.events(log_file="binlog.000001", log_pos=4))
    cli.close()
    srv.join(5)
    assert srv.auth_ok is True
    assert "master_binlog_checksum" in srv.checksum_query
    # a real dump always leads with the artificial pre-FDE ROTATE
    assert [e["kind"] for e in parsed] == [
        "rotate", "format_description", "table_map", "write_rows",
        "xid"]
    assert parsed[3]["rows"] == [[1, "a"], [2, "b"]]


def test_client_rejected_on_bad_password():
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    srv = FakeMySQLReplicaServer(_event_stream(), username=USER,
                                 password=PASSWORD).start()
    cli = BinlogClient(
        lambda: socket.create_connection(("127.0.0.1", srv.port)),
        username=USER, password="wrong")
    with pytest.raises(WireFormatError, match="Access denied"):
        cli.connect()
    cli.close()
    srv.join(5)
    assert srv.auth_ok is False


def test_scramble_is_sha1_composition():
    """mysql_native_password pinned to its published definition,
    computed independently here."""
    h1 = hashlib.sha1(PASSWORD.encode()).digest()
    expect = bytes(a ^ b for a, b in zip(
        h1, hashlib.sha1(SCRAMBLE + hashlib.sha1(h1).digest()).digest()))
    assert native_password_scramble(PASSWORD, SCRAMBLE) == expect
    assert native_password_scramble("", SCRAMBLE) == b""


def test_handshake_decode_golden():
    hs = decode_handshake_v10(_handshake_v10_payload())
    assert hs["thread_id"] == 99 and hs["status"] == 2
    assert hs["scramble"] == SCRAMBLE
    resp = build_handshake_response(USER, PASSWORD, hs["scramble"])
    # 23 reserved zeros at offset 9, username follows
    assert resp[9:32] == bytes(23)
    assert resp[32:].startswith(USER.encode() + b"\x00")
    assert resp.endswith(b"mysql_native_password\x00")
