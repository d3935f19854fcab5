"""Postgres replication client proven against an in-process fake
walsender speaking protocol v3 bytes: startup → md5 auth (verified
server-side) → START_REPLICATION → XLogData stream (+ keepalive
round-trip) → pgoutput decode."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from flink_cdc_dsql_master_spark.pgoutput import (WireFormatError,
                                                  encode_commit,
                                                  encode_begin,
                                                  encode_insert,
                                                  encode_relation,
                                                  parse_message)
from flink_cdc_dsql_master_spark.pgoutput_client import (
    PgReplicationClient, lsn_str, md5_auth_response, read_message,
    send_message)

USER, PASSWORD, SALT = "repl", "s3cret", b"\x01\x02\x03\x04"


class FakeWalsender(threading.Thread):
    def __init__(self, msgs: list[tuple[int, bytes]],
                 password: str = PASSWORD):
        super().__init__(daemon=True)
        self.msgs = msgs
        self.password = password
        self.listener = socket.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.auth_ok = None
        self.saw_keepalive_reply = False
        self.query = None

    def run(self):
        conn, _ = self.listener.accept()
        try:
            # startup message (untagged)
            (ln,) = struct.unpack(">i", conn.recv(4))
            body = b""
            while len(body) < ln - 4:
                body += conn.recv(ln - 4 - len(body))
            (proto,) = struct.unpack(">i", body[:4])
            assert proto == 196608
            assert b"replication\x00database\x00" in body
            # demand md5 auth
            send_message(conn, b"R", struct.pack(">i", 5) + SALT)
            tag, resp = read_message(conn)
            assert tag == b"p"
            expect = md5_auth_response(USER, self.password, SALT)
            self.auth_ok = resp == expect
            if not self.auth_ok:
                send_message(conn, b"E", b"FATAL: password failed\x00")
                return
            send_message(conn, b"R", struct.pack(">i", 0))      # ok
            send_message(conn, b"S", b"server_version\x0016.0\x00")
            send_message(conn, b"K", struct.pack(">ii", 7, 42))
            send_message(conn, b"Z", b"I")
            # START_REPLICATION
            tag, q = read_message(conn)
            assert tag == b"Q"
            self.query = q.rstrip(b"\x00").decode()
            send_message(conn, b"W", b"\x00\x00\x00")
            # keepalive requesting a reply
            send_message(conn, b"d", b"k" + struct.pack(">qq", 100, 0)
                         + b"\x01")
            tag, reply = read_message(conn)
            self.saw_keepalive_reply = (tag == b"d"
                                        and reply[:1] == b"r")
            for lsn, m in self.msgs:
                send_message(conn, b"d", b"w"
                             + struct.pack(">qqq", lsn, lsn, 0) + m)
            send_message(conn, b"c", b"")
        finally:
            conn.close()
            self.listener.close()


def _msgs():
    rel = encode_relation(5, "public", "t",
                          [("k", True, 20), ("v", False, 25)])
    return [(1, encode_begin(10, 0, 9)), (1, rel),
            (2, encode_insert(5, ["1", "a"])),
            (3, encode_insert(5, ["2", None])),
            (4, encode_commit(10, 11, 0))]


def test_pg_client_full_protocol_roundtrip():
    srv = FakeWalsender(_msgs())
    srv.start()
    cli = PgReplicationClient(
        lambda: socket.create_connection(("127.0.0.1", srv.port)),
        user=USER, password=PASSWORD)
    params = cli.connect()
    assert params["server_version"] == "16.0"
    got = list(cli.start_replication("cdc_slot", "pub1", start_lsn=0))
    cli.close()
    srv.join(5)
    assert srv.auth_ok is True
    assert srv.saw_keepalive_reply is True
    assert "START_REPLICATION SLOT cdc_slot LOGICAL 0/0" in srv.query
    kinds = [parse_message(m)["kind"] for _, m in got]
    assert kinds == ["begin", "relation", "insert", "insert", "commit"]
    assert parse_message(got[2][1])["new"] == ["1", "a"]


def test_pg_client_bad_password():
    srv = FakeWalsender(_msgs())
    srv.start()
    cli = PgReplicationClient(
        lambda: socket.create_connection(("127.0.0.1", srv.port)),
        user=USER, password="wrong")
    with pytest.raises(WireFormatError, match="password failed"):
        cli.connect()
    cli.close()
    srv.join(5)
    assert srv.auth_ok is False


def test_lsn_formatting():
    assert lsn_str(0) == "0/0"
    assert lsn_str((0x16 << 32) | 0xB374D848) == "16/B374D848"
