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

USER, PASSWORD = "repl", "s3cret"
from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer as _W
SALT = _W.SALT


def _msgs():
    rel = encode_relation(5, "public", "t",
                          [("k", True, 20), ("v", False, 25)])
    return [(1, encode_begin(10, 0, 9)), (1, rel),
            (2, encode_insert(5, ["1", "a"])),
            (3, encode_insert(5, ["2", None])),
            (4, encode_commit(10, 11, 0))]


def test_pg_client_full_protocol_roundtrip():
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_msgs(), username=USER,
                              password=PASSWORD).start()
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
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_msgs(), username=USER,
                              password=PASSWORD).start()
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
