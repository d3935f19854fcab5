"""SCRAM-SHA-256 (Postgres) and caching_sha2_password (MySQL 8 default)
against the fake servers (VERDICT r9 next-round #5) — the last
non-TLS-bound auth variants, proven over real sockets with server-side
verification."""

from __future__ import annotations

import socket as socketlib

import pytest


# -- SCRAM-SHA-256 primitives (RFC 7677 §3 test vector) ------------------------

def test_scram_rfc7677_test_vector():
    """The published SCRAM-SHA-256 example: user/pencil, the exact
    nonces and salt from RFC 7677 §3 — our proof must match the RFC's
    byte-for-byte."""
    import base64

    from flink_cdc_dsql_master_spark.pgoutput_client import (
        scram_client_proof, scram_verify_client_proof)

    client_first_bare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = ("r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
                    "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    without_proof = ("c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)"
                     "hNlF$k0")
    auth_message = ",".join([client_first_bare, server_first,
                             without_proof])
    salt = base64.b64decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    proof, server_sig = scram_client_proof("pencil", salt, 4096,
                                           auth_message)
    assert base64.b64encode(proof).decode() == \
        "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    assert base64.b64encode(server_sig).decode() == \
        "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
    assert scram_verify_client_proof("pencil", salt, 4096,
                                     auth_message, proof)
    assert not scram_verify_client_proof("wrong", salt, 4096,
                                         auth_message, proof)


def _wal_msgs():
    from flink_cdc_dsql_master_spark.pgoutput import (encode_begin,
                                                      encode_commit,
                                                      encode_insert,
                                                      encode_relation)

    oid = 555
    return [(10, encode_begin(10, 0, 1)),
            (10, encode_relation(oid, "public", "t",
                                 [("k", True, 20), ("v", False, 25)])),
            (11, encode_insert(oid, ["1", "a"])),
            (12, encode_insert(oid, ["2", "b"])),
            (13, encode_commit(13, 14, 0))]


def test_pg_client_scram_end_to_end():
    """Full socket chain under SCRAM: mechanism negotiation,
    client-proof verified server-side against the stored key, server
    signature verified client-side, then the COPY-BOTH stream."""
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        PgReplicationClient
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram").start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="s3cret")
    params = cli.connect()
    assert params["server_version"] == "16.0"
    stream = list(cli.start_replication("slot1", "pub1"))
    cli.close()
    srv.join(5)
    assert srv.auth_ok is True
    assert srv.saw_keepalive_reply
    assert len(stream) == 5


def test_pg_client_scram_wrong_password_rejected():
    from flink_cdc_dsql_master_spark.pgoutput import WireFormatError
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        PgReplicationClient
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram").start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="nope")
    with pytest.raises(WireFormatError, match="SCRAM"):
        cli.connect()
    cli.close()
    srv.join(5)
    assert srv.auth_ok is False


# -- caching_sha2_password ------------------------------------------------------

def test_caching_sha2_scramble_shape():
    """XOR(SHA256(pw), SHA256(SHA256(SHA256(pw)) || nonce)) — verify
    against an independent recomputation, and empty-password → empty."""
    import hashlib

    from flink_cdc_dsql_master_spark.binlog_client import \
        caching_sha2_scramble

    nonce = bytes(range(1, 21))
    got = caching_sha2_scramble("pw", nonce)
    h1 = hashlib.sha256(b"pw").digest()
    expect = bytes(a ^ b for a, b in zip(
        h1, hashlib.sha256(hashlib.sha256(h1).digest() + nonce).digest()))
    assert got == expect and len(got) == 32
    assert caching_sha2_scramble("", nonce) == b""


def _mysql_events():
    from flink_cdc_dsql_master_spark.binlog import (MYSQL_TYPE_LONG,
                                                    MYSQL_TYPE_VARCHAR,
                                                    encode_fde,
                                                    encode_table_map,
                                                    encode_write_rows,
                                                    encode_xid)

    cols = [(MYSQL_TYPE_LONG, None), (MYSQL_TYPE_VARCHAR, 10)]
    return [encode_fde(120),
            encode_table_map(5, "db", "t", cols, 200),
            encode_write_rows(5, cols, [[1, "a"]], 300),
            encode_xid(7, 400)]


def test_mysql_client_caching_sha2_end_to_end():
    """MySQL 8's default auth over the full socket chain: the server
    announces caching_sha2_password, verifies the SHA256 scramble
    server-side, replies with the fast-auth-success marker, and the
    dump proceeds."""
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    srv = FakeMySQLReplicaServer(
        _mysql_events(), username="repl", password="s3cret",
        auth_plugin="caching_sha2_password").start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret")
    hs = cli.connect()
    assert hs["auth_plugin"] == "caching_sha2_password"
    parsed = list(cli.events())
    cli.close()
    srv.join(5)
    assert srv.auth_ok is True
    assert [e["kind"] for e in parsed] == [
        "rotate", "format_description", "table_map", "write_rows",
        "xid"]


def test_mysql_client_caching_sha2_wrong_password():
    from flink_cdc_dsql_master_spark.binlog import WireFormatError
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    srv = FakeMySQLReplicaServer(
        _mysql_events(), username="repl", password="s3cret",
        auth_plugin="caching_sha2_password").start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="bad")
    with pytest.raises(WireFormatError, match="Access denied"):
        cli.connect()
    cli.close()
    srv.join(5)
    assert srv.auth_ok is False


def test_mysql_client_auth_switch_request():
    """The server announces caching_sha2 but the account uses
    mysql_native_password → AuthSwitchRequest with a FRESH nonce; the
    client re-scrambles with the requested plugin."""
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    srv = FakeMySQLReplicaServer(
        _mysql_events(), username="repl", password="s3cret",
        auth_plugin="caching_sha2_password",
        switch_to="mysql_native_password").start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret")
    cli.connect()
    parsed = list(cli.events())
    cli.close()
    srv.join(5)
    assert srv.auth_ok is True
    assert parsed[3]["rows"] == [[1, "a"]]


def test_start_replication_option_negotiation():
    """proto_version 2 + streaming/binary options render exactly as a
    PG >= 14 subscription would request them; the fake walsender
    records the query."""
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        PgReplicationClient
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="pw").start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="pw")
    cli.connect()
    list(cli.start_replication("s1", "pub1", proto_version=2,
                               streaming=True, binary=True))
    cli.close()
    srv.join(5)
    assert "proto_version '2'" in srv.query
    assert "streaming 'on'" in srv.query
    assert "binary 'true'" in srv.query


# -- TLS (the previously "sandbox-bound" delta — provable in-process) ----------

def test_pg_client_tls_scram_end_to_end():
    """sslmode=require against a TLS walsender: SSLRequest → 'S' → TLS
    handshake (self-signed server cert) → SCRAM over the encrypted
    channel → COPY-BOTH stream. The full stock-PG-16 stack."""
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        PgReplicationClient
    from flink_cdc_dsql_master_spark.testing import FakeWalsenderServer

    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram",
                              tls=True).start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="s3cret", tls=True)
    cli.connect()
    stream = list(cli.start_replication("slot1", "pub1"))
    cli.close()
    srv.join(10)
    assert srv.tls_established is True
    assert srv.auth_ok is True
    assert len(stream) == 5


def test_pg_client_tls_refused_fails_loudly():
    """A server that answers 'N' to SSLRequest (ssl = off) must fail
    the TLS-requiring client loudly, never fall back to cleartext."""
    import struct
    import threading

    from flink_cdc_dsql_master_spark.pgoutput import WireFormatError
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        PgReplicationClient

    listener = socketlib.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    port = listener.getsockname()[1]

    def refuse():
        conn, _ = listener.accept()
        conn.recv(8)  # the SSLRequest
        conn.sendall(b"N")
        conn.close()
        listener.close()

    threading.Thread(target=refuse, daemon=True).start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", port)),
        user="u", password="p", tls=True)
    with pytest.raises(WireFormatError, match="refused SSLRequest"):
        cli.connect()
    cli.close()


def test_mysql_client_tls_caching_sha2_crc32_end_to_end():
    """The complete stock-MySQL-8 stack in one chain: CLIENT_SSL
    advertised → short SSL request → TLS upgrade → caching_sha2 auth
    over the encrypted channel → checksum negotiation → CRC32-trailed
    dump, decoded streaming."""
    from flink_cdc_dsql_master_spark.binlog import (checksum_stream,
                                                    crc32_frame,
                                                    encode_fde)
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    plain = _mysql_events()
    events = [encode_fde(checksum_alg=1)] + \
        [crc32_frame(e) for e in plain[1:]]
    srv = FakeMySQLReplicaServer(
        events, username="repl", password="s3cret",
        auth_plugin="caching_sha2_password", serve_checksummed=True,
        tls=True).start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret", tls=True)
    hs = cli.connect()
    assert hs["capabilities"] & 0x0800  # server advertised CLIENT_SSL
    parsed = list(cli.events())
    cli.close()
    srv.join(10)
    assert srv.tls_established is True
    assert srv.auth_ok is True
    assert "master_binlog_checksum" in srv.checksum_query
    assert [e["kind"] for e in parsed] == [
        "rotate", "format_description", "table_map", "write_rows",
        "xid"]
    assert parsed[1]["checksum_alg"] == 1


def test_mysql_client_tls_unavailable_fails_loudly():
    """tls=True against a server without CLIENT_SSL must fail before
    sending credentials — never silently downgrade to cleartext."""
    from flink_cdc_dsql_master_spark.binlog import WireFormatError
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    srv = FakeMySQLReplicaServer(_mysql_events(), username="repl",
                                 password="pw", tls=False).start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="pw", tls=True)
    with pytest.raises(WireFormatError, match="CLIENT_SSL"):
        cli.connect()
    cli.close()
