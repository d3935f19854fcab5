"""CA trust chains — the last TLS "environment residue" (VERDICT r10
"what's missing" #4): both clients run their full stock-deployment
chains against a server certificate SIGNED BY A PRIVATE CA, with the
client VALIDATING the chain (verify-ca) and the hostname (verify-full),
and failing loudly on an untrusted chain or a name mismatch — never a
silent downgrade. Reference behavior: the MySQL/Postgres sources expose
the drivers' ssl-mode / sslmode options verbatim
(flink-cdc-pipeline-connector-mysql MySqlDataSourceOptions,
postgres sources' jdbc properties); verify-full here is libpq's
``sslmode=verify-full`` / MySQL's ``--ssl-mode=VERIFY_IDENTITY``."""

from __future__ import annotations

import socket as socketlib
import ssl

import pytest


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


def test_pg_verify_full_end_to_end():
    """sslmode=verify-full: CA-signed server cert, client validates the
    chain against the CA bundle AND the 'localhost' SAN, then SCRAM and
    the COPY-BOTH stream over the verified channel."""
    from flink_cdc_dsql_master_spark.pgoutput_client import (
        PgReplicationClient, verifying_tls_context)
    from flink_cdc_dsql_master_spark.testing import (
        FakeWalsenderServer, ca_signed_server_context)

    srv_ctx, ca_pem = ca_signed_server_context()
    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram",
                              tls=True, server_ssl_context=srv_ctx
                              ).start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem),
        tls_hostname="localhost")
    cli.connect()
    stream = list(cli.start_replication("slot1", "pub1"))
    cli.close()
    srv.join(10)
    assert srv.tls_established is True
    assert srv.auth_ok is True
    assert len(stream) == 5


def test_pg_untrusted_chain_fails_loudly():
    """A self-signed server cert against a verifying client must fail
    the handshake (certificate verify failed), before any credential
    leaves the client."""
    from flink_cdc_dsql_master_spark.pgoutput_client import (
        PgReplicationClient, verifying_tls_context)
    from flink_cdc_dsql_master_spark.testing import (
        FakeWalsenderServer, ca_signed_server_context)

    _, ca_pem = ca_signed_server_context()
    # server presents the SELF-SIGNED cert — not in the CA bundle
    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram",
                              tls=True).start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem),
        tls_hostname="localhost")
    with pytest.raises(ssl.SSLCertVerificationError):
        cli.connect()
    cli.close()
    assert srv.auth_ok is None  # no credential ever reached the server


def test_pg_hostname_mismatch_fails_loudly():
    """verify-full rejects a chain-valid cert whose SAN does not match
    the expected hostname; verify-ca (check_hostname=False) accepts the
    same connection — the libpq mode split, pinned."""
    from flink_cdc_dsql_master_spark.pgoutput_client import (
        PgReplicationClient, verifying_tls_context)
    from flink_cdc_dsql_master_spark.testing import (
        FakeWalsenderServer, ca_signed_server_context)

    srv_ctx, ca_pem = ca_signed_server_context()
    srv = FakeWalsenderServer(_wal_msgs(), username="repl",
                              password="s3cret", auth="scram",
                              tls=True, server_ssl_context=srv_ctx
                              ).start()
    cli = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        user="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem),
        tls_hostname="db.prod.example")  # cert says 'localhost'
    with pytest.raises(ssl.SSLCertVerificationError):
        cli.connect()
    cli.close()

    # verify-ca: same wrong name, chain check only → succeeds
    srv2 = FakeWalsenderServer(_wal_msgs(), username="repl",
                               password="s3cret", auth="scram",
                               tls=True, server_ssl_context=srv_ctx
                               ).start()
    cli2 = PgReplicationClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv2.port)),
        user="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem,
                                          check_hostname=False),
        tls_hostname="db.prod.example")
    cli2.connect()
    stream = list(cli2.start_replication("slot1", "pub1"))
    cli2.close()
    srv2.join(10)
    assert srv2.tls_established is True and len(stream) == 5


def test_mysql_verify_full_end_to_end():
    """--ssl-mode=VERIFY_IDENTITY over the stock-MySQL-8 stack:
    CA-verified TLS upgrade, caching_sha2 over the verified channel,
    CRC32-checksummed dump decoded streaming."""
    from flink_cdc_dsql_master_spark.binlog import (checksum_stream,
                                                    crc32_frame,
                                                    encode_fde)
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        verifying_tls_context
    from flink_cdc_dsql_master_spark.testing import (
        FakeMySQLReplicaServer, ca_signed_server_context)

    srv_ctx, ca_pem = ca_signed_server_context()
    plain = _mysql_events()
    events = [encode_fde(checksum_alg=1)] + \
        [crc32_frame(e) for e in plain[1:]]
    srv = FakeMySQLReplicaServer(
        events, username="repl", password="s3cret",
        auth_plugin="caching_sha2_password", serve_checksummed=True,
        tls=True, server_ssl_context=srv_ctx).start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem),
        tls_hostname="localhost")
    cli.connect()
    parsed = list(cli.events())
    cli.close()
    srv.join(10)
    assert srv.tls_established is True
    assert srv.auth_ok is True
    assert [e["kind"] for e in parsed] == [
        "rotate", "format_description", "table_map", "write_rows",
        "xid"]


def test_mysql_untrusted_chain_fails_loudly():
    """Verifying MySQL client against a self-signed server: handshake
    fails with certificate-verify, no HandshakeResponse (credentials)
    is ever sent."""
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.pgoutput_client import \
        verifying_tls_context
    from flink_cdc_dsql_master_spark.testing import (
        FakeMySQLReplicaServer, ca_signed_server_context)

    _, ca_pem = ca_signed_server_context()
    srv = FakeMySQLReplicaServer(_mysql_events(), username="repl",
                                 password="s3cret", tls=True).start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret", tls=True,
        ssl_context=verifying_tls_context(ca_pem),
        tls_hostname="localhost")
    with pytest.raises(ssl.SSLCertVerificationError):
        cli.connect()
    cli.close()
    assert srv.auth_ok is None
