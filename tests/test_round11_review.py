"""Round-11 second-pass review fixes: stale last_applied on DROP TABLE,
pgoutput boundary-LSN inclusivity, widened AlterColumnType types,
unknown-OID tolerance for unchanged columns, TOAST resolution across
schema epochs, CHANGE-COLUMN tails, quote-aware spec splitting, and the
RSA nonce after an AuthSwitchRequest."""

import json
import os
import socket as socketlib
import tempfile

import duckdb
import pytest
from pyspark.sql import types as T

from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_write_rows,
)
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.sinks import (JdbcUpsertSink,
                                               schema_change_ddl)

TID = TableId.parse("db.s.t")


def _duck_writer(db):
    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(df)
    return writer


def _duck_ddl(db):
    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()
    return on_ddl


# ---------------------------------------------------------------------------
# review #1: DropTableEvent must reach the sink, never stale events
# ---------------------------------------------------------------------------

def test_evolver_last_applied_on_drop_table():
    """EVOLVE forwards the drop (never stale prior events); LENIENT
    ignores table-level drops at the sink — the same tolerance that
    keeps a dropped COLUMN — so the evolved side survives while the
    original side forgets the table."""
    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    CreateTableEvent,
                                                    DropTableEvent,
                                                    TruncateTableEvent)
    from flink_cdc_dsql_master_spark.evolve import (SchemaChangeBehavior,
                                                    SchemaEvolver)
    from flink_cdc_dsql_master_spark.schema import Schema

    schema = Schema.of([("id", "BIGINT")], primary_keys=["id"])
    ev = SchemaEvolver(behavior=SchemaChangeBehavior.EVOLVE)
    ev.on_event(CreateTableEvent(TID, schema))
    ev.on_event(AddColumnEvent(TID, "v", "STRING"))
    assert [type(e).__name__ for e in ev.last_applied] == [
        "AddColumnEvent"]
    out = ev.on_event(DropTableEvent(TID))
    assert out is None
    assert [type(e).__name__ for e in ev.last_applied] == [
        "DropTableEvent"]

    lev = SchemaEvolver(behavior=SchemaChangeBehavior.LENIENT)
    lev.on_event(CreateTableEvent(TID, schema))
    lev.on_event(TruncateTableEvent(TID))
    assert lev.last_applied == []  # lenient ignores table truncates
    out = lev.on_event(DropTableEvent(TID))
    assert out is not None  # sink side survives a lenient drop
    assert lev.last_applied == []
    assert lev.manager.latest_original(TID) is None  # upstream truth


def test_binlog_drop_table_statement_reaches_sink(spark):
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_drop_tbl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols, 200)
            + encode_write_rows(42, cols, [[1, "a"]], 300)
            + encode_query("db", "DROP TABLE t", 400))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.dropt", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.dropt", "out.db.drop_tbl_sink"),),
        # EVOLVE: table-level drops forward to the sink (LENIENT
        # ignores them — pinned in test_evolver_last_applied_...)
        config={"schema.change.behavior": "EVOLVE"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    tables = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
    con.close()
    assert "drop_tbl_sink" not in tables  # the DROP landed


# ---------------------------------------------------------------------------
# review #2: the first DML at the Relation boundary LSN must not be lost
# ---------------------------------------------------------------------------

def test_pgoutput_boundary_lsn_row_lands(spark):
    """A real walsender emits the re-sent Relation and the first
    post-ALTER DML at the SAME wal_start — that row belongs to the new
    epoch and must land."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_pgoutput_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.pgoutput import (encode_frames,
                                                      encode_insert,
                                                      encode_relation)

    base = tempfile.mkdtemp(prefix="pg_boundary_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    oid = 77
    msgs = [
        (100, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("v", False, 25)])),
        (110, encode_insert(oid, ["1", "a"])),
        # ALTER upstream: Relation AND the first new-shape insert share
        # LSN 120
        (120, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("v", False, 25),
                               ("s", False, 701)])),
        (120, encode_insert(oid, ["2", "b", "2.5"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.public.bdy", "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.bdy", "out.db.bdy_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_pgoutput_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v, s FROM bdy_sink ORDER BY id"
                      ).fetchall()
    con.close()
    assert got == [(1, "a", None), (2, "b", 2.5)]


# ---------------------------------------------------------------------------
# review #5: unchanged-TOAST image in the PREVIOUS epoch must resolve
# ---------------------------------------------------------------------------

def test_toast_image_across_epoch_boundary(spark):
    """INSERT a TOASTed value, ALTER (epoch boundary), then an UPDATE
    sending 'u' for that column — the prior image is in the SAME
    micro-batch, one epoch earlier, and must resolve instead of
    erroring."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_pgoutput_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.pgoutput import (UNCHANGED,
                                                      encode_frames,
                                                      encode_insert,
                                                      encode_relation,
                                                      encode_update)

    base = tempfile.mkdtemp(prefix="pg_toast_epoch_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    oid = 77
    big = "x" * 64  # stands in for a TOASTed datum
    msgs = [
        (100, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("doc", False, 25)])),
        (110, encode_insert(oid, ["1", big])),
        (200, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("doc", False, 25),
                               ("s", False, 701)])),
        # update not touching the TOASTed column: 'u' + new col value
        (210, encode_update(oid, ["1", UNCHANGED, "9.5"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "schema": "id bigint, doc string",
            "table": "db.public.toastx", "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.toastx", "out.db.toastx_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_pgoutput_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, doc, s FROM toastx_sink").fetchall()
    con.close()
    assert got == [(1, big, 9.5)]  # TOAST value carried across the epoch


# ---------------------------------------------------------------------------
# reviews #3/#4: widened alter types; unknown OIDs on unchanged columns
# ---------------------------------------------------------------------------

def test_relation_drift_widens_not_narrows():
    from flink_cdc_dsql_master_spark.events import AlterColumnTypeEvent
    from flink_cdc_dsql_master_spark.pgoutput import relation_drift_events

    cur = T.StructType([T.StructField("d", T.DecimalType(5, 2))])
    evs = relation_drift_events(
        TID, [{"name": "d", "key": False, "type_oid": 1700,
               "typmod": ((10 << 16) | 0) + 4}], cur)
    # lattice: DECIMAL(5,2) ∨ DECIMAL(10,0) = DECIMAL(12,2) — never the
    # raw wire type, which would truncate existing 2-decimal values
    assert evs == [AlterColumnTypeEvent(TID, "d", "DECIMAL(12,2)")]


def test_relation_drift_tolerates_unknown_oid_on_unchanged_column():
    from flink_cdc_dsql_master_spark.pgoutput import relation_drift_events

    cur = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("payload", T.StringType())])
    # OID 600 (point) has no mapping — but the column is unchanged, so
    # the diff must not crash the stream (text datums never need OIDs)
    cols = [{"name": "id", "key": True, "type_oid": 20, "typmod": -1},
            {"name": "payload", "key": False, "type_oid": 600,
             "typmod": -1}]
    assert relation_drift_events(TID, cols, cur) == []
    # bytea/uuid/json now map for genuinely NEW columns
    from flink_cdc_dsql_master_spark.pgoutput import oid_type_string
    assert oid_type_string(17) == "BYTES"
    assert oid_type_string(2950) == "CHAR(36)"
    assert oid_type_string(3802) == "STRING"


# ---------------------------------------------------------------------------
# reviews #6/#8: CHANGE tails; quoted commas in DEFAULT literals
# ---------------------------------------------------------------------------

def test_change_column_with_tails_and_quoted_commas():
    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    AlterColumnTypeEvent,
                                                    RenameColumnEvent)
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    evs = parse_debezium_ddl(
        "ALTER TABLE t CHANGE COLUMN v val VARCHAR(64) NOT NULL", TID)
    assert evs == [RenameColumnEvent(TID, "v", "val"),
                   AlterColumnTypeEvent(TID, "val",
                                        "VARCHAR(64) NOT NULL")]
    evs = parse_debezium_ddl(
        "ALTER TABLE t CHANGE c c INT DEFAULT 3", TID)
    assert evs == [AlterColumnTypeEvent(TID, "c", "INT")]
    # a DEFAULT literal containing ', DROP' must not split the spec
    evs = parse_debezium_ddl(
        "ALTER TABLE t ADD c VARCHAR(40) DEFAULT 'x, DROP y', "
        "ADD d INT", TID)
    assert [(type(e).__name__, e.name) for e in evs] == [
        ("AddColumnEvent", "c"), ("AddColumnEvent", "d")]
    assert evs[0].default == "x, DROP y"


# ---------------------------------------------------------------------------
# review #9: RSA full auth after an AuthSwitchRequest uses the fresh nonce
# ---------------------------------------------------------------------------

def test_rsa_full_auth_after_auth_switch():
    from flink_cdc_dsql_master_spark.binlog import (encode_table_map as etm,
                                                    encode_write_rows as ewr,
                                                    encode_xid)
    from flink_cdc_dsql_master_spark.binlog_client import BinlogClient
    from flink_cdc_dsql_master_spark.testing import FakeMySQLReplicaServer

    cols = [(MYSQL_TYPE_LONGLONG, None)]
    events = [encode_fde(120), etm(5, "db", "t", cols, 200),
              ewr(5, cols, [[1]], 300), encode_xid(1, 400)]
    srv = FakeMySQLReplicaServer(
        events, username="repl", password="s3cret",
        auth_plugin="mysql_native_password",
        switch_to="caching_sha2_password",
        auth_cache_primed=False).start()
    cli = BinlogClient(
        lambda: socketlib.create_connection(("127.0.0.1", srv.port)),
        username="repl", password="s3cret")
    cli.connect()
    parsed = list(cli.events())
    cli.close()
    srv.join(10)
    assert srv.rsa_exchange_used is True
    assert srv.auth_ok is True  # XORed with the SWITCH nonce, not stale
    assert parsed[-1]["kind"] == "xid"


# ---------------------------------------------------------------------------
# review round 2: pg multi-table in-band, drop-and-recreate, parser gaps
# ---------------------------------------------------------------------------

def test_pgoutput_multitable_with_in_band_ddl(spark):
    """in-band-ddl + table-list on the PG side: the per-table handler's
    DATA decode must carry the pg_table filter too — a second relation
    with a different width must neither crash the width guard nor merge
    into the first table's sink."""
    from flink_cdc_dsql_master_spark.compose import compose_stream
    from flink_cdc_dsql_master_spark.pgoutput import (encode_frames,
                                                      encode_insert,
                                                      encode_relation)

    base = tempfile.mkdtemp(prefix="pg_multi_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    msgs = [
        (100, encode_relation(7, "public", "cust",
                              [("id", True, 20), ("v", False, 25)])),
        (110, encode_relation(8, "public", "ord",
                              [("id", True, 20), ("total", False, 701),
                               ("st", False, 25)])),
        (120, encode_insert(7, ["1", "a"])),
        (130, encode_insert(8, ["10", "9.5", "O"])),
        # ALTER upstream on cust only: re-sent 3-wide relation
        (140, encode_relation(7, "public", "cust",
                              [("id", True, 20), ("v", False, 25),
                               ("score", False, 701)])),
        (150, encode_insert(7, ["2", "b", "2.5"])),
        (160, encode_insert(8, ["11", "8.5", "F"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.public.pcust", "pg-table": "cust",
                 "schema": "id bigint, v string",
                 "primary-keys": ["id"]},
                {"table": "db.public.pord", "pg-table": "ord",
                 "schema": "id bigint, total double, st string",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.pcust", "out.db.pmt_cust"),
                RouteRule(r"db.public.pord", "out.db.pmt_ord")),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    cust = con.execute("SELECT id, v, score FROM pmt_cust ORDER BY id"
                       ).fetchall()
    orders = con.execute("SELECT id, total, st FROM pmt_ord ORDER BY id"
                         ).fetchall()
    con.close()
    assert cust == [(1, "a", None), (2, "b", 2.5)]
    assert orders == [(10, 9.5, "O"), (11, 8.5, "F")]


def test_binlog_drop_and_recreate_in_one_batch(spark):
    """DROP TABLE followed by CREATE TABLE in the SAME micro-batch: the
    recreated table's inserts must land (the earlier break-on-drop
    permanently lost them because the checkpoint commits past the
    file)."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_recreate_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols, 200)
            + encode_write_rows(42, cols, [[1, "old"]], 300)
            + encode_query("db", "DROP TABLE t", 400)
            + encode_query("db", "CREATE TABLE t (id BIGINT PRIMARY KEY,"
                           " v VARCHAR(20))", 500)
            + encode_table_map(43, "db", "t", cols, 600)
            + encode_write_rows(43, cols, [[7, "new"]], 700))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.recr", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.recr", "out.db.recreate_sink"),),
        config={"schema.change.behavior": "EVOLVE"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v FROM recreate_sink").fetchall()
    con.close()
    assert got == [(7, "new")]  # dropped history gone, recreated rows in


def test_table_filters_are_case_insensitive(spark):
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.binlog import decode_binlog
    from flink_cdc_dsql_master_spark.pgoutput import (decode_pgoutput,
                                                      encode_insert,
                                                      encode_relation)

    cols = [(MYSQL_TYPE_LONGLONG, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "Orders", cols, 200)
            + encode_write_rows(5, cols, [[1]], 300))
    df = spark.createDataFrame([(blob,)], "value binary")
    payload = T.StructType([T.StructField("id", T.LongType())])
    assert decode_binlog(df, payload, table="orders").count() == 1

    pg = spark.createDataFrame(
        [(10, encode_relation(7, "public", "Cust",
                              [("id", True, 20)])),
         (20, encode_insert(7, ["1"]))],
        "lsn long, value binary").coalesce(1)  # one self-contained seg
    assert decode_pgoutput(pg, payload, pg_table="cust").count() == 1


def test_parser_gaps_round2():
    from flink_cdc_dsql_master_spark.events import (AlterColumnTypeEvent,
                                                    CreateTableEvent)
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    # DEFAULT NULL is NO default, not the string "NULL"
    [ev] = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN c INT DEFAULT NULL", TID)
    assert ev.default is None
    # MODIFY with NOT NULL tail parses (was silently skipped)
    [ev] = parse_debezium_ddl(
        "ALTER TABLE t MODIFY COLUMN c BIGINT NOT NULL", TID)
    assert ev == AlterColumnTypeEvent(TID, "c", "BIGINT NOT NULL")
    # online-DDL clauses are no-ops, not spec-corrupting suffixes
    evs = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN c INT, ALGORITHM=INPLACE, LOCK=NONE",
        TID)
    assert [type(e).__name__ for e in evs] == ["AddColumnEvent"]
    # CREATE TABLE parses into a CreateTableEvent with keys
    [ev] = parse_debezium_ddl(
        "CREATE TABLE t (id BIGINT NOT NULL, v VARCHAR(20), "
        "score DOUBLE, PRIMARY KEY (id)) ENGINE=InnoDB", TID)
    assert isinstance(ev, CreateTableEvent)
    assert [f.name for f in ev.schema.struct.fields] == [
        "id", "v", "score"]
    assert ev.schema.primary_keys == ("id",)


def test_gtid_dump_sets_non_block():
    import struct as _struct

    from flink_cdc_dsql_master_spark.binlog_client import (
        BINLOG_DUMP_NON_BLOCK, BINLOG_THROUGH_GTID,
        build_binlog_dump_gtid)

    pkt = build_binlog_dump_gtid(7, "11111111-2222-3333-4444-"
                                 "555555555555:1")
    (flags,) = _struct.unpack("<H", pkt[1:3])
    assert flags & BINLOG_DUMP_NON_BLOCK  # dump terminates at log end
    assert flags & BINLOG_THROUGH_GTID


def test_pg_binary_bytea_uuid_time_units():
    from flink_cdc_dsql_master_spark.pgoutput import (encode_binary_datum,
                                                      pg_binary_to_text)

    assert pg_binary_to_text(17, b"\x01\xab") == "\\x01ab"
    assert encode_binary_datum(17, "\\x01ab").raw == b"\x01\xab"
    u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert pg_binary_to_text(2950, encode_binary_datum(2950, u).raw) == u
    import struct as _struct
    assert pg_binary_to_text(
        1083, _struct.pack(">q", 3_723_000_500)) == "01:02:03.0005"
    assert pg_binary_to_text(1083, _struct.pack(">q", 0)) == "00:00:00"
    rt = encode_binary_datum(1083, "01:02:03.000500").raw
    assert pg_binary_to_text(1083, rt) == "01:02:03.0005"


def test_binary_payload_field_decodes_hex(spark):
    """A BYTES payload column carries REAL bytes after the cast — and
    non-hex text (legacy escape format) fails loudly."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.pgoutput import (decode_pgoutput,
                                                      encode_insert)

    payload = T.StructType([T.StructField("id", T.StringType()),
                            T.StructField("doc", T.BinaryType())])
    df = spark.createDataFrame(
        [(10, encode_insert(5, ["1", "\\x68690021"]))],
        "lsn long, value binary")
    [r] = decode_pgoutput(df, payload).collect()
    assert bytes(r["doc"]) == b"hi\x00!"
    bad = spark.createDataFrame(
        [(10, encode_insert(5, ["1", "not-hex"]))], "lsn long, value binary")
    with pytest.raises(Exception, match="hex text form"):
        decode_pgoutput(bad, payload).collect()


def test_binary_payload_malformed_hex_fails_loudly(spark):
    """unhex() is quietly lenient — NULL on non-hex digits and SILENT
    ZERO-PADDING on an odd digit count ('\\xabc' → 0x0ABC) — so the
    bytea cast must reject both, not just a missing '\\x' prefix
    (round-11 wave-3 review #1). Empty bytea ('\\x') stays valid."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.pgoutput import (decode_pgoutput,
                                                      encode_insert)

    payload = T.StructType([T.StructField("id", T.StringType()),
                            T.StructField("doc", T.BinaryType())])

    for bad_text in ["\\xZZ", "\\xabc"]:
        bad = spark.createDataFrame(
            [(10, encode_insert(5, ["1", bad_text]))],
            "lsn long, value binary")
        with pytest.raises(Exception, match="hex text form"):
            decode_pgoutput(bad, payload).collect()

    empty = spark.createDataFrame(
        [(10, encode_insert(5, ["1", "\\x"]))], "lsn long, value binary")
    [r] = decode_pgoutput(empty, payload).collect()
    assert bytes(r["doc"]) == b""


def test_drop_tombstone_blocks_later_batches(spark):
    """A table dropped in batch N must stay dropped in batch N+1: the
    skip-while-dropped flag was re-initialized to False per batch, so
    the next micro-batch's (empty) flush re-created the sink table via
    the create-if-missing writer (wave-3 #3). The tombstone also rides
    SchemaManager.to_json, so a checkpoint-resumed stream keeps
    skipping — until a CREATE TABLE clears it and decoding resumes."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.evolve import (SchemaChangeBehavior,
                                                    SchemaEvolver)
    from flink_cdc_dsql_master_spark.schema import SchemaManager

    base = tempfile.mkdtemp(prefix="binlog_tombstone_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(MAGIC + encode_fde(120)
                + encode_table_map(42, "db", "t", cols, 200)
                + encode_write_rows(42, cols, [[1, "old"]], 300)
                + encode_query("db", "DROP TABLE t", 400))
    with open(f"{src}/seg2.binlog", "wb") as f:
        # a LATER batch carrying only another table's traffic
        f.write(MAGIC + encode_fde(120)
                + encode_table_map(9, "db", "other", cols, 200)
                + encode_write_rows(9, cols, [[5, "x"]], 300))

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.tomb", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.tomb", "out.db.tombstone_sink"),),
        config={"schema.change.behavior": "EVOLVE"},
    )
    ev1 = SchemaEvolver(behavior=SchemaChangeBehavior.EVOLVE)
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db), evolver=ev1)
    q.awaitTermination(120)

    con = duckdb.connect(db)
    names = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
    con.close()
    assert "tombstone_sink" not in names, \
        "batch after the drop resurrected the dropped sink table"

    # checkpoint-restart with a re-hydrated registry: tombstone holds,
    # then a CREATE TABLE clears it and the recreated rows land
    with open(f"{src}/seg3.binlog", "wb") as f:
        f.write(MAGIC + encode_fde(120)
                + encode_query("db", "CREATE TABLE t (id BIGINT PRIMARY "
                               "KEY, v VARCHAR(20))", 200)
                + encode_table_map(43, "db", "t", cols, 300)
                + encode_write_rows(43, cols, [[7, "new"]], 400))
    mgr2 = SchemaManager.from_json(ev1.manager.to_json())
    assert mgr2.is_dropped(TableId.parse("db.s.tomb"))
    ev2 = SchemaEvolver(manager=mgr2,
                        behavior=SchemaChangeBehavior.EVOLVE)
    q2 = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db), evolver=ev2)
    q2.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v FROM tombstone_sink").fetchall()
    con.close()
    assert got == [(7, "new")]


def test_ddl_parser_handles_migration_tool_statements():
    """Wave-4 review: real migrations stamp comment prefixes on DDL
    (gh-ost/pt-osc block comments, '--' and '#' line comments) and use
    DROP TABLE IF EXISTS / multi-table drops — all previously parsed
    to NOTHING (the ALTER was skipped, evolution missed; IF EXISTS
    even extracted 'if' as the target table)."""
    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    DropColumnEvent,
                                                    DropTableEvent)
    from flink_cdc_dsql_master_spark.sources import (ddl_target_table,
                                                     ddl_target_tables,
                                                     parse_debezium_ddl)

    [ev] = parse_debezium_ddl(
        "/* gh-ost */ ALTER TABLE t ADD COLUMN c INT", TID)
    assert isinstance(ev, AddColumnEvent) and ev.name == "c"
    [ev] = parse_debezium_ddl(
        "-- migration 42\nALTER TABLE t ADD COLUMN c INT", TID)
    assert isinstance(ev, AddColumnEvent)
    evs = parse_debezium_ddl(
        "/* c1 */ /* c2 */ ALTER TABLE t ADD a INT, DROP b", TID)
    assert [type(e) for e in evs] == [AddColumnEvent, DropColumnEvent]

    [ev] = parse_debezium_ddl("# comment\nDROP TABLE IF EXISTS t", TID)
    assert isinstance(ev, DropTableEvent)
    assert ddl_target_table("DROP TABLE IF EXISTS `db`.`t`") == "t"
    # multi-table drop names BOTH targets — the composers' membership
    # filter must see this pipeline's table in 'DROP TABLE a, t'
    assert ddl_target_tables("DROP TABLE a, t") == {"a", "t"}
    assert ddl_target_tables("SELECT 1") == set()
