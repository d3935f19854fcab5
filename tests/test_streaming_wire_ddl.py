"""Wire-stream schema evolution (VERDICT r10 asks #1/#2): binlog
QUERY_EVENT DDL and pgoutput Relation-message diffs feeding the existing
evolution machinery through the streaming composers — the reference's
headline feature (MySqlEventDeserializer → CustomMySqlAntlrDdlParser →
SchemaOperator; PostgresEventDeserializer + SchemaDerivator) now wired
at the byte layer."""

import json
import os
import struct
import tempfile

import duckdb
import pytest

from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_write_rows,
    encode_xid,
)
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.sinks import (JdbcUpsertSink,
                                               schema_change_ddl)

TID = TableId.parse("db.s.t")


# ---------------------------------------------------------------------------
# DDL translation units
# ---------------------------------------------------------------------------

def test_parse_mysql_change_column():
    from flink_cdc_dsql_master_spark.events import (AlterColumnTypeEvent,
                                                    RenameColumnEvent)
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    evs = parse_debezium_ddl(
        "ALTER TABLE t CHANGE COLUMN old_c new_c BIGINT", TID)
    assert evs == [RenameColumnEvent(TID, "old_c", "new_c"),
                   AlterColumnTypeEvent(TID, "new_c", "BIGINT")]
    # same-name CHANGE = pure type change
    evs = parse_debezium_ddl("ALTER TABLE t CHANGE c c DECIMAL(10,2)", TID)
    assert evs == [AlterColumnTypeEvent(TID, "c", "DECIMAL(10,2)")]


def test_begin_commit_wrappers_are_not_ddl(spark):
    """Under row-based logging QUERY_EVENT also carries BEGIN/COMMIT —
    the extractor must drop them (and CREATE/GRANT noise parses to no
    events downstream)."""
    from flink_cdc_dsql_master_spark.binlog import extract_binlog_ddl

    blob = (MAGIC + encode_fde(120)
            + encode_query("db", "BEGIN", 200)
            + encode_query("db", "ALTER TABLE t ADD COLUMN x INT", 300)
            + encode_query("db", "COMMIT", 400))
    rows = extract_binlog_ddl(
        spark.createDataFrame([(blob,)], "value binary")).collect()
    assert [(r["pos"], r["statement"]) for r in rows] == [
        (300, "ALTER TABLE t ADD COLUMN x INT")]


def test_decode_binlog_pos_range(spark):
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.binlog import decode_binlog

    cols = [(MYSQL_TYPE_LONGLONG, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_write_rows(5, cols, [[1]], 300)
            + encode_write_rows(5, cols, [[2]], 500)
            + encode_write_rows(5, cols, [[3]], 700))
    df = spark.createDataFrame([(blob,)], "value binary")
    payload = T.StructType([T.StructField("id", T.LongType())])
    got = sorted(r["id"] for r in
                 decode_binlog(df, payload,
                               pos_range=(300, 700)).collect())
    assert got == [2]  # strict bounds exclude both boundary events
    got = sorted(r["id"] for r in
                 decode_binlog(df, payload,
                               pos_range=(None, 500)).collect())
    assert got == [1]


def test_relation_drift_events_unit():
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    AlterColumnTypeEvent,
                                                    DropColumnEvent)
    from flink_cdc_dsql_master_spark.pgoutput import relation_drift_events

    cur = T.StructType([T.StructField("id", T.LongType()),
                        T.StructField("v", T.StringType())])
    # unchanged re-send (every new pgoutput connection does this) = no-op
    cols = [{"name": "id", "key": True, "type_oid": 20, "typmod": -1},
            {"name": "v", "key": False, "type_oid": 25, "typmod": -1}]
    assert relation_drift_events(TID, cols, cur) == []
    # added + dropped + widened
    cols2 = [{"name": "id", "key": True, "type_oid": 20, "typmod": -1},
             {"name": "score", "key": False, "type_oid": 701,
              "typmod": -1}]
    evs = relation_drift_events(TID, cols2, cur)
    kinds = [(type(e).__name__, getattr(e, "name", None)) for e in evs]
    assert ("AddColumnEvent", "score") in kinds
    assert ("DropColumnEvent", "v") in kinds
    # int4 relation vs declared SMALLINT → widen to INT
    cur2 = T.StructType([T.StructField("n", T.ShortType())])
    evs = relation_drift_events(
        TID, [{"name": "n", "key": False, "type_oid": 23,
               "typmod": -1}], cur2)
    assert evs == [AlterColumnTypeEvent(TID, "n", "INT")]


def test_oid_type_string_typmods():
    from flink_cdc_dsql_master_spark.pgoutput import (WireFormatError,
                                                      oid_type_string)

    assert oid_type_string(1043, 34) == "VARCHAR(30)"
    assert oid_type_string(1700, ((12 << 16) | 3) + 4) == "DECIMAL(12,3)"
    assert oid_type_string(20) == "BIGINT"
    with pytest.raises(WireFormatError, match="OID 600"):
        oid_type_string(600)


# ---------------------------------------------------------------------------
# end-to-end: binlog bytes → ALTER TABLE → evolved sink
# ---------------------------------------------------------------------------

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


def test_binlog_query_event_ddl_end_to_end(spark):
    """insert → ALTER TABLE ADD COLUMN (raw QUERY_EVENT bytes, mid-file)
    → inserts in the new shape, applied via LENIENT evolution: pre-DDL
    rows carry NULL in the new column, post-DDL rows carry values."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_wire_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols2, 200)
            + encode_write_rows(42, cols2,
                                [[1, "a"], [2, "b"], [3, "c"]], 300)
            + encode_xid(1, 400)
            + encode_query("db", "ALTER TABLE t ADD COLUMN score DOUBLE",
                           500)
            + encode_table_map(42, "db", "t", cols3, 600)
            + encode_write_rows(42, cols3,
                                [[2, "b2", 2.5], [4, "d", 4.5]], 700)
            + encode_xid(2, 800))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.t", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t", "out.db.wire_ddl_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute(
        "SELECT id, v, score FROM wire_ddl_sink ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a", None), (2, "b2", 2.5), (3, "c", None),
                   (4, "d", 4.5)]


def test_binlog_ddl_checkpointed_restart(spark):
    """The DDL lands in run 1; run 2 (same checkpoint, same evolver —
    the checkpointed-registry resume story) streams a second segment
    whose TABLE_MAP is already 3-wide. Without the applied schema the
    decode would fail its width check; with it, rows land evolved."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.evolve import (SchemaChangeBehavior,
                                                    SchemaEvolver)

    base = tempfile.mkdtemp(prefix="binlog_wire_ddl_restart_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(MAGIC + encode_fde(120)
                + encode_table_map(42, "db", "t", cols2, 200)
                + encode_write_rows(42, cols2, [[1, "a"]], 300)
                + encode_query(
                    "db", "ALTER TABLE t ADD COLUMN score DOUBLE", 400))

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.t", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t", "out.db.wire_ddl_restart"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    evolver = SchemaEvolver(behavior=SchemaChangeBehavior.LENIENT)
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db), evolver=evolver)
    q.awaitTermination(120)

    with open(f"{src}/seg2.binlog", "wb") as f:
        f.write(MAGIC + encode_fde(120)
                + encode_table_map(42, "db", "t", cols3, 1200)
                + encode_write_rows(42, cols3, [[5, "e", 5.5]], 1300))
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db), evolver=evolver)
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v, score FROM wire_ddl_restart "
                      "ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a", None), (5, "e", 5.5)]


# ---------------------------------------------------------------------------
# end-to-end: pgoutput Relation diff → evolved sink
# ---------------------------------------------------------------------------

def test_pgoutput_relation_diff_end_to_end(spark):
    """insert → Relation re-sent with an extra column → inserts with the
    new tuple width, evolved and applied (VERDICT r10 ask #2)."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_pgoutput_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.pgoutput import (encode_begin,
                                                      encode_commit,
                                                      encode_frames,
                                                      encode_insert,
                                                      encode_relation)

    base = tempfile.mkdtemp(prefix="pg_wire_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    oid = 77
    msgs = [
        (100, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("v", False, 25)])),
        (110, encode_begin(200, 0, 9)),
        (120, encode_insert(oid, ["1", "a"])),
        (130, encode_insert(oid, ["2", "b"])),
        (140, encode_commit(200, 201, 0)),
        # ALTER TABLE upstream → walsender re-sends the relation
        (150, encode_relation(oid, "public", "t",
                              [("id", True, 20), ("v", False, 25),
                               ("score", False, 701)])),
        (160, encode_begin(300, 0, 10)),
        (170, encode_insert(oid, ["2", "b2", "2.5"])),
        (180, encode_insert(oid, ["4", "d", "4.5"])),
        (190, encode_commit(300, 301, 0)),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.public.t", "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.t", "out.db.pg_wire_ddl_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_pgoutput_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v, score FROM pg_wire_ddl_sink "
                      "ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a", None), (2, "b2", 2.5), (4, "d", 4.5)]


# ---------------------------------------------------------------------------
# broader DDL shapes through the wire composers
# ---------------------------------------------------------------------------

def test_binlog_ddl_drop_and_change_column(spark):
    """DROP COLUMN and CHANGE COLUMN (MySQL's rename+retype form) ride
    the wire too: under LENIENT, DROP keeps the column (nullable fill)
    and CHANGE adds the new name while the old keeps its data."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_wire_ddl2_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols3 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20),
             (MYSQL_TYPE_DOUBLE, None)]
    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols3, 200)
            + encode_write_rows(42, cols3, [[1, "a", 1.5]], 300)
            + encode_query("db", "ALTER TABLE t DROP COLUMN score", 400)
            + encode_table_map(42, "db", "t", cols2, 500)
            + encode_write_rows(42, cols2, [[2, "b"]], 600)
            + encode_query("db", "ALTER TABLE t CHANGE v label VARCHAR(40)",
                           700)
            + encode_table_map(42, "db", "t", cols2, 800)
            + encode_write_rows(42, cols2, [[3, "c"]], 900))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src,
            "schema": "id bigint, v string, score double",
            "table": "db.s.t2", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t2", "out.db.wire_ddl2_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    cols = [d[0] for d in con.execute(
        "SELECT * FROM wire_ddl2_sink LIMIT 0").description]
    got = con.execute(
        "SELECT id, v, score, label FROM wire_ddl2_sink "
        "ORDER BY id").fetchall()
    con.close()
    # LENIENT: score survives the DROP (NULL-filled after), label is
    # appended by the CHANGE; v keeps pre-rename data
    assert cols == ["id", "v", "score", "label"]
    assert got == [(1, "a", 1.5, None), (2, "b", None, None),
                   (3, None, None, "c")]


def test_binlog_ddl_in_crc32_stream(spark):
    """QUERY_EVENT DDL inside a CRC32-checksummed stream: the extractor
    and both epoch decodes verify+strip trailers transparently."""
    from flink_cdc_dsql_master_spark.binlog import (checksum_stream,
                                                    extract_binlog_ddl)

    cols = [(MYSQL_TYPE_LONGLONG, None)]
    blob = MAGIC + checksum_stream([
        encode_table_map(5, "db", "t", cols, 200),
        encode_write_rows(5, cols, [[1]], 300),
        encode_query("db", "ALTER TABLE t ADD COLUMN x INT", 400),
    ])
    rows = extract_binlog_ddl(
        spark.createDataFrame([(blob,)], "value binary")).collect()
    assert [(r["pos"], r["statement"]) for r in rows] == [
        (400, "ALTER TABLE t ADD COLUMN x INT")]


def test_pgoutput_relation_diff_in_streamed_txn(spark):
    """A protocol-v2 in-stream Relation (xid-prefixed) is surfaced by
    the extractor too — schema changes inside large streamed
    transactions are not invisible."""
    from flink_cdc_dsql_master_spark.pgoutput import (
        encode_relation, encode_stream_commit, encode_stream_start,
        encode_stream_stop, extract_pgoutput_relations, encode_frames,
        with_stream_xid)

    rel = encode_relation(9, "public", "t", [("id", True, 20)])
    msgs = [
        (10, encode_stream_start(77)),
        (20, with_stream_xid(rel, 77)),
        (30, encode_stream_stop()),
        (40, encode_stream_commit(77, 100, 101)),
    ]
    df = spark.createDataFrame([(encode_frames(msgs),)], "value binary")
    rows = extract_pgoutput_relations(df).collect()
    assert len(rows) == 1
    assert rows[0]["oid"] == 9 and rows[0]["name"] == "t"
    assert json.loads(rows[0]["columns_json"])[0]["name"] == "id"


def test_compose_stream_yaml_dispatch(spark, tmp_path):
    """The YAML surface reaches the DDL-aware composers: a file-binlog
    source with ``in-band-ddl: true`` parsed from pipeline YAML runs
    the QUERY_EVENT path end-to-end via compose_stream (the CLI's
    streaming entry)."""
    from flink_cdc_dsql_master_spark.compose import compose_stream
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml

    src = tmp_path / "seg"
    src.mkdir()
    db = str(tmp_path / "sink.duckdb")
    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols2, 200)
            + encode_write_rows(42, cols2, [[1, "a"]], 300)
            + encode_query("db", "ALTER TABLE t ADD COLUMN score DOUBLE",
                           400)
            + encode_table_map(42, "db", "t", cols3, 500)
            + encode_write_rows(42, cols3, [[2, "b", 2.5]], 600))
    (src / "seg1.binlog").write_bytes(blob)

    pipe = parse_pipeline_yaml(f"""
source:
  type: file-binlog
  path: {src}
  schema: "id bigint, v string"
  table: db.s.yaml_t
  mysql-table: t
  in-band-ddl: true
  primary-keys: [id]
sink:
  type: duckdb
route:
  - source-table: db.s.yaml_t
    sink-table: out.db.yaml_ddl_sink
pipeline:
  schema.change.behavior: LENIENT
""")
    q = compose_stream(spark, pipe, str(tmp_path / "ckpt"),
                       _duck_writer(db), on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v, score FROM yaml_ddl_sink "
                      "ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a", None), (2, "b", 2.5)]


def test_compose_stream_rejects_unsupported_in_band_ddl(spark, tmp_path):
    from flink_cdc_dsql_master_spark.compose import compose_stream
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                      SourceDef)

    pipe = PipelineDef(
        source=SourceDef("file-maxwell", {"in-band-ddl": True,
                                          "path": str(tmp_path),
                                          "schema": "id bigint"}),
        sink=SinkDef("duckdb"))
    with pytest.raises(ValueError, match="in-band-ddl"):
        compose_stream(spark, pipe, str(tmp_path / "c"), lambda *a: None)


def test_lsn_range_with_streamed_txn_spanning_boundary(spark):
    """A protocol-v2 streamed transaction whose tuples span a mid-txn
    Relation change: each epoch decode processes the FULL stream state
    (buffer-until-commit, control messages unbounded) and emits only
    its in-range rows, so the segmented composer neither double-emits
    nor trips the width guard on the other epoch's tuples."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.pgoutput import (
        decode_pgoutput_segments, encode_frames, encode_insert,
        encode_relation, encode_stream_commit, encode_stream_start,
        encode_stream_stop, with_stream_xid)

    oid, xid = 7, 99
    rel2 = encode_relation(oid, "public", "t",
                           [("id", True, 20), ("v", False, 25)])
    rel3 = encode_relation(oid, "public", "t",
                           [("id", True, 20), ("v", False, 25),
                            ("s", False, 701)])
    msgs = [
        (100, rel2),
        (110, encode_stream_start(xid)),
        (120, with_stream_xid(encode_insert(oid, ["1", "a"]), xid)),
        (130, with_stream_xid(rel3, xid)),  # DDL inside the txn
        (140, with_stream_xid(encode_insert(oid, ["2", "b", "2.5"]),
                              xid)),
        (150, encode_stream_stop()),
        (160, encode_stream_commit(xid, 200, 201)),
    ]
    df = spark.createDataFrame([(encode_frames(msgs),)], "value binary")
    p2 = T.StructType([T.StructField("id", T.LongType()),
                       T.StructField("v", T.StringType())])
    p3 = T.StructType([T.StructField("id", T.LongType()),
                       T.StructField("v", T.StringType()),
                       T.StructField("s", T.DoubleType())])
    ep1 = decode_pgoutput_segments(df, p2, lsn_range=(None, 130))
    assert [(r["id"], r["v"]) for r in ep1.collect()] == [(1, "a")]
    ep2 = decode_pgoutput_segments(df, p3, lsn_range=(130, None))
    assert [(r["id"], r["v"], r["s"]) for r in ep2.collect()] == [
        (2, "b", 2.5)]


def test_parse_ddl_multi_spec_and_defaults():
    """Real migrations bundle alter specs: comma-separated lists, the
    parenthesized multi-add, NOT NULL and DEFAULT tails — each expands
    to its own event, with the default captured (AddColumnEvent.default
    rides into schema metadata)."""
    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    AlterColumnTypeEvent,
                                                    ColumnPosition,
                                                    DropColumnEvent,
                                                    RenameColumnEvent)
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    evs = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN a INT NOT NULL DEFAULT 7 AFTER x, "
        "DROP COLUMN b, CHANGE c c2 BIGINT", TID)
    assert evs == [
        AddColumnEvent(TID, "a", "INT NOT NULL",
                       position=ColumnPosition.AFTER, anchor="x",
                       default="7"),
        DropColumnEvent(TID, "b"),
        RenameColumnEvent(TID, "c", "c2"),
        AlterColumnTypeEvent(TID, "c2", "BIGINT"),
    ]
    evs = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN (p DOUBLE, q VARCHAR(12) "
        "DEFAULT 'x,y')", TID)
    assert [(e.name, e.type_string, e.default) for e in evs] == [
        ("p", "DOUBLE", None), ("q", "VARCHAR(12)", "x,y")]
    # single-spec statements are unchanged by the expansion
    assert parse_debezium_ddl(
        "ALTER TABLE t RENAME COLUMN v TO val", TID) == [
        RenameColumnEvent(TID, "v", "val")]


def test_other_tables_ddl_does_not_segment(spark):
    """A multi-table stream's DDL for ANOTHER table must neither
    segment this pipeline nor evolve its schema."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)
    from flink_cdc_dsql_master_spark.sources import ddl_target_table

    assert ddl_target_table("ALTER TABLE db.`other` ADD c INT") == "other"
    assert ddl_target_table('TRUNCATE TABLE "Big"') == "big"
    assert ddl_target_table("DROP TABLE x") == "x"
    assert ddl_target_table("BEGIN") is None

    base = tempfile.mkdtemp(prefix="binlog_other_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols2, 200)
            + encode_write_rows(42, cols2, [[1, "a"]], 300)
            # DDL for a DIFFERENT table mid-stream
            + encode_query("db", "ALTER TABLE other ADD COLUMN z INT",
                           400)
            + encode_table_map(42, "db", "t", cols2, 500)
            + encode_write_rows(42, cols2, [[2, "b"]], 600))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.t3", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t3", "out.db.other_ddl_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    seen_events = []
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=lambda t, evs, s: seen_events.extend(evs))
    q.awaitTermination(120)

    # only the drift path's initial CreateTableEvent may appear — the
    # other table's ALTER never reaches the evolver
    from flink_cdc_dsql_master_spark.events import CreateTableEvent
    assert all(isinstance(e, CreateTableEvent) for e in seen_events)
    con = duckdb.connect(db)
    cols = [d[0] for d in con.execute(
        "SELECT * FROM other_ddl_sink LIMIT 0").description]
    got = con.execute("SELECT id, v FROM other_ddl_sink "
                      "ORDER BY id").fetchall()
    con.close()
    assert cols == ["id", "v"]  # no 'z' column leaked in
    assert got == [(1, "a"), (2, "b")]


def test_binlog_truncate_statement_reaches_sink(spark):
    """A binlog TRUNCATE TABLE statement carries no row events — its
    data effect must land as sink DDL (DELETE FROM): pre-truncate rows
    vanish, post-truncate inserts land."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_truncate_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols, 200)
            + encode_write_rows(42, cols, [[1, "gone"], [2, "gone"]], 300)
            + encode_query("db", "TRUNCATE TABLE t", 400)
            + encode_table_map(42, "db", "t", cols, 500)
            + encode_write_rows(42, cols, [[3, "kept"]], 600))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.t4", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t4", "out.db.trunc_sink"),),
        # EVOLVE: table truncates forward to the sink (LENIENT
        # ignores them, reference parity)
        config={"schema.change.behavior": "EVOLVE"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v FROM trunc_sink ORDER BY id").fetchall()
    con.close()
    assert got == [(3, "kept")]
