"""In-band Debezium schema-change (DDL) messages through the streaming
composer: flush-before-apply ordering, mid-batch segmentation, rename
identity preservation, and checkpointed restart with a second DDL."""
import json
import os
import tempfile

import duckdb
import pytest

from flink_cdc_dsql_master_spark.compose import compose_ddl_changelog_stream
from flink_cdc_dsql_master_spark.evolve import (SchemaChangeBehavior,
                                                SchemaEvolver)
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.sinks import (JdbcUpsertSink,
                                               schema_change_ddl)


def _env(offset, before=None, after=None, op=None, ddl=None):
    if ddl is not None:
        payload = {"ddl": ddl}
    else:
        payload = {"before": before, "after": after, "op": op}
    return json.dumps({"value": json.dumps(payload), "offset": offset})


def _pipe(src_dir):
    return PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src_dir, "schema": "k bigint, v string",
            "table": "db.s.t", "primary-keys": ["k"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t", "out.db.t_sink"),),
        config={"schema.change.behavior": "EVOLVE"},
    )


@pytest.fixture()
def env_dirs():
    base = tempfile.mkdtemp(prefix="ddl_stream_")
    src = os.path.join(base, "topic")
    os.mkdir(src)
    return (src, os.path.join(base, "ckpt"), os.path.join(base, "s.duckdb"))


def _writers(db):
    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(df)

    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    return writer, on_ddl


def test_midbatch_rename_preserves_identity(spark, env_dirs):
    """One file = one micro-batch containing inserts, a RENAME DDL
    message, then post-rename inserts: rows before the DDL must flush
    under the old schema, the sink column must be renamed in place (old
    rows keep their data — drift diffing alone would drop it), and the
    later rows decode with the new field name."""
    src, ckpt, db = env_dirs
    with open(f"{src}/b1.json", "w") as f:
        for i in range(5):
            f.write(_env(i, after={"k": i, "v": f"a{i}"}, op="c") + "\n")
        f.write(_env(5, ddl="ALTER TABLE t RENAME COLUMN v TO val") + "\n")
        for i in range(6, 10):
            f.write(_env(i, after={"k": i, "val": f"b{i}"}, op="c") + "\n")

    writer, on_ddl = _writers(db)
    evolver = SchemaEvolver(behavior=SchemaChangeBehavior.EVOLVE)
    q = compose_ddl_changelog_stream(spark, _pipe(src), ckpt, writer,
                                     on_schema_change=on_ddl,
                                     evolver=evolver)
    q.awaitTermination(300)

    con = duckdb.connect(db)
    cols = [r[1] for r in con.execute(
        "PRAGMA table_info('t_sink')").fetchall()]
    rows = dict(con.execute("SELECT k, val FROM t_sink").fetchall())
    con.close()
    assert "val" in cols and "v" not in cols
    assert rows == {i: f"a{i}" for i in range(5)} | {
        i: f"b{i}" for i in range(6, 10)}


def test_restart_with_add_column_ddl(spark, env_dirs):
    """Second run on the same checkpoint: an ADD COLUMN DDL arrives
    in-band, the sink gains the column via DDL, and pre-DDL rows stay
    NULL there (reference AddColumnEvent semantics)."""
    src, ckpt, db = env_dirs
    with open(f"{src}/b1.json", "w") as f:
        for i in range(3):
            f.write(_env(i, after={"k": i, "v": f"a{i}"}, op="c") + "\n")

    writer, on_ddl = _writers(db)
    evolver = SchemaEvolver(behavior=SchemaChangeBehavior.EVOLVE)
    q = compose_ddl_changelog_stream(spark, _pipe(src), ckpt, writer,
                                     on_schema_change=on_ddl,
                                     evolver=evolver)
    q.awaitTermination(300)

    with open(f"{src}/b2.json", "w") as f:
        f.write(_env(10, ddl="ALTER TABLE t ADD COLUMN note VARCHAR(20)")
                + "\n")
        f.write(_env(11, after={"k": 7, "v": "a7", "note": "n7"}, op="c")
                + "\n")
        f.write(_env(12, before={"k": 1, "v": "a1", "note": None},
                     after={"k": 1, "v": "A1", "note": "n1"}, op="u") + "\n")

    q = compose_ddl_changelog_stream(spark, _pipe(src), ckpt, writer,
                                     on_schema_change=on_ddl,
                                     evolver=evolver)
    q.awaitTermination(300)

    con = duckdb.connect(db)
    rows = {r[0]: (r[1], r[2]) for r in con.execute(
        "SELECT k, v, note FROM t_sink ORDER BY k").fetchall()}
    con.close()
    assert rows == {0: ("a0", None), 1: ("A1", "n1"), 2: ("a2", None),
                    7: ("a7", "n7")}


def test_parse_debezium_ddl_kinds():
    from flink_cdc_dsql_master_spark.events import (
        AddColumnEvent, AlterColumnTypeEvent, ColumnPosition,
        DropColumnEvent, DropTableEvent, RenameColumnEvent,
        TruncateTableEvent)
    from flink_cdc_dsql_master_spark.schema import TableId
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    tid = TableId.parse("a.b.c")
    ev = parse_debezium_ddl("ALTER TABLE t RENAME COLUMN v TO val", tid)
    assert ev == [RenameColumnEvent(tid, "v", "val")]
    ev = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN note VARCHAR(20) AFTER v", tid)
    assert ev == [AddColumnEvent(tid, "note", "VARCHAR(20)",
                                 position=ColumnPosition.AFTER, anchor="v")]
    ev = parse_debezium_ddl(
        "ALTER TABLE t DROP COLUMN x; ALTER TABLE t MODIFY v BIGINT", tid)
    assert ev == [DropColumnEvent(tid, "x"),
                  AlterColumnTypeEvent(tid, "v", "BIGINT")]
    ev = parse_debezium_ddl(
        "ALTER TABLE db.t ALTER COLUMN v SET DATA TYPE DECIMAL(10,2)", tid)
    assert ev == [AlterColumnTypeEvent(tid, "v", "DECIMAL(10,2)")]
    assert parse_debezium_ddl("TRUNCATE TABLE t", tid) == [
        TruncateTableEvent(tid)]
    assert parse_debezium_ddl("DROP TABLE t", tid) == [DropTableEvent(tid)]
    # CREATE TABLE parses (round-11: drop-and-recreate support);
    # GRANT and other Debezium noise statements are skipped, not errors
    evs = parse_debezium_ddl(
        "CREATE TABLE t (x INT); GRANT ALL ON t TO app", tid)
    assert [type(e).__name__ for e in evs] == ["CreateTableEvent"]
    assert parse_debezium_ddl("GRANT ALL ON t TO app; SET foo=1",
                              tid) == []
