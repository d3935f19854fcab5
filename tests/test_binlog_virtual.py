"""VIRTUAL generated-column DDL, pinned at the WIRE level (VERDICT r12
next-round #2).

MySQL's documented RBR behavior: a generated column is counted in the
TABLE_MAP column count (it mirrors the table definition), but a VIRTUAL
one is never stored, so row images EXCLUDE it via the present-columns
bitmap — the replica recomputes it (MySQL ref manual, "Replication and
Generated Columns"). STORED generated columns ARE written like ordinary
columns. The engine therefore must: (a) apply `ADD ... AS (expr)
VIRTUAL` as an AddColumnEvent tagged generated="VIRTUAL", (b) decode
absent virtual columns as NULL (Debezium's behavior — the value is not
in the binlog), and (c) keep failing loudly for any OTHER absent column
(binlog_row_image != FULL would corrupt LWW state)."""

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import types as T

from flink_cdc_dsql_master_spark.binlog import (
    ABSENT,
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    WireFormatError,
    decode_binlog,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_update_rows,
    encode_write_rows,
    encode_xid,
    parse_binlog,
)
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.types import CDC_META_KEY


def _virtual_field(name, dtype):
    return T.StructField(name, dtype, True,
                         {CDC_META_KEY: {"generated": "VIRTUAL"}})


# -- wire layer ----------------------------------------------------------------

def test_parse_yields_absent_sentinel_for_excluded_columns():
    """The schema-agnostic byte parse marks bitmap-excluded columns with
    the ABSENT singleton; present columns decode normally around it
    (the value stream skips absent columns entirely — MySQL's layout:
    null bitmap covers PRESENT columns only)."""
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_LONG, None),
            (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_write_rows(5, cols, [[1, None, "a"],
                                          [2, None, None]], 300,
                                absent={1}))
    evs = [e for e in parse_binlog(blob) if e["kind"] == "write_rows"]
    assert evs[0]["rows"] == [[1, ABSENT, "a"], [2, ABSENT, None]]


def test_decode_nullfills_virtual_but_rejects_plain_absent(spark):
    """decode_binlog resolves ABSENT against the payload schema: a
    generated-VIRTUAL field → NULL; an ordinary field → the
    binlog_row_image error (guard preserved)."""
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_LONG, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_write_rows(5, cols, [[1, None], [2, None]], 300,
                                absent={1}))
    df = spark.createDataFrame([(blob,)], "value binary")

    ok = T.StructType([T.StructField("id", T.LongType()),
                       _virtual_field("gen", T.IntegerType())])
    got = sorted((r["id"], r["gen"])
                 for r in decode_binlog(df, ok).collect())
    assert got == [(1, None), (2, None)]

    plain = T.StructType([T.StructField("id", T.LongType()),
                          T.StructField("gen", T.IntegerType())])
    with pytest.raises(Exception, match="binlog_row_image"):
        decode_binlog(df, plain).collect()


def test_update_rows_virtual_absent_in_both_images(spark):
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_DOUBLE, None),
            (MYSQL_TYPE_VARCHAR, 20)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_update_rows(5, cols,
                                 [([1, None, "a"], [1, None, "a2"])],
                                 300, absent={1}))
    payload = T.StructType([T.StructField("id", T.LongType()),
                            _virtual_field("gen", T.DoubleType()),
                            T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(blob,)], "value binary")
    got = sorted((r["id"], r["gen"], r["v"], r["__op"])
                 for r in decode_binlog(df, payload).collect())
    assert got == [(1, None, "a", "-U"), (1, None, "a2", "+U")]


# -- DDL → evolution -----------------------------------------------------------

def test_virtual_add_carries_generated_marker_into_schema():
    from flink_cdc_dsql_master_spark.evolve import apply_schema_change
    from flink_cdc_dsql_master_spark.schema import Schema
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    tid = TableId.parse("db.s.t")
    base = Schema.of([("id", "BIGINT"), ("v", "STRING")],
                     primary_keys=["id"])
    (ev,) = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (id + 1) "
        "VIRTUAL", tid)
    assert ev.generated == "VIRTUAL"
    evolved = apply_schema_change(base, ev)
    f = evolved.struct["g"]
    assert f.metadata[CDC_META_KEY]["generated"] == "VIRTUAL"

    # STORED stays an ordinary column — values ARE in row images
    (ev2,) = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN s INT AS (id * 2) STORED", tid)
    assert ev2.generated is None


# -- the wire e2e: stream across a VIRTUAL add ----------------------------------

def _duck_writer(db):
    from flink_cdc_dsql_master_spark.sinks import JdbcUpsertSink

    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p),
                              tid.table, schema, parallel=False)
        sink.write_batch(df)
    return writer


def _duck_ddl(db):
    from flink_cdc_dsql_master_spark.sinks import schema_change_ddl

    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()
    return on_ddl


def test_binlog_stream_across_virtual_add_end_to_end(spark):
    """QUERY_EVENT `ADD g INT AS (id*2) VIRTUAL` mid-stream, then row
    events whose TABLE_MAP is 3 wide (the virtual column IS counted)
    with the present bitmap excluding it (the value is NOT logged):
    rows stream across the migration without a width error, pre-DDL
    rows and the virtual column land NULL, post-DDL values intact."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_binlog_ddl_changelog_stream)

    base = tempfile.mkdtemp(prefix="binlog_virtual_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    # post-DDL: virtual col in TABLE_MAP (width 3, its wire type
    # mirrors the declared INT), excluded from row images
    cols3 = cols2 + [(MYSQL_TYPE_LONG, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(42, "db", "t", cols2, 200)
            + encode_write_rows(42, cols2, [[1, "a"], [2, "b"]], 300)
            + encode_xid(1, 400)
            + encode_query(
                "db",
                "ALTER TABLE t ADD COLUMN g INT "
                "GENERATED ALWAYS AS (id * 2) VIRTUAL", 500)
            + encode_table_map(42, "db", "t", cols3, 600)
            + encode_write_rows(42, cols3,
                                [[2, "b2", None], [4, "d", None]], 700,
                                absent={2})
            + encode_xid(2, 800))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "schema": "id bigint, v string",
            "table": "db.s.t", "mysql-table": "t",
            "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.t", "out.db.virtual_sink"),),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_binlog_ddl_changelog_stream(
        spark, pipe, ckpt, _duck_writer(db),
        on_schema_change=_duck_ddl(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    got = con.execute("SELECT id, v, g FROM virtual_sink "
                      "ORDER BY id").fetchall()
    con.close()
    # the virtual column exists at the sink and is NULL everywhere —
    # its values are never on the wire (Debezium parity)
    assert got == [(1, "a", None), (2, "b2", None), (4, "d", None)]


def test_create_table_virtual_column_carries_generated_marker(spark):
    """In-band CREATE TABLE declaring a VIRTUAL generated column (r14,
    ADVICE r13 #4): the CreateTableEvent schema carries
    generated="VIRTUAL", so rows whose present bitmap excludes the
    column NULL-fill at decode instead of raising the misleading
    binlog_row_image!=FULL error; a STORED declaration stays an
    ordinary column."""
    from flink_cdc_dsql_master_spark.evolve import apply_schema_change
    from flink_cdc_dsql_master_spark.events import CreateTableEvent
    from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

    tid = TableId.parse("db.s.t")
    (ev,) = parse_debezium_ddl(
        "CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, "
        "v VARCHAR(20), "
        "g INT GENERATED ALWAYS AS (id + 1) VIRTUAL, "
        "s INT AS (id * 2) STORED)", tid)
    assert isinstance(ev, CreateTableEvent)
    schema = apply_schema_change(None, ev)
    assert schema.struct["g"].metadata[CDC_META_KEY]["generated"] == \
        "VIRTUAL"
    assert not (schema.struct["s"].metadata or {}).get(
        CDC_META_KEY, {}).get("generated")
    assert list(schema.primary_keys) == ["id"]

    # and the decode honors it: TABLE_MAP counts all 4 columns, row
    # images exclude ONLY the virtual one (STORED values are logged)
    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20),
            (MYSQL_TYPE_LONG, None), (MYSQL_TYPE_LONG, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_write_rows(5, cols, [[1, "a", None, 2],
                                          [2, "b", None, 4]], 300,
                                absent={2}))
    df = spark.createDataFrame([(blob,)], "value binary")
    payload = T.StructType([f for f in schema.struct.fields])
    got = sorted((r["id"], r["v"], r["g"], r["s"])
                 for r in decode_binlog(df, payload).collect())
    assert got == [(1, "a", None, 2), (2, "b", None, 4)]
