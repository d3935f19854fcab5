"""Multi-table streaming capture: one wire stream feeding N routed
tables (the reference's ``tables: db.\\.*`` capture shape), for both the
binlog and pgoutput byte formats."""

import os
import tempfile

import duckdb

from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    encode_fde,
    encode_table_map,
    encode_update_rows,
    encode_write_rows,
)
from flink_cdc_dsql_master_spark.compose import compose_stream
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.sinks import JdbcUpsertSink


def _duck_writer(db):
    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(df)
    return writer


def test_binlog_multitable_capture(spark):
    """One binlog segment carries interleaved events for TWO tables;
    each decodes against its own schema and lands in its own routed
    sink — no positional collisions, updates to one table leave the
    other untouched."""
    base = tempfile.mkdtemp(prefix="binlog_multi_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cust_cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    ord_cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_DOUBLE, None),
                (MYSQL_TYPE_VARCHAR, 5)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(1, "db", "cust", cust_cols, 200)
            + encode_table_map(2, "db", "ord", ord_cols, 250)
            + encode_write_rows(1, cust_cols, [[1, "alice"], [2, "bob"]],
                                300)
            + encode_write_rows(2, ord_cols, [[10, 99.5, "O"],
                                              [11, 12.25, "F"]], 400)
            + encode_update_rows(1, cust_cols,
                                 [([2, "bob"], [2, "bob2"])], 500))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src,
            "table-list": [
                {"table": "db.s.cust", "mysql-table": "cust",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
                {"table": "db.s.ord", "mysql-table": "ord",
                 "schema": "id bigint, total double, status string",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.cust", "out.db.mt_cust"),
                RouteRule(r"db.s.ord", "out.db.mt_ord")),
    )
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db))
    q.awaitTermination(120)

    con = duckdb.connect(db)
    cust = con.execute("SELECT id, name FROM mt_cust ORDER BY id"
                       ).fetchall()
    orders = con.execute("SELECT id, total, status FROM mt_ord "
                         "ORDER BY id").fetchall()
    con.close()
    assert cust == [(1, "alice"), (2, "bob2")]
    assert orders == [(10, 99.5, "O"), (11, 12.25, "F")]


def test_pgoutput_multitable_capture(spark):
    """One framed pgoutput segment carries two relations' changes; the
    OID→name registry routes each tuple to its own table's decode —
    including a truncate that names only ONE of the relations."""
    from flink_cdc_dsql_master_spark.pgoutput import (encode_frames,
                                                      encode_insert,
                                                      encode_relation,
                                                      encode_truncate)

    base = tempfile.mkdtemp(prefix="pg_multi_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    msgs = [
        (100, encode_relation(7, "public", "cust",
                              [("id", True, 20), ("name", False, 25)])),
        (110, encode_relation(8, "public", "ord",
                              [("id", True, 20), ("total", False, 701)])),
        (120, encode_insert(7, ["1", "alice"])),
        (130, encode_insert(8, ["10", "99.5"])),
        (140, encode_insert(7, ["2", "bob"])),
        (150, encode_insert(8, ["11", "12.25"])),
        # truncate ONLY ord — cust must keep its rows
        (160, encode_truncate([8])),
        (170, encode_insert(8, ["12", "7.75"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src,
            "table-list": [
                {"table": "db.public.cust", "pg-table": "cust",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
                {"table": "db.public.ord", "pg-table": "ord",
                 "schema": "id bigint, total double",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.cust", "out.db.mt_pg_cust"),
                RouteRule(r"db.public.ord", "out.db.mt_pg_ord")),
    )

    def writer(tid, df, schema):
        # the ord stream carries a -T truncate marker: apply the
        # changelog truncate-aware before upserting (all-NULL -T rows
        # never reach the sink themselves)
        from flink_cdc_dsql_master_spark.partitioning import (
            apply_changelog)

        final = apply_changelog(df, list(schema.primary_keys),
                                truncate_aware=True)
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(final)

    q = compose_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    con = duckdb.connect(db)
    cust = con.execute("SELECT id, name FROM mt_pg_cust ORDER BY id"
                       ).fetchall()
    orders = con.execute("SELECT id, total FROM mt_pg_ord ORDER BY id"
                         ).fetchall()
    con.close()
    assert cust == [(1, "alice"), (2, "bob")]  # untouched by truncate
    assert orders == [(12, 7.75)]  # truncated, then one new row
