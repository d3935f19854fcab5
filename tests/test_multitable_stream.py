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


def test_binlog_multitable_with_in_band_ddl(spark):
    """in-band-ddl composes with table-list: an ALTER on ONE captured
    table evolves only that table's flow; the other decodes untouched.
    Each per-table DDL handler filters statements to its own table and
    segments the shared batch at its own boundaries."""
    from flink_cdc_dsql_master_spark.binlog import encode_query
    from flink_cdc_dsql_master_spark.sinks import schema_change_ddl

    base = tempfile.mkdtemp(prefix="binlog_multi_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cust2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cust3 = cust2 + [(MYSQL_TYPE_DOUBLE, None)]
    ord_cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_DOUBLE, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(1, "db", "cust", cust2, 200)
            + encode_table_map(2, "db", "ord", ord_cols, 250)
            + encode_write_rows(1, cust2, [[1, "a"]], 300)
            + encode_write_rows(2, ord_cols, [[10, 5.5]], 400)
            + encode_query("db", "ALTER TABLE cust ADD COLUMN score "
                           "DOUBLE", 500)
            + encode_table_map(1, "db", "cust", cust3, 600)
            + encode_write_rows(1, cust3, [[2, "b", 2.5]], 700)
            + encode_write_rows(2, ord_cols, [[11, 6.5]], 800))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.s.custd", "mysql-table": "cust",
                 "schema": "id bigint, v string",
                 "primary-keys": ["id"]},
                {"table": "db.s.ordd", "mysql-table": "ord",
                 "schema": "id bigint, total double",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.custd", "out.db.mtd_cust"),
                RouteRule(r"db.s.ordd", "out.db.mtd_ord")),
        config={"schema.change.behavior": "LENIENT"},
    )

    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=on_ddl)
    q.awaitTermination(120)

    con = duckdb.connect(db)
    cust = con.execute("SELECT id, v, score FROM mtd_cust ORDER BY id"
                       ).fetchall()
    ord_cols_names = [d[0] for d in con.execute(
        "SELECT * FROM mtd_ord LIMIT 0").description]
    orders = con.execute("SELECT id, total FROM mtd_ord ORDER BY id"
                         ).fetchall()
    con.close()
    assert cust == [(1, "a", None), (2, "b", 2.5)]
    assert ord_cols_names == ["id", "total"]  # no score leaked
    assert orders == [(10, 5.5), (11, 6.5)]


def test_binlog_fanin_two_tables_one_sink(spark):
    """Fan-in (VERDICT r11 #4): two shard tables with drifted schemas
    route to ONE sink; the composer widens through the lattice per
    batch, NULL-fills the narrow shard, and a second micro-batch's
    update to one shard leaves the other shard's rows untouched."""
    base = tempfile.mkdtemp(prefix="binlog_fanin_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob1 = (MAGIC + encode_fde(120)
             + encode_table_map(1, "db", "sh_a", cols2, 200)
             + encode_table_map(2, "db", "sh_b", cols3, 250)
             + encode_write_rows(1, cols2,
                                 [[1, "a1"], [2, "a2"]], 1000)
             + encode_write_rows(2, cols3,
                                 [[11, "b1", 1.5], [12, "b2", 2.5]],
                                 2000))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob1)

    def pipe():
        return PipelineDef(
            source=SourceDef("file-binlog", {
                "path": src,
                "table-list": [
                    {"table": "db.s.sh_a", "mysql-table": "sh_a",
                     "schema": "k bigint, name string",
                     "primary-keys": ["k"]},
                    {"table": "db.s.sh_b", "mysql-table": "sh_b",
                     "schema": "k bigint, name string, w double",
                     "primary-keys": ["k"]},
                ]}),
            sink=SinkDef("duckdb"),
            routes=(RouteRule(r"db.s.sh_a", "out.db.merged"),
                    RouteRule(r"db.s.sh_b", "out.db.merged")),
        )

    q = compose_stream(spark, pipe(), ckpt, _duck_writer(db))
    q.awaitTermination(300)

    con = duckdb.connect(db)
    tables = [r[0] for r in con.execute(
        "SELECT table_name FROM information_schema.tables").fetchall()]
    assert tables == ["merged"]
    got = con.execute("SELECT k, name, w FROM merged ORDER BY k") \
        .fetchall()
    con.close()
    assert got == [(1, "a1", None), (2, "a2", None),
                   (11, "b1", 1.5), (12, "b2", 2.5)]

    # second micro-batch: update one shard only
    blob2 = (MAGIC + encode_fde(120)
             + encode_table_map(1, "db", "sh_a", cols2, 200)
             + encode_update_rows(1, cols2,
                                  [([2, "a2"], [2, "a2x"])], 1000))
    with open(f"{src}/seg2.binlog", "wb") as f:
        f.write(blob2)
    q = compose_stream(spark, pipe(), ckpt, _duck_writer(db))
    q.awaitTermination(300)
    con = duckdb.connect(db)
    got = con.execute("SELECT k, name, w FROM merged ORDER BY k") \
        .fetchall()
    con.close()
    assert got == [(1, "a1", None), (2, "a2x", None),
                   (11, "b1", 1.5), (12, "b2", 2.5)]


def _fanin_inband_pipe(src):
    return PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.s.sh_a", "mysql-table": "sh_a",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]},
                {"table": "db.s.sh_b", "mysql-table": "sh_b",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.sh_a", "out.db.merged_ddl"),
                RouteRule(r"db.s.sh_b", "out.db.merged_ddl")),
        config={"schema.change.behavior": "LENIENT"},
    )


def test_fanin_with_in_band_ddl_globally_sequenced(spark):
    """Fan-in WITH in-band QUERY_EVENT DDL (r13 — previously rejected):
    two shards merge into one sink while shard A gains a column
    mid-stream. Epochs are interleaved by LOG POSITION across both
    members: shard B rows logged AFTER shard A's ALTER land under the
    widened merged schema; pre-DDL rows of both shards flush before
    the DDL applies (flush-before-apply, globally sequenced)."""
    from flink_cdc_dsql_master_spark.binlog import (encode_query,
                                                    encode_xid)

    base = tempfile.mkdtemp(prefix="binlog_fanin_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob = (MAGIC + encode_fde(120)
            # epoch 0: both shards in the 2-column shape
            + encode_table_map(1, "db", "sh_a", cols2, 200)
            + encode_table_map(2, "db", "sh_b", cols2, 250)
            + encode_write_rows(1, cols2, [[1, "a1"]], 300)
            + encode_write_rows(2, cols2, [[11, "b1"]], 400)
            + encode_xid(1, 450)
            # shard A evolves; B is untouched but its later rows must
            # still coerce into the WIDENED merged sink schema
            + encode_query("db", "ALTER TABLE sh_a ADD COLUMN w DOUBLE",
                           500)
            + encode_table_map(1, "db", "sh_a", cols3, 600)
            + encode_write_rows(1, cols3, [[2, "a2", 2.5]], 700)
            + encode_write_rows(2, cols2, [[12, "b2"]], 800)
            + encode_xid(2, 900))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    def on_ddl(tid, events, schema):
        from flink_cdc_dsql_master_spark.sinks import schema_change_ddl

        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    q = compose_stream(spark, _fanin_inband_pipe(src), ckpt,
                       _duck_writer(db), on_schema_change=on_ddl)
    q.awaitTermination(300)

    con = duckdb.connect(db)
    assert [t[0] for t in con.execute("SHOW TABLES").fetchall()] == \
        ["merged_ddl"]
    got = con.execute("SELECT k, name, w FROM merged_ddl "
                      "ORDER BY k").fetchall()
    con.close()
    assert got == [(1, "a1", None), (2, "a2", 2.5),
                   (11, "b1", None), (12, "b2", None)]


def test_fanin_with_in_band_relation_drift_pgoutput(spark):
    """pgoutput fan-in WITH in-band Relation drift (r13 — the initial
    rejection argued 'no cross-table total order', but Relation
    messages carry WAL LSNs, which ARE one): shard A's re-sent
    Relation adds a column mid-segment; epochs interleave by LSN across
    both members, so shard B rows logged AFTER A's drift land under
    the widened merged schema, NULL-filled."""
    from flink_cdc_dsql_master_spark.pgoutput import (encode_frames,
                                                      encode_insert,
                                                      encode_relation)
    from flink_cdc_dsql_master_spark.sinks import schema_change_ddl

    base = tempfile.mkdtemp(prefix="pg_fanin_ddl_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [("id", True, 20), ("name", False, 25)]
    cols3 = cols2 + [("w", False, 701)]
    msgs = [
        (100, encode_relation(7, "public", "sh_a", cols2)),
        (110, encode_relation(8, "public", "sh_b", cols2)),
        (120, encode_insert(7, ["1", "a1"])),
        (130, encode_insert(8, ["11", "b1"])),
        # shard A drifts: re-sent Relation with an added column
        (200, encode_relation(7, "public", "sh_a", cols3)),
        (210, encode_insert(7, ["2", "a2", "2.5"])),
        # shard B keeps its old shape AFTER A's drift — must coerce
        # into the widened merged sink schema (w NULL)
        (220, encode_insert(8, ["12", "b2"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.public.sh_a", "pg-table": "sh_a",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
                {"table": "db.public.sh_b", "pg-table": "sh_b",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.sh_a", "out.db.pg_merged_ddl"),
                RouteRule(r"db.public.sh_b", "out.db.pg_merged_ddl")),
        config={"schema.change.behavior": "LENIENT"},
    )

    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=on_ddl)
    q.awaitTermination(300)

    con = duckdb.connect(db)
    assert [t[0] for t in con.execute("SHOW TABLES").fetchall()] == \
        ["pg_merged_ddl"]
    got = con.execute("SELECT id, name, w FROM pg_merged_ddl "
                      "ORDER BY id").fetchall()
    con.close()
    assert got == [(1, "a1", None), (2, "a2", 2.5),
                   (11, "b1", None), (12, "b2", None)]
