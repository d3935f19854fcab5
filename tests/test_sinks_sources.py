"""Sink + source tests: upsert into DuckDB, parquet merge, JSON envelopes,
chunk splitting, debezium decode, snapshot handoff."""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.schema import Schema, TableId
from flink_cdc_dsql_master_spark.sinks import (
    JdbcUpsertSink,
    canal_json,
    create_table_sql,
    debezium_json,
    merge_into_parquet,
    upsert_sql,
)
from flink_cdc_dsql_master_spark.sources import (
    SnapshotStreamHandoff,
    decode_debezium_json,
    distribution_factor,
    split_evenly_sized_chunks,
    uneven_bounds,
)

TID = TableId.parse("db.public.users")
SCHEMA = Schema.of([("id", "INT NOT NULL"), ("name", "STRING"),
                    ("balance", "DOUBLE")], primary_keys=["id"])


@pytest.fixture()
def changelog(spark):
    rows = [
        (1, "alice", 10.0, "+I", 1),
        (2, "bob", 20.0, "+I", 2),
        (1, "alice", 10.0, "-U", 3),
        (1, "alice2", 15.0, "+U", 4),
        (3, "carol", 30.0, "+I", 5),
        (2, "bob", 20.0, "-D", 6),
    ]
    return spark.createDataFrame(
        rows, f"id int, name string, balance double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


def test_upsert_sql_shapes():
    sql = upsert_sql("t", ["id", "name"], ["id"])
    assert "ON CONFLICT" in sql and "DO UPDATE" in sql
    assert 'excluded."name"' in sql
    ddl = create_table_sql("t", SCHEMA)
    assert 'PRIMARY KEY ("id")' in ddl and '"id" INTEGER NOT NULL' in ddl


def test_jdbc_upsert_into_duckdb(tmp_path, changelog):
    db = str(tmp_path / "t.duckdb")

    def factory(path=db):
        return duckdb.connect(path)

    sink = JdbcUpsertSink(factory, "users", SCHEMA, parallel=False)
    sink.ensure_table()
    sink.write_batch(changelog)
    rows = duckdb.connect(db).execute(
        "SELECT id, name, balance FROM users ORDER BY id").fetchall()
    # final state: 1 updated, 2 deleted, 3 inserted
    assert rows == [(1, "alice2", 15.0), (3, "carol", 30.0)]
    # idempotent replay (effectively-once)
    sink.write_batch(changelog)
    rows2 = duckdb.connect(db).execute(
        "SELECT id, name, balance FROM users ORDER BY id").fetchall()
    assert rows2 == rows


def test_merge_into_parquet(tmp_path, spark, changelog):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(2, "bob", 20.0), (9, "zed", 99.0)],
        "id int, name string, balance double")
    base.write.parquet(path)
    merge_into_parquet(path, changelog, SCHEMA)
    got = sorted((r["id"], r["name"]) for r in
                 spark.read.parquet(path).collect())
    # 2 deleted, 1/3 upserted, 9 untouched
    assert got == [(1, "alice2"), (3, "carol"), (9, "zed")]


def test_debezium_envelope_roundtrip(spark, changelog):
    env = debezium_json(changelog, TID)
    vals = [json.loads(r["value"]) for r in env.collect()]
    ops = sorted(v["op"] for v in vals)
    assert ops == ["c", "c", "c", "d", "u", "u"]
    d = next(v for v in vals if v["op"] == "d")
    assert d["before"]["id"] == 2 and d["after"] is None
    assert d["source"]["table"] == "users"

    # decode back: only the after/insert/update images rebuild state
    payload = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("balance", T.DoubleType()),
    ])
    decoded = decode_debezium_json(env, "value", payload)
    assert decoded.where(F.col(OP_COLUMN) == "-D").count() == 1
    assert decoded.where(F.col(OP_COLUMN) == "+U").count() == 1


def test_canal_envelope(spark, changelog):
    env = canal_json(changelog, TID)
    vals = [json.loads(r["value"]) for r in env.collect()]
    types = sorted(v["type"] for v in vals)
    assert types == ["DELETE", "INSERT", "INSERT", "INSERT",
                     "UPDATE", "UPDATE"]


def test_chunk_splitting_even():
    splits = split_evenly_sized_chunks(0, 99_999, 100_000, chunk_size=10_000)
    assert len(splits) == 10
    assert splits[0].start is None and splits[-1].end is None
    assert splits[1].predicate("id") == "id >= 10000 AND id < 20000"
    assert distribution_factor(0, 99_999, 100_000) == pytest.approx(1.0)


def test_chunk_splitting_small_table():
    assert len(split_evenly_sized_chunks(0, 100, 50)) == 1


def test_uneven_bounds_quantiles(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * F.col("id")).alias("k"))  # skewed key
    splits = uneven_bounds(df, "k", 4)
    assert 2 <= len(splits) <= 4
    assert splits[0].start is None and splits[-1].end is None


def test_snapshot_stream_handoff(spark):
    table = spark.createDataFrame([(1, "a")], "id int, v string")
    log = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 10), (3, "c", 15)],
        f"id int, v string, {SEQ_COLUMN} long")
    h = SnapshotStreamHandoff()
    h.snapshot(table, log)
    assert h.high_watermark == 15
    later = spark.createDataFrame(
        [(4, "d", 20), (2, "b", 10)], f"id int, v string, {SEQ_COLUMN} long")
    assert [r["id"] for r in h.stream_filter(later).collect()] == [4]
