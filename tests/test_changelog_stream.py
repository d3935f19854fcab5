"""Streaming changelog source e2e: file-backed Debezium envelopes through
decode → transform → evolve → upsert with a checkpointed restart, plus the
Kafka sink partition strategies.

Reference: the flink-cdc-connect Kafka pipeline source (debezium-json wire
format) and flink-cdc-pipeline-connector-kafka sink PartitionStrategy.java.
"""

import json

import duckdb
import pytest

from flink_cdc_dsql_master_spark.compose import compose_changelog_stream
from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.pipeline import PipelineDef, SinkDef, SourceDef
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.sinks import (
    JdbcUpsertSink,
    PARTITION_ALL_TO_ZERO,
    PARTITION_HASH_BY_KEY,
    kafka_records,
    kafka_sink_stream,
    schema_change_ddl,
)
from flink_cdc_dsql_master_spark.transform import TransformRule


def _envelope(before, after, op):
    return {"before": before, "after": after, "op": op}


def _write_envelopes(path, name, records):
    with open(f"{path}/{name}", "w") as f:
        for offset, env in records:
            f.write(json.dumps({"value": json.dumps(env),
                                "offset": offset}) + "\n")


def test_changelog_stream_e2e_with_restart(spark, tmp_path):
    src = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.duckdb")
    (tmp_path / "topic").mkdir()

    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src, "schema": "id int, name string, score double",
            "table": "db.s.users", "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        transforms=(TransformRule(
            r"db.s.users", projection="id, UPPER(name) AS name, score"),),
        routes=(RouteRule(r"db.s.users", "out.public.users"),),
    )

    batch_rows = []

    def writer(tid, df, schema):
        batch_rows.append(df.count())
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p),
                              tid.table, schema, parallel=False)
        sink.write_batch(df)

    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    _write_envelopes(src, "b1.json", [
        (0, _envelope(None, {"id": 1, "name": "ann", "score": 1.5}, "c")),
        (1, _envelope(None, {"id": 2, "name": "bob", "score": 2.5}, "c")),
        (2, _envelope(None, {"id": 3, "name": "cal", "score": 3.5}, "c")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer,
                                 on_schema_change=on_ddl)
    q.awaitTermination(120)
    run1_rows = sum(batch_rows)
    assert run1_rows == 3

    # mid-stream: an update (both images) and a delete, then restart
    _write_envelopes(src, "b2.json", [
        (3, _envelope({"id": 2, "name": "bob", "score": 2.5},
                      {"id": 2, "name": "bobby", "score": 9.0}, "u")),
        (4, _envelope({"id": 3, "name": "cal", "score": 3.5}, None, "d")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer,
                                 on_schema_change=on_ddl)
    q.awaitTermination(120)
    # only the 3 new decoded rows (-U, +U, -D) — batch 1 was not replayed
    assert sum(batch_rows) - run1_rows == 3

    got = duckdb.connect(db).execute(
        "SELECT id, name, score FROM users ORDER BY id").fetchall()
    assert got == [(1, "ANN", 1.5), (2, "BOBBY", 9.0)]


def test_kafka_records_partition_strategies(spark):
    df = spark.createDataFrame(
        [(i, f"n{i}", "+I", i) for i in range(40)],
        f"id int, name string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    tid = TableId.parse("db.s.t")

    zero = kafka_records(df, tid, partition_strategy=PARTITION_ALL_TO_ZERO)
    assert set(r["partition"] for r in zero.collect()) == {0}
    assert zero.columns == ["key", "value", "partition", "topic"]
    assert zero.head()["topic"] == "db.s.t"

    hashed = kafka_records(df, tid, partition_strategy=PARTITION_HASH_BY_KEY,
                           num_partitions=4)
    rows = hashed.collect()
    assert set(r["partition"] for r in rows) <= {0, 1, 2, 3}
    assert len(set(r["partition"] for r in rows)) > 1  # actually spreads
    # same key → same partition, always
    again = {r["key"]: r["partition"] for r in hashed.collect()}
    for r in rows:
        assert again[r["key"]] == r["partition"]

    with pytest.raises(ValueError, match="partition strategy"):
        kafka_records(df, tid, partition_strategy="ROUND_ROBIN")
    with pytest.raises(ValueError, match="serialization"):
        kafka_records(df, tid, serialization="avro")


def test_kafka_sink_stream_plan(spark, tmp_path):
    """Plan construction for the Kafka writer (no broker in the sandbox —
    the options surface is what's under test)."""
    df = spark.createDataFrame(
        [(1, "a", "+I", 0)],
        f"id int, name string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    recs = kafka_records(
        df, TableId.parse("db.s.t"), serialization="canal-json",
        partition_strategy=PARTITION_HASH_BY_KEY, num_partitions=8)
    assert recs.columns == ["key", "value", "partition", "topic"]
    w = kafka_sink_stream(rate.selectExpr("CAST(value AS STRING) AS value"),
                          "broker:9092", "topic-a", str(tmp_path / "ck"))
    assert w is not None  # DataStreamWriter built lazily; start() needs a jar


def test_changelog_stream_to_scd2_history(spark, tmp_path):
    """Full streaming pipeline into the SCD2 history writer: Debezium
    file-stream → decode → compose → scd2_apply_increment per batch; the
    resulting history holds closed and open versions across two
    checkpointed runs."""
    from flink_cdc_dsql_master_spark.compose import make_scd2_sink_writer

    src = str(tmp_path / "topic2")
    ckpt = str(tmp_path / "ckpt2")
    hist = str(tmp_path / "hist")
    (tmp_path / "topic2").mkdir()
    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src, "schema": "id int, v string",
            "table": "db.s.t", "primary-keys": ["id"]}),
        sink=SinkDef("custom"),
    )
    writer = make_scd2_sink_writer(hist)

    _write_envelopes(src, "b1.jsonl", [
        (1, _envelope(None, {"id": 1, "v": "a"}, "c")),
        (2, _envelope(None, {"id": 2, "v": "b"}, "c")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)
    _write_envelopes(src, "b2.jsonl", [
        (3, _envelope({"id": 1, "v": "a"}, {"id": 1, "v": "a2"}, "u")),
        (4, _envelope({"id": 2, "v": "b"}, None, "d")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    rows = sorted((r["id"], r["v"], r["is_current"]) for r in
                  spark.read.parquet(f"{hist}/t").collect())
    assert (1, "a", False) in rows      # closed by the update
    assert (1, "a2", True) in rows      # open current version
    assert (2, "b", False) in rows      # closed by the delete
    assert not any(k == 2 and cur for k, _, cur in rows)


def test_malformed_envelopes_to_dlq(spark):
    """Corrupt JSON, missing op, and unknown op codes land in the DLQ
    with raw payload preserved; valid envelopes pass through and decode."""
    from pyspark.sql import types as T
    from flink_cdc_dsql_master_spark.sources import (
        decode_debezium_json, split_malformed_envelopes)

    payload = T.StructType([T.StructField("id", T.IntegerType())])
    rows = [
        ('{"before": null, "after": {"id": 1}, "op": "c"}', 1),
        ('{not json at all', 2),
        ('{"before": null, "after": {"id": 3}}', 3),       # no op
        ('{"before": null, "after": {"id": 4}, "op": "x"}', 4),
        ('{"before": {"id": 5}, "after": null, "op": "d"}', 5),
    ]
    df = spark.createDataFrame(rows, "value string, offset long")
    good, dlq = split_malformed_envelopes(df, "value", payload)
    assert good.count() == 2
    bad = {r["raw_value"] for r in dlq.collect()}
    assert len(bad) == 3 and '{not json at all' in bad
    decoded = decode_debezium_json(good, "value", payload,
                                   seq_col="offset")
    got = sorted((r["id"], r["__op"]) for r in decoded.collect())
    assert got == [(1, "+I"), (5, "-D")]


def test_changelog_stream_to_rollup(spark, tmp_path):
    """Streaming pipeline into the rollup writer: inserts then a
    retraction update fold into group-grain state across checkpointed
    runs."""
    from flink_cdc_dsql_master_spark.compose import make_rollup_sink_writer
    from flink_cdc_dsql_master_spark.operators import ivm

    src = str(tmp_path / "topic3")
    ckpt = str(tmp_path / "ckpt3")
    roll = str(tmp_path / "roll")
    (tmp_path / "topic3").mkdir()
    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src, "schema": "id int, g string, v double",
            "table": "db.s.r", "primary-keys": ["id"]}),
        sink=SinkDef("custom"),
    )
    writer = make_rollup_sink_writer(roll, ["g"], "v")

    _write_envelopes(src, "b1.jsonl", [
        (1, _envelope(None, {"id": 1, "g": "x", "v": 5.0}, "c")),
        (2, _envelope(None, {"id": 2, "g": "x", "v": 3.0}, "c")),
        (3, _envelope(None, {"id": 3, "g": "y", "v": 7.0}, "c")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)
    _write_envelopes(src, "b2.jsonl", [
        (4, _envelope({"id": 1, "g": "x", "v": 5.0},
                      {"id": 1, "g": "x", "v": 9.0}, "u")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    got = {r["g"]: (r["n"], r["total"]) for r in
           ivm.rollup_view(spark.read.parquet(f"{roll}/r")).collect()}
    assert got == {"x": (2, 12.0), "y": (1, 7.0)}


def test_maxwell_and_ogg_file_streams(spark, tmp_path):
    """The maxwell-json and ogg-json envelope streams ride the same
    decode->apply path as debezium: inserts land, updates win, the
    OGG delete (image in `before`) deletes."""
    import json

    from flink_cdc_dsql_master_spark.partitioning import apply_changelog
    from flink_cdc_dsql_master_spark.sources import changelog_file_stream

    payload = spark.createDataFrame(
        [], "id int, name string").schema

    def run(envelope, records, subdir):
        src = tmp_path / subdir
        src.mkdir()
        with open(src / "b1.json", "w") as f:
            for off, val in records:
                f.write(json.dumps(
                    {"value": json.dumps(val), "offset": off}) + "\n")
        stream = changelog_file_stream(
            spark, str(src), payload, envelope=envelope)
        got = []

        def sink(df, bid):
            got.append(apply_changelog(df, ["id"]).collect())

        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / f"ck_{subdir}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["id"]: r["name"] for r in got[-1]}

    mx = run("maxwell-json", [
        (0, {"type": "insert", "data": {"id": 1, "name": "ann"}}),
        (1, {"type": "insert", "data": {"id": 2, "name": "bob"}}),
        (2, {"type": "update", "data": {"id": 1, "name": "ANN"}}),
        (3, {"type": "delete", "data": {"id": 2, "name": "bob"}}),
    ], "mx")
    assert mx == {1: "ANN"}

    og = run("ogg-json", [
        (0, {"op_type": "I", "before": None,
             "after": {"id": 1, "name": "ann"}}),
        (1, {"op_type": "U", "before": None,
             "after": {"id": 1, "name": "ANN"}}),
        (2, {"op_type": "I", "before": None,
             "after": {"id": 3, "name": "cyn"}}),
        (3, {"op_type": "D", "before": {"id": 3, "name": "cyn"},
             "after": None}),
    ], "og")
    assert og == {1: "ANN"}
