"""Mid-stream schema evolution through the real streaming path.

The scenario the reference's SchemaOperator/SchemaCoordinator exist for
(SchemaOperator.java:70,176-180; SchemaCoordinator.java:389-465): a column
appears upstream mid-stream; the pipeline must issue sink DDL, widen the
registry, and coerce old/new batches — across a checkpointed restart.
"""

import json

import duckdb
import pytest

from flink_cdc_dsql_master_spark.compose import foreach_batch_writer
from flink_cdc_dsql_master_spark.evolve import SchemaEvolver
from flink_cdc_dsql_master_spark.pipeline import PipelineDef, SinkDef, SourceDef
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import SchemaManager
from flink_cdc_dsql_master_spark.sinks import JdbcUpsertSink, schema_change_ddl


def _pipe():
    return PipelineDef(
        source=SourceDef("values", {
            "table": "db.s.users", "primary-keys": ["id"]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.users", "out.public.users"),),
    )


def _duckdb_writer(db_path, ddl_log):
    def on_ddl(tid, events, schema):
        con = duckdb.connect(db_path)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                ddl_log.append(sql)
                con.execute(sql)
            con.commit()
        finally:
            con.close()

    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db_path: duckdb.connect(p),
                              tid.table, schema, parallel=False)
        sink.write_batch(df)

    return writer, on_ddl


def test_evolution_direct_batches(spark, tmp_path):
    """Two direct handler invocations: batch 2 adds a column → DDL fires,
    old rows stay NULL-filled, new rows land widened."""
    db = str(tmp_path / "sink.duckdb")
    ddl_log = []
    writer, on_ddl = _duckdb_writer(db, ddl_log)
    handle = foreach_batch_writer(_pipe(), writer, spark,
                                  on_schema_change=on_ddl)

    handle(spark.createDataFrame([(1, "a"), (2, "b")],
                                 "id int, name string"), 0)
    handle(spark.createDataFrame([(3, "c", 30), (2, "b", 20)],
                                 "id int, name string, age int"), 1)

    assert any(sql.startswith("CREATE TABLE") for sql in ddl_log)
    assert any("ADD COLUMN" in sql and '"age"' in sql for sql in ddl_log)
    got = duckdb.connect(db).execute(
        "SELECT id, name, age FROM users ORDER BY id").fetchall()
    assert got == [(1, "a", None), (2, "b", 20), (3, "c", 30)]


def test_evolution_streaming_restart(spark, tmp_path):
    """Real readStream file source, checkpointed: run 1 processes the v1
    file; the stream restarts with the widened source schema and the
    evolver registry restored from its JSON checkpoint — run 2 processes
    only the new file and infers AddColumn (not CreateTable)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.duckdb")
    (tmp_path / "src").mkdir()

    ddl_log = []
    writer, on_ddl = _duckdb_writer(db, ddl_log)
    pipe = _pipe()

    with open(f"{src}/batch1.json", "w") as f:
        f.write(json.dumps({"id": 1, "name": "a"}) + "\n")
        f.write(json.dumps({"id": 2, "name": "b"}) + "\n")

    evolver1 = SchemaEvolver()
    handle1 = foreach_batch_writer(pipe, writer, spark,
                                   on_schema_change=on_ddl, evolver=evolver1)
    stream1 = spark.readStream.schema("id int, name string").json(src)
    q = (stream1.writeStream.foreachBatch(handle1)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    registry_ckpt = evolver1.manager.to_json()  # checkpointed driver state

    with open(f"{src}/batch2.json", "w") as f:
        f.write(json.dumps({"id": 3, "name": "c", "age": 30}) + "\n")
        f.write(json.dumps({"id": 2, "name": "b2", "age": 20}) + "\n")

    ddl_before_restart = len(ddl_log)
    evolver2 = SchemaEvolver(manager=SchemaManager.from_json(registry_ckpt))
    handle2 = foreach_batch_writer(pipe, writer, spark,
                                   on_schema_change=on_ddl, evolver=evolver2)
    stream2 = spark.readStream.schema("id int, name string, age int").json(src)
    q = (stream2.writeStream.foreachBatch(handle2)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    new_ddl = ddl_log[ddl_before_restart:]
    assert len(new_ddl) == 1 and "ADD COLUMN" in new_ddl[0], new_ddl
    got = duckdb.connect(db).execute(
        "SELECT id, name, age FROM users ORDER BY id").fetchall()
    # id=2 updated by batch 2 (file source offset tracking: batch1 was NOT
    # reprocessed — otherwise name would be 'b' again and age NULL)
    assert got == [(1, "a", None), (2, "b2", 20), (3, "c", 30)]


def test_evolution_type_widening_stream(spark):
    """Drift with a widened column type (int → bigint) coerces the batch
    and issues ALTER ... SET DATA TYPE."""
    ddl_log = []
    captured = []

    def writer(tid, df, schema):
        captured.append((df, schema))

    def on_ddl(tid, events, schema):
        ddl_log.extend(schema_change_ddl(tid.table, events, schema))

    handle = foreach_batch_writer(_pipe(), writer, spark,
                                  on_schema_change=on_ddl)
    handle(spark.createDataFrame([(1, "a")], "id int, name string"), 0)
    handle(spark.createDataFrame([(2**40, "b")], "id bigint, name string"), 1)
    assert any("SET DATA TYPE" in s and '"id"' in s for s in ddl_log), ddl_log
    df, schema = captured[-1]
    assert dict(df.dtypes)["id"] == "bigint"
    rows = sorted(r["id"] for r in df.collect())
    assert rows == [2**40]
    # batch 1 coerced under the old schema at its time: re-coercion of old
    # sink rows is the sink's job (ALTER widens in place) — the stream side
    # only guarantees every batch matches the registry schema at write time
    assert dict(captured[0][0].dtypes)["id"] == "int"


@pytest.mark.parametrize("behavior", ["IGNORE", "EXCEPTION"])
def test_evolution_behavior_policies_in_stream(spark, behavior):
    """IGNORE drops the widened column in the hot path; EXCEPTION refuses
    the batch (SchemaChangeBehavior.java:27-33)."""
    from flink_cdc_dsql_master_spark.evolve import (
        SchemaChangeBehavior,
        SchemaEvolveError,
    )

    captured = []

    def writer(tid, df, schema):
        captured.append(df)

    ev = SchemaEvolver(behavior=SchemaChangeBehavior(behavior))
    handle = foreach_batch_writer(_pipe(), writer, spark, evolver=ev)
    handle(spark.createDataFrame([(1, "a")], "id int, name string"), 0)
    b2 = spark.createDataFrame([(2, "b", 9)], "id int, name string, age int")
    if behavior == "EXCEPTION":
        with pytest.raises(SchemaEvolveError):
            handle(b2, 1)
    else:
        handle(b2, 1)
        assert captured[-1].columns == ["id", "name"]  # age projected away
