"""UDF registry + structured-streaming foreachBatch e2e."""

import pytest

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.pipeline import PipelineDef, SinkDef, SourceDef, UdfDef
from flink_cdc_dsql_master_spark.compose import foreach_batch_writer
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.udf import (
    UserDefinedFunction,
    register_udf,
    register_udfs,
)


def shout(s):
    return (s or "") + "!"


def test_register_plain_callable_usable_in_transform(spark):
    # closure, not a module-level ref: executors don't have tests/ on path
    register_udf(spark, "shout", lambda s: (s or "") + "!", "string")
    eng = TransformEngine([TransformRule(
        r"d.s.t", projection="id, SHOUT(name) AS loud")])
    df = spark.createDataFrame([(1, "hi")], "id int, name string")
    out = eng.apply(df, TableId.parse("d.s.t")).collect()
    assert out[0]["loud"] == "hi!"


def test_register_udf_class_with_lifecycle(spark):
    class AddTen(UserDefinedFunction):
        return_type = "int"

        def eval(self, x):
            return None if x is None else x + 10

    register_udf(spark, "add_ten", AddTen)
    eng = TransformEngine([TransformRule(
        r"d.s.t", projection="id, ADD_TEN(id) AS idp")])
    df = spark.createDataFrame([(5, "x")], "id int, name string")
    assert eng.apply(df, TableId.parse("d.s.t")).collect()[0]["idp"] == 15


def test_register_udfs_from_pipeline_defs(spark):
    register_udfs(spark, [
        UdfDef("shout2", "tests.test_udf_streaming:shout")])
    assert spark.sql("SELECT shout2('a') AS v").collect()[0]["v"] == "a!"


def test_streaming_foreach_batch_e2e(spark, tmp_path):
    """File-source stream → transform → route → collected writer, with
    checkpointing (Structured Streaming e2e of the composed pipeline)."""
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [(1, "a", "+I", 1), (2, "b", "+I", 2)],
        f"id int, v string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    batch1.write.parquet(src_dir)

    pipe = PipelineDef(
        source=SourceDef("values", {"table": "db.s.stream",
                                    "primary-keys": ["id"]}),
        sink=SinkDef("values"),
        transforms=(TransformRule(
            r"db.s.\.*", projection="id, UPPER(v) AS v", filter="id > 0"),),
    )
    seen = []

    def writer(tid, df, schema):
        seen.append((tid.identifier(), sorted(
            (r["id"], r["v"]) for r in df.collect())))

    stream = (spark.readStream.schema(batch1.schema).parquet(src_dir))
    q = (stream.writeStream
         .foreachBatch(foreach_batch_writer(pipe, writer, spark))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    assert seen and seen[0][0] == "db.s.stream"
    assert seen[0][1] == [(1, "A"), (2, "B")]


def test_model_functions_in_transform(spark):
    """GET_EMBEDDING / AI_CHAT_PREDICT callable from a projection string
    (TransformSqlOperatorTable.java:355-385 + OpenAIEmbeddingModel shape)."""
    from flink_cdc_dsql_master_spark.functions import register_model_functions

    register_model_functions(spark, dim=8)
    eng = TransformEngine([TransformRule(
        r"d.s.docs",
        projection=("id, GET_EMBEDDING(body) AS emb, "
                    "AI_CHAT_PREDICT(body) AS reply"))])
    df = spark.createDataFrame([(1, "hello world")], "id int, body string")
    row = eng.apply(df, TableId.parse("d.s.docs")).collect()[0]
    assert len(row["emb"]) == 8
    assert row["reply"].startswith("[stub-reply:")
