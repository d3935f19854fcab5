"""Multi-table pipeline e2e: the ITCase mytable1/mytable2 pair through the
batch composer — transform + fan-in route + schema widening + changelog
materialization, asserted against the reference's expected merged shape."""

from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.compose import BatchComposer
from flink_cdc_dsql_master_spark.events import OP_COLUMN
from flink_cdc_dsql_master_spark.partitioning import apply_changelog
from flink_cdc_dsql_master_spark.pipeline import PipelineDef, SinkDef, SourceDef
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.testing import multi_transform_tables
from flink_cdc_dsql_master_spark.transform import TransformRule


def test_multitable_fan_in_with_transform(spark):
    script = multi_transform_tables()
    pipe = PipelineDef(
        source=SourceDef("values", {"script": script}),
        sink=SinkDef("values"),
        transforms=(TransformRule(
            r"default_namespace.default_schema.mytable\.*",
            projection="id, UPPER(name) AS name, age",
        ),),
        routes=(RouteRule(
            r"default_namespace.default_schema.mytable\.*",
            "sink_db.merged.people"),),
    )
    result = BatchComposer(spark, pipe).run()
    sink_tid = TableId.parse("sink_db.merged.people")
    schema = result.schemas[sink_tid]
    # INT + BIGINT id → BIGINT; INT + TINYINT age → INT
    # (SchemaMergingUtils.getLeastCommonType:462 lattice)
    assert schema.struct["id"].dataType.typeName() == "long"
    assert schema.struct["age"].dataType.typeName() == "integer"

    df = result.tables[sink_tid]
    # materialize the changelog to final state: Bob updated to 30,
    # Derrida deleted
    final = apply_changelog(df, ["id"])
    state = {r["id"]: (r["name"], r["age"]) for r in final.collect()}
    assert state == {1: ("ALICE", 18), 2: ("BOB", 30), 3: ("CAROL", 15)}

    # changelog still carries the delete row before materialization
    ops = [r[OP_COLUMN] for r in df.collect()]
    assert ops.count("-D") == 1 and ops.count("-U") == 1
