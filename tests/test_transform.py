"""Transform engine conformance tests — ported case shapes from
FlinkPipelineTransformITCase.java (:141-1169) and
UnifiedTransformOperatorTest.java (:334-1169)."""

import pytest

from flink_cdc_dsql_master_spark.events import OP_COLUMN
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.testing import CollectSink, transform_table
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule

TID = TableId.parse("default_namespace.default_schema.table1")
PAT = r"default_namespace.default_schema.table\.*"


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "Alice", 17), (2, "Bob", 19), (3, None, 21), (4, "Dan", None)],
        "id int, name string, age int")


def test_projection_computed_column(people):
    # FlinkPipelineTransformITCase:175 — *, CAST(age*age*age AS INT)
    eng = TransformEngine([TransformRule(
        PAT, projection="*, CAST(age * age * age AS INT) AS cubic_age")])
    rows = {r["id"]: r["cubic_age"]
            for r in eng.apply(people, TID).collect()}
    assert rows[1] == 17 ** 3 and rows[2] == 19 ** 3
    assert rows[4] is None


def test_filter_null_is_false(people):
    eng = TransformEngine([TransformRule(PAT, filter="age > 18")])
    ids = sorted(r["id"] for r in eng.apply(people, TID).collect())
    assert ids == [2, 3]  # id=4 has NULL age → FALSE, dropped


def test_not_equals_keeps_nulls(people):
    eng = TransformEngine([TransformRule(PAT, filter="age <> 19")])
    ids = sorted(r["id"] for r in eng.apply(people, TID).collect())
    assert ids == [1, 3, 4]  # NULL <> 19 is TRUE (JaninoCompiler:265)


def test_star_override_in_place(people):
    eng = TransformEngine([TransformRule(
        PAT, projection="*, UPPER(name) AS name")])
    out = eng.apply(people, TID)
    assert out.columns == ["id", "name", "age"]
    assert {r["name"] for r in out.collect()} == {"ALICE", "BOB", "DAN", None}


def test_unmatched_table_passthrough(people):
    eng = TransformEngine([TransformRule(
        r"other_db.other_schema.t", projection="id")])
    assert eng.apply(people, TID).columns == people.columns


def test_multi_rule_first_filter_pass(people):
    eng = TransformEngine([
        TransformRule(PAT, projection="id, 'adult' AS tag", filter="age >= 18"),
        TransformRule(PAT, projection="id, 'minor' AS tag"),
    ])
    tags = {r["id"]: r["tag"] for r in eng.apply(people, TID).collect()}
    # NULL age → first filter FALSE → falls to unconditional rule
    assert tags == {1: "minor", 2: "adult", 3: "adult", 4: "minor"}


def test_no_rule_passes_drops_event(people):
    eng = TransformEngine([
        TransformRule(PAT, projection="id", filter="age > 100")])
    assert eng.apply(people, TID).count() == 0


def test_metadata_columns(people):
    eng = TransformEngine([TransformRule(
        PAT,
        projection=("id, __namespace_name__ AS ns, __schema_name__ AS sch, "
                    "__table_name__ AS tbl"))])
    r = eng.apply(people, TID).collect()[0]
    assert (r["ns"], r["sch"], r["tbl"]) == (
        "default_namespace", "default_schema", "table1")


def test_pre_transform_pruning(people):
    eng = TransformEngine([TransformRule(
        PAT, projection="id", filter="age > 0", primary_keys=("id",))])
    assert eng.pruned_columns(TID, ["id", "name", "age"]) == ["id", "age"]
    pruned = eng.prune(people, TID)
    assert pruned.columns == ["id", "age"]


def test_soft_delete_via_script(spark):
    script = transform_table()
    df = script.to_changelog_df(spark, TID)
    eng = TransformEngine([TransformRule(
        PAT, projection="id, name, __data_event_type__ AS det",
        converter_after_transform="SOFT_DELETE")])
    out = eng.apply(df, TID)
    ops = {r[OP_COLUMN] for r in out.collect()}
    assert "-D" not in ops  # all deletes became inserts
    golden = CollectSink.render(out, TID)
    assert any("op=INSERT" in g for g in golden)


def test_filter_on_computed_column(people):
    eng = TransformEngine([TransformRule(
        PAT, projection="id, CAST(age * 2 AS INT) AS dbl",
        filter="dbl > 38")])
    ids = sorted(r["id"] for r in eng.apply(people, TID).collect())
    assert ids == [3]  # 19*2=38 fails strict >38; 21*2=42 passes


def test_plan_is_single_stage_project_filter(people):
    eng = TransformEngine([TransformRule(
        PAT, projection="id, UPPER(name) AS un", filter="age > 0")])
    plan = eng.apply(people, TID)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle for a pure transform


def test_op_ts_unavailable_errors_like_unknown_column(spark):
    """Referencing op_ts on a source that supplies no __op_ts backing
    column fails with the reference's unknown-column message (a source
    must declare its SupportedMetadataColumns)."""
    import pytest

    from flink_cdc_dsql_master_spark.schema import TableId
    from flink_cdc_dsql_master_spark.transform import (TransformEngine,
                                                       TransformRule)

    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    eng = TransformEngine([TransformRule(
        r"db.sch.t", projection="id, op_ts AS commit_ts")])
    with pytest.raises(ValueError, match="op_ts"):
        eng.apply(df, TableId.parse("db.sch.t"))


def test_op_ts_resolves_from_backing_column(spark):
    """With the internal __op_ts column present (what the envelope
    decoders attach), a transform can project and filter on op_ts."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.schema import TableId
    from flink_cdc_dsql_master_spark.transform import (TransformEngine,
                                                       TransformRule)

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-06-01 00:00:00")],
        "id bigint, v string, ts string").withColumn(
        "__op_ts", F.to_timestamp("ts")).drop("ts")
    eng = TransformEngine([TransformRule(
        r"db.sch.t", projection="id, op_ts AS commit_ts",
        filter="op_ts > '2024-03-01 00:00:00'")])
    out = eng.apply(df, TableId.parse("db.sch.t"))
    rows = out.select("id", "commit_ts").collect()
    assert [r["id"] for r in rows] == [2]
    assert rows[0]["commit_ts"] is not None
