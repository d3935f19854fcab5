"""Edge-case vectors: complex column names (COMPLEX_COLUMN_NAME_TABLE,
ValuesDataSourceHelper.java:693 — columns named `class`, `foo-bar`,
`bar-foo`), large literals (FlinkPipelineTransformITCase:2265), and
schema-evolution-mid-stream through the transform engine."""

from pyspark.sql import functions as F, types as T

from flink_cdc_dsql_master_spark.events import AddColumnEvent, CreateTableEvent
from flink_cdc_dsql_master_spark.evolve import SchemaEvolver
from flink_cdc_dsql_master_spark.merging import coerce_dataframe
from flink_cdc_dsql_master_spark.schema import Schema, TableId
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule

TID = TableId.parse("default_namespace.default_schema.table1")
PAT = r"default_namespace.default_schema.\.*"


def test_complex_column_names(spark):
    # reference: columns `class` (a keyword), `foo-bar`, `bar-foo` — usable
    # in projections/filters via backticks (the reference uses a
    # column-name-map $0/$1; Spark handles backticks natively,
    # TransformParser.generateColumnNameMap:588 note in SURVEY §2.4)
    df = spark.createDataFrame(
        [("class0", 0, 0), ("class1", 1, 10)],
        T.StructType([
            T.StructField("class", T.StringType()),
            T.StructField("foo-bar", T.IntegerType()),
            T.StructField("bar-foo", T.IntegerType()),
        ]))
    eng = TransformEngine([TransformRule(
        PAT,
        projection="`class`, `foo-bar` + `bar-foo` AS total",
        filter="`foo-bar` >= 0")])
    rows = {r["class"]: r["total"] for r in eng.apply(df, TID).collect()}
    assert rows == {"class0": 0, "class1": 11}


def test_large_literals(spark):
    # FlinkPipelineTransformITCase:2265: literals beyond INT range stay
    # exact, and BIGINT arithmetic with them works
    df = spark.createDataFrame([(2, "Barcarolle", 22)],
                               "id int, name string, age int")
    eng = TransformEngine([TransformRule(
        PAT,
        projection=("*, 2147483647 AS int_max, "
                    "2147483648 AS greater_than_int_max, "
                    "-2147483648 AS int_min, "
                    "-2147483649 AS less_than_int_min, "
                    "1234567890123456789 AS really_big"),
        filter="CAST(id AS BIGINT) + 2147483648 > 2147483649")])
    rows = eng.apply(df, TID).collect()
    assert len(rows) == 1  # id=2: 2+2^31 > 2^31+1
    r = rows[0]
    assert r["int_max"] == 2147483647
    assert r["greater_than_int_max"] == 2147483648
    assert r["less_than_int_min"] == -2147483649
    assert r["really_big"] == 1234567890123456789


def test_schema_evolution_mid_stream_with_transform(spark):
    """AddColumn arrives between batches while a wildcard transform rule is
    active (ITCase schema-evolution × transform :1264-1909 shape): old rows
    coerce with NULL fill, new rows carry the column, the transform applies
    to both."""
    tid = TableId.parse("db.s.people")
    v1 = Schema.of([("id", "INT NOT NULL"), ("name", "STRING")],
                   primary_keys=["id"])
    ev = SchemaEvolver()
    ev.on_event(CreateTableEvent(tid, v1))

    batch1 = spark.createDataFrame([(1, "alice")], "id int, name string")

    ev.on_event(AddColumnEvent(tid, "age", "INT"))
    evolved = ev.manager.latest_evolved(tid)
    assert evolved.column_names == ["id", "name", "age"]

    batch2 = spark.createDataFrame([(2, "bob", 30)],
                                   "id int, name string, age int")

    eng = TransformEngine([TransformRule(
        r"db.s.\.*", projection="*, UPPER(name) AS name")])
    out1 = eng.apply(coerce_dataframe(batch1, evolved), tid)
    out2 = eng.apply(coerce_dataframe(batch2, evolved), tid)
    merged = out1.unionByName(out2)
    rows = {r["id"]: (r["name"], r["age"]) for r in merged.collect()}
    assert rows == {1: ("ALICE", None), 2: ("BOB", 30)}
