"""Schema-evolution × transform ITCase vectors
(FlinkPipelineTransformITCase.java:1264-1909 + generateSchemaEvolutionEvents
:2846-3010), timezone vectors (:1035-1140), error-message parity (:2531),
and the widened ValuesDataSourceHelper event-set catalog.

Documented deviations: Spark has no VARCHAR(n) (rendered STRING); an UPDATE
is one golden line here (the -U/+U pair merged back, matching the
reference's single UPDATE event).
"""

import pytest

from flink_cdc_dsql_master_spark.evolve import SchemaChangeBehavior
from flink_cdc_dsql_master_spark.events import SEQ_COLUMN
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.testing import (
    complex_column_name_table,
    multi_splits_single_table,
    replay_script,
    schema_evolution_events,
    single_split_single_table_with_default_value,
)
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule

T1 = "default_namespace.default_schema.mytable1"


def test_schema_evolution_golden_stream_evolve():
    """The five-stage event script under EVOLVE reproduces the reference's
    golden stream (testVanillaTransformWithSchemaEvolution :1264-1349)."""
    db = replay_script(schema_evolution_events(),
                       behavior=SchemaChangeBehavior.EVOLVE)
    g = db.golden

    def data_lines(lines):
        return [x for x in lines if x.startswith("DataChangeEvent")]

    def ev(before, after, op):
        return (f"DataChangeEvent{{tableId={T1}, before=[{before}], "
                f"after=[{after}], op={op}}}")

    assert data_lines(g) == [
        # initial stage
        ev("", "1, Alice, 21", "INSERT"),
        ev("", "2, Barcarolle, 22", "INSERT"),
        ev("", "3, Cecily, 23", "INSERT"),
        ev("3, Cecily, 23", "3, Colin, 24", "UPDATE"),
        ev("2, Barcarolle, 22", "", "DELETE"),
        # add-column stage (rank FIRST, gender LAST)
        ev("", "1st, 4, Derrida, 24, 0", "INSERT"),
        ev("", "2nd, 5, Eve, 25, 1", "INSERT"),
        ev("2nd, 5, Eve, 25, 1", "2nd, 5, Eva, 20, 2", "UPDATE"),
        ev("", "3rd, 6, Fiona, 26, 3", "INSERT"),
        ev("3rd, 6, Fiona, 26, 3", "", "DELETE"),
        # alter-column-type stage (age DOUBLE, gender INT, name VARCHAR(17))
        ev("", "4th, 7, Gem, 19.0, -1", "INSERT"),
        ev("", "5th, 8, Helen, 18.0, -2", "INSERT"),
        ev("5th, 8, Helen, 18.0, -2", "5th, 8, Harry, 18.0, -3", "UPDATE"),
        ev("", "6th, 9, IINA, 17.0, 0", "INSERT"),
        ev("6th, 9, IINA, 17.0, 0", "", "DELETE"),
        # rename stage (gender→biological_sex, age→toshi)
        ev("", "7th, 10, Julia, 24.0, 1", "INSERT"),
        ev("", "8th, 11, Kalle, 23.0, 0", "INSERT"),
        ev("8th, 11, Kalle, 23.0, 0", "8th, 11, Kella, 18.0, 0", "UPDATE"),
        ev("", "9th, 12, Lynx, 17.0, 0", "INSERT"),
        ev("9th, 12, Lynx, 17.0, 0", "", "DELETE"),
        # drop stage (biological_sex, toshi)
        ev("", "10th, 13, Munroe", "INSERT"),
        ev("", "11th, 14, Neko", "INSERT"),
        ev("11th, 14, Neko", "11th, 14, Nein", "UPDATE"),
        ev("", "12th, 15, Oops", "INSERT"),
        ev("12th, 15, Oops", "", "DELETE"),
    ]
    # schema stream: create + 2 adds + 3 alters + 2 renames + 2 drops
    kinds = [x.split("{", 1)[0] for x in g if not x.startswith("DataChange")]
    assert kinds == (["CreateTableEvent"] + ["AddColumnEvent"] * 2
                     + ["AlterColumnTypeEvent"] * 3
                     + ["RenameColumnEvent"] * 2 + ["DropColumnEvent"] * 2)
    # rename carried values; drops then removed the columns entirely
    assert [f.name for f in db.schema.struct.fields] == ["rank", "id", "name"]
    assert db.final_rows() == [
        ("10th", 13, "Munroe"), ("11th", 14, "Nein"), ("1st", 4, "Derrida"),
        ("2nd", 5, "Eva"), ("4th", 7, "Gem"), ("5th", 8, "Harry"),
        ("7th", 10, "Julia"), ("8th", 11, "Kella"),
        (None, 1, "Alice"), (None, 3, "Colin"),
    ]


def test_schema_evolution_lenient():
    """LENIENT keeps renamed/dropped columns nullable and appends adds LAST
    (SchemaDerivator.java:212-280)."""
    db = replay_script(schema_evolution_events(),
                       behavior=SchemaChangeBehavior.LENIENT)
    assert [f.name for f in db.schema.struct.fields] == [
        "id", "name", "age", "rank", "gender", "biological_sex", "toshi"]
    rows = {r[0]: r for r in db.final_rows()}
    # pre-evolution row: evolved extras NULL-filled
    assert rows[1] == (1, "Alice", 21, None, None, None, None)
    # post-rename row: values land in the ADDED columns, originals go NULL
    assert rows[10] == (10, "Julia", None, "7th", None, 1, 24.0)
    # post-drop row: dropped columns survive as NULL (LENIENT keeps them)
    assert rows[13] == (13, "Munroe", None, "10th", None, None, None)


def test_event_set_with_default_value():
    """SINGLE_SPLIT_SINGLE_TABLE_WITH_DEFAULT_VALUE: the added column back-
    fills its default; the rename carries values under EVOLVE."""
    db = replay_script(single_split_single_table_with_default_value(),
                       behavior=SchemaChangeBehavior.EVOLVE)
    assert [f.name for f in db.schema.struct.fields] == [
        "col1", "col2", "newColWithDefault"]
    assert db.final_rows() == [("1", "1", "flink"), ("2", "x", "flink")]


def test_event_set_multi_splits(spark):
    """MULTI_SPLITS_SINGLE_TABLE: four parallel splits union into one
    changelog; the delete split (the incremental stage) lands last."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.partitioning import apply_changelog

    splits = multi_splits_single_table()
    tid = splits[0].table_ids()[0]
    frames = [
        s.to_changelog_df(spark, tid)
        .withColumn(SEQ_COLUMN, F.col(SEQ_COLUMN) + F.lit(i * 1000))
        for i, s in enumerate(splits)
    ]
    cl = frames[0]
    for f in frames[1:]:
        cl = cl.unionByName(f)
    final = sorted(r["col1"] for r in apply_changelog(cl, ["col1"]).collect())
    assert final == ["1", "3", "5"]


def test_event_set_complex_column_names():
    """COMPLEX_COLUMN_NAME_TABLE: hyphenated names through the full
    create/insert/add/rename/drop/delete/update sequence."""
    db = replay_script(complex_column_name_table(),
                       behavior=SchemaChangeBehavior.EVOLVE)
    assert [f.name for f in db.schema.struct.fields] == [
        "class", "foo-bar", "import-package"]
    assert db.final_rows() == [
        ("class0", 0, None), ("class2", 2, "new Value")]


@pytest.mark.parametrize("tz", ["UTC", "Asia/Shanghai", "America/Los_Angeles"])
def test_timestamp_formatting_vectors(spark, tz):
    """testTransformWithTimestamps (:1035-1140): DATE_FORMAT over
    TIMESTAMP / TIMESTAMP_LTZ with literal-rich patterns and TIMESTAMPADD,
    invariant across pipeline timezones (the LTZ instant is created in the
    same zone the formatter renders in — the reference's setup)."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = spark.sql("""
            SELECT * FROM VALUES
              (1, TIMESTAMP_NTZ'2023-11-27 20:12:31',
                  TIMESTAMP'2020-07-17 18:00:22'),
              (2, TIMESTAMP_NTZ'2018-02-01 04:14:01',
                  TIMESTAMP'2019-12-31 21:00:22'),
              (3, CAST(NULL AS TIMESTAMP_NTZ), CAST(NULL AS TIMESTAMP))
            AS t(id, ts, ts_ltz)
        """)
        eng = TransformEngine([TransformRule(
            r"default_namespace.default_schema.\.*",
            projection=(
                "id, "
                "DATE_FORMAT(ts, 'yyyy~MM~dd') AS df1, "
                "DATE_FORMAT(ts_ltz, 'yyyy~MM~dd') AS df2, "
                "DATE_FORMAT(ts, 'yyyy->MM->dd / HH->mm->ss') AS df3, "
                "DATE_FORMAT(ts_ltz, 'yyyy->MM->dd / HH->mm->ss') AS df4, "
                "DATE_FORMAT(TIMESTAMPADD(SECOND, 17, ts), "
                "'yyyy->MM->dd / HH->mm->ss') AS df5, "
                "DATE_FORMAT(TIMESTAMPADD(SECOND, 17, ts_ltz), "
                "'yyyy->MM->dd / HH->mm->ss') AS df6"),
        )])
        rows = {r["id"]: r for r in
                eng.apply(df, TableId.parse(T1)).collect()}
        assert [rows[1][c] for c in
                ("df1", "df2", "df3", "df4", "df5", "df6")] == [
            "2023~11~27", "2020~07~17",
            "2023->11->27 / 20->12->31", "2020->07->17 / 18->00->22",
            "2023->11->27 / 20->12->48", "2020->07->17 / 18->00->39"]
        assert [rows[2][c] for c in
                ("df1", "df2", "df3", "df4", "df5", "df6")] == [
            "2018~02~01", "2019~12~31",
            "2018->02->01 / 04->14->01", "2019->12->31 / 21->00->22",
            "2018->02->01 / 04->14->18", "2019->12->31 / 21->00->39"]
        assert all(rows[3][c] is None for c in
                   ("df1", "df2", "df3", "df4", "df5", "df6"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_transform_error_messages(spark):
    """testTransformErrorMessage (:2531): unknown projection column,
    unknown filter column, and a projection dropping its declared primary
    key all fail fast with the reference's message content."""
    df = spark.createDataFrame([(1, "Alice", 18)],
                               "id int, name string, age int")
    tid = TableId.parse(T1)

    eng = TransformEngine([TransformRule(T1, projection="id1")])
    with pytest.raises(ValueError, match="Column 'id1' not found in any table"):
        eng.apply(df, tid)

    eng = TransformEngine([TransformRule(T1, projection="*", filter="id1 > 0")])
    with pytest.raises(ValueError, match="Column 'id1' not found in any table"):
        eng.apply(df, tid)

    eng = TransformEngine([TransformRule(T1, projection="name",
                                         primary_keys=("id",))])
    with pytest.raises(ValueError, match='Unable to find column "id" which '
                                         'is defined as primary key'):
        eng.apply(df, tid)
