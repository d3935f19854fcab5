"""Ported golden vectors from FlinkPipelineTransformITCase.java.

Each test runs the reference's exact projection string over the reference's
fixture rows (mytable1: (1,'Alice',18),(2,'Bob',20); mytable2:
(3,'Carol',15,'student'),(4,'Derrida',25,'student')) and asserts the golden
after-image values (comparison :701, logical :734, arithmetic :767, string
:801, substring :838, conditional :864).

Documented deviation: the reference's `valueEquals` is Java
`Object.equals`, so a BIGINT column never equals an INT literal
(mytable2's `id <> 3` is TRUE for id=3). Spark coerces numeric types before
comparison — the sane SQL behavior — so the mytable2 cross-type vectors are
intentionally not asserted.
"""

import pytest

from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule

TID1 = TableId.parse("default_namespace.default_schema.mytable1")
PAT = r"default_namespace.default_schema.\.*"


@pytest.fixture()
def mytable1(spark):
    return spark.createDataFrame([(1, "Alice", 18), (2, "Bob", 20)],
                                 "id int, name string, age int")


@pytest.fixture()
def mytable2(spark):
    return spark.createDataFrame(
        [(3, "Carol", 15, "student"), (4, "Derrida", 25, "student")],
        "id long, name string, age byte, description string")


def _run(df, projection):
    eng = TransformEngine([TransformRule(PAT, projection=projection)])
    rows = eng.apply(df, TID1).collect()
    return {r["id"]: r for r in rows}


def test_builtin_comparison_functions(mytable1):
    # FlinkPipelineTransformITCase.java:701-728
    rows = _run(mytable1, (
        "*, id = 2 AS col1, id <> 3 AS col2, id > 2 as col3, "
        "id >= 2 as col4, id < 3 as col5, id <= 4 as col6, "
        "name IS NULL as col7, name IS NOT NULL as col8, "
        "id BETWEEN 1 AND 3 as col9, id NOT BETWEEN 2 AND 4 as col10, "
        "name LIKE 'li' as col11, name LIKE 'ro' as col12, "
        "CAST(id AS INT) IN (1, 3, 5) as col13, "
        "name IN ('Bob', 'Derrida') AS col14"))
    alice = rows[1]
    golden = [False, True, False, False, True, True, False, True, True,
              True, True, False, True, False]
    assert [alice[f"col{i}"] for i in range(1, 15)] == golden
    bob = rows[2]
    golden = [True, True, False, True, True, True, False, True, True,
              False, False, False, False, True]
    assert [bob[f"col{i}"] for i in range(1, 15)] == golden


def test_builtin_logical_functions(mytable1):
    # FlinkPipelineTransformITCase.java:734-760 (cols 1,2,4,5,6,7,8,9,10)
    rows = _run(mytable1, (
        "*, id = 2 OR true as col1, id <> 3 OR false as col2, "
        "name = 'Alice' AND true as col4, name <> 'Bob' AND false as col5, "
        "NOT id = 1 as col6, id = 3 IS FALSE as col7, "
        "name = 'Derrida' IS TRUE as col8, "
        "name <> 'Carol' IS NOT FALSE as col9, "
        "name <> 'Eve' IS NOT TRUE as col10"))
    alice = rows[1]
    golden = {"col1": True, "col2": True, "col4": True, "col5": False,
              "col6": False, "col7": True, "col8": False, "col9": True,
              "col10": False}
    assert {k: alice[k] for k in golden} == golden
    bob = rows[2]
    golden = {"col1": True, "col2": True, "col4": False, "col5": False,
              "col6": True, "col7": True, "col8": False, "col9": True,
              "col10": False}
    assert {k: bob[k] for k in golden} == golden


def test_builtin_arithmetic_functions(mytable1):
    # FlinkPipelineTransformITCase.java:767-795
    rows = _run(mytable1, (
        "*, id + 17 AS col1, id - 17 AS col2, id * 17 AS col3, "
        "CAST(id AS DOUBLE) / 1.7 AS col4, "
        "CAST(id AS INT) % 3 AS col5, ABS(id - 17) AS col6, "
        "CEIL(CAST(id AS DOUBLE) / 1.7) AS col7, "
        "FLOOR(CAST(id AS DOUBLE) / 1.7) AS col8, "
        "ROUND(CAST(id AS DOUBLE) / 1.7, 0) AS col9, "
        "CHAR_LENGTH(UUID()) AS col10"))
    alice = rows[1]
    assert alice["col1"] == 18 and alice["col2"] == -16
    assert alice["col3"] == 17
    assert alice["col4"] == pytest.approx(0.5882352941176471)
    assert alice["col5"] == 1 and alice["col6"] == 16
    assert alice["col7"] == 1 and alice["col8"] == 0  # ref emits 1.0/0.0
    assert alice["col9"] == 1.0
    assert alice["col10"] == 36
    bob = rows[2]
    assert bob["col4"] == pytest.approx(1.1764705882352942)
    assert bob["col7"] == 2 and bob["col8"] == 1 and bob["col9"] == 1.0


def test_builtin_string_functions(mytable1, mytable2):
    # FlinkPipelineTransformITCase.java:801-832
    proj = ("*, 'Dear ' || name AS col1, CHAR_LENGTH(name) AS col2, "
            "UPPER(name) AS col3, LOWER(name) AS col4, TRIM(name) AS col5, "
            "REGEXP_REPLACE(name, 'Al|Bo', '**') AS col6, "
            "SUBSTR(name, 1, 1) AS col7, SUBSTR(name, 2, 1) AS col8, "
            "SUBSTR(name, 3) AS col9, "
            "CONCAT(name, ' - ', CAST(id AS VARCHAR)) AS col10")
    rows = _run(mytable1, proj)
    alice = rows[1]
    assert [alice[f"col{i}"] for i in range(1, 11)] == [
        "Dear Alice", 5, "ALICE", "alice", "Alice", "**ice",
        "A", "l", "ice", "Alice - 1"]
    bob = rows[2]
    assert [bob[f"col{i}"] for i in range(1, 11)] == [
        "Dear Bob", 3, "BOB", "bob", "Bob", "**b", "B", "o", "b", "Bob - 2"]

    rows2 = _run(mytable2, proj)
    carol = rows2[3]
    assert [carol[f"col{i}"] for i in range(1, 11)] == [
        "Dear Carol", 5, "CAROL", "carol", "Carol", "Carol",
        "C", "a", "rol", "Carol - 3"]
    derrida = rows2[4]
    assert derrida["col6"] == "Derrida" and derrida["col9"] == "rrida"


def test_substring_zero_and_out_of_range(mytable1):
    # FlinkPipelineTransformITCase.java:838-860: SUBSTR(name, 0, 1) = first
    # char; out-of-range start → empty
    rows = _run(mytable1, (
        "*, SUBSTR(name, 0, 1) AS col1, SUBSTR(name, 100) AS col2, "
        "SUBSTR(name, -3) AS col3"))
    alice = rows[1]
    assert alice["col1"] == "A"
    assert alice["col2"] == ""
    assert alice["col3"] == "ice"  # negative = from end


def test_builtin_conditional_functions(mytable1):
    # FlinkPipelineTransformITCase.java:864-895 shapes
    rows = _run(mytable1, (
        "*, CASE UPPER(name) WHEN 'ALICE' THEN 'A - Alice' "
        "WHEN 'BOB' THEN 'B - Bob' ELSE 'other' END AS col1, "
        "CASE WHEN age < 19 THEN 'minor' ELSE 'adult' END AS col2, "
        "COALESCE(NULL, NULL, name, 'fallback') AS col3, "
        "IF(name = 'Alice', IF(id = 1, 'YES', 'NO'), 'NO') AS col4"))
    alice = rows[1]
    assert alice["col1"] == "A - Alice"
    assert alice["col2"] == "minor"
    assert alice["col3"] == "Alice"
    assert alice["col4"] == "YES"
    bob = rows[2]
    assert bob["col1"] == "B - Bob" and bob["col2"] == "adult"
    assert bob["col4"] == "NO"


def test_temporal_functions_deterministic(mytable1):
    # fixed-input temporal vectors (SystemFunctionUtils.java:54-265);
    # session timezone is UTC (session.py), like the reference's
    # pipeline-timezone plumbing
    rows = _run(mytable1, (
        "*, DATE_FORMAT(TO_TIMESTAMP('2024-03-05 06:07:08'), "
        "'yyyy-MM-dd HH:mm:ss') AS col1, "
        "UNIX_TIMESTAMP('2024-01-01 00:00:00') AS col2, "
        "UNIX_TIMESTAMP('not a date') AS col3, "
        "FROM_UNIXTIME(1704067200) AS col4, "
        "TIMESTAMPDIFF(DAY, TO_TIMESTAMP('2024-01-01 00:00:00'), "
        "TO_TIMESTAMP('2024-03-01 00:00:00')) AS col5, "
        "TIMESTAMPADD(HOUR, 5, TO_TIMESTAMP('2024-01-01 00:00:00')) AS col6, "
        "TO_DATE('2024-02-29') AS col7"))
    r = rows[1]
    assert r["col1"] == "2024-03-05 06:07:08"
    assert r["col2"] == 1704067200
    assert r["col3"] == -9223372036854775808  # Long.MIN_VALUE sentinel
    assert r["col4"] == "2024-01-01 00:00:00"
    assert r["col5"] == 60  # Jan (31) + Feb (29, leap) days
    assert str(r["col6"]).startswith("2024-01-01 05:00:00")
    assert str(r["col7"]) == "2024-02-29"


def test_current_time_functions_shape(mytable1):
    # FlinkPipelineTransformITCase.java:898-960 — relative values; assert
    # types/shapes like the reference's loose assertions
    rows = _run(mytable1, (
        "*, LOCALTIME as lcl_t, CURRENT_TIME as cur_t, "
        "CAST(CURRENT_TIMESTAMP AS TIMESTAMP) as cur_ts, "
        "CAST(NOW() AS TIMESTAMP) as now_ts, "
        "LOCALTIMESTAMP as lcl_ts, CURRENT_DATE as cur_dt"))
    r = rows[1]
    import datetime as dt

    assert len(r["lcl_t"]) == 8 and r["lcl_t"].count(":") == 2
    assert r["lcl_t"] == r["cur_t"]
    assert isinstance(r["cur_ts"], dt.datetime)
    assert isinstance(r["cur_dt"], dt.date)
