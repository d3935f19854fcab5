"""Numeric casting truncation vectors
(FlinkPipelineTransformITCase.testNumericCastingsWithTruncation :2166).

Fixture row shape: id BIGINT, tiny_c TINYINT, small_c SMALLINT, int_c INT,
bigint_c BIGINT, float_c FLOAT, double_c DOUBLE, decimal_c DECIMAL(10,2),
valid_char_c VARCHAR ('12.13'-style), invalid_char_c VARCHAR ('foo').
"""

from decimal import Decimal

import pytest

from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.transform import TransformEngine, TransformRule

TID = TableId.parse("ns.scm.tbl")
COLS = ["tiny_c", "small_c", "int_c", "bigint_c", "float_c", "double_c",
        "decimal_c", "valid_char_c", "invalid_char_c"]


@pytest.fixture()
def tbl(spark):
    rows = [
        (-1, -2, -3, -4, -5, -6.7, -8.9, Decimal("-10.11"), "-12.13", "foo"),
        (0, 0, 0, 0, 0, 0.0, 0.0, Decimal("0.00"), "0", "bar"),
        (1, 2, 3, 4, 5, 6.7, 8.9, Decimal("10.11"), "12.13", "baz"),
        (2, None, None, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "id long, tiny_c byte, small_c short, int_c int, bigint_c long, "
        "float_c float, double_c double, decimal_c decimal(10,2), "
        "valid_char_c string, invalid_char_c string")


def _cast_all(tbl, target):
    proj = "id, " + ", ".join(f"CAST({c} AS {target}) AS {c}" for c in COLS)
    eng = TransformEngine([TransformRule(r"ns.scm.tbl", projection=proj)])
    return {r["id"]: [r[c] for c in COLS]
            for r in eng.apply(tbl, TID).collect()}


def test_cast_to_tinyint(tbl):
    rows = _cast_all(tbl, "TINYINT")
    # golden :2186-2190: floats truncate toward zero, strings go via double
    assert rows[-1] == [-2, -3, -4, -5, -6, -8, -10, -12, None]
    assert rows[1] == [2, 3, 4, 5, 6, 8, 10, 12, None]
    assert rows[2] == [None] * 9


def test_cast_to_int_and_bigint(tbl):
    assert _cast_all(tbl, "INT")[-1] == [-2, -3, -4, -5, -6, -8, -10, -12, None]
    assert _cast_all(tbl, "BIGINT")[1] == [2, 3, 4, 5, 6, 8, 10, 12, None]


def test_cast_to_boolean(tbl):
    rows = _cast_all(tbl, "BOOLEAN")
    # golden :2177-2181: numerics non-zero → true; STRINGS via
    # Boolean.valueOf → '12.13'/'foo' are FALSE
    assert rows[-1] == [True] * 7 + [False, False]
    assert rows[0] == [False] * 7 + [False, False]
    assert rows[1] == [True] * 7 + [False, False]
    assert rows[2] == [None] * 9


def test_cast_to_float_double(tbl):
    rows = _cast_all(tbl, "FLOAT")
    assert rows[1][:4] == [2.0, 3.0, 4.0, 5.0]
    assert rows[1][4] == pytest.approx(6.7, abs=1e-6)
    assert rows[1][7] == pytest.approx(12.13, abs=1e-5)  # string → float
    assert rows[1][8] is None  # 'baz' → null
    rows = _cast_all(tbl, "DOUBLE")
    assert rows[1][5] == 8.9 and rows[1][7] == 12.13


def test_cast_to_decimal_rounds_half_up_and_nulls_on_overflow(tbl):
    rows = _cast_all(tbl, "DECIMAL(1, 0)")
    # golden :2230-2234: -6.7 → -7 (HALF_UP), -10.11 → null (overflow),
    # strings → null at precision 1
    assert rows[-1] == [Decimal(-2), Decimal(-3), Decimal(-4), Decimal(-5),
                        Decimal(-7), Decimal(-9), None, None, None]
    assert rows[1] == [Decimal(2), Decimal(3), Decimal(4), Decimal(5),
                       Decimal(7), Decimal(9), None, None, None]


def test_cast_to_varchar(tbl):
    rows = _cast_all(tbl, "VARCHAR")
    assert rows[1][0] == "2" and rows[1][8] == "baz"
    assert rows[2] == [None] * 9
