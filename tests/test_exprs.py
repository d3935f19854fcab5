"""Expression dialect parser/rewriter unit tests (no Spark needed).

Vectors mirror the reference semantics from SystemFunctionUtils.java and
JaninoCompiler.java (see exprs.py docstring for cites).
"""

import pytest

from flink_cdc_dsql_master_spark.exprs import (
    parse_expr,
    parse_projection,
    referenced_columns,
    rewrite_expr,
    rewrite_filter,
)


def test_comparison_null_false():
    # FILTER context: bare comparison (row-equivalent to null→FALSE, and
    # pushdown-capable); PROJECTION context: explicit two-valued coalesce
    assert rewrite_filter("a > 1") == "((`a`) > (1))"
    sql = rewrite_expr("a > 1")
    assert "coalesce" in sql and "false" in sql


def test_equals_null_semantics():
    # filter: bare `=` (NULL comparisons drop rows either way)
    assert rewrite_filter("a = b") == "((`a`) = (`b`))"
    # projection: the valueEquals rendering must stay two-valued
    sql = rewrite_expr("a = b")
    assert "IS NOT NULL" in sql and "<=>" in sql


def test_not_equals_is_negated_equals():
    sql = rewrite_filter("a <> b")
    assert sql.startswith("(NOT")


def test_like_is_rlike():
    sql = rewrite_filter("name LIKE 'A.*'")
    assert "RLIKE" in sql


def test_between_and_in():
    # filter context: positive forms bare (pushdown); negated forms keep
    # the two-valued rendering (NULL must become TRUE under the NOT)
    assert rewrite_filter("v BETWEEN 1 AND 10") == \
        "((`v`) BETWEEN (1) AND (10))"
    assert "IN (" in rewrite_filter("v IN (1, 2, 3)")
    assert rewrite_filter("v NOT IN (1)").startswith("(NOT coalesce")
    assert "coalesce" in rewrite_expr("v BETWEEN 1 AND 10")


def test_two_valued_logic_wraps_bare_columns():
    sql = rewrite_filter("flag AND other")
    assert sql.count("coalesce(cast(") == 2


def test_cast_int_has_double_fallback():
    sql = rewrite_expr("CAST(x AS INT)")
    assert "cast(cast(`x` as double) as int)" in sql


def test_cast_boolean_formula():
    sql = rewrite_expr("CAST(x AS BOOLEAN)")
    assert "!= 0.0d" in sql and "'true'" in sql


def test_unix_timestamp_sentinel():
    sql = rewrite_expr("UNIX_TIMESTAMP(s)")
    assert "-9223372036854775808" in sql


def test_date_format_pattern_translation():
    sql = rewrite_expr("DATE_FORMAT(ts, 'yyyy-MM-dd')")
    assert "date_format(`ts`, 'yyyy-MM-dd')" in sql


def test_case_both_forms():
    assert "CASE WHEN" in rewrite_expr(
        "CASE WHEN a > 1 THEN 'x' ELSE 'y' END")
    assert "CASE `seg`" in rewrite_expr(
        "CASE seg WHEN 'A' THEN 1 ELSE 2 END")


def test_concat_skips_nulls_via_concat_ws():
    assert "concat_ws" in rewrite_expr("CONCAT(a, b)")
    assert "concat_ws" in rewrite_expr("a || b")


def test_projection_star_and_alias():
    items = parse_projection("*, UPPER(name) AS uname, id")
    assert items[0].is_star
    assert items[1].alias == "uname" and items[1].refs == ("name",)
    assert items[2].alias == "id"


def test_projection_requires_alias_for_expressions():
    with pytest.raises(ValueError):
        parse_projection("UPPER(name)")


def test_referenced_columns():
    refs = referenced_columns("id, a + b AS s", "c > 1 AND d LIKE 'x'")
    assert refs == ["id", "a", "b", "c", "d"]


def test_timestampdiff_unit_not_a_column():
    refs = referenced_columns("TIMESTAMPDIFF(DAY, a, b) AS d", None)
    assert refs == ["a", "b"]


def test_backquoted_identifiers():
    sql = rewrite_expr("`weird col` + 1")
    assert "`weird col`" in sql


def test_parse_error_on_garbage():
    with pytest.raises(ValueError):
        parse_expr("a >!< b")
