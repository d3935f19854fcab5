"""Every function the reference registers (TransformSqlOperatorTable.java,
SURVEY §2.5 'complete inventory') must compile through the expression
rewriter — a structural completeness gate, independent of the per-family
semantic oracles."""

import pytest

from flink_cdc_dsql_master_spark.exprs import rewrite_expr, rewrite_filter

FILTER_SURFACE = [
    # comparison (:90-110)
    "a = b", "a <> b", "a > b", "a >= b", "a < b", "a <= b",
    "a IS NULL", "a IS NOT NULL",
    "a BETWEEN 1 AND 9", "a NOT BETWEEN 1 AND 9",
    "s LIKE 'x.*'", "s NOT LIKE 'x.*'",
    "a IN (1, 2, 3)", "a NOT IN (1, 2, 3)",
    # logical (:114-122)
    "a > 1 AND b > 1", "a > 1 OR b > 1", "NOT (a > 1)",
    "(a > 1) IS TRUE", "(a > 1) IS NOT TRUE",
    "(a > 1) IS FALSE", "(a > 1) IS NOT FALSE",
]

EXPR_SURFACE = [
    # arithmetic (:127-152)
    "a + b", "a - b", "a * b", "a / b", "a % b",
    "ABS(a)", "CEIL(a)", "CEILING(a)", "FLOOR(a)", "ROUND(a, 2)", "UUID()",
    # string (:155-198)
    "a || b", "CONCAT(a, b, c)", "CHAR_LENGTH(s)", "UPPER(s)", "LOWER(s)",
    "TRIM(s)", "REGEXP_REPLACE(s, 'x', 'y')", "SUBSTR(s, 1, 3)",
    "SUBSTRING(s, 2)",
    # temporal (:199-305)
    "LOCALTIME()", "LOCALTIMESTAMP()", "CURRENT_TIME()", "CURRENT_DATE()",
    "CURRENT_TIMESTAMP()", "NOW()",
    "UNIX_TIMESTAMP(s)", "UNIX_TIMESTAMP(s, 'yyyy-MM-dd')",
    "FROM_UNIXTIME(n)", "FROM_UNIXTIME(n, 'yyyy-MM-dd')",
    "DATE_FORMAT(ts, 'yyyy-MM-dd HH:mm:ss')",
    "TIMESTAMPDIFF(DAY, t1, t2)", "TIMESTAMP_DIFF(DAY, t1, t2)",
    "TIMESTAMPADD(SECOND, 17, ts)",
    "TO_DATE(s)", "TO_DATE(s, 'yyyy-MM-dd')",
    "TO_TIMESTAMP(s)", "TO_TIMESTAMP(s, 'yyyy-MM-dd HH:mm:ss')",
    # conditional (:306-352)
    "CASE WHEN a > 1 THEN 'x' ELSE 'y' END",
    "CASE seg WHEN 'A' THEN 1 ELSE 2 END",
    "COALESCE(a, b, 0)", "IF(a > 1, 'x', 'y')",
    # casts (:353, transform.md:201-216)
    "CAST(x AS TINYINT)", "CAST(x AS SMALLINT)", "CAST(x AS INT)",
    "CAST(x AS BIGINT)", "CAST(x AS FLOAT)", "CAST(x AS DOUBLE)",
    "CAST(x AS STRING)", "CAST(x AS VARCHAR)", "CAST(x AS CHAR)",
    "CAST(x AS DECIMAL(10, 2))", "CAST(x AS BOOLEAN)",
    "CAST(x AS TIMESTAMP)", "CAST(x AS DATE)",
    # AI model fns (:355-385)
    "GET_EMBEDDING(s)", "AI_CHAT_PREDICT(s)", "AI_LANGCHAIN_PREDICT(s)",
    # metadata columns (MetadataColumns.java:28-40)
    "__namespace_name__", "__schema_name__", "__table_name__",
    "__data_event_type__",
]


@pytest.mark.parametrize("expr", FILTER_SURFACE)
def test_filter_surface_compiles(expr):
    assert rewrite_filter(expr)


@pytest.mark.parametrize("expr", EXPR_SURFACE)
def test_expr_surface_compiles(expr):
    assert rewrite_expr(expr)
