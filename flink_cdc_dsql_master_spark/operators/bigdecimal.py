"""Exact arithmetic over BIG_DECIMAL tagged-string columns.

The reference's e2e fixture DDL declares ``DECIMAL(65,1)``
(flink-cdc-e2e-tests/flink-cdc-pipeline-e2e-tests/src/test/resources/
ddl/data_types_test.sql:20-64) — wider than both Spark's and DuckDB's
native DECIMAL ceiling of 38. The engine policy (types.py, SURVEY §1.3)
carries such values as canonical digit strings tagged ``BIG_DECIMAL``.
This module gives them EXACT relational aggregation anyway:

- the scaled-integer digit string (``replace(value, '.', '')``) is
  left-padded to 72 digits and split into three 24-digit limbs, each
  safe in DECIMAL(38,0);
- the limbs are summed independently — ONE partial-aggregated shuffle
  of three decimal columns, identical cost to a plain SUM(price) at
  100 TB;
- carries are re-propagated on the 1-row result and the exact total is
  re-rendered as a canonical scale-1 decimal string.

The whole algorithm is dialect-shared SQL: the only divergent token is
the string cast name (Spark ``STRING`` vs DuckDB ``VARCHAR``), so the
DuckDB oracle executes the textually identical plan — and the result is
additionally pinned against Python big-int ground truth in pytest.
"""

from __future__ import annotations

LIMB_DIGITS = 24
PAD_WIDTH = 72  # three limbs cover DECIMAL(65,s): 66 scaled digits < 72

_L = "CAST('1' || repeat('0', 24) AS DECIMAL(38,0))"


def exact_sum_sql(src: str, value_col: str = "big",
                  varchar: str = "VARCHAR") -> str:
    """SQL computing ``(cnt, total)`` — the exact sum of a scale-1
    BIG_DECIMAL string column ``value_col`` over relation ``src`` (any
    SQL relation expression: a table name or a parenthesized subquery).

    ``varchar`` is the dialect's string type name: "VARCHAR" (DuckDB) or
    "STRING" (Spark). Everything else is shared text.
    """
    vc = varchar
    return f"""
    WITH digits AS (
      SELECT lpad(replace({value_col}, '.', ''), {PAD_WIDTH}, '0') AS d
      FROM {src}
    ), limbs AS (
      SELECT CAST(substring(d, 1, 24) AS DECIMAL(38,0)) AS hi,
             CAST(substring(d, 25, 24) AS DECIMAL(38,0)) AS mid,
             CAST(substring(d, 49, 24) AS DECIMAL(38,0)) AS lo
      FROM digits
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(hi) AS sh, SUM(mid) AS sm, SUM(lo) AS sl
      FROM limbs
    ), carried AS (
      SELECT cnt,
             sh + CAST((sm + CAST((sl - (sl % {_L})) / {_L} AS DECIMAL(38,0))
                        - ((sm + CAST((sl - (sl % {_L})) / {_L}
                                      AS DECIMAL(38,0))) % {_L}))
                       / {_L} AS DECIMAL(38,0)) AS fhi,
             (sm + CAST((sl - (sl % {_L})) / {_L} AS DECIMAL(38,0)))
               % {_L} AS fmid,
             sl % {_L} AS flo
      FROM sums
    ), rendered AS (
      SELECT cnt,
             regexp_replace(CAST(fhi AS {vc})
                            || lpad(CAST(fmid AS {vc}), 24, '0')
                            || lpad(CAST(flo AS {vc}), 24, '0'),
                            '^0+', '') AS dsum
      FROM carried
    )
    SELECT cnt,
           substring(dsum, 1, length(dsum) - 1) || '.'
             || substring(dsum, length(dsum), 1) AS total
    FROM rendered
    """


def exact_sum(df, value_col: str = "big"):
    """Spark-side exact sum of a scale-1 BIG_DECIMAL string column:
    registers ``df`` under a scoped temp view and runs the
    dialect-shared SQL with the Spark string cast. Returns a 1-row
    DataFrame (cnt bigint, total string)."""
    view = "__bigdecimal_exact_sum_src"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        exact_sum_sql(view, value_col, varchar="STRING"))
