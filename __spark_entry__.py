"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``flink_cdc_dsql_master_spark/queries.py`` —
one entry per implemented operator from SURVEY.md §2 plus the LLM-pipeline
operators; queries without an ``oracle_sql`` entry (seeded-hash approximate
ops) get the weaker rows-only check by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference-shaped
    transform rule (projection + computed column + regex-LIKE filter)."""
    from flink_cdc_dsql_master_spark.queries import QUERIES

    return QUERIES["transform_projection_filter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_cdc_dsql_master_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from flink_cdc_dsql_master_spark.queries import ORACLE

    return dict(ORACLE)
