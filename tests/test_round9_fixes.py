"""Round-9 regression tests: the VERDICT r8 / ADVICE r8 fixes.

1. Registry uniqueness — `_q` raises on duplicate names (r8 shipped two
   silently-shadowed dead definitions), and decorator count == live count.
"""

from __future__ import annotations

import re

import pytest


def test_q_raises_on_duplicate_registration():
    from flink_cdc_dsql_master_spark.queries import QUERIES, _q

    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        _q(name)(lambda spark, sf_dir: None)
    # the failed registration must not have clobbered the original
    assert QUERIES[name] is not None


def test_pin_eager_never_lazy(spark):
    """ADVICE r8 (medium): the poll-loop pin before the snapshot swap must
    be unrecomputable from lineage even under pinMode=persist — persist is
    lazy AND keeps lineage, so the diff could evaluate against the swapped
    (new) snapshot. pin_eager must map persist to an eager, lineage-free
    materialization."""
    from flink_cdc_dsql_master_spark.pinning import PIN_MODE_CONF, pin_eager

    df = spark.range(10).withColumn("v", spark_col_double())
    old = spark.conf.get(PIN_MODE_CONF, "localCheckpoint")
    try:
        spark.conf.set(PIN_MODE_CONF, "persist")
        pinned = pin_eager(df)
        # eager + lineage-truncated: the physical plan must be a scan of
        # checkpointed/materialized data, not the original Range
        plan = pinned._jdf.queryExecution().executedPlan().toString()
        assert "Range" not in plan
    finally:
        spark.conf.set(PIN_MODE_CONF, old)


def spark_col_double():
    from pyspark.sql import functions as F

    return (F.col("id") * 2).cast("double")


def test_decorator_count_equals_live_registry():
    import flink_cdc_dsql_master_spark.queries as q

    src = open(q.__file__).read()
    decorators = len(re.findall(r"@_q\(", src))
    assert decorators == len(q.QUERIES), (
        f"{decorators} @_q decorators but {len(q.QUERIES)} live queries: "
        "a duplicate name is shadowing an earlier definition")
