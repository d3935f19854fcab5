"""Units for the user-facing scale linter (plans.lint_plan)."""

from pyspark.sql import Window, functions as F

from flink_cdc_dsql_master_spark.plans import explain_scale, lint_plan


def _checks(df):
    return {f["check"] for f in lint_plan(df)}


def test_clean_plan_has_no_findings(spark):
    df = (spark.range(100).groupBy((F.col("id") % 10).alias("k"))
          .agg(F.count("*").alias("n")))
    assert lint_plan(df) == []
    assert explain_scale(df) == ""


def test_flags_global_unpartitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert "single_partition_window" in _checks(df)


def test_partitioned_window_is_clean(spark):
    w = Window.partitionBy(F.col("id") % 10).orderBy("id")
    df = spark.range(100).withColumn("rn", F.row_number().over(w))
    assert "single_partition_window" not in _checks(df)


def test_flags_cartesian_and_row_udf(spark):
    # a small side plans as BroadcastNestedLoopJoin, a big one as
    # CartesianProduct — the linter flags both all-pairs shapes
    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "j")
    assert {"cartesian_product",
            "broadcast_nested_loop_join"} & _checks(a.crossJoin(b))

    f = F.udf(lambda x: x + 1, "bigint", useArrow=False)
    assert "python_row_udf" in _checks(
        spark.range(10).select(f("id").alias("y")))
