"""Bucketed-table co-located join: the pay-the-shuffle-once path."""

from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators.joins import (
    co_located_join,
    write_bucketed,
)


def test_bucketed_join_no_exchange(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv"))
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("rv"))
    write_bucketed(left, "bkt_left", ["k"], 8, sort_cols=["k"])
    write_bucketed(right, "bkt_right", ["k"], 8, sort_cols=["k"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        j = co_located_join(spark, "bkt_left", "bkt_right", "k")
        assert j.count() == 500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same result as the plain (shuffled) join
        plain = left.join(right, "k").count()
        assert plain == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
