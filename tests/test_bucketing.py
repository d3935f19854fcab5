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


def test_partitioned_layout_write_and_partition_pruning(spark, tmp_path,
                                                        sf_dir):
    """Date-partitioned parquet layout: a day-filtered read must prune at
    the PARTITION level (PartitionFilters in the scan, one day directory
    read), never scan-then-filter — at 100 TB the difference is reading
    1/365th of the table vs all of it."""
    from pyspark.sql import functions as F

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("day", F.to_date("ts")))
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(path)

    days = [r["day"] for r in
            spark.read.parquet(path).select("day").distinct().collect()]
    assert len(days) > 3
    one = sorted(days)[1]
    rd = spark.read.parquet(path).where(F.col("day") == F.lit(one))
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split(
        "PartitionFilters", 1)[1][:200]
    # pruning is visible in the scan: the day predicate is a partition
    # filter (metadata-only), NOT a data filter after a full scan
    scan = plan.split("PartitionFilters", 1)[1]
    assert "isnotnull(day" in scan[:200]
    data_filters = plan.split("PushedFilters", 1)
    if len(data_filters) > 1:  # day never appears as a row-level filter
        assert "day" not in data_filters[1][:120]
