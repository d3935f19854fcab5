"""distributed_rank / ntile_from_rank: exactness vs the single-partition
window twins, across awkward sizes (n < k, n % k != 0, duplicate keys)."""

import pytest
from pyspark.sql import Window, functions as F

from flink_cdc_dsql_master_spark.operators import sampling


@pytest.mark.parametrize("n,k", [(1, 10), (7, 10), (10, 10), (12, 10),
                                 (103, 10), (64, 7)])
def test_ntile_closed_form_matches_window_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("v"))
    w = Window.orderBy("v")
    want = {r["v"]: r["t"] for r in
            df.withColumn("t", F.ntile(k).over(w)).collect()}
    ranked = sampling.distributed_rank(
        df, [F.col("v").asc()], F.floor(F.col("v") / 5).cast("long"),
        out="i")
    got = {r["v"]: r["t"] for r in
           ranked.crossJoin(F.broadcast(df.agg(
               F.count("*").alias("n"))))
           .withColumn("t", sampling.ntile_from_rank(
               F.col("i"), F.col("n"), k)).collect()}
    assert got == want


def test_distributed_rank_matches_global_row_number(spark):
    df = (spark.range(500)
          .select((F.col("id") % 37).alias("key"),
                  F.col("id").alias("tie")))
    w = Window.orderBy(F.col("key").asc(), F.col("tie").asc())
    want = {(r["key"], r["tie"]): r["i"] for r in
            df.withColumn("i", F.row_number().over(w)).collect()}
    bkt = sampling.range_bucket(df, F.col("key"), 8)
    got = {(r["key"], r["tie"]): r["i"] for r in
           sampling.distributed_rank(
               df, [F.col("key").asc(), F.col("tie").asc()], bkt,
               out="i").collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_distributed_rank_plan_has_no_single_partition_exchange(spark):
    df = spark.range(1000).select((F.col("id") % 101).alias("key"),
                                  F.col("id").alias("tie"))
    bkt = sampling.range_bucket(df, F.col("key"), 8)
    ranked = sampling.distributed_rank(
        df, [F.col("key").asc(), F.col("tie").asc()], bkt, out="i")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    plan = ranked._jdf.queryExecution().explainString(mode)
    assert "Exchange SinglePartition" not in plan
