"""Stream-stream interval join over real file streams with checkpointed
restart: watermark-bounded state, no duplicate emission on replay."""

from datetime import datetime

import pytest

from flink_cdc_dsql_master_spark.streaming import streaming_interval_join

L_SCHEMA = "p_id long, p_user long, p_ts timestamp"
R_SCHEMA = "c_id long, c_user long, c_ts timestamp"


def _ts(m, s=0):
    return datetime(2024, 3, 1, 12, m, s)


def _run(spark, lsrc, rsrc, ckpt, collected):
    left = spark.readStream.schema(L_SCHEMA).parquet(lsrc)
    right = spark.readStream.schema(R_SCHEMA).parquet(rsrc)
    out = streaming_interval_join(
        left, right, [("p_user", "c_user")], "p_ts", "c_ts",
        lower_s=-1800, upper_s=0, watermark="5 minutes")
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_interval_join_matches_and_replay_safe(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")
    collected = []

    spark.createDataFrame(
        [(1, 10, _ts(30)), (2, 20, _ts(40))], L_SCHEMA).write.parquet(lsrc)
    spark.createDataFrame(
        [(101, 10, _ts(15)),      # inside purchase 1's 30-min lookback
         (102, 10, _ts(31)),      # AFTER purchase 1 -> no match
         (103, 99, _ts(29))],     # unknown user
        R_SCHEMA).write.parquet(rsrc)
    _run(spark, lsrc, rsrc, ckpt, collected)

    got = sorted((r["p_id"], r["c_id"]) for r in collected)
    assert got == [(1, 101)]

    # restart from the same checkpoint: a new click matching purchase 2
    # arrives (inside the right-side watermark, which run 1 advanced to
    # 12:26 = max(c_ts) - 5 min); prior pairs must NOT be re-emitted
    spark.createDataFrame([(104, 20, _ts(39))],
                          R_SCHEMA).write.mode("append").parquet(rsrc)
    _run(spark, lsrc, rsrc, ckpt, collected)

    got = sorted((r["p_id"], r["c_id"]) for r in collected)
    assert got == [(1, 101), (2, 104)]


def test_interval_join_rejects_bad_args(spark, tmp_path):
    spark.createDataFrame([(1, 10, _ts(0))], L_SCHEMA).write.parquet(
        str(tmp_path / "x"))
    spark.createDataFrame([(2, 10, _ts(0))], R_SCHEMA).write.parquet(
        str(tmp_path / "y"))
    left = spark.readStream.schema(L_SCHEMA).parquet(str(tmp_path / "x"))
    right = spark.readStream.schema(R_SCHEMA).parquet(str(tmp_path / "y"))
    with pytest.raises(ValueError, match="upper_s"):
        streaming_interval_join(left, right, [("p_user", "c_user")],
                                "p_ts", "c_ts", 5, -5)
    with pytest.raises(ValueError, match="ambiguous"):
        streaming_interval_join(left, left, [("p_user", "p_user")],
                                "p_ts", "p_ts", -5, 5)
