"""Stateful streaming operator tests: cross-batch dedup + running counts.

Two micro-batches are fed through a file stream with a shared checkpoint,
so state genuinely persists across batches.
"""

import time

from flink_cdc_dsql_master_spark.streaming import (
    streaming_exact_dedup,
    streaming_running_counts,
)


def _run_two_batches(spark, tmp_path, build_query, batch1_rows, batch2_rows,
                     schema, mode="append"):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def sink(df, batch_id):
        collected.append((batch_id, df.collect()))

    spark.createDataFrame(batch1_rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = build_query(stream)
    q = (out.writeStream.outputMode(mode).foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    spark.createDataFrame(batch2_rows, schema).write.mode(
        "append").parquet(src)
    q = (out.writeStream.outputMode(mode).foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    time.sleep(0.2)
    return collected


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    schema = "k string, value double"
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_exact_dedup(s, "k"),
        [("a", 1.0), ("a", 2.0), ("b", 3.0)],  # batch 1: a dup within batch
        [("a", 4.0), ("c", 5.0)],              # batch 2: a dup across batch
        schema)
    rows = [r for _, batch in collected for r in batch]
    keys = sorted(r["k"] for r in rows)
    assert keys == ["a", "b", "c"]  # each key exactly once, ever


def test_streaming_running_counts(spark, tmp_path):
    schema = "k string, value double"
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_running_counts(s, "k"),
        [("a", 1.0), ("a", 2.0), ("b", 3.0)],
        [("a", 4.0)],
        schema, mode="update")
    final = {}
    for _, batch in collected:
        for r in batch:
            final[r["k"]] = (r["n"], r["total"])
    assert final["a"] == (3, 7.0)  # state carried across batches
    assert final["b"] == (1, 3.0)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    import datetime as dt
    from flink_cdc_dsql_master_spark.streaming import (
        streaming_dedup_within_watermark)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "k string, ts timestamp, value double"
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_dedup_within_watermark(s, ["k"], "ts",
                                                   "10 minutes"),
        # batch 1: in-batch duplicate of a
        [("a", t0, 1.0), ("a", t0 + dt.timedelta(seconds=30), 2.0),
         ("b", t0, 3.0)],
        # batch 2: replay of a within the watermark window + new key
        [("a", t0 + dt.timedelta(minutes=2), 4.0),
         ("c", t0 + dt.timedelta(minutes=2), 5.0)],
        schema)
    rows = [r for _, batch in collected for r in batch]
    keys = sorted(r["k"] for r in rows)
    assert keys == ["a", "b", "c"]
    # first arrival won: a kept value 1.0
    assert [r["value"] for r in rows if r["k"] == "a"] == [1.0]
