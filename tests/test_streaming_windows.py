"""Watermarked event-time tumbling windows over a real file stream with
checkpointed restarts: in-watermark merging, late-data drop, append-mode
exactly-once window emission. The reference has no event-time semantics at
all (SURVEY §2.10) — this is the Spark-native capability surfaced."""

from datetime import datetime

from flink_cdc_dsql_master_spark.streaming import streaming_windowed_agg

SCHEMA = "ts timestamp, value double"


def _run(spark, src, ckpt, collected):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_windowed_agg(stream, ts_col="ts", window="1 hour",
                                 watermark="10 minutes")
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_windowed_agg_watermark_and_late_data(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    collected = []

    def ts(h, m, s=0):
        return datetime(2024, 3, 1, h, m, s)

    # batch 1: two rows in the 10:00 window, one at 11:30 that will push
    # the watermark past the 10:00 window's end
    spark.createDataFrame(
        [(ts(10, 0, 10), 1.0), (ts(10, 0, 50), 2.0), (ts(11, 30), 5.0)],
        SCHEMA).write.parquet(src)
    _run(spark, src, ckpt, collected)

    # batch 2 (restart, same checkpoint): a LATE row for the already-closed
    # 10:00 window (watermark is 11:20 > 11:00) — must be dropped — and a
    # 12:30 row that closes the 11:00 window
    spark.createDataFrame(
        [(ts(10, 0, 30), 100.0), (ts(12, 30), 7.0)],
        SCHEMA).write.mode("append").parquet(src)
    _run(spark, src, ckpt, collected)

    # batch 3: advance the watermark far enough to flush the 12:00 window
    spark.createDataFrame([(ts(14, 0), 9.0)], SCHEMA).write.mode(
        "append").parquet(src)
    _run(spark, src, ckpt, collected)

    got = {r["window_start"].hour: (r["n"], r["total"]) for r in collected}
    # 10:00 window emitted exactly once, WITHOUT the late 100.0 row
    assert got[10] == (2, 3.0)
    assert got[11] == (1, 5.0)
    assert got[12] == (1, 7.0)
    hours = [r["window_start"].hour for r in collected]
    assert len(hours) == len(set(hours))  # append mode: one emission each


def test_windowed_agg_keyed(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    collected = []
    schema = "ts timestamp, k string, value double"
    spark.createDataFrame(
        [(datetime(2024, 3, 1, 9, 5), "a", 1.0),
         (datetime(2024, 3, 1, 9, 6), "a", 2.0),
         (datetime(2024, 3, 1, 9, 7), "b", 4.0),
         (datetime(2024, 3, 1, 12, 0), "a", 0.0)],
        schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_windowed_agg(stream, ts_col="ts", key_col="k",
                                 window="1 hour", watermark="5 minutes")
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # second pass to flush windows closed by the 12:00 row's watermark
    spark.createDataFrame(
        [(datetime(2024, 3, 1, 13, 0), "b", 0.0)],
        schema).write.mode("append").parquet(src)
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"].hour, r["k"]): (r["n"], r["total"])
           for r in collected}
    assert got[(9, "a")] == (2, 3.0)
    assert got[(9, "b")] == (1, 4.0)


def test_sliding_windows_overlap(spark, tmp_path):
    """1-hour windows sliding every 30 min: each event lands in 2 windows;
    append-mode emits each closed window instance exactly once."""
    from datetime import datetime

    src, ckpt = str(tmp_path / "src_slide"), str(tmp_path / "ckpt_slide")
    collected = []

    spark.createDataFrame(
        [(datetime(2024, 3, 1, 10, 40), 2.0),
         (datetime(2024, 3, 1, 14, 0), 9.0)],  # closes the 10:xx windows
        SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_windowed_agg(stream, ts_col="ts", window="1 hour",
                                 watermark="10 minutes", slide="30 minutes")
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window_start"].hour, r["window_start"].minute): r["n"]
           for r in collected if r["window_start"].hour < 13}
    # the 10:40 event belongs to [10:00, 11:00) and [10:30, 11:30)
    assert got == {(10, 0): 1, (10, 30): 1}


def test_streaming_session_windows_merge_and_close(spark, tmp_path):
    """Two events 10 min apart (gap 30m) merge into ONE session; an event
    55 min later opens a second. Batch-2 late events beyond the watermark
    horizon are dropped; the first session emits once closed."""
    import datetime as dt
    from flink_cdc_dsql_master_spark.streaming import streaming_session_agg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "user_id string, ts timestamp, value double"
    rows1 = [("u1", t0, 1.0),
             ("u1", t0 + dt.timedelta(minutes=10), 2.0),
             ("u1", t0 + dt.timedelta(minutes=65), 4.0)]
    # batch 2 advances the watermark far past session 1's close
    rows2 = [("u2", t0 + dt.timedelta(hours=6), 8.0)]
    src, ckpt = str(tmp_path / "ssrc"), str(tmp_path / "sckpt")
    rows = []

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_session_agg(stream, "ts", "user_id", "30 minutes",
                                    "10 minutes")
        q = (out.writeStream.outputMode("append")
             .foreachBatch(lambda df, bid: rows.extend(df.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(rows1, schema).write.parquet(src)
    run()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run()
    u1 = sorted((r["session_start"], r["n_events"], r["total"])
                for r in rows if r["user_id"] == "u1")
    # session 1: events at 0 and +10min merged (n=2, total=3.0);
    # session 2: the +65min event alone
    assert (t0, 2, 3.0) in u1
    assert (t0 + dt.timedelta(minutes=65), 1, 4.0) in u1


def test_streaming_topk_complete_mode(spark, tmp_path):
    """Complete-output-mode streaming aggregation: each trigger re-emits
    the full ranked state, so the last batch holds the global top-k over
    everything seen — the live-dashboard output mode (append/update are
    covered elsewhere)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "tksrc")
    ckpt = str(tmp_path / "tkckpt")
    schema = "k string, value double"
    batches = []

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (stream.groupBy("k")
               .agg(F.count("*").alias("n"),
                    F.sum("value").alias("total")))
        q = (agg.writeStream.outputMode("complete")
             .foreachBatch(lambda df, bid: batches.append(
                 df.orderBy(F.desc("n"), "k").limit(2).collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], schema).write.parquet(src)
    run()
    spark.createDataFrame(
        [("b", 1.0), ("b", 1.0), ("c", 9.0)], schema).write.mode(
        "append").parquet(src)
    run()

    final = {r["k"]: (r["n"], r["total"]) for r in batches[-1]}
    # complete mode: counts span BOTH batches; b (3 events) leads a (2)
    assert final == {"b": (3, 5.0), "a": (2, 3.0)}
