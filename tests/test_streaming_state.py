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
    # one in-batch row for 'a' won (intra-batch pick is partition-order
    # dependent); the batch-2 replay (4.0) was dropped by state for sure
    a_vals = [r["value"] for r in rows if r["k"] == "a"]
    assert len(a_vals) == 1 and a_vals[0] in (1.0, 2.0)


def test_streaming_rollup_maintenance(spark, tmp_path):
    """foreachBatch-maintained rollup: signed partials folded into a
    parquet state table per micro-batch (temp-write + atomic swap), so
    the rollup equals the direct aggregate of the net stream after any
    number of batches — the streaming face of operators/ivm.py."""
    import os
    from flink_cdc_dsql_master_spark.operators import ivm

    src = str(tmp_path / "rsrc")
    ckpt = str(tmp_path / "rckpt")
    state_dir = str(tmp_path / "rollup.parquet")
    schema = "g string, value double, __op string"

    def fold(batch_df, batch_id):
        try:
            state = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            state = None
        delta = ivm.rollup_delta(batch_df, ["g"], "value")
        new = ivm.merge_rollup(state, delta, ["g"])
        tmp = state_dir + ".tmp"
        new.write.mode("overwrite").parquet(tmp)
        import shutil
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream.writeStream.foreachBatch(fold)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", 1.0, "+I"), ("a", 2.0, "+I"), ("b", 5.0, "+I")],
        schema).write.parquet(src)
    run()
    spark.createDataFrame(
        [("a", 1.0, "-D"), ("b", 5.0, "-U"), ("b", 8.0, "+U"),
         ("c", 3.0, "+I")], schema).write.mode("append").parquet(src)
    run()

    rows = {r["g"]: (r["n"], r["total"]) for r in
            ivm.rollup_view(spark.read.parquet(state_dir)).collect()}
    assert rows == {"a": (1, 2.0), "b": (1, 8.0), "c": (1, 3.0)}


def test_streaming_scd2_maintenance(spark, tmp_path):
    """SCD2 history folded per micro-batch via scd2_apply_increment:
    after two checkpointed availableNow runs the parquet history equals
    the one-shot scd2_history of the full changelog."""
    import os
    import shutil
    from flink_cdc_dsql_master_spark.partitioning import (
        scd2_apply_increment, scd2_history)

    src = str(tmp_path / "ssrc2")
    ckpt = str(tmp_path / "sckpt2")
    hist_dir = str(tmp_path / "hist.parquet")
    schema = "k int, val string, __seq long, __op string"
    rows1 = [(1, "v1", 10, "+I"), (2, "w1", 11, "+I"), (1, "v2", 12, "+U")]
    rows2 = [(1, None, 14, "-D"), (1, "v3", 16, "+I"), (3, "x1", 17, "+I")]

    def fold(batch_df, batch_id):
        try:
            hist = batch_df.sparkSession.read.parquet(hist_dir)
        except Exception:
            hist = None
        new = scd2_apply_increment(hist, batch_df, ["k"])
        tmp = hist_dir + ".tmp"
        new.write.mode("overwrite").parquet(tmp)
        if os.path.exists(hist_dir):
            shutil.rmtree(hist_dir)
        os.rename(tmp, hist_dir)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream.writeStream.foreachBatch(fold)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(rows1, schema).write.parquet(src)
    run()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    run()

    key = lambda df: sorted(
        (r["k"], r["val"], r["valid_from_seq"], r["valid_to_seq"],
         r["is_current"]) for r in df.collect())
    got = key(spark.read.parquet(hist_dir))
    want = key(scd2_history(
        spark.createDataFrame(rows1 + rows2, schema), ["k"]))
    assert got == want and len(got) == 5


def test_streaming_temporal_enrich(spark, tmp_path):
    """Processing-time temporal join: facts pick up the dim version
    current at their micro-batch; a later dim update changes later
    facts only; unseen keys enrich as NULL."""
    from flink_cdc_dsql_master_spark.streaming import (
        streaming_temporal_enrich, tag_temporal_streams)

    schema = ("k string, __kind string, __seq long, amount double, "
              "rate double")
    b1 = [
        ("a", "d", 1, None, 1.5),     # dim arrives with/before facts
        ("a", "f", 2, 10.0, None),
        ("b", "f", 3, 20.0, None),    # no dim for b yet -> NULL rate
    ]
    b2 = [
        ("a", "d", 4, None, 2.0),     # dim update applies before facts
        ("a", "f", 5, 30.0, None),
        ("b", "f", 6, 40.0, None),    # still no dim for b
    ]
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_temporal_enrich(
            s, "k", ["amount"], ["rate"], seq_col="__seq"),
        b1, b2, schema)
    rows = {(r["k"], r["amount"]): r["rate"]
            for _, batch in collected for r in batch}
    assert rows[("a", 10.0)] == 1.5   # batch-1 version
    assert rows[("a", 30.0)] == 2.0   # updated version
    assert rows[("b", 20.0)] is None and rows[("b", 40.0)] is None


def test_streaming_pattern_match_across_batches(spark, tmp_path):
    from flink_cdc_dsql_master_spark.streaming import (
        streaming_pattern_match,
    )

    schema = "user_id long, seq int, c string"
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_pattern_match(
            s, "user_id", "c", ["seq"], "v", "c", "p"),
        # user 1: complete match in batch 1, partial "vc" left open;
        # user 2: nothing yet
        [(1, 1, "v"), (1, 2, "p"), (1, 3, "v"), (1, 4, "c"),
         (2, 1, "x")],
        # user 1: the open "vc" completes with "p" ACROSS the boundary;
        # user 2: full match inside batch 2
        [(1, 5, "p"), (2, 2, "v"), (2, 3, "p")],
        schema)
    rows = [(bid, r["user_id"], r["n_new"], r["n_total"])
            for bid, batch in collected for r in batch]
    # batch ids restart per query run; order by appearance
    assert (0, 1, 1, 1) in rows            # batch 1: user 1 matched once
    assert (1, 1, 1, 2) in rows            # batch 2: cross-batch completion
    assert (1, 2, 1, 1) in rows            # batch 2: user 2 in-batch match
    assert len(rows) == 3                  # user 2 emitted nothing in batch 1


def test_streaming_pattern_match_interruption_resets(spark, tmp_path):
    from flink_cdc_dsql_master_spark.streaming import (
        streaming_pattern_match,
    )

    schema = "user_id long, seq int, c string"
    collected = _run_two_batches(
        spark, tmp_path,
        # "v c x p" — the x breaks contiguity, no match ever
        lambda s: streaming_pattern_match(
            s, "user_id", "c", ["seq"], "v", "c", "p"),
        [(1, 1, "v"), (1, 2, "c")],
        [(1, 3, "x"), (1, 4, "p")],
        schema)
    assert [r for _, batch in collected for r in batch] == []


def test_streaming_cusum_alarm_spans_batches(spark, tmp_path):
    from flink_cdc_dsql_master_spark.streaming import streaming_cusum

    schema = "k string, seq long, x double"
    # mu=0, allowance=0.5, threshold=2.0: each x=1.0 adds 0.5 to s+;
    # s+ reaches 1.0 in batch 1 and crosses 2.0 (STRICTLY) only at the
    # fifth high in batch 2 — the alarm can ONLY fire if state carried
    # across the boundary
    collected = _run_two_batches(
        spark, tmp_path,
        lambda s: streaming_cusum(s, "k", "x", ["seq"],
                                  mu=0.0, allowance=0.5, threshold=2.0),
        [("a", 1, 1.0), ("a", 2, 1.0), ("b", 1, 0.0)],
        [("a", 3, 1.0), ("a", 4, 1.0), ("a", 5, 1.0)],
        schema)
    rows = [(r["k"], r["event_seq"], r["drift"], r["cusum"])
            for _, batch in collected for r in batch]
    assert rows == [("a", 5, "up", 2.5)]
