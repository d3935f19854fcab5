"""Streaming micro-batch latency bench (VERDICT r7 #7 / r8 #3).

Drives the full composed changelog pipeline (readStream over Debezium
JSON-lines files → decode → transform → evolve → coerce → PK-repartition
→ parquet sink) with ``maxFilesPerTrigger=1`` so every source file is one
micro-batch, and reports the p50/p95 **per-micro-batch latency** off the
StreamingQuery's own progress events (``durationMs.triggerExecution`` —
the wall time of one trigger: offset resolution + batch planning +
execution + commit).

Fixture: the 10× events corpus (1M rows, ``tools/scale_stress.py``'s
sf10x tier) encoded once into N=20 Debezium envelope files of 50k events
each and cached under ``.scale_data/stream_bench_v{GEN}`` — batch size is
the latency-relevant knob, and 50k rows/batch is the shape a real
1k-events/sec topic polled every 50 s (or maxOffsetsPerTrigger=50k)
produces.

Gate: like the batch tier, a frozen ``BASELINE_BENCH_STREAMING.json``
(written on first run) and a self-enforcing 2× regression gate on p50 and
p95 (+100 ms absolute slack for scheduler jitter on sub-second batches).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

GEN_VERSION = 1
N_FILES = 20
PAYLOAD_SCHEMA = ("event_id bigint, user_id bigint, event_type string, "
                  "value double")


def _repo() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _events_10x_path() -> str:
    d = os.path.join(_repo(), ".scale_data", "sf10x")
    if not os.path.exists(os.path.join(d, "events.parquet")):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(_repo(), "tools",
                                          "scale_stress.py"),
             "--generate-only"], check=True, cwd=_repo())
    return os.path.join(d, "events.parquet")


def build_fixture(spark) -> str:
    """Encode the 10× events into N_FILES Debezium (value, offset)
    JSON-lines files, once (cached by GEN_VERSION)."""
    from pyspark.sql import functions as F

    out = os.path.join(_repo(), ".scale_data",
                       f"stream_bench_v{GEN_VERSION}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    ev = spark.read.parquet(_events_10x_path())
    after = F.struct(
        F.col("event_id"), F.col("user_id"), F.col("event_type"),
        F.col("value"))
    env = F.to_json(F.struct(after.alias("after"), F.lit("c").alias("op")))
    (ev.select(F.to_json(F.struct(env.alias("value"),
                                  F.col("event_id").alias("offset")))
               .alias("line"))
     .repartition(N_FILES)
     .write.mode("overwrite").text(out))
    # drop the _SUCCESS marker etc. that the file stream would also read
    for f in os.listdir(out):
        if not f.endswith(".txt"):
            os.remove(os.path.join(out, f))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def build_fixture_binlog(spark) -> str:
    """Encode the 10× events into N_FILES binlog segment files, once
    (cached). The encode runs DISTRIBUTED: each of N_FILES partitions
    encodes its bucket into one self-contained segment (magic + FDE +
    TABLE_MAP + one multi-row WRITE event) in an Arrow-batched task."""
    from pyspark.sql import functions as F

    out = os.path.join(_repo(), ".scale_data",
                       f"stream_bench_binlog_v{GEN_VERSION}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    ev = (spark.read.parquet(_events_10x_path())
          .select("event_id", "user_id", "event_type", "value")
          .repartition(N_FILES, "event_id"))

    def encode_segment(batches):
        import pandas as pd

        from flink_cdc_dsql_master_spark.binlog import (
            MAGIC, MYSQL_TYPE_DOUBLE, MYSQL_TYPE_LONGLONG,
            MYSQL_TYPE_VARCHAR, encode_fde, encode_table_map,
            encode_write_rows)

        cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_LONGLONG, None),
                (MYSQL_TYPE_VARCHAR, 30), (MYSQL_TYPE_DOUBLE, None)]
        rows = []
        for pdf in batches:
            rows.extend(pdf.itertuples(index=False, name=None))
        blob = (MAGIC + encode_fde(120)
                + encode_table_map(3, "bench", "events", cols, 200)
                + encode_write_rows(3, cols, [list(r) for r in rows],
                                    1000))
        yield pd.DataFrame({"blob": [blob]})

    blobs = [r["blob"] for r in
             ev.mapInPandas(encode_segment, "blob binary").collect()]
    for i, blob in enumerate(blobs):
        with open(os.path.join(out, f"seg{i:02d}.binlog"), "wb") as f:
            f.write(bytes(blob))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def build_fixture_pgoutput(spark) -> str:
    """Encode the 10× events into N_FILES framed pgoutput segment files,
    once (cached) — the Postgres twin of the binlog fixture, encoded
    DISTRIBUTED (one self-contained Relation + multi-insert segment per
    partition)."""
    from pyspark.sql import functions as F

    out = os.path.join(_repo(), ".scale_data",
                       f"stream_bench_pgout_v{GEN_VERSION}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    ev = (spark.read.parquet(_events_10x_path())
          .select("event_id", "user_id", "event_type", "value")
          .repartition(N_FILES, "event_id"))

    def encode_segment(batches):
        import pandas as pd

        from flink_cdc_dsql_master_spark.pgoutput import (
            encode_frames, encode_insert, encode_relation)

        oid = 9001
        msgs = [(1, encode_relation(oid, "bench", "events",
                                    [("event_id", True, 20),
                                     ("user_id", False, 20),
                                     ("event_type", False, 25),
                                     ("value", False, 701)]))]
        for pdf in batches:
            for eid, uid, etype, val in pdf.itertuples(index=False,
                                                       name=None):
                msgs.append((int(eid) * 2, encode_insert(
                    oid, [str(eid), str(uid), etype,
                          repr(float(val))])))
        yield pd.DataFrame({"blob": [encode_frames(msgs)]})

    blobs = [r["blob"] for r in
             ev.mapInPandas(encode_segment, "blob binary").collect()]
    for i, blob in enumerate(blobs):
        with open(os.path.join(out, f"seg{i:02d}.pgout"), "wb") as f:
            f.write(bytes(blob))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _pipeline_pgoutput(src_dir: str):
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                      SourceDef)
    from flink_cdc_dsql_master_spark.route import RouteRule
    from flink_cdc_dsql_master_spark.transform import TransformRule

    return PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src_dir,
            "schema": ("event_id bigint, user_id bigint, "
                       "event_type string, value double"),
            "table": "bench.public.events_pg",
            "primary-keys": ["event_id"],
            "reader-options": {"maxFilesPerTrigger": "1"},
        }),
        sink=SinkDef("parquet"),
        transforms=(TransformRule(
            r"bench\.public\.events_pg",
            projection=("event_id, user_id, UPPER(event_type) AS "
                        "event_type, value")),),
        routes=(RouteRule(r"bench\.public\.events_pg",
                          "analytics.out.events_pg"),),
    )


def _pipeline_binlog(src_dir: str):
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                      SourceDef)
    from flink_cdc_dsql_master_spark.route import RouteRule
    from flink_cdc_dsql_master_spark.transform import TransformRule

    return PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src_dir,
            "schema": ("event_id bigint, user_id bigint, "
                       "event_type string, value double"),
            "table": "bench.public.events_bl",
            "mysql-table": "events",
            "primary-keys": ["event_id"],
            "reader-options": {"maxFilesPerTrigger": "1"},
        }),
        sink=SinkDef("parquet"),
        transforms=(TransformRule(
            r"bench\.public\.events_bl",
            projection=("event_id, user_id, UPPER(event_type) AS "
                        "event_type, value")),),
        routes=(RouteRule(r"bench\.public\.events_bl",
                          "analytics.out.events_bl"),),
    )


def _pipeline(src_dir: str):
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                      SourceDef)
    from flink_cdc_dsql_master_spark.route import RouteRule
    from flink_cdc_dsql_master_spark.transform import TransformRule

    return PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src_dir,
            "schema": PAYLOAD_SCHEMA,
            "table": "bench.public.events_cl",
            "primary-keys": ["event_id"],
            # one source file per micro-batch: the latency-bench trigger
            "reader-options": {"maxFilesPerTrigger": "1"},
        }),
        sink=SinkDef("parquet"),
        transforms=(TransformRule(
            r"bench\.public\.events_cl",
            projection=("event_id, user_id, UPPER(event_type) AS "
                        "event_type, value")),),
        routes=(RouteRule(r"bench\.public\.events_cl",
                          "analytics.out.events_cl"),),
    )


def run(spark, warm: bool = True, scenario: str = "debezium") -> dict:
    """Run the latency bench; returns the streaming metrics dict.

    Scenarios: ``debezium`` (JSON-lines envelope files → from_json
    decode), ``binlog`` (raw binlog v4 segment files → byte decode) and
    ``pgoutput`` (framed pgoutput message segments → byte decode) —
    same composed pipeline downstream of the decode."""
    import tempfile

    from flink_cdc_dsql_master_spark.compose import compose_changelog_stream

    if scenario in ("binlog", "paimon-dynamic"):
        # paimon-dynamic: same binlog wire decode upstream, but the sink
        # is a DYNAMIC-bucket Paimon PK table — every micro-batch is a
        # full merge-on-read commit through the resident hash-index
        # assigner (the r14 steady-state path: delta-sized index work
        # per commit across foreachBatch's cloned sessions). Commits
        # are ~6s each (real table commits, not parquet appends), so
        # this scenario drives a 12-file subset to bound bench wall.
        src_all = build_fixture_binlog(spark)
        pipeline_of = _pipeline_binlog
        suffix = ".binlog"
        if scenario == "paimon-dynamic":
            sub = os.path.join(os.path.dirname(src_all),
                               "paimon_dyn_subset")
            if not os.path.exists(os.path.join(sub, "_DONE")):
                os.makedirs(sub, exist_ok=True)
                segs = sorted(f for f in os.listdir(src_all)
                              if f.endswith(suffix))
                for f in segs[:12]:
                    shutil.copy(os.path.join(src_all, f), sub)
                open(os.path.join(sub, "_DONE"), "w").close()
            src_all = sub
    elif scenario == "pgoutput":
        src_all = build_fixture_pgoutput(spark)
        pipeline_of = _pipeline_pgoutput
        suffix = ".pgout"
    else:
        src_all = build_fixture(spark)
        pipeline_of = _pipeline
        suffix = ".txt"

    # the bench reads the SAME metrics registry users get (VERDICT r12
    # #1): foreachBatch processing latency + engine progress land in
    # one MetricsRegistry, reported alongside the measured percentiles
    from flink_cdc_dsql_master_spark.metrics import (
        MetricsRegistry, make_streaming_listener)

    reg = MetricsRegistry(f"bench-stream-{scenario}")
    listener = make_streaming_listener(reg)

    def drive(src_dir: str) -> list[dict]:
        base = tempfile.mkdtemp(prefix="stream_bench_")
        ckpt = os.path.join(base, "ckpt")
        sink_dir = os.path.join(base, "sink")

        if scenario == "paimon-dynamic":
            from flink_cdc_dsql_master_spark.paimon_pk import (
                DYNAMIC_BUCKET, make_paimon_pk_sink_writer,
                read_paimon_pk)

            pk_writer = make_paimon_pk_sink_writer(
                sink_dir, buckets=DYNAMIC_BUCKET,
                dynamic_bucket_target_rows=100_000)
            seen_tables: list[str] = []

            def writer(tid, df, schema, batch_id=None):
                if tid.table not in seen_tables:
                    seen_tables.append(tid.table)
                pk_writer(tid, df, schema, batch_id)
        else:
            def writer(tid, df, schema):
                df.write.mode("append").parquet(sink_dir)

        q = compose_changelog_stream(spark, pipeline_of(src_dir), ckpt,
                                     writer, metrics=reg)
        q.awaitTermination(600)
        prog = [json.loads(p.json if hasattr(p, "json") else p)
                if not isinstance(p, dict) else p
                for p in q.recentProgress]
        # numInputRows counts source ROWS — for binaryFile that is one
        # per segment FILE, so the honest row count is the sink's
        if scenario == "paimon-dynamic":
            from flink_cdc_dsql_master_spark.paimon_pk import \
                read_paimon_pk

            sink_rows = read_paimon_pk(
                spark, os.path.join(sink_dir, seen_tables[0])).count()
        else:
            sink_rows = spark.read.parquet(sink_dir).count()
        shutil.rmtree(base, ignore_errors=True)
        return prog, sink_rows

    if warm:
        # 2-file warmup stream: JITs the decode/transform/sink codegen and
        # spawns the streaming execution threads — one-time JVM costs
        warm_dir = tempfile.mkdtemp(prefix="stream_bench_warm_")
        files = sorted(f for f in os.listdir(src_all)
                       if f.endswith(suffix))[:2]
        for f in files:
            shutil.copy(os.path.join(src_all, f), warm_dir)
        drive(warm_dir)
        shutil.rmtree(warm_dir, ignore_errors=True)

    spark.streams.addListener(listener)
    try:
        t0 = time.perf_counter()
        prog, rows = drive(src_all)
        wall = round(time.perf_counter() - t0, 3)
    finally:
        spark.streams.removeListener(listener)

    lat = sorted(p["durationMs"]["triggerExecution"] for p in prog
                 if p.get("numInputRows", 0) > 0)
    if not lat:
        raise RuntimeError("streaming bench measured zero non-empty "
                           "micro-batches — fixture or trigger broken")

    def pct(q: float) -> float:
        i = min(len(lat) - 1, max(0, round(q * (len(lat) - 1))))
        return float(lat[i])

    return {
        "metric": "streaming_microbatch_latency",
        "scenario": scenario,
        "n_batches": len(lat),
        "rows": rows,
        "p50_ms": pct(0.50),
        "p95_ms": pct(0.95),
        "max_ms": float(lat[-1]),
        "throughput_rows_per_sec": round(rows / (sum(lat) / 1000.0), 1),
        "wall_sec": wall,
        # the user-facing registry's view of the same run: foreachBatch
        # processing-latency timer + engine-reported progress counters
        "registry": {
            "processing_latency": next(
                (t for k, t in reg.snapshot()["timers"].items()
                 if k.startswith("cdc.processing.latency")), None),
            "stream_batches": reg.get("stream.batches"),
            "stream_input_rows": reg.get("stream.input.rows"),
        },
    }


def gate(metrics: dict, section: str = "") -> int:
    """Self-enforcing 2× regression gate vs the frozen baseline (written
    on first run, like the batch tier's BASELINE_BENCH.json). ``section``
    prefixes the frozen keys (e.g. "binlog_") so several scenarios share
    one baseline file; missing sections freeze on first run."""
    base_path = os.path.join(_repo(), "BASELINE_BENCH_STREAMING.json")
    frozen = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            frozen = json.load(f)
    if f"{section}p50_ms" not in frozen:
        for k in ("p50_ms", "p95_ms", "n_batches", "rows"):
            frozen[section + k] = metrics[k]
        with open(base_path, "w") as f:
            json.dump(frozen, f, indent=2)
        print(f"# froze streaming baseline section {section or 'default'}:"
              f" {base_path}", file=sys.stderr)
        return 0
    rc = 0
    for k in ("p50_ms", "p95_ms"):
        if metrics[k] > 2.0 * frozen[section + k] + 100.0:
            print(f"# STREAMING REGRESSION {section}{k}: {metrics[k]}ms "
                  f"> 2x frozen {frozen[section + k]}ms", file=sys.stderr)
            rc = 1
    return rc


def main() -> int:
    sys.path.insert(0, _repo())
    from flink_cdc_dsql_master_spark.session import get_spark

    spark = get_spark("bench_streaming")
    metrics = run(spark)
    print(json.dumps(metrics))
    rc = gate(metrics)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
