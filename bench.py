"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a checksum-over-every-column action
(see ``materialize`` — a bare count() would let Catalyst prune a map-only
query's actual compute; the driver never collects full results). Timings are steady-state: a warmup pass runs every
query once at sf0.001 (identical plans -> same generated code, so JVM JIT,
Janino codegen, shuffle and Python-worker paths are all hot), then each
query is timed at the target SF over three passes and the per-query
minimum is reported, with the block cache cleared between queries so no
measurement depends on another query's leftover persisted frames. Measured on this box: the first 32-task aggregate stage of a
cold JVM costs 5-40 s of pure JIT/codegen warmup for a query whose
steady-state is <1 s -- attributing that one-time cost to whichever query
happens to run first says nothing about the operator.
"""

from __future__ import annotations

import json
import os
import sys
import time


def materialize(df) -> int:
    """Force FULL evaluation of every output column, returning the row
    count. A bare ``df.count()`` lets Catalyst prune projections the
    count does not need — a map-only query (per-doc scores, normalized
    text) would "bench" as a parquet row count with its actual compute
    optimized away. Folding every column into a per-row checksum that
    feeds a global aggregate makes pruning impossible while adding one
    hash per row; the row count rides in the same single pass. Falls
    back to a JSON-serialized hash for column types xxhash64 cannot
    take (maps)."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in df.columns]
    try:
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(F.struct(*cols))).alias("h")).first()["n"]
    except Exception:  # noqa: BLE001 — unhashable type: hash the JSON
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(F.to_json(F.struct(*cols))))
            .alias("h")).first()["n"]


# sf1 tier (VERDICT r7 #6): the 10 most expensive headline queries,
# re-measured at 10x the sf0.1 volume (tools/scale_stress.py's sf10x
# corpus IS sf~1: documents/embeddings/events/orders/lineitem scaled
# 10x, dims fixed). sf0.1 hides constant factors that sf1 exposes;
# this tier gets its own frozen baseline + the same 2x gate.
SF1_QUERIES = [
    "similarity_knn_join", "lakehouse_change_feed",
    "similarity_range_search", "sample_greedy_cover",
    "sink_partitioned_merge", "embedding_kmeans", "text_dedup_spans",
    "text_bpe_train", "dedup_minhash_lsh", "multimodal_jpeg_decode",
]


def _sf1_dir() -> str:
    repo = os.path.dirname(os.path.abspath(__file__))
    d = os.path.join(repo, ".scale_data", "sf10x")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        import subprocess
        subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "scale_stress.py"),
             "--generate-only"], check=True, cwd=repo)
    return d


def main() -> int:
    sf1_tier = False
    if "--sf" in sys.argv:
        i = sys.argv.index("--sf")
        if i + 1 >= len(sys.argv):
            print("usage: bench.py [--sf 1]  (--sf requires a value)",
                  file=sys.stderr)
            return 2
        sf1_tier = sys.argv[i + 1] == "1"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if sf1_tier:
        sf_dir = _sf1_dir()
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.1")

    from flink_cdc_dsql_master_spark.queries import BENCH_QUERIES, QUERIES
    from flink_cdc_dsql_master_spark.session import get_spark

    if sf1_tier:
        BENCH_QUERIES = SF1_QUERIES  # noqa: N806

    spark = get_spark("bench")
    # effective-parallelism echo (VERDICT r15 #2b): the bench output
    # must PROVE the $SPARK_GRAFT_CPUS contract is honored — the driver
    # cannot otherwise distinguish "env var ignored" from "fixed
    # per-job overhead dominates at this SF"
    par_info = {
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")),
    }
    # warmup pass: every query once at sf0.001 (same plans, tiny data).
    # This JITs the generated code, spawns the Python/Arrow worker pool,
    # and warms parquet/shuffle paths -- one-time JVM costs, not any
    # query's cost. Falls back to the target dir if sf0.001 is absent.
    # Warmup queries run CONCURRENTLY from a small driver thread pool
    # (guide §2.6 — independent jobs back-fill each other's stragglers;
    # at sf0.001 every query is fixed-overhead-bound, so overlap cuts
    # the untimed warmup wall ~3x without touching any measurement:
    # the timed passes below stay strictly serial). A warmup failure is
    # non-fatal by design — the serial timed pass still surfaces it.
    if sf1_tier:
        warm_dir = "/root/testdata/sf0.01"  # same plans, 1% the volume
    else:
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")),
                                "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor

    def warm(name: str) -> str | None:
        try:
            spark.sparkContext.setJobDescription(f"warmup: {name}")
            materialize(QUERIES[name](spark, warm_dir))
            return None
        except Exception as e:  # noqa: BLE001 — warmup only
            return f"{name}: {e}"

    n_threads = int(os.environ.get("SPARK_GRAFT_WARM_THREADS", "4"))
    with ThreadPoolExecutor(max_workers=max(1, n_threads)) as pool:
        for err in pool.map(warm, BENCH_QUERIES):
            if err:
                print(f"# warmup error (non-fatal): {err}",
                      file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    spark.catalog.clearCache()
    print(f"# warmup pass ({warm_dir}, {n_threads} threads): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # 2 passes at the sf1 tier (queries are 5-40s each; the min-of-2 is
    # stable once warm), 3 at sf0.1
    for _pass in range(2 if sf1_tier else 3):
        for name in BENCH_QUERIES:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = materialize(df)
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            rows[name] = n
            # queries that persist() intermediates (LSH, clustering) never
            # unpersist them -- the returned frame still depends on the
            # cache lazily. Dropping the cache between queries keeps each
            # measurement self-contained: no cross-query storage-memory
            # pressure, no eviction-triggered recompute noise (seen as a
            # 3.9s-vs-1.1s swing on dedup_minhash_lsh in BENCH_r03).
            spark.catalog.clearCache()
    for name in BENCH_QUERIES:
        print(f"# {name}: {timings[name]}s ({rows[name]} rows)",
              file=sys.stderr)

    if sf1_tier:
        sf_val: float | str = 1.0
    else:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf_val = float(sf)
        except ValueError:
            sf_val = sf
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # ambient contention marker (VERDICT r12 what's-wrong #4): the
        # driver's shared box sometimes inflates every query uniformly
        # ~1.25x — load average at measurement time lets a contended
        # artifact self-identify instead of reading as a regression
        "loadavg": list(os.getloadavg()),
        # effective parallelism proof (VERDICT r15 #2b): decidable
        # suspect_cpus_ignored — the session is local[cpus_env] and
        # these are the live values the queries actually ran with
        **par_info,
    }
    # streaming latency tier (VERDICT r7 #7): p50/p95 micro-batch latency
    # of the composed changelog pipeline at 10x events, 1 file/trigger.
    # Its own frozen baseline + 2x gate (bench_streaming.gate).
    streaming_rc = 0
    if not sf1_tier:
        import bench_streaming

        # measure the latency tier in a FRESH session (VERDICT r10 ask
        # #6): the 57-query batch suite leaves block-manager/shuffle/GC
        # residue that the FIRST streaming scenario otherwise absorbs —
        # the documented in-suite flap class (p50 2180ms in-suite vs
        # 765ms isolated, r10; same shape r8). Restarting the context
        # drops that state while keeping the JIT-warm JVM, then a
        # full GC + short settle separates the tiers — isolated truth
        # without a manual re-run.
        spark.stop()
        spark = get_spark("bench-streaming")
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
        out["streaming"] = bench_streaming.run(spark)
        streaming_rc = bench_streaming.gate(out["streaming"])
        # second scenario: raw binlog v4 segments through the byte
        # decoder — wire-to-sink latency of the mysql-shaped pipeline
        out["streaming_binlog"] = bench_streaming.run(spark,
                                                      scenario="binlog")
        # gate() must RUN for every scenario (it also freezes missing
        # baseline sections) — never short-circuit it behind an earlier
        # failure
        streaming_rc = bench_streaming.gate(
            out["streaming_binlog"], section="binlog_") or streaming_rc
        # third scenario: framed pgoutput segments through the byte
        # decoder — the postgres-shaped pipeline's wire-to-sink latency
        out["streaming_pgoutput"] = bench_streaming.run(
            spark, scenario="pgoutput")
        streaming_rc = bench_streaming.gate(
            out["streaming_pgoutput"], section="pgoutput_") or streaming_rc
        # fourth scenario: the binlog wire into a DYNAMIC-bucket Paimon
        # PK sink — per-micro-batch merge-on-read commit latency through
        # the resident hash-index assigner (the r14 steady-state path)
        out["streaming_paimon_dynamic"] = bench_streaming.run(
            spark, scenario="paimon-dynamic")
        streaming_rc = bench_streaming.gate(
            out["streaming_paimon_dynamic"],
            section="paimon_dynamic_") or streaming_rc
    line = json.dumps(out)
    print(line, flush=True)
    # compact FINAL stdout line (VERDICT r15 #2a): the driver keeps
    # only the LAST 2000 chars of stdout, and the full line above (with
    # four embedded streaming sections) exceeds that — six rounds of
    # BENCH_r*.json `parsed: null`. This line carries the same contract
    # keys (metric/value/unit/queries/sf) plus the parallelism echo,
    # compact-separated (~1.9 KB for 60 queries), and is printed LAST
    # so the tail always contains one complete parseable JSON object.
    # The full line and the BENCH_LOCAL.json mirror are unchanged.
    compact = {"metric": out["metric"], "value": out["value"],
               "unit": "sec", "queries": out["queries"],
               "sf": out["sf"], **par_info}
    print(json.dumps(compact, separators=(",", ":")), flush=True)
    # durable copy of the same line (VERDICT r9 "what's wrong" #4: the
    # driver's tail capture once truncated its own mid-map record) —
    # BENCH_LOCAL.json is always complete and machine-readable
    # the sf1 tier mirrors to its OWN file — it must never clobber the
    # sf0.1 mirror the driver/judge recover truncated artifacts from
    mirror = "BENCH_LOCAL_SF1.json" if sf1_tier else "BENCH_LOCAL.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           mirror), "w") as f:
        f.write(line + "\n")
    spark.stop()

    # self-enforcing regression gate (VERDICT r5 ask #5): the reference
    # publishes no numbers, so the operative per-query baseline is the
    # frozen BENCH_r05 steady-state committed in BASELINE_BENCH.json.
    # Any frozen query running slower than 2x its baseline (+0.25s
    # absolute slack so sub-100ms queries don't flap on timer noise)
    # fails the bench run. New queries without a frozen entry pass
    # (they become part of the baseline when it is next refrozen).
    rc = 0
    base_name = "BASELINE_BENCH_SF1.json" if sf1_tier \
        else "BASELINE_BENCH.json"
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             base_name)
    if sf1_tier and not os.path.exists(base_path):
        # freeze-on-first-run, like the streaming tier: the sf1 baseline
        # comes from the first full steady-state run of SF1_QUERIES
        with open(base_path, "w") as f:
            json.dump({"queries": timings, "sf": 1.0}, f, indent=2)
        print(f"# froze sf1 baseline: {base_path}", file=sys.stderr)
    if os.path.exists(base_path) and sf_val in (0.1, 1.0):
        with open(base_path) as f:
            frozen = json.load(f)["queries"]
        for name, t in sorted(timings.items()):
            if name in frozen and t > 2.0 * frozen[name] + 0.25:
                print(f"# REGRESSION {name}: {t}s > 2x frozen "
                      f"{frozen[name]}s", file=sys.stderr)
                rc = 1
    return rc or streaming_rc


if __name__ == "__main__":
    raise SystemExit(main())
