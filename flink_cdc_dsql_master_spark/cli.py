"""Command-line front end: ``python -m flink_cdc_dsql_master_spark``.

The user-facing twin of the reference's ``flink-cdc.sh pipeline.yaml``
entry (flink-cdc-cli/.../CliFrontend.java + CliExecutor.java): parse the
pipeline YAML, compose, run, land the routed tables. Spark-first
differences: the "cluster submission" half of CliFrontend is Spark's own
``spark-submit``/session machinery, so this CLI only owns what remains —
YAML → PipelineDef → composer → sink.

Commands:
  run PIPELINE.yaml [--output-dir DIR] [--streaming] — execute the
      pipeline; batch mode lands one parquet dataset per routed sink
      table under DIR and prints a row-count summary line per table.
  validate PIPELINE.yaml — parse + compose-plan only (no Spark job):
      prints sources, transform rules, routes, sink; exit 2 on a
      malformed definition. The cheap pre-flight a 100 TB submission
      deserves before it asks the cluster for executors.
  report METRICS.json — render a metrics snapshot dumped by
      ``run --metrics-json`` (the reference's documented monitoring
      contract: throughput, latency, auth, errors-by-category).
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flink_cdc_dsql_master_spark",
        description="Run or validate a CDC pipeline YAML on Spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="execute a pipeline definition")
    runp.add_argument("pipeline_yaml")
    runp.add_argument("--output-dir", default="./pipeline-out",
                      help="directory for parquet sink tables")
    runp.add_argument("--streaming", action="store_true",
                      help="compose as a changelog stream "
                           "(readStream + foreachBatch upsert)")
    runp.add_argument("--checkpoint", default=None,
                      help="streaming checkpoint location")
    runp.add_argument("--metrics-json", default=None,
                      help="dump the pipeline metrics registry "
                           "(counters/timers/errors-by-category) to "
                           "this path when the run finishes")

    repp = sub.add_parser(
        "report", help="render a metrics snapshot dumped by "
                       "`run --metrics-json` (the reference's "
                       "documented monitoring contract)")
    repp.add_argument("metrics_json")

    valp = sub.add_parser("validate",
                          help="parse + plan a pipeline, run nothing")
    valp.add_argument("pipeline_yaml")

    tp = sub.add_parser(
        "table", help="versioned-lakehouse table maintenance")
    tsub = tp.add_subparsers(dest="table_cmd", required=True)
    hist = tsub.add_parser("history", help="DESCRIBE HISTORY")
    hist.add_argument("path")
    vers = tsub.add_parser("versions", help="list committed versions")
    vers.add_argument("path")
    stats = tsub.add_parser(
        "stats", help="metadata-only COUNT/MIN/MAX (no data read)")
    stats.add_argument("path")
    vac = tsub.add_parser("vacuum", help="expire old versions")
    vac.add_argument("path")
    vac.add_argument("--keep-last", type=int, default=1)
    dele = tsub.add_parser(
        "delete", help="DELETE by SQL predicate via deletion vectors")
    dele.add_argument("path")
    dele.add_argument("predicate", help="SQL boolean expr, e.g. 'k % 5 = 0'")
    dele.add_argument("--pk", required=True, action="append",
                      help="primary-key column (repeatable)")

    lintp = sub.add_parser(
        "lint", help="scale-lint a registered query's physical plan "
                     "(plans.lint_plan) before a large run")
    lintp.add_argument("query", help="name from queries.QUERIES")
    lintp.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                       help="table directory used to plan the query")
    return p


def _load(path: str):
    from .pipeline import load_pipeline

    try:
        return load_pipeline(path)
    except (ValueError, KeyError, OSError) as e:
        print(f"invalid pipeline definition: {e}", file=sys.stderr)
        return None


def _cmd_validate(args) -> int:
    pipe = _load(args.pipeline_yaml)
    if pipe is None:
        return 2
    print(f"pipeline: {pipe.name}")
    print(f"source: type={pipe.source.type}")
    for r in pipe.transforms:
        print(f"transform: {r.source_table} "
              f"projection={r.projection or '*'!r} "
              f"filter={r.filter or 'TRUE'!r}")
    for rt in pipe.routes:
        print(f"route: {rt.source_table} -> {rt.sink_table}")
    print(f"sink: type={pipe.sink.type}")
    print(f"schema.change.behavior: {pipe.schema_change_behavior}")
    return 0


def _cmd_run(args) -> int:
    pipe = _load(args.pipeline_yaml)
    if pipe is None:
        return 2
    from .compose import BatchComposer, compose_stream
    from .session import get_spark

    spark = get_spark(pipe.name)
    if args.streaming:
        # honor the YAML sink type (previously always parquet-merge)
        stype = pipe.sink.type
        base = pipe.sink.config.get("path", args.output_dir)
        if stype in ("paimon", "paimon-append"):
            from .paimon_export import make_paimon_append_sink_writer
            from .paimon_pk import make_paimon_pk_sink_writer

            append_w = make_paimon_append_sink_writer(base)
            from .paimon_pk import parse_partition_key_option
            pk_w = make_paimon_pk_sink_writer(
                base, buckets=int(pipe.sink.config.get("buckets", 4)),
                partition_map=parse_partition_key_option(
                    pipe.sink.config.get("partition.key")),
                changelog_producer=pipe.sink.config.get(
                    "changelog-producer"),
                dynamic_bucket_target_rows=(
                    int(pipe.sink.config[
                        "dynamic-bucket.target-row-num"])
                    if "dynamic-bucket.target-row-num"
                    in pipe.sink.config else None))
            if stype == "paimon-append":
                stream_writer = append_w
            else:
                # PaimonDataSink parity: keyed tables stream as
                # merge-on-read PK commits, keyless as insert-only
                def stream_writer(tid, df, schema, batch_id=None,
                                  _pk=pk_w, _ap=append_w):
                    if schema.primary_keys:
                        _pk(tid, df, schema, batch_id)
                    else:
                        _ap(tid, df, schema)
        elif stype == "scd2-parquet":
            from .compose import make_scd2_sink_writer
            stream_writer = make_scd2_sink_writer(base)
        elif stype == "cow-parquet":
            from .compose import make_cow_sink_writer
            stream_writer = make_cow_sink_writer(base)
        elif stype == "dsql":
            from .compose import make_dsql_sink_writer
            stream_writer = make_dsql_sink_writer(pipe.sink.config)
        else:
            from .sinks import merge_into_parquet

            def stream_writer(tid, df, schema):
                path = (f"{args.output_dir}/"
                        f"{tid.namespace}.{tid.schema_name}.{tid.table}")
                merge_into_parquet(path, df, schema)

        from .metrics import make_streaming_listener, registry
        listener = make_streaming_listener(registry(pipe.name))
        spark.streams.addListener(listener)
        try:
            q = compose_stream(
                spark, pipe,
                args.checkpoint or f"{args.output_dir}/_checkpoint",
                stream_writer)
            q.awaitTermination()
        finally:
            spark.streams.removeListener(listener)
            _dump_metrics(pipe.name, args.metrics_json)
        return 0

    def write_parquet(tid, df, schema):
        path = (f"{args.output_dir}/"
                f"{tid.namespace}.{tid.schema_name}.{tid.table}")
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        print(f"{tid}: {n} rows -> {path}")

    BatchComposer(spark, pipe, sink_writer=write_parquet).run()
    _dump_metrics(pipe.name, args.metrics_json)
    return 0


def _dump_metrics(pipeline_name: str, path: str | None) -> None:
    if not path:
        return
    from .metrics import registry

    with open(path, "w") as f:
        f.write(registry(pipeline_name).report())
    print(f"metrics -> {path}")


def _cmd_report(args) -> int:
    """Human rendering of a dumped metrics snapshot — per-table
    throughput, latency timers, auth counters, errors by category."""
    import json

    with open(args.metrics_json) as f:
        snap = json.load(f)
    print(f"registry: {snap.get('registry', '?')}")
    counters = snap.get("counters", {})
    if counters:
        print("counters:")
        for k in sorted(counters):
            print(f"  {k} = {counters[k]}")
    timers = snap.get("timers", {})
    if timers:
        print("timers:")
        for k in sorted(timers):
            t = timers[k]
            print(f"  {k}: n={t['count']} avg={t['avg_s']*1000:.1f}ms "
                  f"max={t['max_s']*1000:.1f}ms")
    gauges = snap.get("gauges", {})
    if gauges:
        print("gauges:")
        for k in sorted(gauges):
            print(f"  {k} = {gauges[k]}")
    errs = snap.get("errors_by_category", {})
    if errs:
        print("errors by category:")
        for k in sorted(errs):
            print(f"  {k} = {errs[k]}")
    return 0


def _cmd_table(args) -> int:
    from . import lakehouse as lh

    if args.table_cmd == "history":
        for h in lh.table_history(args.path):
            print(f"v{h['version']}  ts={h['ts']:.3f}  "
                  f"files={h['n_files']}  rewrote={h['rewritten']}  "
                  f"dropped={h['dropped']}")
        return 0
    if args.table_cmd == "versions":
        print(" ".join(str(v) for v in lh.list_versions(args.path)))
        return 0
    if args.table_cmd == "stats":
        agg = lh.metadata_aggregate(args.path)
        print(f"version={agg['version']} n_rows={agg['n_rows']} "
              f"minmax_exact={agg['minmax_exact']}")
        for c, (lo, hi) in sorted(agg["columns"].items()):
            print(f"  {c}: [{lo}, {hi}]")
        return 0
    if args.table_cmd == "vacuum":
        r = lh.vacuum_versioned(args.path, keep_last=args.keep_last)
        print(f"expired={r['expired_versions']} "
              f"removed_files={r['removed_files']} "
              f"removed_dv_sidecars={r['removed_dv_sidecars']}")
        return 0
    # delete — the only verb that needs a Spark session
    from pyspark.sql import functions as F

    from .session import get_spark

    spark = get_spark("lakehouse-delete")
    r = lh.delete_versioned(spark, args.path, F.expr(args.predicate),
                            args.pk)
    print(f"v{r['version']}: deleted={r['deleted']} "
          f"dv_total={r['dv_total']}")
    return 0


def _cmd_lint(args) -> int:
    from .plans import lint_plan
    from .queries import QUERIES
    from .session import get_spark

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}", file=sys.stderr)
        return 2
    spark = get_spark("plan-lint")
    finds = lint_plan(QUERIES[args.query](spark, args.sf_dir))
    for f in finds:
        print(f"[{f['severity']}] {f['check']}: {f['detail']}")
    if not finds:
        print(f"{args.query}: plan clean")
    return 1 if any(f["severity"] == "error" for f in finds) else 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "validate":
        return _cmd_validate(args)
    if args.cmd == "table":
        return _cmd_table(args)
    if args.cmd == "report":
        return _cmd_report(args)
    if args.cmd == "lint":
        return _cmd_lint(args)
    return _cmd_run(args)
