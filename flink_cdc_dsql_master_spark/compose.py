"""PipelineDef → Spark execution (batch + streaming composers).

Reference counterpart: ``FlinkPipelineComposer.compose`` (:99) / ``translate``
(:114) building Source → PreTransform → PostTransform → SchemaOperator →
hash-partition → Sink, and ``FlinkPipelineExecution.execute``.

Spark shape (SURVEY §7.0): the operator DAG collapses to

    per-table DataFrames → [prune] → [projection+filter] →
      route → schema-evolve → coerce → partition → upsert/collect

run once for batch mode (``pipeline.execution.runtime-mode: BATCH``,
BatchSchemaOperator parity) or once per micro-batch inside ``foreachBatch``
for streaming — foreachBatch is the global synchronous barrier that replaces
the reference's FlushEvent/SchemaCoordinator RPC machinery (~2,000 LoC).

Scale notes: routing/evolution are driver-side metadata ops; the data plane
per table is exactly one Catalyst plan ending in the sink's PK-hash
repartition — no extra shuffles are introduced by composition.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import monotonic as _monotonic

from pyspark.sql import DataFrame, SparkSession

from .events import CreateTableEvent
from .evolve import SchemaChangeBehavior, SchemaEvolver
from .merging import coerce_dataframe
from .partitioning import repartition_by_key
from .pipeline import PipelineDef, SourceDef
from .route import TableIdRouter, fan_in
from .schema import Schema, TableId
from .testing import CollectSink, EventScript
from .transform import TransformEngine


@dataclass
class PipelineResult:
    """Materialized result of a batch pipeline run."""

    tables: dict[TableId, DataFrame] = field(default_factory=dict)
    schemas: dict[TableId, Schema] = field(default_factory=dict)
    golden: dict[str, list[str]] = field(default_factory=dict)


class BatchComposer:
    """Compose + run a PipelineDef once over bounded inputs."""

    def __init__(self, spark: SparkSession, pipeline: PipelineDef,
                 sink_writer=None):
        """`sink_writer(table_id, df, schema)` materializes one routed table;
        default collects DataFrames into the PipelineResult (values sink).
        """
        self.spark = spark
        self.pipeline = pipeline
        self.engine = TransformEngine(list(pipeline.transforms))
        self.router = TableIdRouter(list(pipeline.routes))
        self.evolver = SchemaEvolver(
            behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))
        self.sink_writer = sink_writer

    # -- sources ------------------------------------------------------------

    def load_source(self) -> dict[TableId, tuple[DataFrame, Schema]]:
        src = self.pipeline.source
        if src.type == "values":
            script: EventScript = src.config["script"]
            out = {}
            for tid in script.table_ids():
                out[tid] = (script.to_changelog_df(self.spark, tid),
                            script.schema_of(tid))
            return out
        if src.type == "parquet":
            path = src.config["path"]
            tables = src.config.get("table-list") or []
            out = {}
            for t in tables:
                tid = TableId.parse(t)
                df = self.spark.read.parquet(f"{path}/{tid.table}.parquet")
                pks = src.config.get("primary-keys", {}).get(tid.table, [])
                out[tid] = (df, Schema.of(df.schema, primary_keys=pks))
            return out
        if src.type == "dbapi-polling":
            # Live-database polling CDC: every composer run() is one poll
            # — the first loads the snapshot as +I, later ones emit the
            # diff changelog. The source instance is cached on the
            # composer so the poll epoch advances across runs; snapshot
            # state itself lives crash-safely at state-path, surviving
            # composer restarts.
            from pyspark.sql import types as _T

            from .sources import DbApiPollingSource

            if not hasattr(self, "_polling_source"):
                tid = TableId.parse(src.config["table-id"])
                schema = _T._parse_datatype_string(src.config["schema"])
                self._polling_source = (tid, DbApiPollingSource(
                    self.spark, src.config["conn-factory"],
                    src.config["table"], src.config["key"],
                    list(src.config["primary-keys"]), schema,
                    state_path=src.config["state-path"],
                    chunk_size=int(src.config.get("chunk-size", 8096))))
            tid, source = self._polling_source
            cl = source.poll()
            pks = list(src.config["primary-keys"])
            data_schema = Schema.of(
                _data_struct(cl), primary_keys=pks)
            return {tid: (cl, data_schema)}
        raise ValueError(f"unsupported source type {src.type!r}")

    # -- the composed run ---------------------------------------------------

    def run(self) -> PipelineResult:
        sources = self.load_source()
        result = PipelineResult()

        # 1) register original schemas + transform each source table
        transformed: dict[TableId, DataFrame] = {}
        out_schema: dict[TableId, Schema] = {}
        for tid, (df, schema) in sources.items():
            self.evolver.on_event(CreateTableEvent(tid, schema))
            pruned = self.engine.prune(df, tid)
            xdf = self.engine.apply(pruned, tid)
            transformed[tid] = xdf
            pk_override = ()
            for c in self.engine.rules_for(tid):
                if c.rule.primary_keys:
                    pk_override = c.rule.primary_keys
                    break
            out_schema[tid] = Schema.of(
                _data_struct(xdf),
                primary_keys=list(pk_override or schema.primary_keys))

        # 2) route (fan-in groups) + merge schemas + coerce + sink
        groups = self.router.group_sources_by_sink(list(sources))
        for sink_tid, src_tids in groups.items():
            frames = [transformed[s] for s in src_tids]
            schemas = [out_schema[s] for s in src_tids]
            merged_df, merged_schema = fan_in(frames, schemas)
            self.evolver.manager.register_evolved(sink_tid, merged_schema)
            if merged_schema.primary_keys:
                merged_df = repartition_by_key(
                    merged_df, list(merged_schema.primary_keys),
                    self.pipeline.parallelism or None)
            result.tables[sink_tid] = merged_df
            result.schemas[sink_tid] = merged_schema
            if self.sink_writer is not None:
                self.sink_writer(sink_tid, merged_df, merged_schema)
            else:
                self._default_sink(sink_tid, merged_df, merged_schema, result)
        return result

    def _default_sink(self, sink_tid: TableId, df: DataFrame, schema: Schema,
                      result: PipelineResult) -> None:
        """Built-in sink types: values (golden collect), parquet (MERGE into
        a per-table path), duckdb (INSERT..ON CONFLICT upsert)."""
        sink = self.pipeline.sink
        if sink.type == "values":
            result.golden[sink_tid.identifier()] = CollectSink.render(
                df, sink_tid)
        elif sink.type == "parquet":
            from .sinks import merge_into_parquet

            base = sink.config["path"]
            merge_into_parquet(f"{base}/{sink_tid.table}", df, schema)
        elif sink.type == "duckdb":
            from .sinks import JdbcUpsertSink

            path = sink.config["path"]

            def factory(p=path):
                import duckdb

                return duckdb.connect(p)

            writer = JdbcUpsertSink(
                factory, sink_tid.table, schema,
                batch_size=int(sink.config.get("batch-size", 1000)),
                parallel=False)  # duckdb: single writer
            writer.ensure_table()
            writer.write_batch(df)
        elif sink.type == "dsql":
            # the fork's flagship sink (DsqlDataSinkFactory): a
            # Postgres-wire endpoint authenticated via IAM DbConnect
            # tokens by default (use-iam-auth: true), with the
            # refresh-cache + expired-token retry of
            # iam_auth.DsqlAuthenticator. `connect` in the config
            # injects the DB-API connect callable (tests use the
            # FakeDsqlTokenGate + duckdb); absent that, PostgresConnect
            # dials host/port/database over TLS.
            from .iam_auth import (PostgresConnect,
                                   authenticator_from_config,
                                   iam_conn_factory)
            from .sinks import JdbcUpsertSink

            base_connect = sink.config.get("connect") or PostgresConnect(
                host=sink.config["host"],
                port=int(sink.config.get("port", 5432)),
                database=sink.config.get("database", "postgres"),
                sslrootcert=sink.config.get("ssl-ca"))
            from .metrics import registry
            reg = sink.config.get("metrics") or \
                registry(self.pipeline.name)
            auth = sink.config.get("authenticator") or \
                authenticator_from_config(sink.config, metrics=reg)
            if auth.metrics is None:
                auth.metrics = reg
            writer = JdbcUpsertSink(
                iam_conn_factory(base_connect, auth), sink_tid.table,
                schema,
                batch_size=int(sink.config.get("batch-size", 1000)),
                parallel=bool(sink.config.get("parallel", False)),
                metrics=reg)
            writer.ensure_table()
            writer.write_batch(df)
        elif sink.type in ("paimon", "paimon-append"):
            # the reference pipeline's `sink: type: paimon`
            # (PaimonDataSink): a keyed changelog lands as a Paimon
            # PRIMARY-KEY table (PaimonMetadataApplier builds
            # .primaryKey(...) — merge-on-read KeyValue commits); a
            # keyless one as an insert-only append table.
            # `paimon-append` forces the append face: keyed changelogs
            # LWW-apply FIRST and the final state lands append-only
            # (the pre-PK behavior, kept for append-table consumers)
            from .paimon_export import write_paimon
            from .paimon_pk import write_paimon_pk

            base = sink.config["path"]
            if sink.type == "paimon-append" and schema.primary_keys:
                from .partitioning import apply_changelog

                final = apply_changelog(df, list(schema.primary_keys))
                write_paimon(self.spark, final,
                             f"{base}/{sink_tid.table}")
                return
            if schema.primary_keys:
                from .paimon_pk import (_partition_keys_for,
                                        parse_partition_key_option)

                pmap = parse_partition_key_option(
                    sink.config.get("partition.key"))
                pkeys = _partition_keys_for(sink_tid, pmap)
                if pkeys and not schema.partition_keys:
                    schema = Schema(schema.struct, schema.primary_keys,
                                    tuple(pkeys), schema.options,
                                    schema.comment)
                write_paimon_pk(
                    self.spark, df, f"{base}/{sink_tid.table}", schema,
                    buckets=int(sink.config.get("buckets", 4)),
                    changelog_producer=sink.config.get(
                        "changelog-producer"),
                    dynamic_bucket_target_rows=(
                        int(sink.config[
                            "dynamic-bucket.target-row-num"])
                        if "dynamic-bucket.target-row-num"
                        in sink.config else None))
                return
            else:
                # keyless append: insert-only, like the streaming
                # make_paimon_append_sink_writer — a retraction in a
                # keyless changelog cannot be applied, so fail loudly
                # instead of appending it as an ordinary data row
                from pyspark.sql import functions as F

                from .events import OP_COLUMN, SEQ_COLUMN
                if OP_COLUMN in df.columns:
                    # NULL-safe: a NULL op must ALSO trip the guard
                    # (plain `!= "+I"` drops NULLs under 3VL)
                    bad = (df.where(~F.coalesce(
                               F.col(OP_COLUMN) == "+I", F.lit(False)))
                           .limit(1).count())
                    if bad:
                        raise ValueError(
                            "keyless paimon sink is insert-only; got "
                            "a retraction/update op — declare primary "
                            "keys or route to the versioned lakehouse")
                final = df.drop(*[c for c in
                                  (OP_COLUMN, SEQ_COLUMN, "__table_id",
                                   "__op_ts") if c in df.columns])
            write_paimon(self.spark, final,
                         f"{base}/{sink_tid.table}")
        elif sink.type == "scd2-parquet":
            from .partitioning import scd2_apply_increment
            from .sinks import read_parquet_state, swap_parquet_dir

            base = sink.config["path"]
            path = f"{base}/{sink_tid.table}"
            hist = read_parquet_state(self.spark, path)
            new = scd2_apply_increment(hist, df,
                                       list(schema.primary_keys))
            swap_parquet_dir(new, path)
        elif sink.type == "rollup-parquet":
            from .operators import ivm
            from .sinks import read_parquet_state, swap_parquet_dir

            base = sink.config["path"]
            path = f"{base}/{sink_tid.table}"
            group_cols = [c.strip() for c in
                          sink.config["group-columns"].split(",")]
            value_col = sink.config["value-column"]
            state = read_parquet_state(self.spark, path)
            delta = ivm.rollup_delta(df, group_cols, value_col)
            swap_parquet_dir(ivm.merge_rollup(state, delta, group_cols),
                             path)
        elif sink.type == "cow-parquet":
            from .lakehouse import merge_into_partitioned_parquet
            from .partitioning import hash_bucket_expr

            base = sink.config["path"]
            buckets = int(sink.config.get("buckets", 16))
            part = df.withColumn(
                "part", hash_bucket_expr(list(schema.primary_keys),
                                         buckets))
            merge_into_partitioned_parquet(
                f"{base}/{sink_tid.table}", part, schema)
        elif sink.type == "versioned-parquet":
            from .lakehouse import merge_into_versioned_parquet
            from .partitioning import hash_bucket_expr

            base = sink.config["path"]
            buckets = int(sink.config.get("buckets", 16))
            part = df.withColumn(
                "part", hash_bucket_expr(list(schema.primary_keys),
                                         buckets))
            merge_into_versioned_parquet(
                f"{base}/{sink_tid.table}", part, schema,
                epoch=sink.config.get("epoch"))
        else:
            raise ValueError(f"unsupported sink type {sink.type!r}")


def _data_struct(df: DataFrame):
    from pyspark.sql import types as T

    return T.StructType([
        f for f in df.schema.fields
        if f.name not in ("__op", "__table_id", "__seq", "__op_ts")])


def compose_changelog_stream(spark: SparkSession, pipeline: PipelineDef,
                             checkpoint: str, sink_writer,
                             on_schema_change=None, evolver=None,
                             available_now: bool = True,
                             metrics=None):
    """Compose the full streaming pipeline over a Debezium changelog source:

        readStream → decode_debezium_json → [prune → transform → evolve →
          coerce → PK-repartition → sink]  (the bracket runs per micro-batch)

    Source types: ``file-debezium`` (JSON-lines (value, offset) files — the
    hermetic stand-in with the identical decode path) and
    ``kafka-debezium`` (the real topic; needs the Kafka connector jar).
    Source config: ``path``/``servers``+``topics``, ``schema`` (DDL string
    of the payload), ``table``, ``primary-keys``.

    Returns the started StreamingQuery. Effectively-once: the checkpoint
    tracks source offsets; the upsert sink is idempotent; a restart with a
    checkpointed ``evolver`` resumes mid-stream schema evolution.
    """
    from .sources import changelog_file_stream, kafka_changelog_stream

    src = pipeline.source
    payload = spark.createDataFrame([], src.config["schema"]).schema
    if src.type in ("file-debezium", "file-maxwell", "file-ogg"):
        envelope = {"file-debezium": "debezium-json",
                    "file-maxwell": "maxwell-json",
                    "file-ogg": "ogg-json"}[src.type]
        stream = changelog_file_stream(
            spark, src.config["path"], payload, envelope=envelope,
            reader_options=src.config.get("reader-options"))
    elif src.type == "file-binlog":
        # byte-level MySQL binlog segments (binlog.py) — the hermetic
        # twin of a live COM_BINLOG_DUMP tail
        from .binlog import binlog_file_stream

        stream = binlog_file_stream(
            spark, src.config["path"], payload,
            table=src.config.get("mysql-table"),
            reader_options=src.config.get("reader-options"))
    elif src.type == "file-pgoutput":
        # byte-level pgoutput segments (pgoutput.py) — the hermetic
        # twin of a live START_REPLICATION slot
        from .pgoutput import pgoutput_file_stream

        stream = pgoutput_file_stream(
            spark, src.config["path"], payload,
            reader_options=src.config.get("reader-options"),
            pg_table=src.config.get("pg-table"))
    elif src.type == "kafka-debezium":
        stream = kafka_changelog_stream(
            spark, src.config["servers"], src.config["topics"], payload)
    else:
        raise ValueError(f"unsupported stream source type {src.type!r}")
    handle = foreach_batch_writer(pipeline, sink_writer, spark,
                                  on_schema_change=on_schema_change,
                                  evolver=evolver, metrics=metrics)
    w = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_writer(pipeline: PipelineDef, sink_writer,
                         spark: SparkSession, on_schema_change=None,
                         evolver: SchemaEvolver | None = None,
                         metrics=None):
    """Build a ``foreachBatch`` function running the composed pipeline on
    each micro-batch of a single-table changelog stream.

    Usage::

        q = (stream_df.writeStream
             .foreachBatch(foreach_batch_writer(pipe, writer, spark))
             .option("checkpointLocation", ckpt)
             .start())

    Effectively-once: checkpointLocation tracks offsets; the sink writer is
    an idempotent upsert, so replays converge (the same guarantee as the
    reference's upsert sink, DsqlBatchSinkFunction).

    Schema evolution in the hot path (SchemaOperator.java:70,176-180 +
    SchemaCoordinator.java:72,389-465): each micro-batch's post-transform
    schema is diffed against the registry; drift (new columns, widened
    types) becomes schema-change events applied under the pipeline's
    ``schema.change.behavior`` policy, the batch is coerced into the
    evolved sink schema, and ``on_schema_change(sink_tid, events, schema)``
    fires so JDBC-style sinks can issue DDL before rows land. foreachBatch
    is already a global synchronous barrier, so the reference's
    FlushEvent/RPC coordination collapses into this call sequence.
    """
    engine = TransformEngine(list(pipeline.transforms))
    router = TableIdRouter(list(pipeline.routes))
    src_cfg = pipeline.source.config
    table = TableId.parse(src_cfg.get("table", "default.default.stream"))
    pks = list(src_cfg.get("primary-keys", []))
    # Pass a pre-seeded evolver (SchemaManager.from_json of checkpointed
    # registry state) to resume evolution across stream restarts — the
    # SchemaCoordinator's checkpoint story (SchemaCoordinator snapshot).
    evolver = evolver or SchemaEvolver(
        behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))
    from .metrics import (PROCESSING_LATENCY, SCHEMA_CHANGES_APPLIED,
                          registry)
    reg = metrics if metrics is not None else registry(pipeline.name)

    def handle(df: DataFrame, batch_id: int) -> None:
        t0 = _monotonic()
        xdf = engine.apply(engine.prune(df, table), table)
        incoming = Schema.of(_data_struct(xdf), primary_keys=pks)
        applied = list(evolver.infer_drift_events(table, incoming))
        evolved = evolver.manager.latest_evolved(table)
        for e in applied:
            evolved = evolver.on_event(e)
        schema = evolved if evolved is not None else incoming
        out0 = coerce_dataframe(xdf, schema)
        for sink_tid in router.route(table):
            if applied and on_schema_change is not None:
                on_schema_change(sink_tid, applied, schema)
            if applied:
                reg.inc(SCHEMA_CHANGES_APPLIED, len(applied),
                        table=str(sink_tid))
            out = out0
            if schema.primary_keys:
                out = repartition_by_key(out, list(schema.primary_keys))
            # epoch-aware writers (e.g. make_versioned_sink_writer) take
            # the micro-batch id as their commit epoch for exactly-once
            # versioning under replay; classic 3-arg writers stay as-is
            if _accepts_batch_id(sink_writer):
                sink_writer(sink_tid, out, schema, batch_id=batch_id)
            else:
                sink_writer(sink_tid, out, schema)
        # batch processing latency, attributed to each routed sink
        # (observed AFTER the loop so fan-out sinks report the same
        # end-to-end batch time rather than cumulative prefixes)
        dur = _monotonic() - t0
        for sink_tid in router.route(table):
            reg.observe(PROCESSING_LATENCY, dur, table=str(sink_tid))

    return handle


def _accepts_batch_id(writer) -> bool:
    import inspect

    try:
        return "batch_id" in inspect.signature(writer).parameters
    except (TypeError, ValueError):
        return False


def ddl_foreach_batch_writer(pipeline: PipelineDef, sink_writer,
                             spark: SparkSession, on_schema_change=None,
                             evolver: SchemaEvolver | None = None):
    """``foreachBatch`` handler over the RAW ``(value, offset)`` envelope
    stream that ALSO consumes IN-BAND Debezium schema-change messages
    (envelopes carrying a ``ddl`` field instead of before/after images —
    what Debezium emits with ``include.schema.changes``).

    Reference ordering contract (SchemaOperator.java:176-180): on a
    schema-change event, FLUSH the sink, THEN apply the change, THEN
    resume the data flow. Here each micro-batch is segmented at the
    offsets of its schema messages; every segment is decoded with the
    schema current AT ITS OFFSETS, written (the flush), and only then is
    the DDL parsed into SchemaChangeEvents, applied through the shared
    evolver, and surfaced via ``on_schema_change`` so JDBC sinks issue
    DDL before the next segment's rows land.

    This is the piece drift-diffing cannot recover: a RENAME is
    indistinguishable from drop+add in a schema diff, so only the
    explicit event preserves column identity — old rows keep their data
    under the renamed column at the sink.

    Scale note: schema messages are control-plane (a handful per batch
    at most), so the driver-side collect is bounded; data rows never
    leave the cluster, and each segment runs the same composed pipeline
    as :func:`foreach_batch_writer`. Transform rules are applied per
    segment in source-column space — pair in-band DDL with wildcard /
    pass-through projections (a rename racing a projection that names
    the old column is ill-defined in the reference too).
    """
    from pyspark.sql import functions as F, types as T

    from .sources import decode_debezium_json, parse_debezium_ddl

    src_cfg = pipeline.source.config
    table = TableId.parse(src_cfg.get("table", "default.default.stream"))
    evolver = evolver or SchemaEvolver(
        behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))
    data_handle = foreach_batch_writer(pipeline, sink_writer, spark,
                                       on_schema_change=on_schema_change,
                                       evolver=evolver)
    router = TableIdRouter(list(pipeline.routes))
    base_struct = spark.createDataFrame([], src_cfg["schema"]).schema
    aux = ("__op", "__seq", "__table_id")

    def payload_struct() -> T.StructType:
        cur = evolver.manager.latest_original(table)
        if cur is None:
            return base_struct
        return T.StructType(
            [f for f in cur.struct.fields if f.name not in aux])

    def handle(df: DataFrame, batch_id: int) -> None:
        marked = df.withColumn(
            "__sc", F.from_json(F.col("value"), "ddl STRING, op STRING"))
        ddl_rows = sorted(
            marked.where(F.col("__sc.ddl").isNotNull())
            .select("offset", F.col("__sc.ddl").alias("ddl")).collect(),
            key=lambda r: r["offset"])
        data = marked.where(F.col("__sc.ddl").isNull()).drop("__sc")
        lo = None
        # persists ACROSS micro-batches via the registry tombstone:
        # a table dropped in batch N must not be flushed (and
        # resurrected by a create-if-missing sink) by batch N+1's
        # empty frames — only a CREATE TABLE clears it (wave-3 #3)
        table_dropped = evolver.manager.is_dropped(table)
        for seg_idx, r in enumerate(ddl_rows + [None]):
            hi = r["offset"] if r is not None else None
            if not table_dropped:
                seg = data
                if lo is not None:
                    seg = seg.where(F.col("offset") > lo)
                if hi is not None:
                    seg = seg.where(F.col("offset") < hi)
                decoded = decode_debezium_json(seg, "value",
                                               payload_struct(),
                                               seq_col="offset")
                # flush before apply; the epoch is SEGMENT-qualified:
                # all segments of one micro-batch share batch_id, and
                # an epoch-deduping sink (make_versioned_sink_writer)
                # must not mistake segment 2 for a replay of segment 1
                data_handle(decoded, f"{batch_id}s{seg_idx}")
            # while dropped, skip segments but keep applying events so
            # a CREATE TABLE in the same batch resumes decoding (see
            # the binlog twin)
            if r is not None:
                for ev in parse_debezium_ddl(r["ddl"], table):
                    schema = evolver.on_event(ev)
                    _fire_applied(on_schema_change, evolver, router,
                                  table, schema)
                table_dropped = (
                    evolver.manager.latest_original(table) is None)
            lo = hi

    return handle


def compose_ddl_changelog_stream(spark: SparkSession, pipeline: PipelineDef,
                                 checkpoint: str, sink_writer,
                                 on_schema_change=None, evolver=None,
                                 available_now: bool = True):
    """:func:`compose_changelog_stream` variant whose foreachBatch also
    decodes in-band Debezium schema-change (DDL) messages — see
    :func:`ddl_foreach_batch_writer`. File-backed envelope source (the
    hermetic Kafka twin; the decode path is shared)."""
    src = pipeline.source
    if src.type != "file-debezium":
        raise ValueError(
            f"in-band DDL stream needs file-debezium source, got {src.type!r}")
    raw = (spark.readStream.schema("value string, offset long")
           .json(src.config["path"]))
    handle = ddl_foreach_batch_writer(pipeline, sink_writer, spark,
                                      on_schema_change=on_schema_change,
                                      evolver=evolver)
    w = (raw.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _fire_applied(on_schema_change, evolver, router, table, schema):
    """Surface the POLICY-APPLIED events of the evolver's last on_event
    to the sink callback (LENIENT rewrites; [] for a lenient DROP) —
    never the raw upstream event, so sink DDL always agrees with the
    evolved schema (SchemaDerivator parity). Fires even when the table
    was dropped (schema None): the sink must see DropTableEvent."""
    if on_schema_change is not None and evolver.last_applied:
        for sink_tid in router.route(table):
            on_schema_change(sink_tid, list(evolver.last_applied), schema)


def binlog_ddl_foreach_batch_writer(pipeline: PipelineDef, sink_writer,
                                    spark: SparkSession,
                                    on_schema_change=None,
                                    evolver: SchemaEvolver | None = None):
    """``foreachBatch`` handler over RAW binlog segment blobs that ALSO
    consumes IN-STREAM ``QUERY_EVENT`` DDL — schema change riding the
    wire itself, not an envelope (VERDICT r10 "what's missing" #1; the
    reference flow is MySqlEventDeserializer.java:105-120 reading the
    history record's DDL_STATEMENTS, parsed by
    CustomMySqlAntlrDdlParser.java into column events feeding
    SchemaOperator).

    Same flush-before-apply ordering as :func:`ddl_foreach_batch_writer`:
    a distributed control-plane scan (:func:`.binlog.extract_binlog_ddl`)
    surfaces the batch's DDL statements (a handful of rows — bounded
    collect); the batch is segmented at their log_pos; each segment is
    decoded with the schema current AT those positions
    (``decode_binlog(pos_range=...)`` — the byte parse still covers the
    whole blob so TABLE_MAP state accrues, only payload conversion is
    bounded), written, and only then is the DDL translated
    (``parse_debezium_ddl`` — the same translator the envelope path
    uses) and applied through the shared evolver. Combined with
    decode_binlog's fail-loud width check, a mid-stream ``ALTER TABLE``
    now lands as a proper schema change instead of either silent
    truncation or a hard error.

    Ordering contract: log_pos must be monotone across the micro-batch
    (true of a single server's tail between rotations) —
    :func:`compose_binlog_ddl_changelog_stream` therefore DEFAULTS to
    ``maxFilesPerTrigger=1``, one segment file per micro-batch, since
    rotated binlog files each restart log_pos near 4."""
    from pyspark.sql import types as T

    from .binlog import decode_binlog, extract_binlog_ddl
    from .sources import ddl_target_tables, parse_debezium_ddl

    src_cfg = pipeline.source.config
    table = TableId.parse(src_cfg.get("table", "default.default.stream"))
    mysql_table = src_cfg.get("mysql-table")
    evolver = evolver or SchemaEvolver(
        behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))
    data_handle = foreach_batch_writer(pipeline, sink_writer, spark,
                                       on_schema_change=on_schema_change,
                                       evolver=evolver)
    router = TableIdRouter(list(pipeline.routes))
    base_struct = spark.createDataFrame([], src_cfg["schema"]).schema
    aux = ("__op", "__seq", "__table_id")

    def payload_struct() -> T.StructType:
        cur = evolver.manager.latest_original(table)
        if cur is None:
            return base_struct
        return T.StructType(
            [f for f in cur.struct.fields if f.name not in aux])

    def handle(df: DataFrame, batch_id: int) -> None:
        boundaries = []
        for r in sorted(extract_binlog_ddl(df).collect(),
                        key=lambda r: r["pos"]):
            # a multi-table stream carries DDL for OTHER tables too —
            # only statements targeting THIS pipeline's table may
            # segment it and evolve its schema
            if mysql_table is not None and mysql_table.lower() \
                    not in ddl_target_tables(r["statement"]):
                continue  # membership: DROP TABLE a, b names several
            evs = parse_debezium_ddl(r["statement"], table)
            if evs:  # CREATE/GRANT noise parses to nothing — no split
                boundaries.append((r["pos"], evs))
        lo = None
        # persists ACROSS micro-batches via the registry tombstone:
        # a table dropped in batch N must not be flushed (and
        # resurrected by a create-if-missing sink) by batch N+1's
        # empty frames — only a CREATE TABLE clears it (wave-3 #3)
        table_dropped = evolver.manager.is_dropped(table)
        for seg_idx, item in enumerate(boundaries + [None]):
            hi = item[0] if item is not None else None
            if not table_dropped:
                decoded = decode_binlog(df, payload_struct(),
                                        table=mysql_table,
                                        pos_range=(lo, hi))
                # flush before apply; SEGMENT-qualified epoch (an
                # epoch-deduping sink must not mistake segment 2 for
                # a replay of segment 1)
                data_handle(decoded, f"{batch_id}s{seg_idx}")
            # while dropped, segments are SKIPPED (not flushed: an
            # empty flush would let a create-if-missing writer
            # resurrect the dropped sink table) — but boundary events
            # keep applying, so a CREATE TABLE later in the SAME batch
            # re-registers the schema and decoding resumes (a
            # drop-and-recreate migration must not lose the recreated
            # rows; round-11 review-2 #2)
            if item is not None:
                for ev in item[1]:
                    schema = evolver.on_event(ev)
                    _fire_applied(on_schema_change, evolver, router,
                                  table, schema)
                table_dropped = (
                    evolver.manager.latest_original(table) is None)
            lo = hi

    return handle


def compose_binlog_ddl_changelog_stream(spark: SparkSession,
                                        pipeline: PipelineDef,
                                        checkpoint: str, sink_writer,
                                        on_schema_change=None,
                                        evolver=None,
                                        available_now: bool = True):
    """:func:`compose_changelog_stream` variant over RAW MYSQL BINLOG
    BYTES whose foreachBatch also applies in-stream QUERY_EVENT DDL —
    see :func:`binlog_ddl_foreach_batch_writer`."""
    from pyspark.sql import functions as F

    from .binlog import _BINARY_FILE_SCHEMA

    src = pipeline.source
    if src.type != "file-binlog":
        raise ValueError(
            f"in-stream DDL needs a file-binlog source, got {src.type!r}")
    reader = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA))
    # DEFAULT one segment file per micro-batch: the pos_range
    # segmentation needs log_pos monotone WITHIN a batch, and rotated
    # binlog files each restart near pos 4 — batching several files
    # together (availableNow's default) would interleave their pos
    # spaces. A user who knows their files share one monotone pos
    # space may raise it explicitly.
    opts = {"maxFilesPerTrigger": "1",
            **(src.config.get("reader-options") or {})}
    for k, v in opts.items():
        reader = reader.option(k, v)
    raw = reader.load(src.config["path"]).select(
        F.col("content").alias("value"))
    handle = binlog_ddl_foreach_batch_writer(
        pipeline, sink_writer, spark,
        on_schema_change=on_schema_change, evolver=evolver)
    w = (raw.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def pgoutput_ddl_foreach_batch_writer(pipeline: PipelineDef, sink_writer,
                                      spark: SparkSession,
                                      on_schema_change=None,
                                      evolver: SchemaEvolver | None = None):
    """``foreachBatch`` handler over RAW framed pgoutput segments that
    derives schema changes from RE-SENT RELATION MESSAGES — the pg face
    of wire-stream evolution (VERDICT r10 ask #2; reference analog:
    PostgresEventDeserializer + SchemaDerivator over Debezium's relation
    metadata).

    A distributed control-plane scan
    (:func:`.pgoutput.extract_pgoutput_relations`) surfaces the batch's
    Relation messages; each is diffed against the evolver's registry
    (:func:`.pgoutput.relation_drift_events` — restart-safe: pgoutput
    re-sends Relation on every new connection, and an unchanged re-send
    diffs to nothing). Segments are cut at the LSNs whose diff is
    non-empty, each decoded with the schema current at those LSNs
    (``lsn_range``), flushed, THEN the events apply — the reference's
    flush-before-apply ordering."""
    import json

    from pyspark.sql import types as T

    from .evolve import apply_schema_change
    from .pgoutput import (decode_pgoutput_segments,
                           extract_pgoutput_relations,
                           relation_drift_events,
                           resolve_and_cast_pgoutput)

    src_cfg = pipeline.source.config
    table = TableId.parse(src_cfg.get("table", "default.default.stream"))
    pks = list(src_cfg.get("primary-keys", []))
    # a slot publishing several tables re-sends Relations for each —
    # only THIS pipeline's relation may drive its evolution
    pg_table = src_cfg.get("pg-table")
    evolver = evolver or SchemaEvolver(
        behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))
    data_handle = foreach_batch_writer(pipeline, sink_writer, spark,
                                       on_schema_change=on_schema_change,
                                       evolver=evolver)
    router = TableIdRouter(list(pipeline.routes))
    base_struct = spark.createDataFrame([], src_cfg["schema"]).schema
    aux = ("__op", "__seq", "__table_id")

    def payload_struct() -> T.StructType:
        cur = evolver.manager.latest_original(table)
        if cur is None:
            return base_struct
        return T.StructType(
            [f for f in cur.struct.fields if f.name not in aux])

    def handle(df: DataFrame, batch_id: int) -> None:
        rels = sorted((r for r in extract_pgoutput_relations(df).collect()
                       if pg_table is None
                       or r["name"].lower() == pg_table.lower()),
                      key=lambda r: r["lsn"])
        # simulate the schema progression driver-side to place the
        # boundaries; the REAL application happens interleaved with the
        # segment flushes below
        sim = Schema.of(payload_struct(), primary_keys=pks)
        boundaries = []
        for r in rels:
            evs = relation_drift_events(
                table, json.loads(r["columns_json"]), sim.struct)
            if evs:
                boundaries.append((r["lsn"], evs))
                for ev in evs:
                    sim = apply_schema_change(sim, ev)
        lo = None
        ctx = None  # prior epochs' raw frames: TOAST-resolution context
        persisted = []
        try:
            for seg_idx, item in enumerate(boundaries + [None]):
                hi = item[0] if item is not None else None
                ps = payload_struct()
                raw = decode_pgoutput_segments(
                    df, ps, primary_keys=pks or None,
                    lsn_range=(lo, hi), raw_only=True,
                    pg_table=pg_table)
                if boundaries:
                    # cache each epoch's raw frame BEFORE it joins
                    # later epochs' resolution windows — without this,
                    # epoch k's resolution re-parses every prior
                    # epoch's blobs (O(B²) full decodes per DDL-dense
                    # batch)
                    raw = raw.persist()
                    persisted.append(raw)
                # resolve unchanged-TOAST against prior epochs too: a
                # 'u' whose last full image landed before the mid-batch
                # ALTER must not become a hard error (review #5)
                decoded = resolve_and_cast_pgoutput(
                    raw, ps, pks or None, toast_context=ctx,
                    epoch_lo=lo)
                data_handle(decoded, f"{batch_id}s{seg_idx}")
                if boundaries:
                    ctx = raw if ctx is None else \
                        ctx.unionByName(raw, allowMissingColumns=True)
                if item is not None:
                    for ev in item[1]:
                        schema = evolver.on_event(ev)
                        _fire_applied(on_schema_change, evolver,
                                      router, table, schema)
                lo = hi
        finally:
            # also on a failing batch — a retried micro-batch must not
            # accrete stale cached frames in the block manager
            for fr in persisted:
                fr.unpersist()

    return handle


def compose_pgoutput_ddl_changelog_stream(spark: SparkSession,
                                          pipeline: PipelineDef,
                                          checkpoint: str, sink_writer,
                                          on_schema_change=None,
                                          evolver=None,
                                          available_now: bool = True):
    """:func:`compose_changelog_stream` variant over RAW framed pgoutput
    segments whose foreachBatch also derives schema changes from
    Relation-message diffs — see
    :func:`pgoutput_ddl_foreach_batch_writer`."""
    from pyspark.sql import functions as F

    from .pgoutput import _BINARY_FILE_SCHEMA

    src = pipeline.source
    if src.type != "file-pgoutput":
        raise ValueError(
            f"Relation-diff DDL needs a file-pgoutput source, "
            f"got {src.type!r}")
    reader = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA))
    for k, v in (src.config.get("reader-options") or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(src.config["path"]).select(
        F.col("content").alias("value"))
    handle = pgoutput_ddl_foreach_batch_writer(
        pipeline, sink_writer, spark,
        on_schema_change=on_schema_change, evolver=evolver)
    w = (raw.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def multitable_foreach_batch_writer(pipeline: PipelineDef, sink_writer,
                                    spark: SparkSession,
                                    on_schema_change=None,
                                    evolver: SchemaEvolver | None = None):
    """``foreachBatch`` handler capturing SEVERAL tables from ONE wire
    stream — the reference's ``tables: db.\\.*`` capture (one MySQL
    source feeding N routed tables; FlinkPipelineComposer wires one
    source to a table-id-routing DAG the same way).

    Source config: ``table-list`` — a list of per-table dicts, each
    with the single-table source keys (``table`` logical id,
    ``schema``, ``primary-keys``, and ``mysql-table`` / ``pg-table``
    naming the wire table). Each micro-batch decodes the SHARED blob
    frame once per table (the byte parse is per-blob Arrow-batched
    work; tables are decoded independently so their payload schemas
    never collide positionally — pgoutput filters by the Relation
    OID→name registry, binlog by TABLE_MAP name) and runs the same
    composed per-table flow as :func:`foreach_batch_writer`: transform
    rules and routes match per table id, one shared evolver keyed by
    table id carries every table's schema history.

    Fan-out (one table → several sinks) composes through routes as
    usual. Fan-in of DIFFERENT tables into ONE sink table (several
    ``route:`` rules naming the same sink — the reference's sharded-
    table merge, TableIdRouter fan-in +
    SchemaDerivator.deduceMergedCreateTableEvent) merges the member
    schemas through the type-widening lattice per micro-batch under the
    SHARED registry: each member is transformed and drift-evolved
    against its OWN history, coerced, then union-by-name'd into the
    widened sink schema (columns one shard lacks NULL-fill — a narrow
    union, no extra shuffle) and written ONCE per batch. In-band-DDL
    capture composes per-table segment loops whose flush cadence is
    table-local, so fan-in there is rejected loudly — use drift-diff
    evolution for sharded merges."""
    src_cfg = pipeline.source.config
    stype = pipeline.source.type
    in_band = bool(src_cfg.get("in-band-ddl"))
    evolver = evolver or SchemaEvolver(
        behavior=SchemaChangeBehavior(pipeline.schema_change_behavior))

    src_tids = [TableId.parse(t.get("table", "default.default.stream"))
                for t in src_cfg["table-list"]]
    router = TableIdRouter(list(pipeline.routes))
    groups = router.group_sources_by_sink(src_tids)
    if any(len(srcs) > 1 for srcs in groups.values()):
        if in_band:
            builder = {
                "file-binlog": _multitable_fanin_inband_binlog_writer,
                "file-pgoutput":
                    _multitable_fanin_inband_pgoutput_writer,
            }.get(stype)
            if builder is None:
                raise ValueError(
                    "fan-in with in-band-ddl capture is supported for "
                    f"file-binlog / file-pgoutput, not {stype!r} — "
                    "use drift-diff evolution (omit in-band-ddl)")
            return builder(pipeline, sink_writer, spark, groups,
                           evolver, on_schema_change)
        return _multitable_fanin_batch_writer(
            pipeline, sink_writer, spark, groups, evolver,
            on_schema_change)

    handles = []
    for tcfg in src_cfg["table-list"]:
        sub = PipelineDef(
            source=SourceDef(stype, dict(tcfg)),
            sink=pipeline.sink, routes=pipeline.routes,
            transforms=pipeline.transforms, udfs=pipeline.udfs,
            models=pipeline.models, config=pipeline.config)
        if in_band:
            # the DDL-aware per-table handlers already filter DDL /
            # Relation diffs to THEIR OWN table and consume the RAW
            # blob frame, so multi-table in-band evolution is plain
            # composition: each table segments the shared batch at its
            # own boundaries (one control-plane scan per table — a
            # handful of collected rows each)
            builder = {"file-binlog": binlog_ddl_foreach_batch_writer,
                       "file-pgoutput": pgoutput_ddl_foreach_batch_writer
                       }.get(stype)
            if builder is None:
                raise ValueError(
                    f"in-band-ddl multi-table capture unsupported for "
                    f"{stype!r}")
            handles.append((tcfg, builder(
                sub, sink_writer, spark,
                on_schema_change=on_schema_change, evolver=evolver)))
        else:
            handles.append((tcfg, foreach_batch_writer(
                sub, sink_writer, spark,
                on_schema_change=on_schema_change, evolver=evolver)))
    # static payload structs hoisted out of the per-batch hot path
    payloads = {id(tcfg): spark.createDataFrame([], tcfg["schema"]).schema
                for tcfg, _ in handles}

    def handle(df: DataFrame, batch_id: int) -> None:
        for tcfg, table_handle in handles:
            if in_band:
                table_handle(df, batch_id)  # raw frame; decodes itself
                continue
            payload = payloads[id(tcfg)]
            if stype == "file-binlog":
                from .binlog import decode_binlog

                decoded = decode_binlog(df, payload,
                                        table=tcfg.get("mysql-table"))
            elif stype == "file-pgoutput":
                from .pgoutput import decode_pgoutput_segments

                decoded = decode_pgoutput_segments(
                    df, payload,
                    primary_keys=list(tcfg.get("primary-keys", []))
                    or None,
                    pg_table=tcfg.get("pg-table"))
            else:
                raise ValueError(
                    f"multi-table capture unsupported for {stype!r}")
            table_handle(decoded, batch_id)

    return handle


def _multitable_fanin_batch_writer(pipeline: PipelineDef, sink_writer,
                                   spark: SparkSession, groups,
                                   evolver: SchemaEvolver,
                                   on_schema_change=None):
    """Fan-in-aware multi-table ``foreachBatch`` handler (split out of
    :func:`multitable_foreach_batch_writer`): decode + transform +
    drift-evolve each member table once per batch, then write each sink
    group — solo sinks get their member's frame, fan-in sinks the
    lattice-merged union (:func:`..route.fan_in`). The merged schema is
    registered for the sink tid so downstream readers of the registry
    see what the sink actually received (BatchComposer parity)."""
    src_cfg = pipeline.source.config
    stype = pipeline.source.type
    engine = TransformEngine(list(pipeline.transforms))
    members = {}
    for tcfg in src_cfg["table-list"]:
        tid = TableId.parse(tcfg.get("table", "default.default.stream"))
        members[tid] = (tcfg,
                        spark.createDataFrame([], tcfg["schema"]).schema)

    from .metrics import PROCESSING_LATENCY, registry
    reg = registry(pipeline.name)

    def handle(df: DataFrame, batch_id: int) -> None:
        t0 = _monotonic()
        frames = {}
        for tid, (tcfg, payload) in members.items():
            if stype == "file-binlog":
                from .binlog import decode_binlog

                decoded = decode_binlog(df, payload,
                                        table=tcfg.get("mysql-table"))
            elif stype == "file-pgoutput":
                from .pgoutput import decode_pgoutput_segments

                decoded = decode_pgoutput_segments(
                    df, payload,
                    primary_keys=list(tcfg.get("primary-keys", []))
                    or None,
                    pg_table=tcfg.get("pg-table"))
            else:
                raise ValueError(
                    f"multi-table capture unsupported for {stype!r}")
            xdf = engine.apply(engine.prune(decoded, tid), tid)
            incoming = Schema.of(
                _data_struct(xdf),
                primary_keys=list(tcfg.get("primary-keys", [])))
            applied = list(evolver.infer_drift_events(tid, incoming))
            evolved = evolver.manager.latest_evolved(tid)
            for e in applied:
                evolved = evolver.on_event(e)
            schema = evolved if evolved is not None else incoming
            frames[tid] = (coerce_dataframe(xdf, schema), schema,
                           applied)
        for sink_tid, srcs in groups.items():
            if len(srcs) == 1:
                out, schema, applied = frames[srcs[0]]
            else:
                out, schema = fan_in([frames[s][0] for s in srcs],
                                     [frames[s][1] for s in srcs])
                applied = [e for s in srcs for e in frames[s][2]]
                evolver.manager.register_evolved(sink_tid, schema)
            if applied and on_schema_change is not None:
                on_schema_change(sink_tid, applied, schema)
            if schema.primary_keys:
                out = repartition_by_key(out,
                                         list(schema.primary_keys))
            if _accepts_batch_id(sink_writer):
                sink_writer(sink_tid, out, schema, batch_id=batch_id)
            else:
                sink_writer(sink_tid, out, schema)
        dur = _monotonic() - t0
        for sink_tid in groups:
            reg.observe(PROCESSING_LATENCY, dur, table=str(sink_tid))

    return handle


def _multitable_fanin_inband_binlog_writer(pipeline: PipelineDef,
                                           sink_writer,
                                           spark: SparkSession, groups,
                                           evolver: SchemaEvolver,
                                           on_schema_change=None):
    """Fan-in of several wire tables into one sink WITH in-band
    QUERY_EVENT DDL (closes the r12 rejection): global flush sequencing
    by LOG POSITION.

    The single-table DDL composer segments a micro-batch at its own
    table's DDL positions; with fan-in the SINK schema is the lattice
    merge of all members, so a DDL in member A re-shapes what member
    B's subsequent rows must be coerced into. The fix is to interleave
    ALL members' DDL boundaries into ONE position-ordered epoch
    sequence: within an epoch every live member decodes its rows under
    its schema current AT those positions, the members fan-in through
    the widening lattice, and the merged frame flushes BEFORE the
    boundary's events apply (the same flush-before-apply ordering as
    the single-table path, now globally sequenced). Requires the same
    monotone-log_pos contract (one segment file per micro-batch —
    compose_multitable_stream already defaults maxFilesPerTrigger=1
    for in-band binlog).

    A DROP TABLE of one member removes it from the union until a
    CREATE re-registers it; the sink keeps receiving the surviving
    members (sharded-migration semantics: shards retire one at a
    time)."""
    from pyspark.sql import types as T

    from .binlog import decode_binlog, extract_binlog_ddl
    from .sources import ddl_target_tables, parse_debezium_ddl

    src_cfg = pipeline.source.config
    engine = TransformEngine(list(pipeline.transforms))
    members: dict[TableId, dict] = {}
    wire_of: dict[str, TableId] = {}
    base_structs: dict[TableId, T.StructType] = {}
    for tcfg in src_cfg["table-list"]:
        tid = TableId.parse(tcfg.get("table", "default.default.stream"))
        members[tid] = tcfg
        wire_of[(tcfg.get("mysql-table") or tid.table).lower()] = tid
        base_structs[tid] = spark.createDataFrame(
            [], tcfg["schema"]).schema

    # seed each member's declared schema (BatchComposer parity) so the
    # first in-band ALTER has a base to apply to; a checkpointed-resume
    # evolver or an in-band drop tombstone is left untouched
    for tid, tcfg in members.items():
        if evolver.manager.latest_original(tid) is None \
                and not evolver.manager.is_dropped(tid):
            evolver.on_event(CreateTableEvent(tid, Schema.of(
                base_structs[tid],
                primary_keys=list(tcfg.get("primary-keys", [])))))

    aux = ("__op", "__seq", "__table_id")

    def payload_struct(tid: TableId) -> T.StructType:
        cur = evolver.manager.latest_original(tid)
        if cur is None:
            return base_structs[tid]
        return T.StructType(
            [f for f in cur.struct.fields if f.name not in aux])

    def member_schema(tid: TableId) -> Schema:
        cur = evolver.manager.latest_evolved(tid) \
            or evolver.manager.latest_original(tid)
        if cur is not None:
            return cur
        tcfg = members[tid]
        return Schema.of(base_structs[tid],
                         primary_keys=list(tcfg.get("primary-keys",
                                                    [])))

    from .metrics import PROCESSING_LATENCY, registry
    reg = registry(pipeline.name)

    def handle(df: DataFrame, batch_id: int) -> None:
        t0 = _monotonic()
        written_sinks: set = set()
        # ONE position-ordered boundary sequence over ALL members
        boundaries = []
        for r in sorted(extract_binlog_ddl(df).collect(),
                        key=lambda r: r["pos"]):
            targets = ddl_target_tables(r["statement"])
            hit = [(tid, parse_debezium_ddl(r["statement"], tid))
                   for w, tid in wire_of.items() if w in targets]
            hit = [(tid, evs) for tid, evs in hit if evs]
            if hit:
                boundaries.append((r["pos"], hit))
        lo = None
        dropped = {tid: evolver.manager.is_dropped(tid)
                   for tid in members}
        for seg_idx, item in enumerate(boundaries + [None]):
            hi = item[0] if item is not None else None
            frames: dict[TableId, tuple] = {}
            for tid, tcfg in members.items():
                if dropped[tid]:
                    continue  # retired shard: skip until re-created
                decoded = decode_binlog(df, payload_struct(tid),
                                        table=tcfg.get("mysql-table"),
                                        pos_range=(lo, hi))
                xdf = engine.apply(engine.prune(decoded, tid), tid)
                schema = member_schema(tid)
                frames[tid] = (coerce_dataframe(xdf, schema), schema)
            for sink_tid, srcs in groups.items():
                live = [s for s in srcs if s in frames]
                if not live:
                    continue
                if len(live) == 1:
                    out, schema = frames[live[0]]
                else:
                    out, schema = fan_in(
                        [frames[s][0] for s in live],
                        [frames[s][1] for s in live])
                    evolver.manager.register_evolved(sink_tid, schema)
                if schema.primary_keys:
                    out = repartition_by_key(
                        out, list(schema.primary_keys))
                # flush BEFORE the boundary applies; segment-qualified
                # epoch id (an epoch-deduping sink must not mistake
                # segment 2 for a replay of segment 1)
                if _accepts_batch_id(sink_writer):
                    sink_writer(sink_tid, out, schema,
                                batch_id=f"{batch_id}s{seg_idx}")
                else:
                    sink_writer(sink_tid, out, schema)
                written_sinks.add(sink_tid)
            if item is not None:
                touched = set()
                applied_events = []
                for tid, evs in item[1]:
                    for ev in evs:
                        evolver.on_event(ev)
                        applied_events.extend(evolver.last_applied)
                    dropped[tid] = (
                        evolver.manager.latest_original(tid) is None)
                    touched.add(tid)
                if on_schema_change is not None and applied_events:
                    for sink_tid, srcs in groups.items():
                        if not (touched & set(srcs)):
                            continue
                        live = [member_schema(s) for s in srcs
                                if not dropped[s]]
                        if not live:
                            continue
                        from .route import merged_sink_schema
                        merged = merged_sink_schema(live) \
                            if len(live) > 1 else live[0]
                        evolver.manager.register_evolved(sink_tid,
                                                         merged)
                        on_schema_change(sink_tid, applied_events,
                                         merged)
            lo = hi
        # batch processing latency: ONE end-to-end observation per sink
        # that flushed this batch (d9d267e semantics — never cumulative
        # per-segment prefixes, never segments×sinks observations)
        dur = _monotonic() - t0
        for sink_tid in written_sinks:
            reg.observe(PROCESSING_LATENCY, dur, table=str(sink_tid))

    return handle


def _multitable_fanin_inband_pgoutput_writer(pipeline: PipelineDef,
                                             sink_writer,
                                             spark: SparkSession,
                                             groups,
                                             evolver: SchemaEvolver,
                                             on_schema_change=None):
    """pgoutput twin of
    :func:`_multitable_fanin_inband_binlog_writer` (r13 — the initial
    rejection argued 'no cross-table total order', but Relation
    messages carry WAL LSNs, which ARE one): interleave ALL members'
    Relation-drift boundaries into one LSN-ordered epoch sequence,
    decode every member per epoch with ``lsn_range`` under its schema
    current AT those LSNs, fan-in through the widening lattice, flush,
    THEN apply the boundary's drift events. Per-member TOAST-resolution
    context accumulates across epochs exactly like the single-table
    path (an unchanged-TOAST 'u' whose full image landed before another
    member's boundary must still resolve). Relation re-sends that diff
    to nothing place no boundary, so reconnect noise costs nothing."""
    import json as _json

    from pyspark.sql import types as T

    from .evolve import apply_schema_change
    from .pgoutput import (decode_pgoutput_segments,
                           extract_pgoutput_relations,
                           relation_drift_events,
                           resolve_and_cast_pgoutput)

    src_cfg = pipeline.source.config
    engine = TransformEngine(list(pipeline.transforms))
    members: dict[TableId, dict] = {}
    rel_of: dict[str, TableId] = {}
    base_structs: dict[TableId, T.StructType] = {}
    for tcfg in src_cfg["table-list"]:
        tid = TableId.parse(tcfg.get("table", "default.default.stream"))
        members[tid] = tcfg
        rel_of[(tcfg.get("pg-table") or tid.table).lower()] = tid
        base_structs[tid] = spark.createDataFrame(
            [], tcfg["schema"]).schema

    for tid, tcfg in members.items():
        if evolver.manager.latest_original(tid) is None \
                and not evolver.manager.is_dropped(tid):
            evolver.on_event(CreateTableEvent(tid, Schema.of(
                base_structs[tid],
                primary_keys=list(tcfg.get("primary-keys", [])))))

    aux = ("__op", "__seq", "__table_id")

    def payload_struct(tid: TableId) -> T.StructType:
        cur = evolver.manager.latest_original(tid)
        if cur is None:
            return base_structs[tid]
        return T.StructType(
            [f for f in cur.struct.fields if f.name not in aux])

    def member_schema(tid: TableId) -> Schema:
        cur = evolver.manager.latest_evolved(tid) \
            or evolver.manager.latest_original(tid)
        if cur is not None:
            return cur
        return Schema.of(base_structs[tid], primary_keys=list(
            members[tid].get("primary-keys", [])))

    from .metrics import PROCESSING_LATENCY, registry
    reg = registry(pipeline.name)

    def handle(df: DataFrame, batch_id: int) -> None:
        t0 = _monotonic()
        written_sinks: set = set()
        rels = sorted(extract_pgoutput_relations(df).collect(),
                      key=lambda r: r["lsn"])
        # simulate each member's progression driver-side to PLACE the
        # boundaries; real application interleaves with flushes below
        sims = {tid: Schema.of(payload_struct(tid),
                               primary_keys=list(
                                   members[tid].get("primary-keys",
                                                    [])))
                for tid in members}
        boundaries = []
        for r in rels:
            tid = rel_of.get(r["name"].lower())
            if tid is None:
                continue
            evs = relation_drift_events(
                tid, _json.loads(r["columns_json"]), sims[tid].struct)
            if evs:
                boundaries.append((r["lsn"], tid, evs))
                for ev in evs:
                    sims[tid] = apply_schema_change(sims[tid], ev)
        lo = None
        ctx: dict[TableId, DataFrame | None] = \
            {tid: None for tid in members}
        persisted = []
        try:
            for seg_idx, item in enumerate(boundaries + [None]):
                hi = item[0] if item is not None else None
                frames: dict[TableId, tuple] = {}
                for tid, tcfg in members.items():
                    ps = payload_struct(tid)
                    pks = list(tcfg.get("primary-keys", []))
                    raw = decode_pgoutput_segments(
                        df, ps, primary_keys=pks or None,
                        lsn_range=(lo, hi), raw_only=True,
                        pg_table=tcfg.get("pg-table"))
                    if boundaries:
                        raw = raw.persist()
                        persisted.append(raw)
                    decoded = resolve_and_cast_pgoutput(
                        raw, ps, pks or None, toast_context=ctx[tid],
                        epoch_lo=lo)
                    xdf = engine.apply(engine.prune(decoded, tid), tid)
                    schema = member_schema(tid)
                    frames[tid] = (coerce_dataframe(xdf, schema),
                                   schema)
                    if boundaries:
                        ctx[tid] = raw if ctx[tid] is None else \
                            ctx[tid].unionByName(
                                raw, allowMissingColumns=True)
                for sink_tid, srcs in groups.items():
                    live = [s for s in srcs if s in frames]
                    if not live:
                        continue
                    if len(live) == 1:
                        out, schema = frames[live[0]]
                    else:
                        out, schema = fan_in(
                            [frames[s][0] for s in live],
                            [frames[s][1] for s in live])
                        evolver.manager.register_evolved(sink_tid,
                                                         schema)
                    if schema.primary_keys:
                        out = repartition_by_key(
                            out, list(schema.primary_keys))
                    if _accepts_batch_id(sink_writer):
                        sink_writer(sink_tid, out, schema,
                                    batch_id=f"{batch_id}s{seg_idx}")
                    else:
                        sink_writer(sink_tid, out, schema)
                    written_sinks.add(sink_tid)
                if item is not None:
                    _lsn, tid, evs = item
                    applied_events = []
                    for ev in evs:
                        evolver.on_event(ev)
                        applied_events.extend(evolver.last_applied)
                    if on_schema_change is not None and applied_events:
                        for sink_tid, srcs in groups.items():
                            if tid not in srcs:
                                continue
                            merged_members = [member_schema(s)
                                              for s in srcs]
                            from .route import merged_sink_schema
                            merged = merged_sink_schema(
                                merged_members) \
                                if len(merged_members) > 1 else \
                                merged_members[0]
                            evolver.manager.register_evolved(sink_tid,
                                                             merged)
                            on_schema_change(sink_tid, applied_events,
                                             merged)
                lo = hi
            # ONE end-to-end observation per flushed sink (d9d267e
            # semantics — never cumulative per-segment prefixes)
            dur = _monotonic() - t0
            for sink_tid in written_sinks:
                reg.observe(PROCESSING_LATENCY, dur,
                            table=str(sink_tid))
        finally:
            for fr in persisted:
                fr.unpersist()

    return handle


def compose_multitable_stream(spark: SparkSession, pipeline: PipelineDef,
                              checkpoint: str, sink_writer,
                              on_schema_change=None, evolver=None,
                              available_now: bool = True):
    """Streaming composer for a MULTI-TABLE wire source (``table-list``
    in the source config): one binaryFile stream, every captured table
    decoded and routed per micro-batch — see
    :func:`multitable_foreach_batch_writer`."""
    from pyspark.sql import functions as F

    src = pipeline.source
    if src.type == "file-binlog":
        from .binlog import _BINARY_FILE_SCHEMA
    elif src.type == "file-pgoutput":
        from .pgoutput import _BINARY_FILE_SCHEMA
    else:
        raise ValueError(
            f"multi-table capture unsupported for {src.type!r}")
    reader = (spark.readStream.format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA))
    opts = dict(src.config.get("reader-options") or {})
    if src.config.get("in-band-ddl"):
        # same monotone-position contract as the single-table DDL
        # composers (log_pos for binlog, LSN for pgoutput): one segment
        # file per micro-batch by default
        opts.setdefault("maxFilesPerTrigger", "1")
    for k, v in opts.items():
        reader = reader.option(k, v)
    raw = reader.load(src.config["path"]).select(
        F.col("content").alias("value"))
    handle = multitable_foreach_batch_writer(
        pipeline, sink_writer, spark,
        on_schema_change=on_schema_change, evolver=evolver)
    w = (raw.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compose_stream(spark: SparkSession, pipeline: PipelineDef,
                   checkpoint: str, sink_writer,
                   on_schema_change=None, evolver=None,
                   available_now: bool = True):
    """Source-type-aware streaming composer dispatch — the YAML surface
    (`python -m flink_cdc_dsql_master_spark run --streaming`). A source
    with ``in-band-ddl: true`` selects the schema-change-aware variant
    for its wire format (QUERY_EVENT DDL for file-binlog, Relation
    diffs for file-pgoutput, schema-change envelopes for
    file-debezium); everything else takes the plain changelog path
    whose drift-diff evolution still covers additive changes. A
    source with ``table-list`` (multi-table capture) dispatches to
    :func:`compose_multitable_stream`."""
    if pipeline.source.config.get("table-list"):
        return compose_multitable_stream(
            spark, pipeline, checkpoint, sink_writer,
            on_schema_change=on_schema_change, evolver=evolver,
            available_now=available_now)
    if pipeline.source.config.get("in-band-ddl"):
        composer = {
            "file-binlog": compose_binlog_ddl_changelog_stream,
            "file-pgoutput": compose_pgoutput_ddl_changelog_stream,
            "file-debezium": compose_ddl_changelog_stream,
        }.get(pipeline.source.type)
        if composer is None:
            raise ValueError(
                f"in-band-ddl is not supported for source type "
                f"{pipeline.source.type!r}")
        return composer(spark, pipeline, checkpoint, sink_writer,
                        on_schema_change=on_schema_change,
                        evolver=evolver, available_now=available_now)
    return compose_changelog_stream(spark, pipeline, checkpoint,
                                    sink_writer,
                                    on_schema_change=on_schema_change,
                                    evolver=evolver,
                                    available_now=available_now)


def make_scd2_sink_writer(base_path: str):
    """Sink-writer for :func:`compose_changelog_stream` maintaining an
    SCD2 parquet history per sink table (the streaming face of the
    ``scd2-parquet`` YAML sink): each micro-batch folds via
    ``scd2_apply_increment`` and swaps atomically."""
    from .partitioning import scd2_apply_increment
    from .sinks import read_parquet_state, swap_parquet_dir

    def writer(sink_tid, df, schema):
        path = f"{base_path}/{sink_tid.table}"
        hist = read_parquet_state(df.sparkSession, path)
        swap_parquet_dir(
            scd2_apply_increment(hist, df, list(schema.primary_keys)),
            path)

    return writer


def make_cow_sink_writer(base_path: str, buckets: int = 16):
    """Sink-writer maintaining a partitioned copy-on-write parquet table
    per sink table (the streaming face of the ``cow-parquet`` YAML sink):
    each micro-batch MERGEs into the affected PK-hash-bucket partitions
    only, published through the manifest-logged atomic swap — so a
    crashed micro-batch is rolled forward on restart and the foreachBatch
    replay of the same epoch is idempotent (same final images, same
    partitions)."""
    from .lakehouse import merge_into_partitioned_parquet
    from .partitioning import hash_bucket_expr

    def writer(sink_tid, df, schema):
        part = df.withColumn(
            "part", hash_bucket_expr(list(schema.primary_keys), buckets))
        merge_into_partitioned_parquet(
            f"{base_path}/{sink_tid.table}", part, schema)

    return writer


def make_rollup_sink_writer(base_path: str, group_cols: list[str],
                            value_col: str):
    """Sink-writer maintaining a signed-partial rollup per sink table
    (the streaming face of the ``rollup-parquet`` YAML sink)."""
    from .operators import ivm
    from .sinks import read_parquet_state, swap_parquet_dir

    def writer(sink_tid, df, schema):
        path = f"{base_path}/{sink_tid.table}"
        state = read_parquet_state(df.sparkSession, path)
        delta = ivm.rollup_delta(df, group_cols, value_col)
        swap_parquet_dir(ivm.merge_rollup(state, delta, group_cols), path)

    return writer


def make_sketch_sink_writer(base_path: str, key_col: str,
                            group_cols: list[str] | None = None,
                            depth: int = 4, width: int = 256,
                            k: int = 64):
    """Sink-writer maintaining BOUNDED-state streaming sketches per sink
    table: a Count-Min frequency grid (``<table>__cm``) and a KMV
    distinct-count partial (``<table>__kmv``), each folded per
    micro-batch and swapped crash-safely, plus a HyperLogLog register
    state (``<table>__hll``) whose max-merge fold is IDEMPOTENT under
    epoch replay (re-folding a delivered-twice batch moves no
    register — the distinct-count that is safe even without the
    writer's replay guard). The live "top keys so far / distinct keys
    so far" dashboard whose state never grows with the stream — the
    sketch counterpart of the rollup writer's exact group-grain state
    (which is the right tool only while the grain stays small)."""
    from pyspark.sql import functions as F

    from .operators.sketches import (
        countmin_apply_batch,
        hll_apply_batch,
        kmv_apply_batch,
    )
    from .sinks import read_parquet_state, swap_parquet_dir

    gcols = group_cols or []

    def writer(sink_tid, df, schema):
        spark = df.sparkSession
        base = f"{base_path}/{sink_tid.table}"
        src = df if gcols else df.withColumn("__g", F.lit(1))
        g = gcols or ["__g"]
        cm = read_parquet_state(spark, f"{base}__cm")
        swap_parquet_dir(
            countmin_apply_batch(cm, src, key_col, depth, width),
            f"{base}__cm")
        kmv = read_parquet_state(spark, f"{base}__kmv")
        swap_parquet_dir(
            kmv_apply_batch(kmv, src, key_col, g, k), f"{base}__kmv")
        hll = read_parquet_state(spark, f"{base}__hll")
        swap_parquet_dir(
            hll_apply_batch(hll, src, key_col, g), f"{base}__hll")

    return writer


def make_dsql_sink_writer(config: dict, metrics=None):
    """Sink-writer for the streaming face of ``sink: type: dsql``: each
    micro-batch upserts its changelog through an IAM-authenticated
    connection (``DsqlBatchSinkFunction`` cadence — one effectively-once
    apply per checkpoint). The token cache means a long-running stream
    re-presigns at most every 20 minutes; an expired-token rejection
    mid-stream heals via the factory's refresh-and-retry
    (``getConnectionWithRetry`` parity). Tables are created on first
    sight via the FullLoadCoordinator's idempotence cache.

    ``metrics`` (or ``config['metrics']``) is a
    :class:`..metrics.MetricsRegistry` — when present the writer feeds
    the reference's documented monitoring contract: token refresh /
    auth-failure counters ride the authenticator, per-table events
    processed + commit latency ride the upsert sink, categorized
    errors + retry attempts ride the connection factory and the
    executemany retry loop."""
    from .iam_auth import (PostgresConnect, authenticator_from_config,
                           iam_conn_factory)
    from .sinks import FullLoadCoordinator, JdbcUpsertSink

    reg = metrics if metrics is not None else config.get("metrics")
    base_connect = config.get("connect") or PostgresConnect(
        host=config["host"], port=int(config.get("port", 5432)),
        database=config.get("database", "postgres"),
        sslrootcert=config.get("ssl-ca"))
    auth = config.get("authenticator") or \
        authenticator_from_config(config, metrics=reg)
    if reg is not None and auth.metrics is None:
        auth.metrics = reg
    factory = iam_conn_factory(base_connect, auth)
    coordinator = FullLoadCoordinator(factory)
    batch_size = int(config.get("batch-size", 1000))
    parallel = bool(config.get("parallel", False))

    def writer(sink_tid, df, schema, batch_id=None):
        sink = JdbcUpsertSink(factory, sink_tid.table, schema,
                              batch_size=batch_size, parallel=parallel,
                              metrics=reg)
        if not coordinator.is_table_created(sink_tid):
            sink.ensure_table()
            coordinator.mark_table_as_created(sink_tid)
        sink.write_batch(df)

    return writer


def make_versioned_sink_writer(base_path: str, buckets: int = 16):
    """Sink-writer maintaining a VERSIONED (manifest-pinned) parquet
    table per sink table: each micro-batch MERGEs as one snapshot
    commit, so the streaming sink accrues a full time-travel history —
    query any past micro-batch state, diff any two with table_changes,
    vacuum when retention expires. The Structured-Streaming batchId
    rides as the commit epoch, making replay after a crash a NO-OP
    (same epoch → no duplicate version, no double-apply): stronger
    than the cow writer's idempotent-by-same-images guarantee."""
    from .lakehouse import merge_into_versioned_parquet
    from .partitioning import hash_bucket_expr

    def writer(sink_tid, df, schema, batch_id=None):
        part = df.withColumn(
            "part", hash_bucket_expr(list(schema.primary_keys), buckets))
        merge_into_versioned_parquet(
            f"{base_path}/{sink_tid.table}", part, schema,
            epoch=None if batch_id is None else str(batch_id))

    return writer


def make_kmeans_sink_writer(base_path: str, cents: list,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding"):
    """Sink-writer maintaining streaming mini-batch K-MEANS sufficient
    statistics per sink table (``<table>__kmstate``): each micro-batch
    assigns against the centroids DERIVED FROM the current state
    (seeded by ``cents``), collapses to the linear-mergeable (cluster,
    dim, n, sum) rows, and folds them in with a crash-safe swap — the
    model-state counterpart of the sketch writer: centroids follow the
    stream without ever rescanning history, and the state is k x dim
    rows forever. Read the live centroids back with
    ``kmeans_centroids_of(read_parquet_state(...).collect(), cents)``."""
    from .operators.similarity import (
        kmeans_centroids_of,
        kmeans_merge_state,
        kmeans_state_from_batch,
    )
    from .sinks import read_parquet_state, swap_parquet_dir

    def writer(sink_tid, df, schema):
        spark = df.sparkSession
        path = f"{base_path}/{sink_tid.table}__kmstate"
        state = read_parquet_state(spark, path)
        cur = (kmeans_centroids_of(state.collect(), cents)
               if state is not None else [list(c) for c in cents])
        delta = kmeans_state_from_batch(df, cur, id_col, vec_col)
        merged = (kmeans_merge_state(state, delta)
                  if state is not None else delta)
        swap_parquet_dir(merged, path)

    return writer
