"""Sources: chunked JDBC snapshot, Debezium/Canal JSON decode, and the
snapshot→stream handoff.

Reference counterparts:
- ``JdbcSourceChunkSplitter.generateSplits`` (:109-349): split a table into
  PK-range chunks; *evenly-sized* fast path when the key's distribution
  factor is inside [0.05, 1000] (``calculateDistributionFactor`` :225-250,
  factor = (max-min+1)/rowCount; bounds
  ``MySqlDataSourceOptions.java:192-217``), else *unevenly-sized* chunks via
  per-chunk ``splitEnd`` queries. ``SnapshotSplit`` carries
  splitStart/splitEnd/highWatermark (meta/split/SnapshotSplit.java:35-57).
- Debezium-JSON source decode (the Kafka pipeline wire format),
  ``JsonSerializationType.java:26-32``.
- Snapshot→stream handoff (``HybridSplitAssigner``): full snapshot, record
  the log offset, then tail the log from that offset — DBLog-style.

Spark design:
- The chunk computation is a **driver-side bound calculation** feeding
  ``spark.read.jdbc(partitionColumn, lowerBound, upperBound, numPartitions)``
  — Spark's even-range JDBC partitioning is exactly the reference's
  evenly-sized fast path; for skewed keys, ``uneven_bounds`` computes
  quantile-based predicates (one query per chunk boundary, like the
  reference's uneven path) passed as ``predicates=[...]``.
- Debezium decode is ``from_json`` + the changelog flattening — all
  Catalyst.
- Handoff: batch-load the snapshot (chunked read), record the max offset,
  then stream micro-batches filtered to ``offset > recorded`` — expressed
  over any offset-carrying stream (file/kafka) in foreachBatch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from .pinning import pin, pin_eager

from .events import OP_COLUMN, OP_INSERT, OP_TS_COLUMN, SEQ_COLUMN

# chunk-key even-distribution factor bounds (MySqlDataSourceOptions.java:192-217)
EVEN_DISTRIBUTION_FACTOR_UPPER = 1000.0
EVEN_DISTRIBUTION_FACTOR_LOWER = 0.05
DEFAULT_CHUNK_SIZE = 8096  # scan.incremental.snapshot.chunk.size default


@dataclass(frozen=True)
class SnapshotSplit:
    """One chunk of a table snapshot (SnapshotSplit.java:35-57 analog)."""

    split_id: int
    start: object | None  # None = unbounded low
    end: object | None  # None = unbounded high

    def predicate(self, col: str) -> str:
        if self.start is None and self.end is None:
            return "1=1"
        if self.start is None:
            return f"{col} < {self.end}"
        if self.end is None:
            return f"{col} >= {self.start}"
        return f"{col} >= {self.start} AND {col} < {self.end}"


def distribution_factor(min_v: float, max_v: float, row_count: int) -> float:
    """(max - min + 1) / rowCount (JdbcSourceChunkSplitter.java:225-250)."""
    if row_count == 0:
        return float("inf")
    return (max_v - min_v + 1.0) / row_count


def split_evenly_sized_chunks(min_v: int, max_v: int, row_count: int,
                              chunk_size: int = DEFAULT_CHUNK_SIZE
                              ) -> list[SnapshotSplit]:
    """Evenly-sized chunk bounds (splitEvenlySizedChunks :327-349): stride =
    chunk_size * distribution_factor, half-open ranges, unbounded ends."""
    if row_count <= chunk_size:
        return [SnapshotSplit(0, None, None)]
    factor = distribution_factor(min_v, max_v, row_count)
    stride = max(int(chunk_size * factor), 1)
    splits = []
    start = None
    nxt = min_v + stride
    i = 0
    while nxt <= max_v:
        splits.append(SnapshotSplit(i, start, nxt))
        start = nxt
        nxt += stride
        i += 1
    splits.append(SnapshotSplit(i, start, None))
    return splits


def uneven_bounds(df: DataFrame, key: str, num_chunks: int,
                  error: float = 0.001) -> list[SnapshotSplit]:
    """Skew-aware chunk bounds from approxQuantile — the Spark analog of the
    reference's per-chunk splitEnd queries (:200-249 uneven path), but one
    pass instead of N queries. Use when the distribution factor is outside
    the even bounds."""
    if num_chunks <= 1:
        return [SnapshotSplit(0, None, None)]
    qs = [i / num_chunks for i in range(1, num_chunks)]
    bounds = df.approxQuantile(key, qs, error)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    splits = []
    prev = None
    for i, b in enumerate(uniq):
        splits.append(SnapshotSplit(i, prev, b))
        prev = b
    splits.append(SnapshotSplit(len(uniq), prev, None))
    return splits


class DuckDBConnFactory:
    """Picklable per-task read-only connection factory for
    :func:`chunked_dbapi_read` (executors each open their own handle; a
    lambda would not survive pickling)."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self):
        import duckdb

        return duckdb.connect(self.path, read_only=True)


def chunked_dbapi_read(spark: SparkSession, conn_factory, table: str,
                       key: str, schema: T.StructType,
                       chunk_size: int = DEFAULT_CHUNK_SIZE,
                       metrics=None) -> DataFrame:
    """Parallel snapshot read against a LIVE database over DB-API — the
    executor-side half of the chunked snapshot that ``chunked_jdbc_read``
    delegates to Spark's JDBC source (which needs a driver jar this
    sandbox lacks). Reference: JdbcIncrementalSource's per-split
    SELECT-with-predicate fetch (JdbcSourceChunkSplitter.java:327-349 for
    the bounds; each SnapshotSplit becomes one task's query).

    - the driver opens ONE connection for the (min, max, count) stats
      and plans SnapshotSplits with the reference's stride arithmetic;
    - each chunk becomes one row of a spec frame, repartitioned
      one-chunk-per-task; every task opens ITS OWN connection (the
      ``conn_factory`` must be a picklable top-level callable) and
      fetches exactly its predicate's rows, yielded as Arrow batches;
    - no row is read twice and none skipped (no-overlap-no-gap is the
      splitter's pytest-pinned property; the e2e test hash-checks the
      union against the whole table).

    At scale this is the standard DB-parallel snapshot shape: N
    concurrent range queries, connection count = task slots, each query
    index-range-scanned on ``key``.
    """
    con = conn_factory()
    try:
        row = con.execute(
            f"SELECT MIN({key}), MAX({key}), COUNT(*) FROM {table}"
        ).fetchone()
    finally:
        con.close()
    min_v, max_v, cnt = row
    if not cnt:
        return spark.createDataFrame([], schema)
    splits = split_evenly_sized_chunks(int(min_v), int(max_v), int(cnt),
                                       chunk_size)
    cols = [f.name for f in schema.fields]
    specs = spark.createDataFrame(
        [(s.split_id, s.predicate(key)) for s in splits],
        "split_id int, pred string",
    ).repartition(len(splits), "split_id")

    col_list = ", ".join(cols)

    # full-load metrics (dsql.md "Full Load Metrics"): total chunk
    # count driver-side; records loaded + chunks done ride the
    # executor handle so progress = chunks.done / chunks.total and
    # throughput = records / elapsed are readable mid-load
    handle = None
    if metrics is not None:
        from .metrics import FULL_LOAD_CHUNKS_TOTAL
        metrics.inc(FULL_LOAD_CHUNKS_TOTAL, len(splits), table=table)
        handle = metrics.executor_handle(spark)

    def read_chunk(batches):
        import pandas as pd

        for pdf in batches:
            for pred in pdf["pred"]:
                c = conn_factory()
                try:
                    cur = c.execute(
                        f"SELECT {col_list} FROM {table} WHERE {pred}")
                    rows = cur.fetchall()
                finally:
                    c.close()
                if handle is not None:
                    from .metrics import (FULL_LOAD_CHUNKS_DONE,
                                          FULL_LOAD_RECORDS)
                    handle.inc(FULL_LOAD_CHUNKS_DONE, table=table)
                    handle.inc(FULL_LOAD_RECORDS, len(rows),
                               table=table)
                yield pd.DataFrame(rows, columns=cols)

    return specs.mapInPandas(read_chunk, schema)


def chunked_jdbc_read(spark: SparkSession, url: str, table: str, key: str,
                      min_v: int, max_v: int, row_count: int,
                      chunk_size: int = DEFAULT_CHUNK_SIZE,
                      properties: dict | None = None) -> DataFrame:
    """Parallel snapshot read with reference-parity chunking decision.

    Even distribution (factor within bounds) → Spark's built-in range
    partitioning (identical chunks to splitEvenlySizedChunks); uneven →
    explicit per-chunk predicates.
    """
    factor = distribution_factor(min_v, max_v, row_count)
    props = properties or {}
    num = max(1, (row_count + chunk_size - 1) // chunk_size)
    if EVEN_DISTRIBUTION_FACTOR_LOWER <= factor <= EVEN_DISTRIBUTION_FACTOR_UPPER:
        return spark.read.jdbc(
            url, table, column=key, lowerBound=min_v, upperBound=max_v + 1,
            numPartitions=num, properties=props)
    # Skewed keys (factor outside the even bounds): evenly-STRIDED ranges
    # would put most rows in a few chunks. Mirror the reference's uneven
    # splitter (JdbcSourceChunkSplitter.java:200-249, per-chunk splitEnd
    # queries) with one preliminary key-only scan -> quantile bounds; the
    # key scan itself ranges evenly, which is fine for a single column.
    key_df = spark.read.jdbc(
        url, f"(SELECT {key} FROM {table}) __keys", column=key,
        lowerBound=min_v, upperBound=max_v + 1,
        numPartitions=min(num, 64), properties=props)
    splits = uneven_bounds(key_df, key, num)
    preds = [s.predicate(key) for s in splits]
    return spark.read.jdbc(url, table, predicates=preds, properties=props)


# ---------------------------------------------------------------------------
# Debezium / Canal JSON decode (Kafka pipeline wire format)
# ---------------------------------------------------------------------------

def decode_debezium_json(df: DataFrame, value_col: str,
                         payload_schema: T.StructType,
                         seq_col: str | None = None) -> DataFrame:
    """(key, value) debezium-json strings → flattened changelog DataFrame.

    op mapping: c/r → +I, u → +U (after image; the before image becomes a
    -U row), d → -D (before image). Pure from_json + selects.

    Source metadata (SupportedMetadataColumn / OpTsMetadataColumn.java in
    the mysql pipeline connector): the Debezium envelope's ``source.ts_ms``
    (DB commit time) — falling back to the envelope-level ``ts_ms``
    (connector time) — rides along as the internal ``__op_ts`` column, so
    transforms can project/filter ``op_ts`` like any built-in metadata.
    NULL when the envelope carries neither (the fields are optional).
    """
    envelope = T.StructType([
        T.StructField("before", payload_schema, True),
        T.StructField("after", payload_schema, True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("source", T.StructType([
            T.StructField("ts_ms", T.LongType(), True)]), True),
    ])
    p = F.from_json(F.col(value_col), envelope)
    # Assign the record sequence ONCE on the undivided frame: a
    # monotonically_increasing_id evaluated per filtered branch would number
    # c/u/d rows independently (not comparable across ops — a later delete
    # could sort below an earlier insert). Both images of one update inherit
    # the same record seq; the *2+1 / *2 bias ranks the after-image above
    # its paired before-image so last_write_wins never keeps the retraction.
    rec_seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    base = df.withColumn("__dbz", p).withColumn("__rec_seq",
                                                rec_seq.cast("long"))

    # SINGLE-PASS decode (round 9): the previous shape was a 4-way union
    # of filtered branches (inserts / -U / +U / deletes), and a union is
    # NOT one scan — each branch re-reads the source and re-runs the
    # from_json parse, so every micro-batch read its file (and parsed
    # every envelope) 4× (measured: numInputRows = 4× the file's rows in
    # the streaming latency bench). One conditional row-array + explode
    # keeps scan and parse at exactly one per record at any scale.
    op_ts = F.timestamp_millis(F.coalesce(F.col("__dbz.source.ts_ms"),
                                          F.col("__dbz.ts_ms")))

    def entry(img: str, opcode: str, seq_bias: int):
        s = F.struct(
            *[F.col(f"__dbz.{img}.{f.name}").alias(f.name)
              for f in payload_schema.fields],
            F.lit(opcode).alias(OP_COLUMN),
            (F.col("__rec_seq") * 2 + seq_bias).alias(SEQ_COLUMN),
            op_ts.alias(OP_TS_COLUMN))
        # a null image yields a null entry, compacted away below (the
        # old per-branch `where img is not null` filter)
        return F.when(F.col(f"__dbz.{img}").isNotNull(), s)

    o = F.col("__dbz.op")
    rows = (F.when(o.isin("c", "r"), F.array(entry("after", "+I", 1)))
            .when(o == "u", F.array(entry("before", "-U", 0),
                                    entry("after", "+U", 1)))
            .when(o == "d", F.array(entry("before", "-D", 1))))
    # unknown ops leave `rows` null; explode drops null/empty arrays
    out_cols = ([f.name for f in payload_schema.fields]
                + [OP_COLUMN, SEQ_COLUMN, OP_TS_COLUMN])
    return (base
            .select(F.explode(F.filter(rows, lambda x: x.isNotNull()))
                    .alias("__r"))
            .select(*[F.col(f"__r.{c}").alias(c) for c in out_cols]))


def decode_maxwell_json(df: DataFrame, value_col: str,
                        payload_schema: T.StructType,
                        seq_col: str | None = None) -> DataFrame:
    """maxwell-json strings → changelog: insert→+I, update→+U,
    delete→-D, payload from `data`. Pure from_json + selects."""
    envelope = T.StructType([
        T.StructField("type", T.StringType(), True),
        T.StructField("data", payload_schema, True),
        T.StructField("ts", T.LongType(), True),
    ])
    p = F.from_json(F.col(value_col), envelope)
    rec_seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    base = df.withColumn("__mx", p).withColumn(
        "__rec_seq", rec_seq.cast("long"))
    op = (F.when(F.col("__mx.type") == "insert", "+I")
          .when(F.col("__mx.type") == "update", "+U")
          .when(F.col("__mx.type") == "delete", "-D"))
    cols = [F.col(f"__mx.data.{f.name}").alias(f.name)
            for f in payload_schema.fields]
    return base.select(*cols, op.alias(OP_COLUMN),
                       F.col("__rec_seq").alias(SEQ_COLUMN),
                       F.timestamp_seconds(F.col("__mx.ts"))
                       .alias(OP_TS_COLUMN))


def decode_ogg_json(df: DataFrame, value_col: str,
                    payload_schema: T.StructType,
                    seq_col: str | None = None) -> DataFrame:
    """ogg-json strings → changelog: I→+I (after), U→+U (after),
    D→-D (before image, GoldenGate semantics)."""
    envelope = T.StructType([
        T.StructField("op_type", T.StringType(), True),
        T.StructField("before", payload_schema, True),
        T.StructField("after", payload_schema, True),
        T.StructField("op_ts", T.StringType(), True),
    ])
    p = F.from_json(F.col(value_col), envelope)
    rec_seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    base = df.withColumn("__og", p).withColumn(
        "__rec_seq", rec_seq.cast("long"))
    ot = F.col("__og.op_type")
    op = (F.when(ot == "I", "+I").when(ot == "U", "+U")
          .when(ot == "D", "-D"))
    img = F.when(ot == "D", F.col("__og.before"))         .otherwise(F.col("__og.after"))
    base = base.withColumn("__img", img)
    cols = [F.col(f"__img.{f.name}").alias(f.name)
            for f in payload_schema.fields]
    return base.select(*cols, op.alias(OP_COLUMN),
                       F.col("__rec_seq").alias(SEQ_COLUMN),
                       F.to_timestamp(F.col("__og.op_ts"))
                       .alias(OP_TS_COLUMN))


def changelog_file_stream(spark: SparkSession, path: str,
                          payload_schema: T.StructType,
                          envelope: str = "debezium-json",
                          reader_options: dict | None = None) -> DataFrame:
    """File-backed changelog stream — the sandbox stand-in for a Kafka
    topic carrying Debezium envelopes. Each JSON-lines file holds
    ``{"value": <envelope string>, "offset": <long>}`` records (exactly the
    (value, offset) pair a Kafka record exposes); the decode path is the
    same one the Kafka variant uses, so tests of this stream test that.
    """
    decoders = {"debezium-json": decode_debezium_json,
                "maxwell-json": decode_maxwell_json,
                "ogg-json": decode_ogg_json}
    if envelope not in decoders:
        raise ValueError(f"unsupported envelope {envelope!r} "
                         f"(one of {sorted(decoders)})")
    reader = spark.readStream.schema("value string, offset long")
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)  # e.g. maxFilesPerTrigger=1: one
        # source file per micro-batch (the latency-bench trigger shape)
    raw = reader.json(path)
    return decoders[envelope](raw, "value", payload_schema,
                              seq_col="offset")


def kafka_changelog_stream(spark: SparkSession, bootstrap_servers: str,
                           topics: str, payload_schema: T.StructType,
                           starting_offsets: str = "earliest") -> DataFrame:
    """Kafka Debezium changelog stream (the reference's Kafka pipeline
    source). Requires the spark-sql-kafka connector on the classpath (not
    present in the hermetic sandbox — the decode path is identical to
    ``changelog_file_stream``, which is what the test suite drives).

    The Kafka record offset is the per-partition sequence — exactly the
    binlog-position analog ``decode_debezium_json`` expects.
    """
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topics)
           .option("startingOffsets", starting_offsets)
           .load())
    vals = raw.selectExpr("CAST(value AS STRING) AS value",
                          "CAST(offset AS LONG) AS offset")
    return decode_debezium_json(vals, "value", payload_schema,
                                seq_col="offset")


# ---------------------------------------------------------------------------
# snapshot → stream handoff (HybridSplitAssigner analog)
# ---------------------------------------------------------------------------

@dataclass
class SnapshotStreamHandoff:
    """Coordinates 'full snapshot, then log from recorded offset'.

    1. ``snapshot()`` batch-loads the table and records the high watermark
       (max offset currently in the log).
    2. ``stream_filter()`` gives the predicate that drops log records at or
       below the watermark, so the transition is exactly-once without
       overlap — the DBLog watermark idea with foreachBatch as the barrier.
    """

    offset_col: str = SEQ_COLUMN
    high_watermark: int | None = None

    def snapshot(self, table_df: DataFrame, log_df: DataFrame | None = None
                 ) -> DataFrame:
        if log_df is not None:
            row = log_df.agg(F.max(self.offset_col).alias("hw")).collect()[0]
            self.high_watermark = row["hw"] if row["hw"] is not None else -1
        else:
            self.high_watermark = -1
        return table_df

    def stream_filter(self, log_df: DataFrame) -> DataFrame:
        if self.high_watermark is None:
            raise RuntimeError("call snapshot() before streaming")
        return log_df.where(F.col(self.offset_col) > self.high_watermark)


# ---------------------------------------------------------------------------
# per-chunk backfill reconciliation (DBLog incremental-snapshot framework)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ChunkWatermarks:
    """Low/high log watermarks bracketing one chunk's snapshot scan.

    Parity: ``SnapshotSplit`` carries a per-split ``highWatermark``
    (meta/split/SnapshotSplit.java:35-57); watermark kinds LOW/HIGH/END
    (meta/wartermark/WatermarkKind.java:21). Each chunk is scanned at some
    unknown point inside its (low, high] log window, so log events in that
    window must be upserted over the chunk's snapshot image to normalize
    it to the high watermark — the DBLog algorithm the reference's
    ``IncrementalSourceScanFetcher`` implements per chunk.
    """

    split_id: int
    low: int
    high: int


def chunk_id_expr(key: str, splits: list[SnapshotSplit]):
    """Map a key to its chunk id — a pure CASE projection (codegen, no
    shuffle, no join): splits are ordered half-open ranges, so the first
    ``key < end`` match wins.

    Sized for the backfill phase's chunk counts (hundreds to a few
    thousand — the reference's default chunk.size 8096 over a snapshot
    wave); beyond ~10k splits a CASE chain stresses Catalyst and the
    right formulation is a broadcast range join against the bounds
    table instead."""
    k = F.col(key)
    out = None
    for s in splits[:-1]:
        cond = k < F.lit(s.end)
        out = F.when(cond, s.split_id) if out is None else \
            out.when(cond, s.split_id)
    last = F.lit(splits[-1].split_id)
    return (out.otherwise(last) if out is not None else last).cast("int")


def _wm_expr(chunk_col, watermarks: list[ChunkWatermarks], attr: str):
    out = None
    for w in watermarks[:-1]:
        val = F.lit(getattr(w, attr))
        cond = chunk_col == F.lit(w.split_id)
        out = F.when(cond, val) if out is None else out.when(cond, val)
    last = F.lit(getattr(watermarks[-1], attr))
    return (out.otherwise(last) if out is not None else last).cast("long")


def chunk_backfill_merge(snapshot: DataFrame, log: DataFrame,
                         primary_keys: list[str], key: str,
                         splits: list[SnapshotSplit],
                         watermarks: list[ChunkWatermarks]) -> DataFrame:
    """Normalize per-chunk snapshot images with their backfill log window.

    For each chunk: admit log events with ``low < seq <= high`` (events at
    or below low pre-date the scan and are already reflected; events above
    high belong to the stream phase), rank the snapshot image below every
    admitted event (its seq is pinned to the chunk's low watermark), and
    reduce per PK with last-write-wins; final deletes drop the row. The
    result is each chunk's state exactly at its high watermark —
    ``IncrementalSourceScanFetcher`` / DBLog semantics.

    Scale: chunk assignment and watermark lookup are CASE projections
    inside whole-stage codegen; the only shuffle is the single PK-hash
    exchange of ``apply_changelog`` — same cost as any changelog merge.
    """
    from .partitioning import apply_changelog

    cid = chunk_id_expr(key, splits)
    snap = (snapshot.withColumn("chunk_id", cid)
            .withColumn(SEQ_COLUMN,
                        _wm_expr(F.col("chunk_id"), watermarks, "low"))
            .withColumn(OP_COLUMN, F.lit(OP_INSERT)))
    lg = log.withColumn("chunk_id", cid)
    low = _wm_expr(F.col("chunk_id"), watermarks, "low")
    high = _wm_expr(F.col("chunk_id"), watermarks, "high")
    window_events = lg.where(
        (F.col(SEQ_COLUMN) > low) & (F.col(SEQ_COLUMN) <= high))
    merged = snap.unionByName(window_events.select(*snap.columns))
    return apply_changelog(merged, primary_keys)


def stream_phase_filter(log: DataFrame, key: str,
                        splits: list[SnapshotSplit],
                        watermarks: list[ChunkWatermarks]) -> DataFrame:
    """Admit only log events strictly above their chunk's high watermark —
    the stream phase's no-replay predicate (``IncrementalSourceStreamFetcher
    .shouldEmit``): combined with :func:`chunk_backfill_merge` the handoff
    has no overlap and no gap."""
    lg = log.withColumn("chunk_id", chunk_id_expr(key, splits))
    high = _wm_expr(F.col("chunk_id"), watermarks, "high")
    return lg.where(F.col(SEQ_COLUMN) > high)


def snapshot_diff(old: DataFrame, new: DataFrame,
                  primary_keys: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Derive the changelog between two table snapshots — diff-based CDC
    for sources with no log access (periodic dump ingestion): +I for
    keys only in ``new``, -D for keys only in ``old`` (carrying the old
    image), and a -U/+U image pair for keys whose compared columns
    changed. Identical rows emit nothing.

    One co-partitioned full outer join on the PK; the change test is a
    null-safe struct comparison (codegen). Feeding the result to
    ``apply_changelog`` over ``old`` reproduces ``new`` exactly — the
    round-trip invariant, pytest-enforced.
    """
    cols = compare_cols or [c for c in new.columns
                            if c not in primary_keys]
    # presence comes from side tags, not data nullability (an all-NULL
    # data row on one side must still count as present there)
    o = old.select(*primary_keys,
                   *[F.col(c).alias(f"__o_{c}") for c in cols]) \
        .withColumn("__in_old", F.lit(True))
    n = new.select(*primary_keys,
                   *[F.col(c).alias(f"__n_{c}") for c in cols]) \
        .withColumn("__in_new", F.lit(True))
    j = o.join(n, primary_keys, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = ~F.struct(*[F.col(f"__o_{c}") for c in cols]).eqNullSafe(
        F.struct(*[F.col(f"__n_{c}") for c in cols]))
    inserts = (j.where(in_new & ~in_old)
               .select(*primary_keys,
                       *[F.col(f"__n_{c}").alias(c) for c in cols],
                       F.lit("+I").alias(OP_COLUMN)))
    deletes = (j.where(in_old & ~in_new)
               .select(*primary_keys,
                       *[F.col(f"__o_{c}").alias(c) for c in cols],
                       F.lit("-D").alias(OP_COLUMN)))
    upd = j.where(in_old & in_new & changed)
    upd_before = upd.select(
        *primary_keys, *[F.col(f"__o_{c}").alias(c) for c in cols],
        F.lit("-U").alias(OP_COLUMN))
    upd_after = upd.select(
        *primary_keys, *[F.col(f"__n_{c}").alias(c) for c in cols],
        F.lit("+U").alias(OP_COLUMN))
    return (inserts.unionByName(deletes).unionByName(upd_before)
            .unionByName(upd_after))


def split_malformed_envelopes(df: DataFrame, value_col: str,
                              payload_schema: T.StructType
                              ) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split for a changelog envelope stream: rows whose
    Debezium JSON fails to parse (or lacks an op) go to the DLQ frame
    with the raw value preserved for replay; well-formed rows pass
    through untouched. ``from_json`` yields NULL on corrupt input, so
    the split is a pure projection — no exceptions in the hot path, and
    a poison message can never stall the pipeline (the at-scale
    alternative to fail-the-job semantics).
    """
    envelope = T.StructType([
        T.StructField("before", payload_schema, True),
        T.StructField("after", payload_schema, True),
        T.StructField("op", T.StringType(), True),
    ])
    parsed = df.withColumn("__env", F.from_json(F.col(value_col), envelope))
    ok = (F.col(value_col).isNotNull()
          & F.col("__env").isNotNull()
          & F.col("__env.op").isNotNull()
          & F.col("__env.op").isin("c", "r", "u", "d"))
    good = parsed.where(ok).drop("__env")
    dlq = (parsed.where(~ok)
           .select(F.col(value_col).alias("raw_value"),
                   F.lit("malformed_envelope").alias("dlq_reason")))
    return good, dlq


# ---------------------------------------------------------------------------
# In-band Debezium schema-change (DDL) messages
# ---------------------------------------------------------------------------

# single-quoted literal with MySQL escapes: backslash-escaped chars
# (default sql_mode) and doubled quotes — `'[^']*'` would stop at the
# escaped quote in DEFAULT 'it\'s' and silently fail the whole spec
_SQ_LIT = r"'(?:\\.|''|[^'\\])*'"

# type capture: base word + optional arg list (numeric, or the quoted
# value lists ENUM/SET take) + MySQL suffix keywords (UNSIGNED/
# ZEROFILL display modifiers, DOUBLE PRECISION, CHARACTER VARYING) —
# a fixed allowlist so NOT NULL / DEFAULT / FIRST / AFTER never get
# swallowed. Normalized to the reference canon by _normalize_ddl_type.
_TYPE_PAT = (r"([A-Za-z_]+"
             r"(?:\s+(?:PRECISION|VARYING))?"  # DOUBLE PRECISION, CHARACTER VARYING(n)
             r"(?:\s*\(\s*(?:" + _SQ_LIT + r"|\d+)\s*(?:,\s*(?:"
             + _SQ_LIT + r"|\d+)\s*)*\))?"
             r"(?:\s+(?:UNSIGNED|ZEROFILL))*)")

_DDL_RES = [
    ("add", re.compile(
        r"ALTER\s+TABLE\s+\S+\s+ADD\s+(?:COLUMN\s+)?[`\"]?(\w+)[`\"]?\s+"
        + _TYPE_PAT +
        r"(?:\s+(NOT\s+NULL)|\s+NULL)?"
        r"(?:\s+DEFAULT\s+('(?:\\.|''|[^'\\])*'|[\w.+-]+))?"
        r"(?:\s+(FIRST)|\s+AFTER\s+[`\"]?(\w+)[`\"]?)?\s*;?\s*$",
        re.IGNORECASE)),
    ("rename", re.compile(
        r"ALTER\s+TABLE\s+\S+\s+RENAME\s+COLUMN\s+[`\"]?(\w+)[`\"]?\s+TO\s+"
        r"[`\"]?(\w+)[`\"]?\s*;?\s*$", re.IGNORECASE)),
    # MySQL's classic rename form: CHANGE [COLUMN] old new TYPE —
    # rename plus (re)declared type in one statement
    ("change", re.compile(
        r"ALTER\s+TABLE\s+\S+\s+CHANGE\s+(?:COLUMN\s+)?[`\"]?(\w+)[`\"]?"
        r"\s+[`\"]?(\w+)[`\"]?\s+"
        + _TYPE_PAT +
        r"(?:\s+(NOT\s+NULL)|\s+NULL)?"
        r"(?:\s+DEFAULT\s+(?:'(?:\\.|''|[^'\\])*'|[\w.+-]+))?\s*;?\s*$",
        re.IGNORECASE)),
    ("drop", re.compile(
        r"ALTER\s+TABLE\s+\S+\s+DROP\s+(?:COLUMN\s+)?[`\"]?(\w+)[`\"]?"
        r"\s*;?\s*$", re.IGNORECASE)),
    ("modify", re.compile(
        r"ALTER\s+TABLE\s+\S+\s+(?:MODIFY\s+(?:COLUMN\s+)?|ALTER\s+"
        r"(?:COLUMN\s+)?)[`\"]?(\w+)[`\"]?\s+(?:SET\s+DATA\s+TYPE\s+)?"
        + _TYPE_PAT +
        r"(?:\s+(NOT\s+NULL)|\s+NULL)?"
        r"(?:\s+DEFAULT\s+(?:'(?:\\.|''|[^'\\])*'|[\w.+-]+))?\s*;?\s*$",
        re.IGNORECASE)),
    ("create_table", re.compile(
        r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?\S+\s*\((.*)\)"
        r"\s*[^)]*;?\s*$", re.IGNORECASE | re.DOTALL)),
    ("truncate", re.compile(
        r"TRUNCATE\s+(?:TABLE\s+)?\S+\s*;?\s*$", re.IGNORECASE)),
    ("drop_table", re.compile(
        r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?"
        r"[`\"\w.]+(?:\s*,\s*[`\"\w.]+)*\s*;?\s*$", re.IGNORECASE)),
]


_ALTER_PREFIX_RE = re.compile(r"(ALTER\s+TABLE\s+\S+)\s+(.*)$",
                              re.IGNORECASE | re.DOTALL)
_SPEC_KEYWORD_RE = re.compile(r"(?:ADD|DROP|MODIFY|CHANGE|RENAME|ALTER)\b",
                              re.IGNORECASE)
_ADD_GROUP_RE = re.compile(r"ADD\s+(?:COLUMN\s+)?\((.*)\)\s*$",
                           re.IGNORECASE | re.DOTALL)


_QUOTE_CHARS = "'\"`"

# MySQL string-literal escape sequences (default sql_mode; the
# published mysql_real_escape_string table). Unknown \x → x.
_MYSQL_ESCAPES = {"0": "\0", "n": "\n", "r": "\r", "t": "\t",
                  "b": "\b", "Z": "\x1a", "\\": "\\", "'": "'",
                  '"': '"', "%": "\\%", "_": "\\_"}


def _unescape_sql_literal(inner: str) -> str:
    """The INNER text of a single-quoted MySQL literal → its value:
    ``\\'`` and ``''`` become ``'``, backslash sequences resolve per the
    published escape table."""
    out, i, n = [], 0, len(inner)
    while i < n:
        ch = inner[i]
        if ch == "\\" and i + 1 < n:
            nxt = inner[i + 1]
            out.append(_MYSQL_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if ch == "'" and i + 1 < n and inner[i + 1] == "'":
            out.append("'")
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _skip_quoted(s: str, i: int) -> int:
    """``s[i]`` opens a quoted region (``'``, ``"`` or a backtick
    identifier); return the index just past its close, honoring MySQL's
    default escaping rules: backslash escapes inside string literals
    (default sql_mode — ``'it\\'s'`` is ONE literal), doubled-quote
    escaping in all three (``'it''s'``, ```a``b```), and NO backslash
    escape inside backticks. Unterminated → end of string (never
    raises — the scrubbers must stay total on malformed DDL)."""
    q = s[i]
    i += 1
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and q != "`":
            i += 2
            continue
        if ch == q:
            if i + 1 < n and s[i + 1] == q:  # doubled quote = escaped
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _split_toplevel_commas(s: str) -> list[str]:
    """Split on commas outside parentheses and quoted regions
    (single/double-quoted literals with backslash escapes, backtick
    identifiers)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in _QUOTE_CHARS:
            i = _skip_quoted(s, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


_DDL_TARGET_RE = re.compile(
    r"(?:ALTER\s+TABLE\s+|TRUNCATE\s+(?:TABLE\s+)?"
    r"|DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?"
    r"|CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?)"
    r"([`\"\w.]+(?:\s*,\s*[`\"\w.]+)*)", re.IGNORECASE)

_LEADING_COMMENT_RE = re.compile(
    r"^(?:\s*(?:/\*.*?\*/|--[^\n]*(?:\n|$)|#[^\n]*(?:\n|$)))*\s*",
    re.S)


_UNSIGNED_WIDEN = {
    # Debezium's unsigned mapping: one integral step up so the full
    # unsigned range fits (io.debezium MySqlValueConverters)
    "TINYINT": "SMALLINT", "SMALLINT": "INT", "MEDIUMINT": "INT",
    "INT": "BIGINT", "INTEGER": "BIGINT", "BIGINT": "DECIMAL(20,0)",
}


def _normalize_ddl_type(ts: str) -> str:
    """MySQL dialect type spelling → the reference canon
    (types.parse_type's vocabulary): ENUM/SET value lists → STRING,
    DOUBLE PRECISION → DOUBLE, CHARACTER VARYING → VARCHAR, UNSIGNED
    integrals widened one step (Debezium's mapping — the binlog decode
    carries the widened range), ZEROFILL/display widths dropped."""
    s = re.sub(r"\s+", " ", ts.strip().upper())
    s = s.replace(" ZEROFILL", "")
    unsigned = s.endswith(" UNSIGNED") or " UNSIGNED " in s + " "
    s = s.replace(" UNSIGNED", "")
    base = s.split("(", 1)[0].strip()
    if base in ("ENUM", "SET"):
        return "STRING"
    if s == "DOUBLE PRECISION":
        s = "DOUBLE"
    if s.startswith("CHARACTER VARYING"):
        s = "VARCHAR" + s[len("CHARACTER VARYING"):]
    if unsigned and base in _UNSIGNED_WIDEN:
        return _UNSIGNED_WIDEN[base]  # display width dropped
    if base in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER",
                "BIGINT"):
        # INT(11) display width is not a type parameter
        s = "INT" if base == "MEDIUMINT" else base
    return s


_COMMENT_ATTR_RE = re.compile(r"\bCOMMENT\s+'(?:[^']|'')*'", re.IGNORECASE)
_CT_PARENS_RE = re.compile(r"\b(DEFAULT\s+CURRENT_TIMESTAMP)\s*\(\d*\)",
                           re.IGNORECASE)
# lookarounds instead of \b: a backtick/double-quoted identifier that
# IS one of these keywords (`unique`, "comment") must stay a name
_COL_ATTR_RE = re.compile(
    r"(?<![\w`\"])(?:CHARACTER\s+SET\s+\w+|COLLATE\s+\w+"
    r"|ON\s+UPDATE\s+CURRENT_TIMESTAMP(?:\s*\(\d*\))?"
    r"|AUTO_INCREMENT|UNIQUE(?:\s+KEY)?|PRIMARY\s+KEY)(?![\w`\"])",
    re.IGNORECASE)
_GENERATED_AS_RE = re.compile(r"(?:\bGENERATED\s+ALWAYS\s+)?\bAS\s*\(",
                              re.IGNORECASE)


def _sub_outside_quotes(rx: re.Pattern, repl: str, s: str) -> str:
    """Apply a regex substitution only to the segments of ``s`` outside
    quoted regions (string literals with MySQL backslash/doubled-quote
    escapes, backtick identifiers — a column NAMED ``auto_increment``
    must not be scrubbed)."""
    out, seg_start, i, n = [], 0, 0, len(s)
    while i < n:
        if s[i] in _QUOTE_CHARS:
            out.append(rx.sub(repl, s[seg_start:i]))
            j = _skip_quoted(s, i)
            out.append(s[i:j])
            seg_start = i = j
            continue
        i += 1
    out.append(rx.sub(repl, s[seg_start:]))
    return "".join(out)


def _in_quoted_region(s: str, pos: int) -> bool:
    """Is ``pos`` inside a quoted region of ``s`` (escape-aware)?"""
    i = 0
    while i < len(s):
        if s[i] in _QUOTE_CHARS:
            j = _skip_quoted(s, i)
            if i < pos < j:
                return True
            i = j
            continue
        if i >= pos:
            return False
        i += 1
    return False


#: the column name + type immediately preceding a generated-column
#: ``AS (`` clause — how the scrubber recovers WHICH column the clause
#: belonged to (the clause itself is removed so the per-spec regexes
#: match the plain column underneath)
_GEN_COL_NAME_RE = re.compile(
    r"[`\"]?(\w+)[`\"]?\s+[A-Za-z_]+"
    r"(?:\s+(?:PRECISION|VARYING))?"   # DOUBLE PRECISION / CHAR VARYING
    r"(?:\s*\([^)]*\))?"
    r"(?:\s+(?:UNSIGNED|ZEROFILL))*\s*$", re.IGNORECASE)


def _scrub_generated_clauses(stmt: str) -> tuple[str, dict]:
    """Remove ``[GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED]``
    generated-column clauses (balanced parens, quote-aware — both the
    search, since an 'AS (' inside a quoted DEFAULT is literal text,
    and the balance walk) and return ``(scrubbed, {column → kind})``.
    Shared by the ALTER-spec scrubber and the CREATE TABLE body parse
    (r14 — previously CREATE bodies skipped this, so an in-band CREATE
    declaring a VIRTUAL column produced a schema without the
    generated="VIRTUAL" marker and its rows' ABSENT values raised the
    misleading binlog_row_image!=FULL error at decode)."""
    generated: dict[str, str] = {}
    pos = 0
    while True:
        m = _GENERATED_AS_RE.search(stmt, pos)
        if not m:
            break
        if _in_quoted_region(stmt, m.start()):  # inside a literal
            pos = m.end()
            continue
        depth, i = 1, m.end()
        while i < len(stmt) and depth:
            ch = stmt[i]
            if ch in _QUOTE_CHARS:
                i = _skip_quoted(stmt, i)
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        tail = re.match(r"\s*(VIRTUAL|STORED)\b", stmt[i:],
                        re.IGNORECASE)
        kind = "VIRTUAL"  # MySQL default when neither keyword given
        if tail:
            kind = tail.group(1).upper()
            i += tail.end()
        nm = _GEN_COL_NAME_RE.search(stmt[:m.start()])
        if nm:
            generated[nm.group(1).lower()] = kind
        stmt = stmt[:m.start()] + " " + stmt[i:]
        pos = m.start() + 1
    return stmt, generated


def _scrub_column_attributes(stmt: str) -> tuple[str, dict]:
    """Remove MySQL column attributes that carry no engine-schema
    meaning so the per-spec regexes still match the column underneath
    (round-12 probe findings — each of these used to make the whole
    spec parse to NOTHING, silently skipping evolution): COMMENT
    strings, CHARACTER SET / COLLATE, ON UPDATE CURRENT_TIMESTAMP,
    AUTO_INCREMENT, inline UNIQUE / PRIMARY KEY markers, and
    ``[GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED]`` generated-column
    clauses. Quote-aware throughout; DEFAULT CURRENT_TIMESTAMP(p)
    loses only its precision parens.

    Returns ``(scrubbed_stmt, generated)`` where ``generated`` maps
    lower-cased column name → "VIRTUAL" | "STORED" for every scrubbed
    generated-column clause. The distinction is WIRE-relevant (r13,
    pinned in tests/test_binlog_virtual.py): a STORED generated column
    IS written to binlog row images, so its ADD applies as an ordinary
    column; a VIRTUAL one is counted in the TABLE_MAP width but
    EXCLUDED from row images by the present bitmap — its AddColumnEvent
    carries generated="VIRTUAL" so the decode NULL-fills instead of
    raising the partial-image error."""
    stmt, generated = _scrub_generated_clauses(stmt)
    stmt = _COMMENT_ATTR_RE.sub(" ", stmt)
    stmt = _sub_outside_quotes(_CT_PARENS_RE, r"\1", stmt)
    stmt = _sub_outside_quotes(_COL_ATTR_RE, " ", stmt)
    return re.sub(r"[ \t]{2,}", " ", stmt).strip(), generated


def strip_inline_comments(stmt: str) -> str:
    r"""Remove ``/* .. */`` blocks and ``-- ``/``#`` line comments
    ANYWHERE in a statement, respecting single-quoted literals (a
    DEFAULT value may contain '--'). MySQL's rule: ``--`` starts a
    comment only when followed by whitespace/EOL; ``#`` always does.
    A mid-spec or trailing comment used to make JUST that spec's regex
    fail — silent PARTIAL application of a multi-spec ALTER (round-12
    fuzz finding). Backtick-quoted identifiers are literal too — a
    column named ``\`col#1\``` must keep its '#'."""
    out = []
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch in _QUOTE_CHARS:
            j = _skip_quoted(stmt, i)
            out.append(stmt[i:j])
            i = j
            continue
        if ch == "/" and stmt.startswith("/*", i):
            end = stmt.find("*/", i + 2)
            i = n if end < 0 else end + 2
            out.append(" ")
            continue
        if ch == "#" or (stmt.startswith("--", i)
                         and (i + 2 >= n or stmt[i + 2] in " \t\n")):
            nl = stmt.find("\n", i)
            i = n if nl < 0 else nl
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def split_sql_statements(ddl: str) -> list[str]:
    """Split a DDL blob on ``;`` outside quoted regions — a quoted
    DEFAULT may contain ';' (round-12 fuzz hardening), including via a
    backslash-escaped quote (``DEFAULT 'it\\'s; x'``), and a backtick
    identifier may contain ';' too (round-13, ADVICE r12)."""
    parts, start, i, n = [], 0, 0, len(ddl)
    while i < n:
        ch = ddl[i]
        if ch in _QUOTE_CHARS:
            i = _skip_quoted(ddl, i)
            continue
        if ch == ";":
            parts.append(ddl[start:i])
            start = i + 1
        i += 1
    parts.append(ddl[start:])
    return parts


def strip_leading_comments(stmt: str) -> str:
    """Remove the comment prefix real migration tools stamp on DDL
    (gh-ost/pt-osc ``/* ... */``, ``-- line``, MySQL ``# line``) so
    the statement underneath still parses — a comment-prefixed ALTER
    silently skipping evolution is exactly the mid-stream drift
    decode_binlog's width guard exists to CATCH, but it should be
    APPLIED (wave-4 review #1)."""
    return _LEADING_COMMENT_RE.sub("", stmt)


def ddl_target_table(stmt: str) -> str | None:
    """The unqualified, unquoted table a DDL statement targets (None
    for non-DDL) — how the wire composers keep a multi-table stream's
    OTHER tables' DDL from segmenting and evolving THIS pipeline's
    table (the reference filters the same way: its schema-change events
    carry the tableId parsed from the statement). A multi-table DROP
    targets several — use :func:`ddl_target_tables` to match them
    all."""
    targets = ddl_target_tables(stmt)
    return sorted(targets)[0] if targets else None


def ddl_target_tables(stmt: str) -> set[str]:
    """Every table a DDL statement targets, unqualified / unquoted /
    lowercased (``DROP TABLE a, b`` names two); empty set for non-DDL.
    Leading migration-tool comments are stripped first."""
    m = _DDL_TARGET_RE.match(strip_leading_comments(stmt).strip())
    if not m:
        return set()
    return {part.strip().split(".")[-1].strip("`\"").lower()
            for part in m.group(1).split(",")}


def _expand_alter_specs(stmt: str) -> list[str]:
    """One ALTER TABLE with several comma-separated alter specs →
    one single-spec statement per spec (what the per-spec regexes
    match). Handles both ``ADD a INT, DROP b`` and the parenthesized
    multi-add ``ADD COLUMN (a INT, b TEXT)`` MySQL accepts — the
    shapes real migrations bundle (the reference's ANTLR grammar walks
    alterSpecification* the same way)."""
    m = _ALTER_PREFIX_RE.match(stmt)
    if not m:
        return [stmt]
    prefix, body = m.groups()
    # quote/paren-aware comma split first (a DEFAULT literal may
    # contain ', ADD'; DECIMAL(10,2) may not split), THEN re-join
    # fragments that don't open with a spec keyword to their spec
    specs: list[str] = []
    for piece in _split_toplevel_commas(body.rstrip(";").strip()):
        piece = piece.strip()
        if re.match(r"(?:ALGORITHM|LOCK)\s*=", piece, re.IGNORECASE):
            continue  # online-DDL no-op clauses (gh-ost/pt-osc era)
        if specs and not _SPEC_KEYWORD_RE.match(piece):
            specs[-1] += ", " + piece
        else:
            specs.append(piece)
    out = []
    for spec in specs:
        g = _ADD_GROUP_RE.match(spec)
        if g:
            out.extend(f"{prefix} ADD COLUMN {col.strip()}"
                       for col in _split_toplevel_commas(g.group(1)))
        else:
            out.append(f"{prefix} {spec}")
    return out


_CREATE_COL_RE = re.compile(
    r"[`\"]?(\w+)[`\"]?\s+"
    r"([A-Za-z_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
    r"(\s+NOT\s+NULL)?", re.IGNORECASE)
_CREATE_PK_RE = re.compile(r"PRIMARY\s+KEY\s*\(([^)]*)\)", re.IGNORECASE)


def _parse_create_columns(body: str):
    """CREATE TABLE column-list body → ([(name, type_string)], [pks]),
    or None when nothing parseable. Constraint entries (KEY/INDEX/
    UNIQUE/CONSTRAINT/FOREIGN) are skipped; an inline or table-level
    PRIMARY KEY feeds the schema's key list."""
    cols: list[tuple[str, str]] = []
    pks: list[str] = []
    for piece in _split_toplevel_commas(body):
        p = piece.strip()
        pk = _CREATE_PK_RE.match(p)
        if pk:
            pks = [c.strip(" `\"") for c in pk.group(1).split(",")]
            continue
        if p.upper().startswith(("KEY", "INDEX", "UNIQUE", "CONSTRAINT",
                                 "FOREIGN", "CHECK")):
            continue
        cm = _CREATE_COL_RE.match(p)
        if not cm:
            continue
        name, typ, notnull = cm.groups()
        cols.append((name, typ.upper() + (" NOT NULL" if notnull else "")))
        if re.search(r"PRIMARY\s+KEY", p, re.IGNORECASE):
            pks.append(name)
    return (cols, pks) if cols else None


def parse_debezium_ddl(ddl: str, tid) -> list:
    """Parse the DDL string of a Debezium schema-change message into
    SchemaChangeEvents (reference event kinds, SURVEY §1.1; the
    reference's MySQL source does the same translation in
    MySqlSchemaChangeEventHandler — binlog DDL → AddColumnEvent /
    RenameColumnEvent / ...).

    This is the piece drift-diffing can NEVER recover: a RENAME looks
    like drop+add to a schema diff, so only the explicit in-band event
    preserves column identity (and therefore old rows' data) at the
    sink. Statements split on ';' are handled independently; an ALTER
    with several comma-separated alter specs (or the parenthesized
    multi-add) expands to one event per spec; unknown statements are
    skipped (Debezium also emits CREATE/GRANT noise).
    """
    events = []
    for raw_stmt in split_sql_statements(ddl):
        # strip comments — leading migration-tool prefixes AND mid/
        # trailing ones — BEFORE spec expansion, so a commented
        # multi-spec ALTER still expands and no single spec silently
        # drops (wave-4 #1 + round-12 fuzz finding)
        raw_stmt = strip_inline_comments(
            strip_leading_comments(raw_stmt)).strip()
        if not raw_stmt:
            continue
        for stmt in _expand_alter_specs(raw_stmt):
            events.extend(_parse_one_ddl(stmt, tid))
    return events


def _parse_one_ddl(stmt: str, tid) -> list:
    from .events import (AddColumnEvent, AlterColumnTypeEvent,
                         ColumnPosition, CreateTableEvent, DropColumnEvent,
                         DropTableEvent, RenameColumnEvent,
                         TruncateTableEvent)

    generated: dict[str, str] = {}
    if re.match(r"\s*ALTER\s+TABLE\b",
                strip_leading_comments(stmt), re.IGNORECASE):
        # ALTER specs only — CREATE TABLE bodies keep inline PRIMARY
        # KEY markers for _parse_create_columns
        stmt, generated = _scrub_column_attributes(stmt)
    elif re.match(r"\s*CREATE\s+TABLE\b",
                  strip_leading_comments(stmt), re.IGNORECASE):
        # CREATE bodies get ONLY the generated-clause scrub (the full
        # attribute scrub would strip the inline PRIMARY KEY markers
        # _parse_create_columns needs) — so a declared VIRTUAL column
        # still lands in the schema with its generated marker
        stmt, generated = _scrub_generated_clauses(stmt)

    events = []
    stmt = strip_leading_comments(stmt)
    for kind, rx in _DDL_RES:
        m = rx.match(stmt)
        if not m:
            continue
        if kind == "add":
            name, typ, notnull, default, first, anchor = m.groups()
            pos = (ColumnPosition.FIRST if first
                   else ColumnPosition.AFTER if anchor
                   else ColumnPosition.LAST)
            ts = _normalize_ddl_type(typ) + \
                (" NOT NULL" if notnull else "")
            if default is not None:
                if default.startswith("'"):
                    default = _unescape_sql_literal(default[1:-1])
                elif default.upper() == "NULL":
                    default = None  # DEFAULT NULL = no default
            gen = generated.get(name.lower())
            events.append(AddColumnEvent(
                tid, name, ts, position=pos, anchor=anchor,
                default=default,
                # only VIRTUAL changes decode behavior; STORED columns
                # are in row images like ordinary ones
                generated="VIRTUAL" if gen == "VIRTUAL" else None))
        elif kind == "rename":
            events.append(RenameColumnEvent(tid, m.group(1), m.group(2)))
        elif kind == "change":
            old_name, new_name, typ, notnull = m.groups()
            if old_name != new_name:
                events.append(RenameColumnEvent(tid, old_name, new_name))
            ts = _normalize_ddl_type(typ) + \
                (" NOT NULL" if notnull else "")
            events.append(AlterColumnTypeEvent(tid, new_name, ts))
        elif kind == "drop":
            events.append(DropColumnEvent(tid, m.group(1)))
        elif kind == "modify":
            ts = _normalize_ddl_type(m.group(2)) + \
                (" NOT NULL" if m.group(3) else "")
            events.append(AlterColumnTypeEvent(tid, m.group(1), ts))
        elif kind == "create_table":
            parsed = _parse_create_columns(m.group(1))
            if parsed is not None:
                from .schema import Schema
                from .types import parse_type, to_struct_field

                cols, pks = parsed
                try:
                    struct = T.StructType([
                        to_struct_field(
                            n, parse_type(t),
                            # only VIRTUAL changes decode behavior;
                            # STORED values ARE in row images
                            generated="VIRTUAL"
                            if generated.get(n.lower()) == "VIRTUAL"
                            else None)
                        for n, t in cols])
                    events.append(CreateTableEvent(
                        tid, Schema.of(struct, primary_keys=pks)))
                except ValueError:
                    pass  # unmappable type → skip, like other noise
        elif kind == "truncate":
            events.append(TruncateTableEvent(tid))
        elif kind == "drop_table":
            events.append(DropTableEvent(tid))
        break
    return events


class DbApiPollingSource:
    """Polling CDC against a live database with no log access — the full
    capture loop the sandbox can actually run end-to-end (no MySQL
    binlog / pgoutput here; this is the standard fallback real pipelines
    use for log-less sources, and it exercises every downstream stage of
    the engine identically).

    Each ``poll()``:

    1. takes a chunked parallel snapshot over DB-API
       (:func:`chunked_dbapi_read` — per-task connections);
    2. diffs it against the previous snapshot (:func:`snapshot_diff` —
       one co-partitioned PK join) into a +I/-U/+U/-D changelog with a
       monotonically increasing per-poll sequence;
    3. persists the new snapshot crash-safely (temp-write + atomic swap,
       recovered via ``read_parquet_state``) so the next poll — or a
       restarted process — diffs against exactly what was last emitted.

    Scale: poll cost is one parallel range-scan of the source plus one
    PK-join against the prior snapshot; the emitted changelog carries
    only changed rows. The snapshot state lives in parquet, not memory.
    """

    def __init__(self, spark: SparkSession, conn_factory, table: str,
                 key: str, primary_keys: list[str], schema: T.StructType,
                 state_path: str, chunk_size: int = DEFAULT_CHUNK_SIZE,
                 startup_mode: str = "initial"):
        if startup_mode not in ("initial", "earliest-offset",
                                "latest-offset", "snapshot"):
            raise ValueError(
                f"unsupported polling startup_mode {startup_mode!r} "
                "(specific-offset/timestamp go through "
                "resume_from_offset)")
        self.spark = spark
        self.conn_factory = conn_factory
        self.table = table
        self.key = key
        self.primary_keys = primary_keys
        self.schema = schema
        self.state_path = state_path
        self.chunk_size = chunk_size
        self.epoch = 0
        self.startup_mode = startup_mode

    def poll(self) -> DataFrame:
        """Capture one changelog batch (empty frame when nothing changed).
        The returned frame is fully materialized before the snapshot
        state is swapped, so a crash mid-poll never loses a diff.

        ``startup_mode='snapshot'`` is BOUNDED (the reference's
        snapshot-only job): the first poll emits the full snapshot as +I
        and finishes the source; polling again raises."""
        from .sinks import read_parquet_state, swap_parquet_dir

        if self.startup_mode == "snapshot" and self.epoch >= 1:
            raise RuntimeError(
                f"snapshot-mode source for {self.table} is bounded and "
                "already finished (one snapshot, no change stream)")
        new = chunked_dbapi_read(
            self.spark, self.conn_factory, self.table, self.key,
            self.schema, self.chunk_size)
        prev = read_parquet_state(self.spark, self.state_path)
        if prev is None and self.startup_mode == "latest-offset":
            # StartupOptions.latest() semantics: start from the CURRENT
            # tail — the first poll records the snapshot as the resume
            # point without emitting it; only changes after this point
            # flow. (initial/earliest emit the snapshot as +I rows.)
            # Pin first: diffing two LIVE reads would query the database
            # twice with mutations possibly landing in between.
            new = pin_eager(new)
            prev = new
        elif prev is None:
            prev = self.spark.createDataFrame([], self.schema)
        cl = snapshot_diff(prev, new, self.primary_keys)
        self.epoch += 1
        # one seq per poll epoch: within an epoch each key appears as at
        # most one logical change (+I | -D | -U/+U pair), and the LWW
        # op-rank tie-break already orders a pair's after-image above its
        # retraction at equal seq. pin_eager (NOT pin): the state swap
        # below invalidates the `prev` lineage, so the diff must be
        # unrecomputable — the lazy 'persist' mode would evaluate (or
        # recompute after block eviction) against the NEW snapshot and
        # emit a silently wrong batch (ADVICE r8).
        cl = (cl.withColumn(SEQ_COLUMN, F.lit(self.epoch).cast("long"))
              .transform(pin_eager))
        swap_parquet_dir(new, self.state_path)
        self._commit_offset()
        return cl

    # -- startup-offset fidelity (MySqlDataSourceOptions.java:123 surface:
    # scan.startup.mode = specific-offset / timestamp) -------------------

    # deterministic stand-in for the source server's UUID in GTID sets
    SERVER_UUID = "24d2d3d8-0000-0000-0000-000000000000"

    def _meta_path(self) -> str:
        local = (self.state_path[7:]
                 if self.state_path.startswith("file://")
                 else self.state_path)
        return local.rstrip("/") + ".__meta__.json"

    def _commit_offset(self) -> None:
        """Record the committed position alongside the state snapshot —
        the GTID-set / LSN the reference's source would report for this
        point in the capture stream (epoch N == N'th committed poll).
        Written crash-safely (tmp + rename) AFTER the state swap, so a
        crash between swap and commit resumes one epoch earlier and
        re-emits at most one diff (at-least-once, converging under the
        idempotent upsert sink)."""
        import json as _json
        import os as _os
        import time as _time

        # singleton intervals render as 'uuid:1', not 'uuid:1-1' — the
        # canonical form MySQL and binlog.gtid_set_from_events emit, so
        # a canonically-formatted resume token string-matches (ADVICE r9)
        interval = "1" if self.epoch == 1 else f"1-{self.epoch}"
        meta = {
            "epoch": self.epoch,
            "gtid_set": f"{self.SERVER_UUID}:{interval}",
            "lsn": f"0/{self.epoch:X}",
            "ts_ms": int(_time.time() * 1000),
        }
        p = self._meta_path()
        with open(p + ".tmp", "w") as f:
            _json.dump(meta, f)
        _os.replace(p + ".tmp", p)

    def committed_offset(self) -> dict:
        """The last committed resume token (gtid_set + lsn + ts_ms)."""
        import json as _json

        with open(self._meta_path()) as f:
            return _json.load(f)

    @classmethod
    def resume_from_offset(cls, spark: SparkSession, conn_factory,
                           table: str, key: str, primary_keys: list[str],
                           schema: T.StructType, state_path: str,
                           startup: dict,
                           chunk_size: int = DEFAULT_CHUNK_SIZE
                           ) -> "DbApiPollingSource":
        """Construct a polling source resuming from a pinned startup
        offset (``scan.startup.mode`` = ``specific-offset`` with a
        GTID-set or LSN string, or ``timestamp`` with
        ``scan.startup.timestamp-millis``) — the reference's
        MySqlDataSourceOptions.java:123 startup surface.

        The token must identify the snapshot the state directory
        actually holds: the source retains only its latest committed
        state (exactly like a binlog server purges old segments), so a
        token older than the committed position raises — mirroring the
        reference's fail-fast when the requested binlog position is no
        longer available — and a matching token resumes with ZERO
        replayed rows (the next poll diffs against the committed
        snapshot, so only post-offset changes are emitted).
        """
        import json as _json

        mode = startup.get("scan.startup.mode")
        meta_path = (state_path[7:] if state_path.startswith("file://")
                     else state_path).rstrip("/") + ".__meta__.json"
        try:
            with open(meta_path) as f:
                meta = _json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"cannot resume {table}: no committed offset at "
                f"{meta_path} (run an initial snapshot poll first)")
        if mode == "specific-offset":
            token = (startup.get("scan.startup.specific-offset.gtid-set")
                     or startup.get("scan.startup.specific-offset.lsn"))
            if not token:
                raise ValueError("specific-offset mode needs a gtid-set "
                                 "or lsn option")
            if token not in (meta["gtid_set"], meta["lsn"]):
                raise ValueError(
                    f"offset {token!r} is not the committed position "
                    f"(gtid_set={meta['gtid_set']!r}, lsn={meta['lsn']!r})"
                    " — earlier positions were purged with their "
                    "snapshots, exactly like a rotated binlog")
            epoch = meta["epoch"]
        elif mode == "timestamp":
            ts = int(startup["scan.startup.timestamp-millis"])
            if ts < meta["ts_ms"]:
                raise ValueError(
                    f"timestamp {ts} predates the committed snapshot "
                    f"({meta['ts_ms']}) — history before it was purged")
            epoch = meta["epoch"]
        else:
            raise ValueError(
                f"resume_from_offset needs scan.startup.mode "
                f"specific-offset or timestamp, got {mode!r}")
        src = cls(spark, conn_factory, table, key, primary_keys, schema,
                  state_path, chunk_size)
        src.epoch = epoch
        return src
