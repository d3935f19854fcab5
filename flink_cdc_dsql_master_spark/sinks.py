"""Sinks: JDBC/DSQL-style batch upsert, parquet merge, Kafka JSON envelopes.

Reference counterparts:
- ``DsqlBatchSinkFunction.java:72`` — the fork's centerpiece: buffers events
  (batch-size 1000 / 30 s timer, :166-180), writes
  ``INSERT … ON CONFLICT … DO UPDATE`` upserts (:121-122), retries with
  exponential backoff (``DsqlRetryHelper.java``), deletes by PK.
- ``DsqlSchemaMapper.java:194-213`` — type → DDL mapping (our
  ``types.to_sql_ddl``).
- Kafka sink envelopes: ``JsonSerializationType.java:26-32`` —
  debezium-json and canal-json.

Spark design: a changelog micro-batch is first reduced to one final event
per key (``partitioning.last_write_wins`` — the reference achieves the same
end state by applying the buffer in order), then:
- upserts go through a DB-API connection per partition via
  ``foreachPartition`` (executemany batches + exponential-backoff retry) —
  batching is the micro-batch itself, parallelism is one connection per
  partition exactly like the reference's one-connection-per-subtask;
- deletes execute as ``DELETE WHERE (pk) IN (batch)``.
The writer is tested against DuckDB (Postgres-compatible ON CONFLICT
syntax); at 100 TB the same class pointed at a real Postgres/DSQL fleet
shards naturally because the input is already PK-hash partitioned
(one key never appears in two partitions).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .events import (INTERNAL_COLUMNS, OP_COLUMN, OP_DELETE, SEQ_COLUMN,
                     UPSERT_OPS)
from .partitioning import last_write_wins
from .schema import Schema, TableId
from .types import CDC_META_KEY, TAG_TIME, to_sql_ddl


# ---------------------------------------------------------------------------
# SQL generation (DsqlBatchSinkFunction / DsqlSchemaMapper parity)
# ---------------------------------------------------------------------------

def create_table_sql(table: str, schema: Schema,
                     dialect: str = "dsql") -> str:
    cols = ", ".join(
        f'"{f.name}" {to_sql_ddl(f, dialect)}'
        + ("" if f.nullable else " NOT NULL")
        for f in schema.struct.fields)
    pk = ""
    if schema.primary_keys:
        pk = ", PRIMARY KEY (" + ", ".join(
            f'"{k}"' for k in schema.primary_keys) + ")"
    return f'CREATE TABLE IF NOT EXISTS {table} ({cols}{pk})'


def schema_change_ddl(table: str, events, schema: Schema) -> list[str]:
    """DDL statements applying schema-change events to a JDBC target
    (DsqlMetadataApplier / MetadataApplier parity). `schema` is the evolved
    sink schema — the type source of truth for added/altered columns."""
    from .events import (
        AddColumnEvent,
        AlterColumnTypeEvent,
        CreateTableEvent,
        DropColumnEvent,
        DropTableEvent,
        RenameColumnEvent,
        TruncateTableEvent,
    )

    out = []
    for e in events:
        if isinstance(e, CreateTableEvent):
            out.append(create_table_sql(table, schema))
        elif isinstance(e, TruncateTableEvent):
            # a binlog TRUNCATE statement carries no row events, so the
            # data effect must land as sink DDL (MetadataApplier's
            # TRUNCATE_TABLE capability); DELETE FROM is the portable
            # spelling (DuckDB has no TRUNCATE)
            out.append(f'DELETE FROM {table}')
        elif isinstance(e, DropTableEvent):
            out.append(f'DROP TABLE IF EXISTS {table}')
        elif isinstance(e, AddColumnEvent):
            f = schema.field(e.name)
            out.append(f'ALTER TABLE {table} ADD COLUMN IF NOT EXISTS '
                       f'"{e.name}" {to_sql_ddl(f)}')
        elif isinstance(e, RenameColumnEvent):
            out.append(f'ALTER TABLE {table} RENAME COLUMN '
                       f'"{e.old_name}" TO "{e.new_name}"')
        elif isinstance(e, DropColumnEvent):
            out.append(f'ALTER TABLE {table} DROP COLUMN IF EXISTS "{e.name}"')
        elif isinstance(e, AlterColumnTypeEvent):
            f = schema.field(e.name)
            out.append(f'ALTER TABLE {table} ALTER COLUMN "{e.name}" '
                       f'SET DATA TYPE {to_sql_ddl(f)}')
    return out


def dbapi_paramstyle(conn) -> str:
    """The connection's driver-declared DB-API paramstyle (a module
    attribute per PEP 249), defaulting to qmark. A hardcoded '?' raised
    on psycopg (pyformat) and vice versa — ADVICE r9."""
    import sys as _sys

    mod = _sys.modules.get(type(conn).__module__.split(".")[0])
    return getattr(mod, "paramstyle", "qmark")


def _markers(style: str, n: int) -> list[str]:
    """Positional bind markers for a paramstyle. ``named`` gets REAL
    names (:p0, :p1) and the caller converts rows to dicts with
    :func:`_bind_rows` — PEP 249 only guarantees named-style drivers
    accept dicts with named placeholders; numbered positional binds are
    an oracledb extension other named drivers reject (ADVICE r10)."""
    if style in ("format", "pyformat"):
        return ["%s"] * n
    if style == "numeric":
        return [f":{i + 1}" for i in range(n)]
    if style == "named":
        return [f":p{i}" for i in range(n)]
    return ["?"] * n  # qmark — the DB-API default


def _bind_rows(style: str, rows):
    """Adapt positional value tuples to what the paramstyle's
    executemany expects: dicts keyed p0..pN for ``named``, the tuples
    unchanged otherwise."""
    if style != "named":
        return rows
    return [{f"p{i}": v for i, v in enumerate(r)} for r in rows]


def upsert_sql(table: str, columns: list[str], primary_keys: list[str],
               paramstyle: str = "qmark") -> str:
    """``INSERT .. ON CONFLICT (pk) DO UPDATE`` (DsqlBatchSinkFunction:121)."""
    collist = ", ".join(f'"{c}"' for c in columns)
    params = ", ".join(_markers(paramstyle, len(columns)))
    pklist = ", ".join(f'"{k}"' for k in primary_keys)
    sets = ", ".join(
        f'"{c}" = excluded."{c}"' for c in columns if c not in primary_keys)
    if not sets:  # pure-PK table: nothing to update
        return (f'INSERT INTO {table} ({collist}) VALUES ({params}) '
                f'ON CONFLICT ({pklist}) DO NOTHING')
    return (f'INSERT INTO {table} ({collist}) VALUES ({params}) '
            f'ON CONFLICT ({pklist}) DO UPDATE SET {sets}')


def delete_sql(table: str, primary_keys: list[str],
               paramstyle: str = "qmark") -> str:
    ms = _markers(paramstyle, len(primary_keys))
    cond = " AND ".join(f'"{k}" = {m}'
                        for k, m in zip(primary_keys, ms))
    return f'DELETE FROM {table} WHERE {cond}'


def _duckdb_relational_write(conn, run, table: str, cols: list[str],
                             pks: list[str], ups: list, dels: list) -> bool:
    """Vectorized upsert/delete for DuckDB targets: one relational
    statement over a registered Arrow table instead of row-at-a-time
    ``executemany`` binds (measured ~2.5 ms/ROW on duckdb 1.0 — a 11k-row
    micro-batch flush cost 28.8 s bound row-wise vs 0.03 s relational).
    Returns False when ``conn`` is not a DuckDB connection (or Arrow
    conversion fails), letting the caller run the generic DB-API path.
    Semantics match the bind loop exactly: keep-LAST per primary key
    replays sequential-bind overwrite order (upstream LWW already
    guarantees unique keys whenever a changelog op column is present),
    and deletes join on ``=`` so NULL pk binds match nothing, as before.
    ``run`` is the caller's retry/metrics wrapper, applied per statement
    just as it wrapped each executemany chunk."""
    if type(conn).__module__.split(".")[0] != "duckdb":
        return False
    try:
        import pyarrow as pa
    except ImportError:  # pragma: no cover — pyspark ships pyarrow
        return False
    collist = ", ".join(f'"{c}"' for c in cols)
    pklist = ", ".join(f'"{k}"' for k in pks)
    try:
        if ups:
            if pks:
                pk_i = [cols.index(k) for k in pks]
                last = {tuple(r[i] for i in pk_i): r for r in ups}
                up_rows = list(last.values())
            else:
                up_rows = ups
            batch = pa.Table.from_pylist(
                [dict(zip(cols, r)) for r in up_rows])
        else:
            batch = None
        del_batch = pa.Table.from_pylist(
            [dict(zip(pks, r)) for r in dels]) if dels else None
    except (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError,
            pa.lib.ArrowNotImplementedError,
            TypeError):  # exotic/unhashable value mix: generic path
        return False
    if batch is not None:
        sets = ", ".join(f'"{c}" = excluded."{c}"'
                         for c in cols if c not in pks)
        if not pks:
            sql = f'INSERT INTO {table} ({collist}) SELECT {collist} ' \
                  f'FROM __cdc_upserts'
        elif not sets:
            sql = (f'INSERT INTO {table} ({collist}) SELECT {collist} '
                   f'FROM __cdc_upserts ON CONFLICT ({pklist}) '
                   f'DO NOTHING')
        else:
            sql = (f'INSERT INTO {table} ({collist}) SELECT {collist} '
                   f'FROM __cdc_upserts ON CONFLICT ({pklist}) '
                   f'DO UPDATE SET {sets}')
        conn.register("__cdc_upserts", batch)
        try:
            run(lambda: conn.execute(sql))
        finally:
            conn.unregister("__cdc_upserts")
    if del_batch is not None:
        cond = " AND ".join(
            f'{table}."{k}" = __cdc_deletes."{k}"' for k in pks)
        sql = f'DELETE FROM {table} USING __cdc_deletes WHERE {cond}'
        conn.register("__cdc_deletes", del_batch)
        try:
            run(lambda: conn.execute(sql))
        finally:
            conn.unregister("__cdc_deletes")
    return True


# ---------------------------------------------------------------------------
# generic DB-API upsert writer
# ---------------------------------------------------------------------------

@dataclass
class RetryPolicy:
    """Exponential backoff (DsqlRetryHelper parity)."""

    max_retries: int = 3
    base_delay_s: float = 0.2
    factor: float = 2.0

    def run(self, fn, on_error=None):
        """Run ``fn`` with backoff. ``on_error(exc, will_retry)`` (if
        given) fires per failed attempt — ``will_retry=False`` on the
        final attempt whose exception propagates, so metrics hooks can
        count retry ATTEMPTS without overcounting exhausted budgets."""
        attempt = 0
        while True:
            try:
                return fn()
            except Exception as e:
                attempt += 1
                will_retry = attempt <= self.max_retries
                if on_error is not None:
                    on_error(e, will_retry)
                if not will_retry:
                    raise
                time.sleep(self.base_delay_s * self.factor ** (attempt - 1))


class FullLoadCoordinator:
    """Full-load table coordinator (``DsqlFullLoadCoordinator.java:37``
    parity — with the CREATE TABLE generation the reference leaves as a
    TODO at ``:71`` actually implemented via :func:`create_table_sql`):
    create-target-if-not-exists behind an idempotence cache (:61), an
    ``information_schema.tables`` existence check (:141), recovery
    marking (:105), and the default retry policy around every DB call.

    Driver-side by design: table DDL is a once-per-table metadata
    operation, never per-partition work — the Spark analog of the
    reference running this on the coordinator, not in task slots."""

    def __init__(self, conn_factory, retry: RetryPolicy | None = None,
                 dialect: str = "dsql"):
        self.conn_factory = conn_factory
        self.retry = retry or RetryPolicy()
        self.dialect = dialect
        self._created: set[str] = set()

    @staticmethod
    def target_table_name(table_id) -> str:
        """schema.table when a schema name is present (:118-126)."""
        if getattr(table_id, "schema_name", None):
            return f"{table_id.schema_name}.{table_id.table}"
        return table_id.table

    def create_target_table_if_not_exists(self, schema: Schema,
                                          table_id) -> bool:
        """Create the target table once; returns True when this call
        actually issued DDL (False = cached as already created)."""
        name = self.target_table_name(table_id)
        if name in self._created:
            return False

        def _create():
            conn = self.conn_factory()
            try:
                conn.execute(create_table_sql(name, schema, self.dialect))
                conn.commit()
            finally:
                conn.close()

        self.retry.run(_create)
        self._created.add(name)
        return True

    def is_table_created(self, table_id) -> bool:
        return self.target_table_name(table_id) in self._created

    def mark_table_as_created(self, table_id) -> None:
        """Recovery path (:105): trust an external guarantee that the
        table exists without issuing DDL."""
        self._created.add(self.target_table_name(table_id))

    def validate_table(self, table_id) -> bool:
        """information_schema existence check (:134-154); False on any
        persistent error, matching the reference's warn-and-return."""
        # Bind with the DRIVER's declared paramstyle (ADVICE r9: a
        # hardcoded '?' raised on psycopg and the blanket except turned
        # every validation into False). A bind parameter — not an
        # inlined literal — keeps dialect-specific escaping (backslash
        # strings, quote styles) out of the query entirely.
        def _check():
            conn = self.conn_factory()
            try:
                style = dbapi_paramstyle(conn)
                (marker,) = _markers(style, 1)
                (params,) = _bind_rows(style, [[table_id.table]])
                cur = conn.execute(
                    "SELECT 1 FROM information_schema.tables "
                    f"WHERE table_name = {marker} LIMIT 1",
                    params)
                return cur.fetchone() is not None
            finally:
                conn.close()

        try:
            return bool(self.retry.run(_check))
        except Exception:
            return False

    @property
    def created_table_count(self) -> int:
        return len(self._created)

    def clear_cache(self) -> None:
        self._created.clear()


class JdbcUpsertSink:
    """Changelog → idempotent upsert into a DB-API target.

    `conn_factory` must be a picklable zero-arg callable returning a DB-API
    connection (executors call it once per partition). `batch_size` chunks
    executemany calls (sink.batch-size parity, default 1000).
    """

    def __init__(self, conn_factory, table: str, schema: Schema,
                 batch_size: int = 1000, retry: RetryPolicy | None = None,
                 parallel: bool = True, dialect: str = "dsql",
                 metrics=None):
        if not schema.primary_keys:
            raise ValueError("upsert sink requires primary keys")
        self.conn_factory = conn_factory
        self.table = table
        self.schema = schema
        self.batch_size = batch_size
        self.retry = retry or RetryPolicy()
        self.parallel = parallel
        self.dialect = dialect
        # metrics face (dsql.md "CDC Metrics" + "Error Metrics"):
        # per-table events processed, commit latency, retry attempts
        # and categorized errors. A MetricsRegistry; executor-side
        # partition writers capture its picklable handle.
        self.metrics = metrics

    def ensure_table(self) -> None:
        conn = self.conn_factory()
        try:
            conn.execute(create_table_sql(self.table, self.schema,
                                          self.dialect))
            if hasattr(conn, "commit"):
                conn.commit()
        finally:
            conn.close()

    def write_batch(self, df: DataFrame) -> None:
        """Apply one changelog micro-batch (used from foreachBatch or batch
        mode). Reduces to final-event-per-key first, then writes upserts and
        deletes."""
        pks = list(self.schema.primary_keys)
        cols = [f.name for f in self.schema.struct.fields]
        final = last_write_wins(df, pks) if OP_COLUMN in df.columns else df

        # Tagged-type bind conversion: TIME travels in-flight as int
        # millis-of-day (SURVEY §1.3) but binds to a SQL TIME column as
        # 'HH:mm:ss.SSS' (the target engine casts). TIMESTAMP_TZ already
        # rides as an ISO-8601 offset string, which TIMESTAMPTZ parses.
        sel = []
        for f in self.schema.struct.fields:
            col = F.col(f.name)
            meta = (f.metadata or {}).get(CDC_META_KEY, {}) \
                if f.metadata else {}
            if meta.get("logical") == TAG_TIME:
                col = F.date_format(F.timestamp_millis(col),
                                    "HH:mm:ss.SSS")
            sel.append(col.alias(f.name))
        if OP_COLUMN in df.columns:
            sel.append(F.col(OP_COLUMN))
        final = final.select(*sel)

        conn_factory = self.conn_factory
        table, batch_size = self.table, self.batch_size
        retry = self.retry
        pk_idx = [cols.index(k) for k in pks]
        has_op = OP_COLUMN in df.columns
        handle = None
        if self.metrics is not None:
            handle = self.metrics.executor_handle(
                df.sparkSession if self.parallel else None)

        def write_partition(rows):
            rows = list(rows)
            if not rows:
                return
            conn = conn_factory()
            # placeholders per the DRIVER's declared paramstyle, decided
            # where the connection exists (psycopg %s, duckdb ?, ...)
            style = dbapi_paramstyle(conn)
            up_sql = upsert_sql(table, cols, pks, style)
            del_sql = delete_sql(table, pks, style)
            def run_with_metrics(fn):
                """retry.run, with each FAILED attempt categorized and
                counted (errors-by-category + retry attempts) — the
                reference's DsqlErrorReporter reporting hook."""
                if handle is None:
                    return retry.run(fn)
                return retry.run(
                    fn,
                    on_error=lambda e, will_retry:
                        handle.record_error(e, retried=will_retry))

            try:
                ups, dels = [], []
                for r in rows:
                    vals = tuple(r[c] for c in cols)
                    if has_op and r[OP_COLUMN] == OP_DELETE:
                        dels.append(tuple(vals[i] for i in pk_idx))
                    elif (not has_op) or r[OP_COLUMN] in UPSERT_OPS:
                        ups.append(vals)
                n_events = len(ups) + len(dels)
                if not _duckdb_relational_write(conn, run_with_metrics,
                                                table, cols, pks, ups,
                                                dels):
                    for i in range(0, len(ups), batch_size):
                        chunk = _bind_rows(style, ups[i : i + batch_size])
                        run_with_metrics(
                            lambda: conn.executemany(up_sql, chunk))
                    for i in range(0, len(dels), batch_size):
                        chunk = _bind_rows(style,
                                           dels[i : i + batch_size])
                        run_with_metrics(
                            lambda: conn.executemany(del_sql, chunk))
                if hasattr(conn, "commit"):
                    conn.commit()
                if handle is not None:
                    from .metrics import EVENTS_PROCESSED
                    handle.inc(EVENTS_PROCESSED, n_events, table=table)
            finally:
                conn.close()

        t0 = time.monotonic()
        if self.parallel:
            final.foreachPartition(write_partition)
        else:  # single-writer targets (e.g. duckdb file in tests)
            # collect(), not toLocalIterator(): the iterator launches one
            # sequential Spark job PER PARTITION (32 scheduling round
            # trips per micro-batch flush — measured 11s/flush on a 22k
            # row batch vs <1s collected). Batches on this path are
            # micro-batch-scale by contract; the scale path is parallel.
            write_partition(final.collect())
        if self.metrics is not None:
            from .metrics import COMMIT_LATENCY
            self.metrics.observe(COMMIT_LATENCY,
                                 time.monotonic() - t0, table=table)


# ---------------------------------------------------------------------------
# parquet merge sink (lakehouse MERGE INTO analog for the sandbox)
# ---------------------------------------------------------------------------

def merge_into_parquet(path: str, changelog: DataFrame,
                       schema: Schema) -> None:
    """Read-modify-write MERGE for a parquet target.

    Semantics of Delta/Iceberg ``MERGE INTO`` (the reference's lake sinks):
    final-image upserts replace matching PKs, final deletes drop them. At
    scale this would be a real MERGE on a table format with file-level
    pruning; the parquet variant keeps e2e tests hermetic.

    Crash safety: the merged result is written to a sibling temp directory
    and swapped in with directory renames — the lazy plan never reads a
    path that is being overwritten, so cache eviction / partition-loss
    recompute can never observe a half-written target (the failure mode of
    read-overwrite-same-path + persist()).
    """
    spark = changelog.sparkSession
    pks = list(schema.primary_keys)
    final = last_write_wins(changelog, pks)
    upserts = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
    deletes = final.where(F.col(OP_COLUMN) == OP_DELETE)
    drop_cols = [c for c in INTERNAL_COLUMNS if c in changelog.columns]
    try:
        cur = spark.read.parquet(path)
        exists = True
    except Exception:
        exists = False
    if exists:
        changed_keys = final.select(*pks).distinct()
        keep = cur.join(changed_keys, on=pks, how="left_anti")
        out = keep.unionByName(upserts.drop(*drop_cols), allowMissingColumns=True)
    else:
        out = upserts.drop(*drop_cols)
    _ = deletes  # deletes are realized by exclusion via changed_keys
    local = path[7:] if path.startswith("file://") else path
    tmp = local.rstrip("/") + ".__merge_tmp__"
    old = local.rstrip("/") + ".__merge_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    # swap: target -> old, tmp -> target, drop old. Each step is a single
    # directory rename; a crash between them leaves either the old or the
    # new complete table on disk, never a mix.
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(local):
        os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old, ignore_errors=True)


# ---------------------------------------------------------------------------
# Kafka JSON envelopes (JsonSerializationType.java:26-32) + partitioning
# (flink-cdc-pipeline-connector-kafka/.../sink/PartitionStrategy.java)
# ---------------------------------------------------------------------------

PARTITION_ALL_TO_ZERO = "ALL_TO_ZERO"
PARTITION_HASH_BY_KEY = "HASH_BY_KEY"


def kafka_key(table_id: TableId, primary_keys: list[str],
              key_format: str = "json"):
    """The reference's record-KEY serialization
    (KeySerializationFactory.java builds {TableId, pk columns...} and
    serializes it as json or csv — KeyFormat.java). The key carries the
    DELETE's before image; in this changelog representation a ``-D``
    row's payload columns ARE that image, so the same projection serves
    every op. Byte shapes pinned to the reference's own test vectors
    (JsonSerializationSchemaTest.java:82-84,
    CsvSerializationSchemaTest.java:81-83): json =
    ``{"TableId":"ns.schema.table","pk":...}``; csv = the TableId
    always quoted, pk values CSV-escaped (quoted iff they contain a
    quote/comma/CR/LF, inner quotes doubled)."""
    tid = F.lit(table_id.identifier())
    if key_format == "json":
        # ignoreNullFields=false: a (pathological) null pk serializes
        # as an explicit "col":null like the reference's Jackson
        # writer, keeping key bytes — and HASH_BY_KEY placement —
        # deterministic
        return F.to_json(F.struct(
            tid.alias("TableId"),
            *[F.col(c) for c in primary_keys]),
            {"ignoreNullFields": "false"})
    if key_format == "csv":
        def esc(c):
            s = F.col(c).cast("string")
            quoted = F.concat(F.lit('"'),
                              F.regexp_replace(s, '"', '""'),
                              F.lit('"'))
            # a null pk keeps its (empty) comma slot like Jackson CSV's
            # empty-field output — concat_ws would otherwise drop the
            # field AND its comma, colliding distinct keys such as
            # (null,'x') vs ('x',null) under HASH_BY_KEY / compaction
            return F.coalesce(
                F.when(s.rlike('[",\r\n]'), quoted).otherwise(s),
                F.lit(""))

        return F.concat_ws(",", F.concat(F.lit('"'), tid, F.lit('"')),
                           *[esc(c) for c in primary_keys])
    raise ValueError(f"unsupported key format {key_format!r}")


def kafka_topic(table_id: TableId, topic: str | None = None,
                topic_mapping: list[tuple[str, str]] | None = None) -> str:
    """``inferTopicName`` parity
    (PipelineKafkaRecordSerializationSchema.java:142-158): a unified
    ``topic`` option wins; else the FIRST matching selector of
    ``sink.tableId-to-topic.mapping`` (pairs of selector-pattern →
    topic, KafkaSinkUtils.parseSelectorsToTopicMap); else the table id
    itself."""
    from .schema import Selectors

    if topic:
        return topic
    for pattern, t in (topic_mapping or []):
        if Selectors(pattern).matches(table_id):
            return t
    return table_id.identifier()


def kafka_headers(table_id: TableId, add_tableid: bool = False,
                  custom_headers: str = ""):
    """Record-header column for Spark's Kafka writer
    (``includeHeaders`` contract: array<struct<key string, value
    binary>>). ``add_tableid`` adds the reference's namespace /
    schemaName / tableName headers
    (PipelineKafkaRecordSerializationSchema.java:69-73, null parts as
    empty strings); ``custom_headers`` is the ``sink.custom-header``
    string — pairs split on ';', key:value on ':' (the reference's
    CODE splits on ';' though its option doc says ',';
    PipelineKafkaRecordSerializationSchema.java:89). Returns None when
    nothing is configured."""
    pairs: list[tuple[str, str]] = []
    if add_tableid:
        pairs += [("namespace", table_id.namespace or ""),
                  ("schemaName", table_id.schema_name or ""),
                  ("tableName", table_id.table)]
    for item in (custom_headers or "").split(";"):
        if ":" in item:
            k, _, v = item.partition(":")
            pairs.append((k.strip(), v.strip()))
    if not pairs:
        return None
    return F.array(*[
        F.struct(F.lit(k).alias("key"),
                 F.lit(v.encode("utf-8")).alias("value"))
        for k, v in pairs])


def kafka_records(df: DataFrame, table_id: TableId,
                  serialization: str = "debezium-json",
                  partition_strategy: str = PARTITION_ALL_TO_ZERO,
                  num_partitions: int = 1,
                  primary_keys: list[str] | None = None,
                  key_format: str = "json",
                  topic: str | None = None,
                  topic_mapping: list[tuple[str, str]] | None = None,
                  add_tableid_headers: bool = False,
                  custom_headers: str = "") -> DataFrame:
    """Changelog → (key, value, partition) records for Spark's Kafka sink.

    PartitionStrategy parity: ALL_TO_ZERO routes every record to partition
    0 (global order preserved); HASH_BY_KEY hashes the serialized key so
    one PK always lands in one partition (per-key order preserved, the
    strategy that scales). Spark's Kafka writer honors an explicit
    ``partition`` column, so this composes directly with
    ``writeStream.format("kafka")``.

    With ``primary_keys`` the key is the reference's
    {TableId, pk columns} record in ``key_format`` (json/csv — see
    :func:`kafka_key`); without it the key stays the envelope's legacy
    full-payload JSON. A ``topic`` column is always attached (unified
    topic / selector mapping / table id — :func:`kafka_topic`; Spark's
    writer uses it unless the ``topic`` option overrides), and
    ``add_tableid_headers`` / ``custom_headers`` attach the reference's
    record headers (:func:`kafka_headers`, requires the writer's
    ``includeHeaders``).
    """
    key_expr = (kafka_key(table_id, primary_keys, key_format)
                if primary_keys else None)
    if serialization == "debezium-json":
        enc = debezium_json(df, table_id, key_expr=key_expr)
    elif serialization == "canal-json":
        enc = canal_json(df, table_id, key_expr=key_expr)
    else:
        raise ValueError(f"unsupported serialization {serialization!r}")
    if partition_strategy == PARTITION_ALL_TO_ZERO:
        part = F.lit(0)
    elif partition_strategy == PARTITION_HASH_BY_KEY:
        part = F.pmod(
            F.xxhash64(F.col("key")).bitwiseAND(F.lit(0x7FFFFFFF)),
            F.lit(num_partitions))
    else:
        raise ValueError(
            f"unsupported partition strategy {partition_strategy!r}")
    out = (enc.withColumn("partition", part.cast("int"))
           .withColumn("topic", F.lit(
               kafka_topic(table_id, topic, topic_mapping))))
    hdrs = kafka_headers(table_id, add_tableid_headers, custom_headers)
    if hdrs is not None:
        out = out.withColumn("headers", hdrs)
    return out


def kafka_sink_stream(records: DataFrame, bootstrap_servers: str,
                      topic: str, checkpoint: str):
    """writeStream plan for the Kafka sink (needs the kafka connector jar;
    plan construction is testable without one)."""
    return (records.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint))

def debezium_json(df: DataFrame, table_id: TableId,
                  key_expr=None) -> DataFrame:
    """Changelog → (key, value) debezium-json strings.

    value = {"before":..., "after":..., "op": c|u|d, "source": {db, table}}
    — the shape DebeziumJsonSerializationSchema emits. ``key_expr``
    overrides the legacy full-payload key (see :func:`kafka_key`).
    """
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    payload = F.struct(*[F.col(c) for c in data_cols])
    op = F.col(OP_COLUMN)
    dbz_op = (F.when(op == "+I", "c").when(op == "+U", "u")
              .when(op == "-U", "u").when(op == "-D", "d"))
    value = F.to_json(F.struct(
        F.when(op.isin("-U", "-D"), payload).alias("before"),
        F.when(op.isin("+I", "+U"), payload).alias("after"),
        dbz_op.alias("op"),
        F.struct(
            F.lit(table_id.schema_name).alias("db"),
            F.lit(table_id.table).alias("table"),
        ).alias("source"),
    ), {"ignoreNullFields": "false"})
    key = key_expr if key_expr is not None else F.to_json(payload)
    return df.select(key.alias("key"), value.alias("value"))


def canal_json(df: DataFrame, table_id: TableId,
               key_expr=None) -> DataFrame:
    """Changelog → canal-json: {"old": [...], "data": [...], "type": ...}."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    payload = F.struct(*[F.col(c) for c in data_cols])
    op = F.col(OP_COLUMN)
    ctype = (F.when(op == "+I", "INSERT").when(op.isin("-U", "+U"), "UPDATE")
             .when(op == "-D", "DELETE"))
    value = F.to_json(F.struct(
        F.when(op == "-U", F.array(payload)).alias("old"),
        F.when(op != "-U", F.array(payload)).alias("data"),
        ctype.alias("type"),
        F.lit(table_id.schema_name).alias("database"),
        F.lit(table_id.table).alias("table"),
    ), {"ignoreNullFields": "false"})
    key = key_expr if key_expr is not None else F.to_json(payload)
    return df.select(key.alias("key"), value.alias("value"))


def maxwell_json(df: DataFrame, table_id: TableId) -> DataFrame:
    """Changelog → maxwell-json (the Zendesk Maxwell daemon's format,
    a FlinkSQL-supported changelog encoding beyond the reference's
    debezium/canal pair): {"database", "table", "type":
    insert|update|delete, "data": {row}}.

    Maxwell emits ONE message per update (new image in `data`, changed
    columns in `old`); this engine's changelog splits update images
    across -U/+U rows, so -U retractions are dropped at encode (they
    carry no information Maxwell transmits) and `old` is omitted —
    apply semantics are unchanged because keyed upsert application
    never needs the before image."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    payload = F.struct(*[F.col(c) for c in data_cols])
    op = F.col(OP_COLUMN)
    mtype = (F.when(op == "+I", "insert").when(op == "+U", "update")
             .when(op == "-D", "delete"))
    value = F.to_json(F.struct(
        F.lit(table_id.schema_name).alias("database"),
        F.lit(table_id.table).alias("table"),
        mtype.alias("type"),
        payload.alias("data"),
    ), {"ignoreNullFields": "false"})
    return (df.where(op != "-U")
            .select(F.to_json(payload).alias("key"),
                    value.alias("value")))


def ogg_json(df: DataFrame, table_id: TableId) -> DataFrame:
    """Changelog → ogg-json (Oracle GoldenGate trail format, the other
    FlinkSQL changelog encoding): {"table": "SCHEMA.TABLE", "op_type":
    I|U|D, "before", "after"}. Deletes carry their image in `before`
    (GoldenGate semantics), inserts/updates in `after`; the split
    -U retraction rows are dropped at encode like maxwell_json."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    payload = F.struct(*[F.col(c) for c in data_cols])
    op = F.col(OP_COLUMN)
    otype = (F.when(op == "+I", "I").when(op == "+U", "U")
             .when(op == "-D", "D"))
    value = F.to_json(F.struct(
        F.lit(f"{table_id.schema_name}.{table_id.table}").alias("table"),
        otype.alias("op_type"),
        F.when(op == "-D", payload).alias("before"),
        F.when(op.isin("+I", "+U"), payload).alias("after"),
    ), {"ignoreNullFields": "false"})
    return (df.where(op != "-U")
            .select(F.to_json(payload).alias("key"),
                    value.alias("value")))


def compact_parquet(spark, path: str, target_mb: int = 128) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes / target_mb) files via a coalesce (narrow — no shuffle)
    and the same temp-write + atomic-swap discipline as
    ``merge_into_parquet``. Returns the new file count.

    Streaming upsert sinks accrete a file per micro-batch; at 100 TB the
    resulting millions of small files dominate scan planning time — a
    periodic compaction pass is standard lakehouse hygiene (OPTIMIZE in
    Delta terms).
    """
    local = path[7:] if path.startswith("file://") else path
    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(local) for f in fs
                if f.endswith(".parquet"))
    n = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(local)
    tmp = local.rstrip("/") + ".__compact_tmp__"
    old = local.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old, ignore_errors=True)
    return n


def swap_parquet_dir(df: DataFrame, path: str) -> None:
    """Write ``df`` to ``path`` crash-safely: temp-dir write then
    directory renames (the same discipline as ``merge_into_parquet`` —
    the lazy plan can read the current ``path`` while building, since
    the target is only swapped after the new table is fully
    materialized).

    The swap is two renames (``path`` -> ``.__swap_old__`` then
    ``.__swap_tmp__`` -> ``path``); a crash between them leaves ``path``
    absent with the data intact in ``.__swap_old__``. State readers must
    go through :func:`read_parquet_state`, which detects exactly that
    window and renames the old directory back — a missing ``path`` with
    an ``-old`` sibling is a recoverable crash, never "no state"."""
    local = path[7:] if path.startswith("file://") else path
    tmp = local.rstrip("/") + ".__swap_tmp__"
    old = local.rstrip("/") + ".__swap_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(local):
        os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old, ignore_errors=True)


def read_parquet_state(spark, path: str) -> DataFrame | None:
    """Read a swap-maintained parquet state directory, distinguishing the
    three cases the naive ``try: read / except: None`` conflates:

    - ``path`` exists → read it; any failure (corrupt footer, IO error,
      schema drift) RE-RAISES so the batch fails loudly instead of
      silently rebuilding state from one micro-batch;
    - ``path`` absent but a ``.__swap_old__`` / ``.__compact_old__``
      sibling exists → a crash hit the rename window of
      :func:`swap_parquet_dir` / :func:`compact_parquet`; recover by
      renaming the old directory back into place, then read it;
    - neither exists → genuinely no prior state; return None.
    """
    local = path[7:] if path.startswith("file://") else path
    if not os.path.exists(local):
        for suffix in (".__swap_old__", ".__compact_old__"):
            old = local.rstrip("/") + suffix
            if os.path.exists(old):
                os.rename(old, local)
                break
        else:
            return None
    return spark.read.parquet(local)


def elasticsearch_bulk(df: DataFrame, table_id: TableId,
                       id_cols: list[str]) -> DataFrame:
    """Changelog → Elasticsearch bulk-API action/source line pairs (the
    pipeline-connector-elasticsearch capability re-expressed: upsert =
    `index` action + source doc, delete = `delete` action, document id =
    the primary key values joined with '|'). Returns (seq, action,
    source) — `source` NULL on deletes; feed the two columns
    newline-joined to `_bulk`. Split -U retractions are dropped at
    encode (the index action replaces the whole document, so the before
    image carries nothing — same rule as maxwell_json). Pure to_json
    codegen, no shuffle."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    payload = F.struct(*[F.col(c) for c in data_cols])
    op = F.col(OP_COLUMN)
    index = f"{table_id.schema_name}.{table_id.table}"
    doc_id = F.concat_ws("|", *[F.col(c).cast("string")
                                for c in id_cols])
    meta = F.struct(F.lit(index).alias("_index"), doc_id.alias("_id"))
    action = F.when(
        op == "-D", F.to_json(F.struct(meta.alias("delete")))) \
        .otherwise(F.to_json(F.struct(meta.alias("index"))))
    source = F.when(op != "-D", F.to_json(payload))
    return (df.where(op != "-U")
            .select(F.col(SEQ_COLUMN).alias("seq"),
                    action.alias("action"), source.alias("source")))


def starrocks_stream_load(df: DataFrame, table_id: TableId) -> DataFrame:
    """Changelog → StarRocks primary-key-table stream-load JSON rows
    (the pipeline-connector-starrocks / doris capability: each row is
    the full image plus the `__op` delete flag — 0 upsert, 1 delete —
    that a PK table's stream load consumes; Doris' __DORIS_DELETE_SIGN__
    is the same wire idea). -U retractions dropped at encode. Returns
    (seq, row_json). Pure to_json codegen, no shuffle."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    op = F.col(OP_COLUMN)
    row = F.to_json(F.struct(
        *[F.col(c) for c in data_cols],
        F.when(op == "-D", 1).otherwise(0).alias("__op")))
    return (df.where(op != "-U")
            .select(F.col(SEQ_COLUMN).alias("seq"),
                    row.alias("row_json")))


def fluss_event_rows(df: DataFrame, table_id: TableId,
                     primary_keys: list[str]) -> DataFrame:
    """Changelog → Fluss sink event rows (pipeline-connector-fluss
    capability: FlussEventSerializationSchema.applyDataChangeEvent —
    INSERT/UPDATE/REPLACE serialize the AFTER image with op UPSERT when
    the table has a primary key, APPEND otherwise; DELETE serializes the
    BEFORE image with op DELETE; CdcAsFlussRow wraps the record without
    copying). Split -U retractions are dropped at encode (Fluss consumes
    the after image). Returns (seq, table_path, op, row_json) — the
    JSON is the canonical test-visible form of the FlussRowWithOp the
    reference hands to the Fluss writer. Pure to_json codegen, no
    shuffle."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    op = F.col(OP_COLUMN)
    row_op = (F.when(op == "-D", "DELETE")
              .otherwise("UPSERT" if primary_keys else "APPEND"))
    row = F.to_json(F.struct(*[F.col(c) for c in data_cols]))
    path = f"{table_id.schema_name}.{table_id.table}"
    return (df.where(op != "-U")
            .select(F.col(SEQ_COLUMN).alias("seq"),
                    F.lit(path).alias("table_path"),
                    row_op.alias("op"), row.alias("row_json")))


def maxcompute_tunnel_rows(df: DataFrame, table_id: TableId,
                           primary_keys: list[str]) -> DataFrame:
    """Changelog → MaxCompute tunnel write operations
    (pipeline-connector-maxcompute capability: BatchUpsertWriter routes
    upserts/deletes through UpsertStream when the table has primary
    keys; BatchAppendWriter appends upserts and IGNORES deletes —
    BatchAppendWriter.java:117-119 'append writer does not support
    delete. just ignore'). Split -U retractions are dropped at encode.
    Returns (seq, op, row_json): op is UPSERT/DELETE for PK tables,
    APPEND for PK-less tables (whose deletes never appear). Pure
    to_json codegen, no shuffle."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    op = F.col(OP_COLUMN)
    row = F.to_json(F.struct(*[F.col(c) for c in data_cols]))
    out = df.where(op != "-U")
    if primary_keys:
        tunnel_op = F.when(op == "-D", "DELETE").otherwise("UPSERT")
    else:
        out = out.where(op != "-D")  # append writer ignores deletes
        tunnel_op = F.lit("APPEND")
    return out.select(F.col(SEQ_COLUMN).alias("seq"),
                      tunnel_op.alias("op"), row.alias("row_json"))


def oceanbase_records(df: DataFrame, table_id: TableId,
                      primary_keys: list[str]) -> DataFrame:
    """Changelog → OceanBase DataChangeRecords
    (pipeline-connector-oceanbase capability:
    OceanBaseEventSerializationSchema.applyDataChangeEvent —
    INSERT/UPDATE/REPLACE build an UPSERT record from the after image,
    DELETE builds a DELETE record from the before image; the record
    carries the qualified table id and the full column-value array).
    Split -U retractions are dropped at encode. Returns
    (seq, table_id, op, row_json) — row_json is the canonical JSON form
    of the DataChangeRecord values the reference hands to the OceanBase
    connector. Pure to_json codegen, no shuffle."""
    data_cols = [c for c in df.columns if c not in INTERNAL_COLUMNS]
    op = F.col(OP_COLUMN)
    rec_op = F.when(op == "-D", "DELETE").otherwise("UPSERT")
    row = F.to_json(F.struct(*[F.col(c) for c in data_cols]))
    tid = f"{table_id.schema_name}.{table_id.table}"
    return (df.where(op != "-U")
            .select(F.col(SEQ_COLUMN).alias("seq"),
                    F.lit(tid).alias("table_id"),
                    rec_op.alias("op"), row.alias("row_json")))
