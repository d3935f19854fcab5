"""Round-14 fixes (VERDICT r13 + ADVICE r13):

- metrics.executor_handle upgrades a driver-local handle in place when
  a SparkSession first becomes available (ADVICE #1 medium — a registry
  first touched by a driver-only caller must not ship a dict-backed
  handle to executors and silently lose their increments);
- RetryPolicy.run's on_error hook reports will_retry, so the FINAL
  attempt that exhausts the budget is not counted as a retry attempt
  (ADVICE #5 — errors.retry.attempts overcounted by one per exhausted
  operation, in both the executemany loop and iam_conn_factory);
- the in-band fan-in writers observe PROCESSING_LATENCY once per sink
  per batch, end-to-end (VERDICT #2 / ADVICE #3 — they recorded
  cumulative-prefix durations per SEGMENT per sink, the exact defect
  d9d267e fixed in the other two writers).
"""

import os
import tempfile

import duckdb
import pytest

import flink_cdc_dsql_master_spark.metrics as M
from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_write_rows,
    encode_xid,
)
from flink_cdc_dsql_master_spark.compose import compose_stream
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.sinks import JdbcUpsertSink, RetryPolicy


# -- executor handle upgrade ---------------------------------------------------

def test_executor_handle_upgrades_driver_local_to_accumulator(spark):
    """A registry first touched by a driver-only caller (spark=None —
    e.g. JdbcUpsertSink with parallel=False) caches a dict-backed
    handle; when an executor-side user later asks WITH a SparkSession,
    the SAME handle object must upgrade to accumulator backing (counts
    migrated), so executor increments actually surface."""
    reg = M.MetricsRegistry("r14-upgrade")
    h_local = reg.executor_handle(None)
    assert h_local._acc is None
    h_local.inc("rows.seen", 7)
    assert reg.get("rows.seen") == 7

    h_up = reg.executor_handle(spark)
    assert h_up is h_local and h_local._acc is not None
    # locally-accrued counts migrated into the accumulator, not dropped
    assert reg.get("rows.seen") == 7

    # the pre-upgrade reference now feeds executors through the
    # accumulator — the exact scenario ADVICE r13 flagged as lost
    df = spark.range(0, 100, 1, 4)

    def work(batches):
        for pdf in batches:
            h_local.inc("rows.seen", len(pdf))
            yield pdf

    assert df.mapInPandas(work, df.schema).count() == 100
    assert reg.get("rows.seen") == 107


def test_executor_handle_spark_first_then_none_stays_accumulator(spark):
    """Order-independence: once accumulator-backed, a later spark=None
    call must NOT downgrade the handle."""
    reg = M.MetricsRegistry("r14-upgrade2")
    h1 = reg.executor_handle(spark)
    assert h1._acc is not None
    h2 = reg.executor_handle(None)
    assert h2 is h1 and h2._acc is not None


# -- retry-attempt accounting --------------------------------------------------

def test_retry_policy_on_error_final_attempt_not_retried():
    """on_error fires per failed attempt with will_retry=False exactly
    once — on the final attempt whose exception propagates."""
    calls = []
    policy = RetryPolicy(max_retries=2, base_delay_s=0.0)

    def boom():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        policy.run(boom, on_error=lambda e, wr: calls.append(wr))
    assert calls == [True, True, False]

    # a success after one failure: the single failed attempt WAS retried
    calls.clear()
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] == 1:
            raise ValueError("transient")
        return "ok"

    assert policy.run(
        flaky, on_error=lambda e, wr: calls.append(wr)) == "ok"
    assert calls == [True]


def test_sink_retry_attempts_exclude_exhausted_final(spark):
    """errors.retry.attempts counts RETRIES (attempts that were
    followed by another), not failures: a sink whose executemany always
    fails with max_retries=2 categorizes 3 errors but records exactly
    2 retry attempts — not 3 (the r13 off-by-one)."""
    from pyspark.sql import Row

    class FailingConn:
        def executemany(self, sql, rows):
            raise RuntimeError("connection attempt failed")

        def execute(self, sql, *a):
            return self

        def fetchall(self):
            return []

        def commit(self):
            pass

        def close(self):
            pass

        def cursor(self):
            return self

    reg = M.MetricsRegistry("r14-retry")
    from flink_cdc_dsql_master_spark.schema import Schema
    from pyspark.sql import types as T

    schema = Schema.of(T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType())]), primary_keys=["id"])
    sink = JdbcUpsertSink(FailingConn, "t_r14", schema,
                          parallel=False, dialect="duckdb",
                          retry=RetryPolicy(max_retries=2,
                                            base_delay_s=0.0),
                          metrics=reg)
    df = spark.createDataFrame([Row(id=1, v="a")])
    with pytest.raises(Exception):
        sink.write_batch(df)
    cat_errors = sum(v for k, v in reg._merged().items()
                     if k.startswith("errors.",) and
                     not k.startswith("errors.retry"))
    assert cat_errors == 3  # every failed attempt categorized
    assert reg.get(M.RETRY_ATTEMPTS) == 2  # but only 2 were retried


def test_iam_conn_factory_retry_attempts_exclude_exhausted_final():
    """iam_conn_factory's expiration-retry loop has the same contract:
    3 attempts all failing token-expiration-shaped → 3 categorized
    errors, 2 retry attempts (the 3rd exhausts and propagates)."""
    from flink_cdc_dsql_master_spark.iam_auth import (Credentials,
                                                      DsqlAuthenticator,
                                                      iam_conn_factory)

    DsqlAuthenticator.clear_token_cache()
    reg = M.MetricsRegistry("r14-iam-retry")
    auth = DsqlAuthenticator(
        host="h.dsql.us-east-1.on.aws", region="us-east-1",
        credentials_provider=lambda: Credentials("AKID", "secret"),
        clock=lambda: 1_768_478_400.0, sleep=lambda s: None,
        metrics=reg)

    def always_expired(user=None, password=None):
        raise RuntimeError("token expired")

    factory = iam_conn_factory(always_expired, auth, max_retries=3)
    with pytest.raises(RuntimeError):
        factory()
    cat_errors = sum(v for k, v in reg._merged().items()
                     if k.startswith("errors.") and
                     not k.startswith("errors.retry"))
    assert cat_errors == 3
    assert reg.get(M.RETRY_ATTEMPTS) == 2


# -- in-band fan-in latency attribution ----------------------------------------

def _duck_writer(db):
    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(df)
    return writer


def _duck_ddl(db):
    def on_ddl(tid, events, schema):
        from flink_cdc_dsql_master_spark.sinks import schema_change_ddl

        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()
    return on_ddl


def test_inband_fanin_latency_once_per_sink_binlog(spark):
    """The binlog in-band fan-in writer observes PROCESSING_LATENCY
    exactly ONCE per routed sink per batch — not once per (segment,
    sink) with growing cumulative prefixes. One batch, one DDL boundary
    (= 2 flush segments), one sink → timer count 1, and the observed
    value is the END-TO-END batch duration (≥ any per-segment slice, so
    max == the single sample)."""
    base = tempfile.mkdtemp(prefix="r14_lat_binlog_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 20)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(1, "db", "sh_a", cols2, 200)
            + encode_table_map(2, "db", "sh_b", cols2, 250)
            + encode_write_rows(1, cols2, [[1, "a1"]], 300)
            + encode_write_rows(2, cols2, [[11, "b1"]], 400)
            + encode_xid(1, 450)
            + encode_query("db", "ALTER TABLE sh_a ADD COLUMN w DOUBLE",
                           500)
            + encode_table_map(1, "db", "sh_a", cols3, 600)
            + encode_write_rows(1, cols3, [[2, "a2", 2.5]], 700)
            + encode_write_rows(2, cols2, [[12, "b2"]], 800)
            + encode_xid(2, 900))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(blob)

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.s.sh_a", "mysql-table": "sh_a",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]},
                {"table": "db.s.sh_b", "mysql-table": "sh_b",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.s.sh_a", "out.db.m14"),
                RouteRule(r"db.s.sh_b", "out.db.m14")),
        config={"schema.change.behavior": "LENIENT",
                "name": "r14-lat-binlog"},
    )
    reg = M.registry("r14-lat-binlog")
    reg.reset()
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=_duck_ddl(db))
    q.awaitTermination(300)

    stats = reg.timer_stats(M.PROCESSING_LATENCY, table="out.db.m14")
    # one observation per sink per BATCH — segments do not multiply it
    assert stats["count"] == 1, stats
    # end-to-end semantics: the single sample is the batch total
    assert stats["max_s"] == pytest.approx(stats["sum_s"])
    assert stats["sum_s"] > 0

    con = duckdb.connect(db)
    got = con.execute("SELECT k FROM m14 ORDER BY k").fetchall()
    con.close()
    assert [r[0] for r in got] == [1, 2, 11, 12]


def test_inband_fanin_latency_once_per_sink_pgoutput(spark):
    """pgoutput twin: one batch with one Relation-drift boundary
    (2 segments), one sink → PROCESSING_LATENCY count 1."""
    from flink_cdc_dsql_master_spark.pgoutput import (encode_frames,
                                                      encode_insert,
                                                      encode_relation)

    base = tempfile.mkdtemp(prefix="r14_lat_pg_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    cols2 = [("id", True, 20), ("name", False, 25)]
    cols3 = cols2 + [("w", False, 701)]
    msgs = [
        (100, encode_relation(7, "public", "sh_a", cols2)),
        (110, encode_relation(8, "public", "sh_b", cols2)),
        (120, encode_insert(7, ["1", "a1"])),
        (130, encode_insert(8, ["11", "b1"])),
        (200, encode_relation(7, "public", "sh_a", cols3)),
        (210, encode_insert(7, ["2", "a2", "2.5"])),
        (220, encode_insert(8, ["12", "b2"])),
    ]
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": "db.public.sh_a", "pg-table": "sh_a",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
                {"table": "db.public.sh_b", "pg-table": "sh_b",
                 "schema": "id bigint, name string",
                 "primary-keys": ["id"]},
            ]}),
        sink=SinkDef("duckdb"),
        routes=(RouteRule(r"db.public.sh_a", "out.db.pg14"),
                RouteRule(r"db.public.sh_b", "out.db.pg14")),
        config={"schema.change.behavior": "LENIENT",
                "name": "r14-lat-pg"},
    )
    reg = M.registry("r14-lat-pg")
    reg.reset()
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=_duck_ddl(db))
    q.awaitTermination(300)

    stats = reg.timer_stats(M.PROCESSING_LATENCY, table="out.db.pg14")
    assert stats["count"] == 1, stats
    assert stats["max_s"] == pytest.approx(stats["sum_s"])

    con = duckdb.connect(db)
    got = con.execute("SELECT id FROM pg14 ORDER BY id").fetchall()
    con.close()
    assert [r[0] for r in got] == [1, 2, 11, 12]
