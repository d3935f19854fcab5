"""Metrics / observability surface (VERDICT r12 next-round #1 — the
reference's documented monitoring contract, dsql.md:271-279 +
DsqlErrorReporter.java): registry semantics, executor-side accumulator
bridge, authentication counters, categorized errors, and the full
multi-batch streaming run with a forced token refresh and a retried
error feeding one registry."""

import duckdb
import json
import pytest

from flink_cdc_dsql_master_spark import metrics as M
from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.schema import Schema


# -- categorizeError parity ----------------------------------------------------

def test_categorize_error_parity():
    cases = [
        (ValueError("connection refused by peer"), "CONNECTION_ERROR"),
        (RuntimeError("read timeout after 30s"), "CONNECTION_ERROR"),
        (ConnectionError("weird"), "CONNECTION_ERROR"),  # type name
        (ValueError("access denied: bad signature"),
         "AUTHENTICATION_ERROR"),
        (ValueError("invalid credential scope"), "AUTHENTICATION_ERROR"),
        (ValueError("no such table users"), "SCHEMA_ERROR"),
        (ValueError("unknown column c7"), "SCHEMA_ERROR"),
        (ValueError("cannot cast to int"), "DATA_TYPE_ERROR"),
        (ValueError("boom"), "UNKNOWN_ERROR"),
        (None, "UNKNOWN_ERROR"),
    ]
    for err, want in cases:
        assert M.categorize_error(err) == want, (err, want)

    # SQLSTATE class mapping (DB-API attribute analog of SQLException)
    class FakeDbErr(Exception):
        def __init__(self, msg, sqlstate):
            super().__init__(msg)
            self.sqlstate = sqlstate

    assert M.categorize_error(FakeDbErr("x", "08006")) == \
        "CONNECTION_ERROR"
    assert M.categorize_error(FakeDbErr("x", "22003")) == \
        "DATA_TYPE_ERROR"
    assert M.categorize_error(FakeDbErr("x", "42P01")) == "SCHEMA_ERROR"


# -- registry semantics --------------------------------------------------------

def test_registry_counters_timers_gauges_snapshot():
    reg = M.MetricsRegistry("t")
    reg.inc(M.EVENTS_PROCESSED, 5, table="users")
    reg.inc(M.EVENTS_PROCESSED, 3, table="users")
    reg.inc(M.TOKEN_REFRESH_COUNT)
    reg.observe(M.COMMIT_LATENCY, 0.2, table="users")
    reg.observe(M.COMMIT_LATENCY, 0.4, table="users")
    reg.set_gauge(M.POOL_ACTIVE, 3)
    reg.record_error(ValueError("connection lost"), retried=True)

    assert reg.get(M.EVENTS_PROCESSED, table="users") == 8
    assert reg.get(M.TOKEN_REFRESH_COUNT) == 1
    assert reg.get(M.RETRY_ATTEMPTS) == 1
    t = reg.timer_stats(M.COMMIT_LATENCY, table="users")
    assert t["count"] == 2
    assert t["sum_s"] == pytest.approx(0.6)
    assert t["avg_s"] == pytest.approx(0.3)
    assert t["max_s"] == pytest.approx(0.4)
    assert t["min_s"] == pytest.approx(0.2)

    snap = reg.snapshot()
    assert snap["counters"][f"{M.EVENTS_PROCESSED}#users"] == 8
    assert snap["timers"][f"{M.COMMIT_LATENCY}#users"]["count"] == 2
    assert snap["gauges"][M.POOL_ACTIVE] == 3
    assert snap["errors_by_category"] == {"CONNECTION_ERROR": 1}
    json.dumps(snap)  # the report face is JSON-able

    reg.reset()
    assert reg.get(M.EVENTS_PROCESSED, table="users") == 0


def test_timer_merge_rule_is_the_accumulator_merge_rule():
    """Driver and executor increments fold through ONE merge rule —
    max/min keys keep extrema, everything else adds."""
    param = M._DictAccumulatorParam()
    a = param.zero(None)
    h1, h2 = M.ExecutorMetrics(), M.ExecutorMetrics()
    h1.observe(M.COMMIT_LATENCY, 0.5)
    h1.inc(M.EVENTS_PROCESSED, 2)
    h2.observe(M.COMMIT_LATENCY, 0.1)
    h2.inc(M.EVENTS_PROCESSED, 3)
    param.addInPlace(a, h1._local)
    param.addInPlace(a, h2._local)
    k = M.COMMIT_LATENCY
    assert a[k + "|count"] == 2
    assert a[k + "|sum"] == pytest.approx(0.6)
    assert a[k + "|max"] == pytest.approx(0.5)
    assert a[k + "|min"] == pytest.approx(0.1)
    assert a[M.EVENTS_PROCESSED] == 5


def test_executor_handle_counts_from_tasks(spark):
    """Increments from real executor tasks (mapInPandas) surface in the
    registry snapshot via the dict accumulator."""
    reg = M.MetricsRegistry("exec-test")
    handle = reg.executor_handle(spark)

    df = spark.range(0, 1000, 1, 8)

    def work(batches):
        for pdf in batches:
            handle.inc("rows.seen", len(pdf))
            yield pdf

    assert df.mapInPandas(work, df.schema).count() == 1000
    assert reg.get("rows.seen") == 1000


# -- authentication counters ---------------------------------------------------

def _fresh_auth(metrics, provider):
    from flink_cdc_dsql_master_spark.iam_auth import DsqlAuthenticator

    DsqlAuthenticator.clear_token_cache()
    return DsqlAuthenticator(
        host="h.dsql.us-east-1.on.aws", region="us-east-1",
        credentials_provider=provider,
        clock=lambda: 1_768_478_400.0, sleep=lambda s: None,
        metrics=metrics)


def test_auth_token_refresh_and_failure_counters():
    from flink_cdc_dsql_master_spark.iam_auth import Credentials

    reg = M.MetricsRegistry("auth-test")
    auth = _fresh_auth(reg, lambda: Credentials("AKID", "secret"))
    auth.get_or_generate_auth_token()
    auth.get_or_generate_auth_token()  # cache hit: no second refresh
    assert reg.get(M.TOKEN_REFRESH_COUNT) == 1
    auth.force_token_refresh()
    assert reg.get(M.TOKEN_REFRESH_COUNT) == 2
    assert reg.get(M.AUTH_FAILURES) == 0

    def broken():
        raise RuntimeError("credential service down")

    reg2 = M.MetricsRegistry("auth-fail")
    auth2 = _fresh_auth(reg2, broken)
    with pytest.raises(RuntimeError):
        auth2.get_or_generate_auth_token()
    assert reg2.get(M.AUTH_FAILURES) == 3  # one per failed attempt
    assert reg2.get(M.TOKEN_REFRESH_COUNT) == 0


def test_pool_metrics_created_retired_acquire_latency():
    from flink_cdc_dsql_master_spark.iam_auth import (
        Credentials, RotatingConnectionPool)

    class FakeConn:
        closed = False

        def close(self):
            self.closed = True

    reg = M.MetricsRegistry("pool-test")
    auth = _fresh_auth(reg, lambda: Credentials("AKID", "secret"))
    pool = RotatingConnectionPool(FakeConn, auth, max_size=4)
    h1 = pool.acquire()
    pool.release(h1)
    h2 = pool.acquire()          # reused, not re-created
    assert reg.get(M.POOL_CREATED) == 1
    assert reg.snapshot()["gauges"][M.POOL_ACTIVE] == 1
    auth.force_token_refresh()   # generation advances
    pool.release(h2)             # stale generation → retired
    assert reg.get(M.POOL_RETIRED) == 1
    assert reg.timer_stats(M.POOL_ACQUIRE_LATENCY)["count"] == 2
    g = reg.snapshot()["gauges"]
    assert g[M.POOL_ACTIVE] == 0 and g["pool.connections.idle"] == 0


# -- the full multi-batch streaming run ----------------------------------------

def test_streaming_run_feeds_one_registry(spark, tmp_path):
    """Multi-batch streaming through the dsql sink face with metrics:
    per-table events processed + commit latency per micro-batch,
    processing latency from the foreachBatch bracket, a FORCED token
    refresh surviving a REAL expired-token rejection (counted as a
    retried, categorized error), and engine progress via the
    StreamingQueryListener — all in one registry."""
    import json as _json

    from flink_cdc_dsql_master_spark.compose import (
        compose_changelog_stream, make_dsql_sink_writer)
    from flink_cdc_dsql_master_spark.iam_auth import (Credentials,
                                                      DsqlAuthenticator)
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef,
                                                      SinkDef, SourceDef)
    from flink_cdc_dsql_master_spark.testing import FakeDsqlTokenGate

    src = tmp_path / "topic"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.duckdb")

    def _envelope(before, after, op):
        return _json.dumps({"before": before, "after": after, "op": op})

    def _write(name, rows):
        with open(src / name, "w") as f:
            for off, env in rows:
                f.write(_json.dumps({"value": env, "offset": off}) + "\n")

    reg = M.MetricsRegistry("stream-metrics")
    clock_t = [1_768_478_400.0]
    host, region = "q.dsql.us-east-1.on.aws", "us-east-1"
    secret = "stream/Secret+Key"
    DsqlAuthenticator.clear_token_cache()
    auth = DsqlAuthenticator(
        host=host, region=region,
        credentials_provider=lambda: Credentials("AKIDSTREAM", secret),
        clock=lambda: clock_t[0], sleep=lambda s: None)
    gate = FakeDsqlTokenGate(lambda: clock_t[0], secret, host, region)

    def connect(user, password, _p=db, _g=gate):
        _g.check(user, password)
        return duckdb.connect(_p)

    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": str(src), "schema": "id int, name string",
            "table": "db.s.users", "primary-keys": ["id"]}),
        sink=SinkDef("dsql", {"connect": connect,
                              "authenticator": auth}),
        config={"name": "stream-metrics"},
    )
    writer = make_dsql_sink_writer(pipe.sink.config, metrics=reg)
    listener = M.make_streaming_listener(reg)
    spark.streams.addListener(listener)
    try:
        _write("b1.json", [
            (0, _envelope(None, {"id": 1, "name": "ann"}, "c")),
            (1, _envelope(None, {"id": 2, "name": "bob"}, "c")),
        ])
        q = compose_changelog_stream(spark, pipe, ckpt, writer,
                                     evolver=None, metrics=reg)
        q.awaitTermination(120)

        # jump past the 900 s presign window but inside the 20-min
        # cache refresh deadline: the gate rejects, the factory
        # refreshes and retries — a REAL mid-stream expiry
        clock_t[0] += 16 * 60
        _write("b2.json", [
            (2, _envelope({"id": 2, "name": "bob"},
                          {"id": 2, "name": "bobby"}, "u")),
            (3, _envelope(None, {"id": 3, "name": "cal"}, "c")),
        ])
        q = compose_changelog_stream(spark, pipe, ckpt, writer,
                                     evolver=None, metrics=reg)
        q.awaitTermination(120)
    finally:
        spark.streams.removeListener(listener)

    # sink state correct under the expiry
    got = duckdb.connect(db).execute(
        "SELECT id, name FROM users ORDER BY id").fetchall()
    assert got == [(1, "ann"), (2, "bobby"), (3, "cal")]

    # CDC metrics: rows applied per table (post-LWW final images:
    # batch1 = {1,2}, batch2 = {2',3}), commit + processing latency
    assert reg.get(M.EVENTS_PROCESSED, table="users") == 4
    assert reg.timer_stats(M.COMMIT_LATENCY, table="users")["count"] >= 2
    assert reg.timer_stats(
        M.PROCESSING_LATENCY, table="out.public.users")["count"] >= 2 \
        or reg.timer_stats(
            M.PROCESSING_LATENCY, table="db.s.users")["count"] >= 2

    # authentication metrics: initial mint + forced refresh
    assert reg.get(M.TOKEN_REFRESH_COUNT) >= 2
    # the expired-token rejection was categorized and marked retried
    assert reg.get(M.RETRY_ATTEMPTS) >= 1
    errs = reg.snapshot()["errors_by_category"]
    assert sum(errs.values()) >= 1

    # engine progress from the listener (delivered async on the
    # listener bus — poll briefly before asserting)
    import time as _t
    deadline = _t.monotonic() + 15
    while (reg.get(M.STREAM_BATCHES) < 2
           and _t.monotonic() < deadline):
        _t.sleep(0.2)
    assert reg.get(M.STREAM_BATCHES) >= 2
    assert reg.get(M.STREAM_INPUT_ROWS) >= 4


# -- full-load metrics ---------------------------------------------------------

def test_full_load_metrics(spark, tmp_path):
    from flink_cdc_dsql_master_spark.sources import (DuckDBConnFactory,
                                                     chunked_dbapi_read)

    db = str(tmp_path / "src.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE items AS "
                "SELECT range AS k, range * 2 AS v FROM range(5000)")
    con.close()

    reg = M.MetricsRegistry("fullload-test")
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    df = chunked_dbapi_read(spark, DuckDBConnFactory(db), "items", "k",
                            schema, chunk_size=1000, metrics=reg)
    assert df.count() == 5000
    assert reg.get(M.FULL_LOAD_RECORDS, table="items") == 5000
    total = reg.get(M.FULL_LOAD_CHUNKS_TOTAL, table="items")
    done = reg.get(M.FULL_LOAD_CHUNKS_DONE, table="items")
    assert total >= 1 and done == total  # progress reached 100%


# -- CLI report ----------------------------------------------------------------

def test_cli_report_renders_snapshot(tmp_path, capsys):
    from flink_cdc_dsql_master_spark.cli import main

    reg = M.MetricsRegistry("cli-test")
    reg.inc(M.EVENTS_PROCESSED, 7, table="users")
    reg.observe(M.COMMIT_LATENCY, 0.25, table="users")
    reg.record_error(ValueError("connection lost"))
    p = tmp_path / "metrics.json"
    p.write_text(reg.report())

    assert main(["report", str(p)]) == 0
    out = capsys.readouterr().out
    assert f"{M.EVENTS_PROCESSED}#users = 7" in out
    assert "CONNECTION_ERROR = 1" in out
    assert "avg=250.0ms" in out


def test_upgrade_race_loses_no_increments(spark):
    """ADVICE r14: a thread that read _acc as None can merge into the
    handle's local dict WHILE (or after) the driver upgrades it to an
    accumulator. The old upgrade copied the local dict into the
    accumulator and set it to None — the racing merge was either lost
    or a TypeError. Now the local dict stays live and snapshot folds
    both stores, so every increment lands exactly once."""
    import threading

    reg = M.MetricsRegistry()
    h = reg.executor_handle()          # driver-local (no spark yet)
    h.inc("pre")                       # accrued before the upgrade

    # hammer: 4 threads increment while the main thread upgrades
    # mid-flight — the interleave the registry documents as safe
    start = threading.Barrier(5)

    def worker():
        start.wait()
        for _ in range(500):
            h.inc("raced")

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    start.wait()
    reg.executor_handle(spark)         # in-place upgrade, concurrent
    for t in ts:
        t.join()

    # the exact ADVICE interleave, deterministically: a merge into the
    # local dict AFTER the upgrade (old code: _local is None → crash)
    M._merge_entry(h._local, "late", 1)
    h.inc("post")                      # post-upgrade → accumulator

    assert reg.get("pre") == 1
    assert reg.get("raced") == 2000
    assert reg.get("late") == 1
    assert reg.get("post") == 1
