"""Round-9 regression tests: the VERDICT r8 / ADVICE r8 fixes.

1. Registry uniqueness — `_q` raises on duplicate names (r8 shipped two
   silently-shadowed dead definitions), and decorator count == live count.
"""

from __future__ import annotations

import re

import pytest


def test_q_raises_on_duplicate_registration():
    from flink_cdc_dsql_master_spark.queries import QUERIES, _q

    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        _q(name)(lambda spark, sf_dir: None)
    # the failed registration must not have clobbered the original
    assert QUERIES[name] is not None


def test_pin_eager_never_lazy(spark):
    """ADVICE r8 (medium): the poll-loop pin before the snapshot swap must
    be unrecomputable from lineage even under pinMode=persist — persist is
    lazy AND keeps lineage, so the diff could evaluate against the swapped
    (new) snapshot. pin_eager must map persist to an eager, lineage-free
    materialization."""
    from flink_cdc_dsql_master_spark.pinning import PIN_MODE_CONF, pin_eager

    df = spark.range(10).withColumn("v", spark_col_double())
    old = spark.conf.get(PIN_MODE_CONF, "localCheckpoint")
    try:
        spark.conf.set(PIN_MODE_CONF, "persist")
        pinned = pin_eager(df)
        # eager + lineage-truncated: the physical plan must be a scan of
        # checkpointed/materialized data, not the original Range
        plan = pinned._jdf.queryExecution().executedPlan().toString()
        assert "Range" not in plan
    finally:
        spark.conf.set(PIN_MODE_CONF, old)


def spark_col_double():
    from pyspark.sql import functions as F

    return (F.col("id") * 2).cast("double")


def _polling_source(spark, tmp_path):
    import duckdb
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.sources import (DbApiPollingSource,
                                                     DuckDBConnFactory)

    path = str(tmp_path / "src.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t AS SELECT range AS k, range * 1.5 AS v "
                "FROM range(100)")
    con.close()
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    return DbApiPollingSource(
        spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
        state_path=str(tmp_path / "state"), chunk_size=50), path, schema


def test_startup_offset_stale_token_raises(spark, tmp_path):
    """A token older than the committed position must fail fast — the
    polling source retains only its latest snapshot, exactly like a
    binlog server purges rotated segments."""
    import duckdb

    from flink_cdc_dsql_master_spark.sources import (DbApiPollingSource,
                                                     DuckDBConnFactory)

    src, path, schema = _polling_source(spark, tmp_path)
    src.poll()
    old_token = src.committed_offset()["gtid_set"]
    con = duckdb.connect(path)
    con.execute("UPDATE t SET v = v + 1 WHERE k % 2 = 0")
    con.close()
    src.poll()  # epoch 2 commits; epoch-1 token is now purged
    with pytest.raises(ValueError, match="purged"):
        DbApiPollingSource.resume_from_offset(
            spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
            state_path=str(tmp_path / "state"),
            startup={"scan.startup.mode": "specific-offset",
                     "scan.startup.specific-offset.gtid-set": old_token})


def test_startup_timestamp_resumes_and_predates_raises(spark, tmp_path):
    """timestamp startup: a ts at/after the committed snapshot resumes
    (zero replay); one before it fails fast (history purged)."""
    import duckdb

    from flink_cdc_dsql_master_spark.sources import (DbApiPollingSource,
                                                     DuckDBConnFactory)

    src, path, schema = _polling_source(spark, tmp_path)
    src.poll()
    meta = src.committed_offset()
    resumed = DbApiPollingSource.resume_from_offset(
        spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
        state_path=str(tmp_path / "state"),
        startup={"scan.startup.mode": "timestamp",
                 "scan.startup.timestamp-millis": str(meta["ts_ms"])})
    assert resumed.epoch == meta["epoch"]
    # no mutations since the snapshot -> zero replayed rows
    assert resumed.poll().count() == 0
    with pytest.raises(ValueError, match="purged"):
        DbApiPollingSource.resume_from_offset(
            spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
            state_path=str(tmp_path / "state"),
            startup={"scan.startup.mode": "timestamp",
                     "scan.startup.timestamp-millis":
                         str(meta["ts_ms"] - 10_000)})


def test_collapse_gate_empty_corpus(spark):
    """Empty input: the duplicate-mass probe's sums are NULL — both gate
    paths must take the direct branch, not raise."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.operators.dedup import (
        minhash_lsh_pairs)
    from flink_cdc_dsql_master_spark.operators.similarity import knn_join

    docs = spark.createDataFrame(
        [], T.StructType([T.StructField("doc_id", T.LongType()),
                          T.StructField("text", T.StringType())]))
    assert minhash_lsh_pairs(docs).count() == 0
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    assert knn_join(emb, k=3, bits=4).count() == 0


def test_startup_snapshot_mode_is_bounded(spark, tmp_path):
    """startup_mode='snapshot' — one full snapshot, then the source is
    finished (the reference's bounded snapshot-only job)."""
    import duckdb
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.sources import (DbApiPollingSource,
                                                     DuckDBConnFactory)

    path = str(tmp_path / "s.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t AS SELECT range AS k, range * 2 AS v "
                "FROM range(50)")
    con.close()
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    src = DbApiPollingSource(
        spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
        state_path=str(tmp_path / "st"), chunk_size=20,
        startup_mode="snapshot")
    cl = src.poll()
    assert cl.count() == 50
    assert cl.where("__op = '+I'").count() == 50
    with pytest.raises(RuntimeError, match="bounded"):
        src.poll()


REFERENCE_YAMLS = [
    "/root/reference/mysql-to-dsql.yaml",
    "/root/reference/postgresql-to-dsql-debug.yaml",
    "/root/reference/flink-cdc-connect/flink-cdc-pipeline-connectors/"
    "flink-cdc-pipeline-connector-dsql/example-postgresql-to-dsql.yaml",
    "/root/reference/flink-cdc-connect/flink-cdc-pipeline-connectors/"
    "flink-cdc-pipeline-connector-dsql/your-pipeline-config.yaml",
]


@pytest.mark.parametrize("path", REFERENCE_YAMLS,
                         ids=[p.rsplit("/", 1)[-1] for p in REFERENCE_YAMLS])
def test_reference_example_yamls_validate_verbatim(path):
    """Every pipeline YAML the reference ships validates VERBATIM through
    our CLI — the 'a user could switch' claim, checked byte-for-byte
    against the reference's own examples (source/sink/pipeline/
    checkpoint/restart-strategy blocks and all their options parse and
    compose-plan)."""
    import os
    import subprocess
    import sys

    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    out = subprocess.run(
        [sys.executable, "-m", "flink_cdc_dsql_master_spark",
         "validate", path],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-500:]
    assert "source: type=" in out.stdout


def test_full_load_coordinator_live_db(tmp_path):
    """FullLoadCoordinator (DsqlFullLoadCoordinator.java:37 parity, with
    real CREATE TABLE where the reference has a TODO): creates once,
    caches, validates via information_schema against a LIVE DuckDB, and
    the created table accepts the upsert writer's rows."""
    import duckdb
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.schema import Schema, TableId
    from flink_cdc_dsql_master_spark.sinks import FullLoadCoordinator

    path = str(tmp_path / "sink.duckdb")
    duckdb.connect(path).close()
    schema = Schema.of(T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]), primary_keys=["k"])
    tid = TableId.parse("db.main.t1")
    coord = FullLoadCoordinator(lambda: duckdb.connect(path))

    assert not coord.is_table_created(tid)
    assert coord.validate_table(tid) is False
    assert coord.create_target_table_if_not_exists(schema, tid) is True
    # second call is served from the cache — no DDL
    assert coord.create_target_table_if_not_exists(schema, tid) is False
    assert coord.is_table_created(tid)
    assert coord.validate_table(tid) is True
    assert coord.created_table_count == 1

    con = duckdb.connect(path)
    con.execute('INSERT INTO main.t1 VALUES (1, \'a\')')
    assert con.execute("SELECT * FROM main.t1").fetchall() == [(1, "a")]
    con.close()

    # recovery marking: no DDL issued, but cached as created
    tid2 = TableId.parse("db.main.t2")
    coord.mark_table_as_created(tid2)
    assert coord.is_table_created(tid2)
    assert coord.validate_table(tid2) is False  # never actually created
    coord.clear_cache()
    assert coord.created_table_count == 0


def test_decorator_count_equals_live_registry():
    import flink_cdc_dsql_master_spark.queries as q

    src = open(q.__file__).read()
    decorators = len(re.findall(r"@_q\(", src))
    assert decorators == len(q.QUERIES), (
        f"{decorators} @_q decorators but {len(q.QUERIES)} live queries: "
        "a duplicate name is shadowing an earlier definition")
