"""Sink + source tests: upsert into DuckDB, parquet merge, JSON envelopes,
chunk splitting, debezium decode, snapshot handoff."""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.schema import Schema, TableId
from flink_cdc_dsql_master_spark.sinks import (
    JdbcUpsertSink,
    canal_json,
    create_table_sql,
    debezium_json,
    merge_into_parquet,
    upsert_sql,
)
from flink_cdc_dsql_master_spark.sources import (
    SnapshotStreamHandoff,
    decode_debezium_json,
    distribution_factor,
    split_evenly_sized_chunks,
    uneven_bounds,
)

TID = TableId.parse("db.public.users")
SCHEMA = Schema.of([("id", "INT NOT NULL"), ("name", "STRING"),
                    ("balance", "DOUBLE")], primary_keys=["id"])


@pytest.fixture()
def changelog(spark):
    rows = [
        (1, "alice", 10.0, "+I", 1),
        (2, "bob", 20.0, "+I", 2),
        (1, "alice", 10.0, "-U", 3),
        (1, "alice2", 15.0, "+U", 4),
        (3, "carol", 30.0, "+I", 5),
        (2, "bob", 20.0, "-D", 6),
    ]
    return spark.createDataFrame(
        rows, f"id int, name string, balance double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


def test_upsert_sql_shapes():
    sql = upsert_sql("t", ["id", "name"], ["id"])
    assert "ON CONFLICT" in sql and "DO UPDATE" in sql
    assert 'excluded."name"' in sql
    ddl = create_table_sql("t", SCHEMA)
    assert 'PRIMARY KEY ("id")' in ddl and '"id" INTEGER NOT NULL' in ddl


def test_jdbc_upsert_into_duckdb(tmp_path, changelog):
    db = str(tmp_path / "t.duckdb")

    def factory(path=db):
        return duckdb.connect(path)

    sink = JdbcUpsertSink(factory, "users", SCHEMA, parallel=False)
    sink.ensure_table()
    sink.write_batch(changelog)
    rows = duckdb.connect(db).execute(
        "SELECT id, name, balance FROM users ORDER BY id").fetchall()
    # final state: 1 updated, 2 deleted, 3 inserted
    assert rows == [(1, "alice2", 15.0), (3, "carol", 30.0)]
    # idempotent replay (effectively-once)
    sink.write_batch(changelog)
    rows2 = duckdb.connect(db).execute(
        "SELECT id, name, balance FROM users ORDER BY id").fetchall()
    assert rows2 == rows


def test_duckdb_relational_write_matches_bind_loop(tmp_path):
    """The vectorized DuckDB flush (one INSERT..SELECT / DELETE..USING
    over a registered Arrow table) must land the exact state the
    row-bind executemany loop produced — including keep-LAST overwrite
    order for duplicate keys WITHOUT a changelog op column (sequential
    binds let the last occurrence win) and delete-by-equality NULL
    semantics."""
    from flink_cdc_dsql_master_spark.sinks import _duckdb_relational_write

    cols, pks = ["id", "name", "balance"], ["id"]
    ups = [(1, "a", 1.0), (2, "b", 2.0), (1, "a2", 1.5), (3, None, None)]
    dels = [(2,), (99,), (None,)]

    def run_table(vectorized: bool):
        con = duckdb.connect(str(tmp_path / f"v{vectorized}.duckdb"))
        con.execute('CREATE TABLE t ("id" INTEGER PRIMARY KEY, '
                    '"name" VARCHAR, "balance" DOUBLE)')
        if vectorized:
            assert _duckdb_relational_write(
                con, lambda fn: fn(), "t", cols, pks, ups, dels)
        else:
            up = upsert_sql("t", cols, pks)
            for r in ups:
                con.execute(up, r)
            for r in dels:
                con.execute('DELETE FROM t WHERE "id" = ?', r)
        out = con.execute(
            "SELECT * FROM t ORDER BY id").fetchall()
        con.close()
        return out

    assert run_table(True) == run_table(False) == [
        (1, "a2", 1.5), (3, None, None)]


def test_duckdb_relational_write_declines_non_duckdb(tmp_path):
    """A non-DuckDB DB-API connection must be declined (return False)
    so the generic bind loop runs — sqlite3 stands in for psycopg."""
    import sqlite3

    from flink_cdc_dsql_master_spark.sinks import _duckdb_relational_write

    con = sqlite3.connect(str(tmp_path / "t.sqlite"))
    assert not _duckdb_relational_write(
        con, lambda fn: fn(), "t", ["id"], ["id"], [(1,)], [])
    con.close()


def test_merge_into_parquet(tmp_path, spark, changelog):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(2, "bob", 20.0), (9, "zed", 99.0)],
        "id int, name string, balance double")
    base.write.parquet(path)
    merge_into_parquet(path, changelog, SCHEMA)
    got = sorted((r["id"], r["name"]) for r in
                 spark.read.parquet(path).collect())
    # 2 deleted, 1/3 upserted, 9 untouched
    assert got == [(1, "alice2"), (3, "carol"), (9, "zed")]


def test_debezium_envelope_roundtrip(spark, changelog):
    env = debezium_json(changelog, TID)
    vals = [json.loads(r["value"]) for r in env.collect()]
    ops = sorted(v["op"] for v in vals)
    assert ops == ["c", "c", "c", "d", "u", "u"]
    d = next(v for v in vals if v["op"] == "d")
    assert d["before"]["id"] == 2 and d["after"] is None
    assert d["source"]["table"] == "users"

    # decode back: only the after/insert/update images rebuild state
    payload = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("balance", T.DoubleType()),
    ])
    decoded = decode_debezium_json(env, "value", payload)
    assert decoded.where(F.col(OP_COLUMN) == "-D").count() == 1
    assert decoded.where(F.col(OP_COLUMN) == "+U").count() == 1


def test_canal_envelope(spark, changelog):
    env = canal_json(changelog, TID)
    vals = [json.loads(r["value"]) for r in env.collect()]
    types = sorted(v["type"] for v in vals)
    assert types == ["DELETE", "INSERT", "INSERT", "INSERT",
                     "UPDATE", "UPDATE"]


def test_chunk_splitting_even():
    splits = split_evenly_sized_chunks(0, 99_999, 100_000, chunk_size=10_000)
    assert len(splits) == 10
    assert splits[0].start is None and splits[-1].end is None
    assert splits[1].predicate("id") == "id >= 10000 AND id < 20000"
    assert distribution_factor(0, 99_999, 100_000) == pytest.approx(1.0)


def test_chunk_splitting_small_table():
    assert len(split_evenly_sized_chunks(0, 100, 50)) == 1


def test_uneven_bounds_quantiles(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * F.col("id")).alias("k"))  # skewed key
    splits = uneven_bounds(df, "k", 4)
    assert 2 <= len(splits) <= 4
    assert splits[0].start is None and splits[-1].end is None


def test_snapshot_stream_handoff(spark):
    table = spark.createDataFrame([(1, "a")], "id int, v string")
    log = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 10), (3, "c", 15)],
        f"id int, v string, {SEQ_COLUMN} long")
    h = SnapshotStreamHandoff()
    h.snapshot(table, log)
    assert h.high_watermark == 15
    later = spark.createDataFrame(
        [(4, "d", 20), (2, "b", 10)], f"id int, v string, {SEQ_COLUMN} long")
    assert [r["id"] for r in h.stream_filter(later).collect()] == [4]


def test_debezium_decode_cross_op_seq_order(spark):
    """ADVICE r2 (high): a delete decoded after inserts must carry a seq
    greater than the inserts' — per-branch monotonically_increasing_id gave
    the delete seq 0 < insert seq 1 and resurrected the deleted row."""
    payload = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])
    rows = [
        ('{"before": null, "after": {"id": 1, "v": "a"}, "op": "c"}',),
        ('{"before": null, "after": {"id": 2, "v": "b"}, "op": "c"}',),
        ('{"before": {"id": 2, "v": "b"}, "after": null, "op": "d"}',),
    ]
    env = spark.createDataFrame(rows, "value string").coalesce(1)
    decoded = decode_debezium_json(env, "value", payload)
    from flink_cdc_dsql_master_spark.partitioning import apply_changelog
    final = sorted((r["id"], r["v"]) for r in
                   apply_changelog(decoded, ["id"]).collect())
    assert final == [(1, "a")]  # k2 stays deleted


def test_debezium_decode_update_images_ordered(spark):
    """ADVICE r2 (high): -U and +U of one update share the record seq; the
    after-image must rank above the before-image (seq*2+1 vs seq*2)."""
    payload = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])
    rows = [
        ('{"before": null, "after": {"id": 1, "v": "old"}, "op": "c"}', 100),
        ('{"before": {"id": 1, "v": "old"}, '
         '"after": {"id": 1, "v": "new"}, "op": "u"}', 200),
    ]
    env = spark.createDataFrame(rows, "value string, offset long")
    decoded = decode_debezium_json(env, "value", payload, seq_col="offset")
    from flink_cdc_dsql_master_spark.partitioning import apply_changelog
    final = [(r["id"], r["v"]) for r in
             apply_changelog(decoded, ["id"]).collect()]
    assert final == [(1, "new")]  # the -U before-image must not win


def test_last_write_wins_equal_seq_op_rank(spark):
    """Equal-seq tie-break: -D > +I/+U > -U (ADVICE r2 fix)."""
    from flink_cdc_dsql_master_spark.partitioning import (
        apply_changelog, last_write_wins)
    df = spark.createDataFrame(
        [(1, "old", "-U", 7), (1, "new", "+U", 7)],
        f"id int, v string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    kept = last_write_wins(df, ["id"]).collect()
    assert [(r["v"], r[OP_COLUMN]) for r in kept] == [("new", "+U")]
    assert [(r["id"], r["v"]) for r in
            apply_changelog(df, ["id"]).collect()] == [(1, "new")]
    # delete still beats an upsert at the same seq
    df2 = spark.createDataFrame(
        [(1, "x", "+U", 7), (1, "x", "-D", 7)],
        f"id int, v string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    assert apply_changelog(df2, ["id"]).count() == 0


def test_merge_into_parquet_self_referential_plan(tmp_path, spark):
    """VERDICT r2: the merge must never read the path it is overwriting.
    A changelog derived lazily FROM the target (worst case: recompute after
    cache loss re-reads the target) must still merge correctly — the
    temp-write + rename swap guarantees the source dir is intact until the
    new table is fully materialized."""
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)],
        "id int, name string, balance double").write.parquet(path)
    # changelog computed lazily from the target itself — no persist anywhere
    cl = (spark.read.parquet(path)
          .where(F.col("id") == 1)
          .withColumn("name", F.concat(F.col("name"), F.lit("-updated")))
          .withColumn(OP_COLUMN, F.lit("+U"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    merge_into_parquet(path, cl, SCHEMA)
    got = sorted((r["id"], r["name"]) for r in
                 spark.read.parquet(path).collect())
    assert got == [(1, "a-updated"), (2, "b")]
    assert not os.path.exists(path + ".__merge_tmp__")
    assert not os.path.exists(path + ".__merge_old__")


def test_simhash_max_hamming_bounds(spark):
    from flink_cdc_dsql_master_spark.operators.dedup import simhash_pairs
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")],
                               "doc_id int, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(df, max_hamming=32)
    # widened banding (d=7 -> 8 chunks) still finds identical docs
    got = simhash_pairs(df, max_hamming=7).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_chunk_backfill_no_overlap_no_gap(spark):
    """DBLog handoff invariant: with low watermarks at 0 every log event is
    consumed exactly once (backfill window XOR stream phase), so replaying
    the stream phase over the reconciled chunks equals applying the whole
    log to the snapshot."""
    from flink_cdc_dsql_master_spark.partitioning import apply_changelog
    from flink_cdc_dsql_master_spark.sources import (
        ChunkWatermarks, SnapshotSplit, chunk_backfill_merge,
        stream_phase_filter)

    snap = spark.createDataFrame(
        [(k, 0) for k in range(1, 11)], "k int, v int")
    # seq = 10*k + i spread across keys; delete every 4th event
    log_rows = []
    seq = 0
    for i in range(3):
        for k in range(1, 11):
            seq += 1
            op = "-D" if seq % 4 == 0 else "+U"
            log_rows.append((k, seq * 100, seq, op))
    log = spark.createDataFrame(
        log_rows, f"k int, v int, {SEQ_COLUMN} long, {OP_COLUMN} string")
    splits = [SnapshotSplit(0, None, 4), SnapshotSplit(1, 4, 8),
              SnapshotSplit(2, 8, None)]
    wms = [ChunkWatermarks(0, 0, 7), ChunkWatermarks(1, 0, 15),
           ChunkWatermarks(2, 0, 23)]
    reconciled = chunk_backfill_merge(snap, log, ["k"], "k", splits, wms)
    stream = stream_phase_filter(log, "k", splits, wms)
    # replay: reconciled state ranks below every stream event (seq=high)
    highs = {w.split_id: w.high for w in wms}
    base = reconciled.withColumn(
        SEQ_COLUMN,
        F.when(F.col("chunk_id") == 0, highs[0])
        .when(F.col("chunk_id") == 1, highs[1])
        .otherwise(highs[2]).cast("long")
    ).withColumn(OP_COLUMN, F.lit("+I"))
    final = apply_changelog(
        base.unionByName(stream.select(*base.columns)), ["k"])
    # ground truth: apply the whole log over the snapshot in one pass
    snap_cl = (snap.withColumn("chunk_id", F.lit(0))
               .withColumn(SEQ_COLUMN, F.lit(0).cast("long"))
               .withColumn(OP_COLUMN, F.lit("+I")))
    log_cl = log.withColumn("chunk_id", F.lit(0))
    truth = apply_changelog(
        snap_cl.unionByName(log_cl.select(*snap_cl.columns)), ["k"])
    got = sorted((r["k"], r["v"]) for r in final.collect())
    want = sorted((r["k"], r["v"]) for r in truth.collect())
    assert got == want and len(got) > 0


def test_chunk_backfill_drops_pre_low_watermark_events(spark):
    """An event at or below its chunk's low watermark pre-dates the scan
    (already reflected in the snapshot image) and must appear in neither
    the backfill window nor the stream phase."""
    from flink_cdc_dsql_master_spark.sources import (
        ChunkWatermarks, SnapshotSplit, chunk_backfill_merge,
        stream_phase_filter)

    snap = spark.createDataFrame([(1, 999)], "k int, v int")
    log = spark.createDataFrame(
        [(1, -1, 5, "+U")], f"k int, v int, {SEQ_COLUMN} long, "
                            f"{OP_COLUMN} string")
    splits = [SnapshotSplit(0, None, None)]
    wms = [ChunkWatermarks(0, 5, 10)]  # event seq == low -> excluded
    rec = chunk_backfill_merge(snap, log, ["k"], "k", splits, wms)
    assert [(r["k"], r["v"]) for r in rec.collect()] == [(1, 999)]
    assert stream_phase_filter(log, "k", splits, wms).count() == 0


def test_compact_parquet_reduces_files(spark, tmp_path):
    from flink_cdc_dsql_master_spark.sinks import compact_parquet
    path = str(tmp_path / "frag.parquet")
    # 12 tiny files (one per write), as a per-micro-batch sink accretes
    spark.createDataFrame([(0, "x")], "id int, v string").write.parquet(path)
    for i in range(1, 12):
        spark.createDataFrame([(i, "x")], "id int, v string") \
            .write.mode("append").parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before >= 12
    n = compact_parquet(spark, path)
    after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert after == n == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(12))


def test_chunked_dbapi_read_live_db(spark, tmp_path):
    """Parallel per-chunk DB-API fetch against a real DuckDB file: union
    of chunks == table, each chunk non-overlapping, empty table safe."""
    import duckdb
    from pyspark.sql import types as T
    from flink_cdc_dsql_master_spark.sources import (
        DuckDBConnFactory, chunked_dbapi_read)

    path = str(tmp_path / "live.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t AS SELECT range AS k, range * 2 AS v "
                "FROM range(0, 2500)")
    con.execute("CREATE TABLE empty(k BIGINT, v BIGINT)")
    con.close()

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.LongType())])
    out = chunked_dbapi_read(spark, DuckDBConnFactory(path), "t", "k",
                             schema, chunk_size=400)
    rows = sorted((r["k"], r["v"]) for r in out.collect())
    assert rows == [(i, 2 * i) for i in range(2500)]  # no loss, no dup

    none = chunked_dbapi_read(spark, DuckDBConnFactory(path), "empty", "k",
                              schema, chunk_size=400)
    assert none.count() == 0 and none.schema == schema


def test_dbapi_polling_cdc_e2e(spark, tmp_path):
    """Full polling-CDC loop against a live DuckDB: snapshot → diff →
    changelog → materialize; mutations between polls surface as
    -U/+U/-D/+I; a quiet poll emits nothing; restart-safe state."""
    import duckdb
    from pyspark.sql import types as T
    from flink_cdc_dsql_master_spark.events import OP_COLUMN
    from flink_cdc_dsql_master_spark.partitioning import apply_changelog
    from flink_cdc_dsql_master_spark.sources import (
        DbApiPollingSource, DuckDBConnFactory)

    path = str(tmp_path / "cdc.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t(k BIGINT, v VARCHAR)")
    con.execute("INSERT INTO t VALUES (1,'a'), (2,'b'), (3,'c')")
    con.close()

    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    src = DbApiPollingSource(
        spark, DuckDBConnFactory(path), "t", "k", ["k"], schema,
        state_path=str(tmp_path / "snap_state"), chunk_size=2)

    cl1 = src.poll()
    assert {r[OP_COLUMN] for r in cl1.collect()} == {"+I"}
    assert cl1.count() == 3

    con = duckdb.connect(path)
    con.execute("UPDATE t SET v = 'b2' WHERE k = 2")
    con.execute("DELETE FROM t WHERE k = 3")
    con.execute("INSERT INTO t VALUES (4, 'd')")
    con.close()

    cl2 = src.poll()
    ops = sorted((r["k"], r[OP_COLUMN]) for r in cl2.collect())
    assert ops == [(2, "+U"), (2, "-U"), (3, "-D"), (4, "+I")]

    # materializing the union of both polls reproduces the live table
    final = apply_changelog(cl1.unionByName(cl2), ["k"])
    got = {r["k"]: r["v"] for r in final.collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}

    # quiet poll → empty changelog
    assert src.poll().count() == 0
