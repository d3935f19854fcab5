"""Partitioned copy-on-write MERGE: pruning, atomicity, crash recovery."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.lakehouse import (
    TXN_DIR,
    merge_into_partitioned_parquet,
    read_partitioned,
    recover_partitioned_merge,
    with_bucket_partition,
)
from flink_cdc_dsql_master_spark.schema import Schema


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "cow_table")


def _changelog(spark, rows):
    """rows: (k, v, op, seq)"""
    df = spark.createDataFrame(rows, "k long, v string, op string, seq long")
    df = (df.withColumnRenamed("op", OP_COLUMN)
          .withColumnRenamed("seq", SEQ_COLUMN))
    return with_bucket_partition(df, "k", n_buckets=4)


def _schema(spark):
    base = spark.createDataFrame([], "k long, v string")
    return Schema.of(base.schema, primary_keys=["k"])


def _state(spark, tbl):
    return {
        r["k"]: (r["v"], r["part"])
        for r in read_partitioned(spark, tbl).collect()
    }


def test_merge_upsert_delete_roundtrip(spark, tbl):
    sch = _schema(spark)
    b1 = _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(40)])
    r1 = merge_into_partitioned_parquet(tbl, b1, sch)
    assert sorted(r1["rewritten"]) == [0, 1, 2, 3] and not r1["dropped"]

    b2 = _changelog(spark, [(3, "v3b", "+U", 2), (7, None, "-D", 2),
                            (3, "ignored", "-U", 2)])
    merge_into_partitioned_parquet(tbl, b2, sch)
    st = _state(spark, tbl)
    assert st[3][0] == "v3b"
    assert 7 not in st and len(st) == 39
    # partition placement is the portable Knuth bucket
    from flink_cdc_dsql_master_spark.partitioning import bucket_expr
    want = {r["k"]: r["p"] for r in spark.range(40).select(
        F.col("id").alias("k"), bucket_expr("id", 4).alias("p")).collect()}
    for k, (_, p) in st.items():
        assert p == want[k]


def test_merge_rewrites_only_affected_partitions(spark, tbl):
    sch = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(40)]),
        sch)
    # snapshot the physical files of every partition dir
    def files():
        out = {}
        for e in os.listdir(tbl):
            if e.startswith("part="):
                d = os.path.join(tbl, e)
                out[e] = sorted(
                    (f, os.stat(os.path.join(d, f)).st_mtime_ns)
                    for f in os.listdir(d) if f.endswith(".parquet"))
        return out

    before = files()
    # key 3's bucket only
    res = merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(3, "v3b", "+U", 2)]), sch)
    after = files()
    touched = {f"part={v}" for v in res["rewritten"]}
    assert len(touched) == 1
    for e, snap in before.items():
        if e in touched:
            assert after[e] != snap
        else:
            assert after[e] == snap  # untouched partitions byte-stable


def test_partition_pruned_read_plan(spark, tbl):
    sch = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(40)]),
        sch)
    scan = spark.read.parquet(tbl).where(F.col("part").isin(1, 2))
    plan = scan._jdf.queryExecution().explainString(
        scan.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "part" in pf[0]  # pruning happens at partition level


def test_delete_empties_partition_drops_dir(spark, tbl):
    sch = _schema(spark)
    b1 = _changelog(spark, [(1, "a", "+I", 1), (2, "b", "+I", 1)])
    merge_into_partitioned_parquet(tbl, b1, sch)
    parts = [e for e in os.listdir(tbl) if e.startswith("part=")]
    # delete every key in key-1's bucket
    res = merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(1, None, "-D", 2)]), sch)
    assert len(res["dropped"]) == 1
    v = res["dropped"][0]
    assert not os.path.exists(os.path.join(tbl, f"part={v}"))
    assert len([e for e in os.listdir(tbl) if e.startswith("part=")]) \
        == len(parts) - 1
    assert set(_state(spark, tbl)) == {2}


def test_crash_recovery_rolls_forward(spark, tbl):
    """Simulate a crash in the publish window: staging written and the
    manifest committed, but no partition swapped. Recovery must finish
    the txn; a reader must see the NEW data."""
    sch = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(8)]),
        sch)
    # build the post-merge image of bucket-of-3 out-of-band as "staging"
    b2 = _changelog(spark, [(3, "v3b", "+U", 2)])
    staging = tbl + ".__cow_crash__"
    from flink_cdc_dsql_master_spark.partitioning import bucket_expr
    v3 = spark.range(1).select(bucket_expr(F.lit(3), 4)).first()[0]
    merged = (read_partitioned(spark, tbl)
              .where(F.col("part") == v3).where(F.col("k") != 3)
              .unionByName(b2.where(F.col("k") == 3)
                           .select("k", F.lit("v3b").alias("v"), "part")))
    merged.write.partitionBy("part").mode("overwrite").parquet(staging)
    with open(os.path.join(tbl, TXN_DIR, "pending.json"), "w") as f:
        json.dump({"staging": staging, "part_col": "part",
                   "publish": [v3], "drop": [], "ts": 0}, f)

    assert recover_partitioned_merge(tbl) is True
    st = _state(spark, tbl)
    assert st[3][0] == "v3b" and len(st) == 8
    assert not os.path.exists(staging)
    assert not os.path.exists(os.path.join(tbl, TXN_DIR, "pending.json"))
    # second recovery is a no-op
    assert recover_partitioned_merge(tbl) is False


def test_crash_recovery_mid_swap(spark, tbl):
    """Crash after live -> old but before staging -> live: the partition
    dir is absent; recovery must install the staged data and clean up."""
    sch = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(8)]),
        sch)
    from flink_cdc_dsql_master_spark.partitioning import bucket_expr
    v3 = spark.range(1).select(bucket_expr(F.lit(3), 4)).first()[0]
    staging = tbl + ".__cow_crash2__"
    (read_partitioned(spark, tbl).where(F.col("part") == v3)
     .withColumn("v", F.when(F.col("k") == 3, "v3c").otherwise(F.col("v")))
     .write.partitionBy("part").mode("overwrite").parquet(staging))
    live = os.path.join(tbl, f"part={v3}")
    os.rename(live, live + ".__old__")
    with open(os.path.join(tbl, TXN_DIR, "pending.json"), "w") as f:
        json.dump({"staging": staging, "part_col": "part",
                   "publish": [v3], "drop": [], "ts": 0}, f)
    assert recover_partitioned_merge(tbl) is True
    st = _state(spark, tbl)
    assert st[3][0] == "v3c" and len(st) == 8
    assert not os.path.exists(live + ".__old__")


def test_reader_recovers_before_reading(spark, tbl):
    sch = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(1, "a", "+I", 1)]), sch)
    # fabricate a pending drop txn and read through read_partitioned
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(2, "b", "+I", 1)]), sch)
    from flink_cdc_dsql_master_spark.partitioning import bucket_expr
    v2 = spark.range(1).select(bucket_expr(F.lit(2), 4)).first()[0]
    with open(os.path.join(tbl, TXN_DIR, "pending.json"), "w") as f:
        json.dump({"staging": tbl + ".__gone__", "part_col": "part",
                   "publish": [], "drop": [v2], "ts": 0}, f)
    st = _state(spark, tbl)
    assert set(st) == {1}  # the pending drop was applied before the read


def _envelope(before, after, op):
    return {"before": before, "after": after, "op": op}


def _write_envelopes(path, name, records):
    with open(f"{path}/{name}", "w") as f:
        for offset, env in records:
            f.write(json.dumps({"value": json.dumps(env),
                                "offset": offset}) + "\n")


def test_changelog_stream_to_cow_table(spark, tmp_path):
    """Streaming pipeline into the partitioned COW writer: Debezium
    file-stream -> decode -> compose -> merge_into_partitioned_parquet
    per micro-batch across two checkpointed runs. The second run must
    replay nothing and only rewrite the touched buckets."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_changelog_stream, make_cow_sink_writer)
    from flink_cdc_dsql_master_spark.pipeline import (
        PipelineDef, SinkDef, SourceDef)

    src = str(tmp_path / "topic_cow")
    ckpt = str(tmp_path / "ckpt_cow")
    base = str(tmp_path / "cow")
    (tmp_path / "topic_cow").mkdir()
    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src, "schema": "id int, v string",
            "table": "db.s.t", "primary-keys": ["id"]}),
        sink=SinkDef("custom"),
    )
    writer = make_cow_sink_writer(base, buckets=4)

    _write_envelopes(src, "b1.jsonl", [
        (1, _envelope(None, {"id": i, "v": f"v{i}"}, "c"))
        for i in range(10)
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)
    tbl = f"{base}/t"
    parts_before = {
        e: sorted(os.listdir(os.path.join(tbl, e)))
        for e in os.listdir(tbl) if e.startswith("part=")}
    assert len(parts_before) >= 2

    _write_envelopes(src, "b2.jsonl", [
        (11, _envelope({"id": 3, "v": "v3"}, {"id": 3, "v": "v3b"}, "u")),
        (12, _envelope({"id": 7, "v": "v7"}, None, "d")),
    ])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    got = {r["id"]: r["v"]
           for r in read_partitioned(spark, tbl).collect()}
    want = {i: f"v{i}" for i in range(10) if i != 7}
    want[3] = "v3b"
    assert got == want
    # untouched buckets keep their exact file lists (no full rewrite)
    parts_after = {
        e: sorted(os.listdir(os.path.join(tbl, e)))
        for e in os.listdir(tbl) if e.startswith("part=")}
    untouched = [e for e in parts_before
                 if e in parts_after and parts_after[e] == parts_before[e]]
    assert untouched  # at least one bucket survived byte-identical


def test_cow_merge_after_add_column(spark, tbl):
    """ADD COLUMN mid-table: a post-evolution batch merges a new column
    into some buckets; untouched buckets keep their original files and
    the mergeSchema read NULL-fills them — mixed-generation files under
    one table, the Delta/Iceberg reader contract."""
    from pyspark.sql import functions as F2

    sch1 = _schema(spark)
    merge_into_partitioned_parquet(
        tbl, _changelog(spark, [(i, f"v{i}", "+I", 1) for i in range(8)]),
        sch1)

    wide = spark.createDataFrame(
        [(3, "v3b", 7.5, "+U", 2)],
        "k long, v string, score double, op string, seq long")
    wide = (wide.withColumnRenamed("op", OP_COLUMN)
            .withColumnRenamed("seq", SEQ_COLUMN))
    wide = with_bucket_partition(wide, "k", n_buckets=4)
    base2 = spark.createDataFrame([], "k long, v string, score double")
    sch2 = Schema.of(base2.schema, primary_keys=["k"])
    res = merge_into_partitioned_parquet(tbl, wide, sch2)
    assert len(res["rewritten"]) == 1

    out = read_partitioned(spark, tbl)
    assert "score" in out.columns
    got = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
    assert got[3] == ("v3b", 7.5)
    assert len(got) == 8
    for k, (_, s) in got.items():
        if k != 3:
            assert s is None  # old-generation rows NULL-fill


def test_cow_stream_mid_stream_add_column(spark, tmp_path):
    """Streaming: batch 2 carries a new column in its Debezium payloads;
    the composer evolves and the COW sink lands mixed generations."""
    from flink_cdc_dsql_master_spark.compose import (
        compose_changelog_stream, make_cow_sink_writer)
    from flink_cdc_dsql_master_spark.pipeline import (
        PipelineDef, SinkDef, SourceDef)

    src = str(tmp_path / "topic_cow2")
    base = str(tmp_path / "cow2")
    (tmp_path / "topic_cow2").mkdir()

    def pipe(schema):
        return PipelineDef(
            source=SourceDef("file-debezium", {
                "path": src, "schema": schema,
                "table": "db.s.t", "primary-keys": ["id"]}),
            sink=SinkDef("custom"),
        )

    writer = make_cow_sink_writer(base, buckets=4)
    _write_envelopes(src, "b1.jsonl", [
        (i, _envelope(None, {"id": i, "v": f"v{i}"}, "c"))
        for i in range(6)
    ])
    q = compose_changelog_stream(
        spark, pipe("id int, v string"), str(tmp_path / "ck_a"), writer)
    q.awaitTermination(120)

    _write_envelopes(src, "b2.jsonl", [
        (10, _envelope(None, {"id": 9, "v": "v9", "score": 1.25}, "c")),
    ])
    q = compose_changelog_stream(
        spark, pipe("id int, v string, score double"),
        str(tmp_path / "ck_b"), writer)
    q.awaitTermination(120)

    out = read_partitioned(spark, f"{base}/t")
    got = {r["id"]: (r["v"], r["score"]) for r in out.collect()}
    assert got[9] == ("v9", 1.25)
    assert len(got) == 7 and got[0] == ("v0", None)
