"""Optimistic concurrency, CHECK constraints, timestamp time travel."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.lakehouse import (
    CommitConflictError,
    ConstraintViolation,
    delete_versioned,
    list_versions,
    merge_into_versioned_parquet,
    read_versioned,
    version_as_of,
    with_bucket_partition,
)
from flink_cdc_dsql_master_spark.schema import Schema


def _batch(spark, lo, hi, seq, status="A"):
    rows = [(i, float(i * 10), status, "+I", seq) for i in range(lo, hi)]
    return spark.createDataFrame(
        rows, "k long, price double, status string, __op string, "
              "__seq long")


def _seed(spark, buckets=8):
    b1 = _batch(spark, 0, 40, 1)
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="occ_tbl_"), "t")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", buckets), schema)
    return path, schema


def test_disjoint_concurrent_merges_both_commit(spark):
    """Two transactions read snapshot v1; each touches different
    partitions. A commits v2; B (stale base) rebases onto v2 and
    commits v3 — neither loses the other's writes."""
    path, schema = _seed(spark, buckets=4)
    # bucket(k) is a pure function of k: pick keys in different buckets
    a_keys = [(0, 111.0, "X", "+U", 5)]
    b_keys = [(1, 222.0, "Y", "+U", 5)]
    a = spark.createDataFrame(
        a_keys, "k long, price double, status string, __op string, "
                "__seq long")
    b = spark.createDataFrame(
        b_keys, "k long, price double, status string, __op string, "
                "__seq long")
    pa = with_bucket_partition(a, "k", 4)
    pb = with_bucket_partition(b, "k", 4)
    pa_part = pa.select("part").collect()[0][0]
    pb_part = pb.select("part").collect()[0][0]
    assert pa_part != pb_part, "test needs keys in distinct buckets"
    r_a = merge_into_versioned_parquet(path, pa, schema, base_version=1)
    r_b = merge_into_versioned_parquet(path, pb, schema, base_version=1)
    assert (r_a["version"], r_b["version"]) == (2, 3)
    snap = {r["k"]: (r["price"], r["status"])
            for r in read_versioned(spark, path).collect()}
    assert snap[0] == (111.0, "X")      # A's write survives B's rebase
    assert snap[1] == (222.0, "Y")


def test_overlapping_concurrent_merge_conflicts(spark):
    path, schema = _seed(spark, buckets=4)
    a = spark.createDataFrame(
        [(0, 111.0, "X", "+U", 5)],
        "k long, price double, status string, __op string, __seq long")
    b = spark.createDataFrame(
        [(4, 222.0, "Y", "+U", 5)],   # same bucket as 0 (mod 4 hash)
        "k long, price double, status string, __op string, __seq long")
    pa = with_bucket_partition(a, "k", 4)
    pb = with_bucket_partition(b, "k", 4)
    if pa.select("part").collect()[0][0] != \
            pb.select("part").collect()[0][0]:
        pytest.skip("bucket layout changed; pick overlapping keys")
    merge_into_versioned_parquet(path, pa, schema, base_version=1)
    with pytest.raises(CommitConflictError, match="touched partitions"):
        merge_into_versioned_parquet(path, pb, schema, base_version=1)
    assert list_versions(path) == [1, 2]      # loser committed nothing


def test_concurrent_dv_delete_conflicts_on_same_partition(spark):
    path, schema = _seed(spark, buckets=4)
    up = spark.createDataFrame(
        [(0, 111.0, "X", "+U", 5)],
        "k long, price double, status string, __op string, __seq long")
    pu = with_bucket_partition(up, "k", 4)
    part = pu.select("part").collect()[0][0]
    # concurrent DELETE tombstones a row in the SAME partition
    same_part = [k for k in range(40)
                 if with_bucket_partition(
                     _batch(spark, k, k + 1, 9), "k", 4)
                 .select("part").collect()[0][0] == part]
    delete_versioned(spark, path, F.col("k") == same_part[-1], ["k"])
    with pytest.raises(CommitConflictError):
        merge_into_versioned_parquet(path, pu, schema, base_version=1)


def test_check_constraints_reject_batch_atomically(spark):
    path, schema = _seed(spark)
    bad = spark.createDataFrame(
        [(100, -5.0, "A", "+I", 5), (101, 10.0, "A", "+I", 5)],
        "k long, price double, status string, __op string, __seq long")
    with pytest.raises(ConstraintViolation, match="price_nonneg"):
        merge_into_versioned_parquet(
            path, with_bucket_partition(bad, "k", 8), schema,
            constraints=[("price_nonneg", F.col("price") >= 0)])
    # nothing committed — not even the valid row of the batch
    assert list_versions(path) == [1]
    assert read_versioned(spark, path).count() == 40
    # null constraint results count as violations (Delta semantics)
    nul = spark.createDataFrame(
        [(102, None, "A", "+I", 6)],
        "k long, price double, status string, __op string, __seq long")
    with pytest.raises(ConstraintViolation):
        merge_into_versioned_parquet(
            path, with_bucket_partition(nul, "k", 8), schema,
            constraints=[("price_nonneg", F.col("price") >= 0)])


def test_timestamp_time_travel(spark):
    path, schema = _seed(spark)
    t_between = time.time()
    time.sleep(0.05)
    merge_into_versioned_parquet(
        path, with_bucket_partition(_batch(spark, 40, 50, 2, "B"),
                                    "k", 8), schema)
    assert version_as_of(path, t_between) == 1
    assert version_as_of(path, time.time()) == 2
    with pytest.raises(ValueError, match="no version"):
        version_as_of(path, 0.0)
    old = read_versioned(spark, path, as_of_ts=t_between)
    assert old.count() == 40
    with pytest.raises(ValueError, match="not both"):
        read_versioned(spark, path, version=1, as_of_ts=t_between)


def test_check_constraints_on_partitioned_merge(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        ConstraintViolation,
        merge_into_partitioned_parquet,
        read_partitioned,
    )

    b1 = _batch(spark, 0, 10, 1)
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="cow_ck_"), "t")
    merge_into_partitioned_parquet(
        path, with_bucket_partition(b1, "k", 4), schema,
        constraints=[("price_nonneg", F.col("price") >= 0)])
    bad = spark.createDataFrame(
        [(3, -1.0, "A", "+U", 2)],
        "k long, price double, status string, __op string, __seq long")
    with pytest.raises(ConstraintViolation, match="price_nonneg"):
        merge_into_partitioned_parquet(
            path, with_bucket_partition(bad, "k", 4), schema,
            constraints=[("price_nonneg", F.col("price") >= 0)])
    # table unchanged
    got = {r["k"]: r["price"]
           for r in read_partitioned(spark, path).collect()}
    assert got == {i: float(i * 10) for i in range(10)}


def test_write_audit_publish_happy_path(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        list_versions, publish_staged, read_staged, read_versioned,
    )

    path, schema = _seed(spark)
    up = _batch(spark, 40, 50, 2, "B")
    r = merge_into_versioned_parquet(
        path, with_bucket_partition(up, "k", 8), schema,
        stage_only=True)
    sid = r["staged_id"]
    # invisible until published
    assert list_versions(path) == [1]
    assert read_versioned(spark, path).count() == 40
    # audit sees exactly the staged partition content
    audit = read_staged(spark, path, sid)
    assert {x["k"] for x in audit.collect()} >= set(range(40, 50))
    pub = publish_staged(spark, path, sid)
    assert pub["version"] == 2
    assert read_versioned(spark, path).count() == 50
    # staged manifest consumed: double-publish fails loudly
    with pytest.raises(FileNotFoundError):
        publish_staged(spark, path, sid)


def test_write_audit_discard_then_vacuum_reclaims(spark):
    import os as _os

    from flink_cdc_dsql_master_spark.lakehouse import (
        _local, discard_staged, read_versioned, vacuum_versioned,
    )

    path, schema = _seed(spark)
    bad = _batch(spark, 100, 110, 2, "X")
    r = merge_into_versioned_parquet(
        path, with_bucket_partition(bad, "k", 8), schema,
        stage_only=True)
    sid = r["staged_id"]
    n_files_before = sum(
        1 for dp, _, fs in _os.walk(_local(path))
        for f in fs if f.endswith(".parquet"))
    # staged files survive a vacuum while the stage is open
    vacuum_versioned(path, keep_last=1)
    n_after_open = sum(
        1 for dp, _, fs in _os.walk(_local(path))
        for f in fs if f.endswith(".parquet"))
    assert n_after_open == n_files_before
    # failed audit: discard, vacuum reclaims the orphans
    discard_staged(path, sid)
    vacuum_versioned(path, keep_last=1)
    n_after_discard = sum(
        1 for dp, _, fs in _os.walk(_local(path))
        for f in fs if f.endswith(".parquet"))
    assert n_after_discard < n_after_open
    assert read_versioned(spark, path).count() == 40   # table untouched


def test_staged_publish_conflicts_like_direct_merge(spark):
    from flink_cdc_dsql_master_spark.lakehouse import publish_staged

    path, schema = _seed(spark, buckets=4)
    up = spark.createDataFrame(
        [(0, 111.0, "X", "+U", 5)],
        "k long, price double, status string, __op string, __seq long")
    pu = with_bucket_partition(up, "k", 4)
    r = merge_into_versioned_parquet(path, pu, schema, stage_only=True)
    # a direct merge to the SAME partition lands while the stage is open
    merge_into_versioned_parquet(
        path, with_bucket_partition(spark.createDataFrame(
            [(4, 222.0, "Y", "+U", 6)],
            "k long, price double, status string, __op string, "
            "__seq long"), "k", 4), schema)
    with pytest.raises(CommitConflictError):
        publish_staged(spark, path, r["staged_id"])


def test_export_import_snapshot_roundtrip(spark, tmp_path):
    from flink_cdc_dsql_master_spark.lakehouse import (
        delete_versioned, export_snapshot, import_snapshot,
        read_versioned,
    )

    path, schema = _seed(spark)
    delete_versioned(spark, path, F.col("k") >= 30, ["k"])
    dest = str(tmp_path / "export")
    r = export_snapshot(spark, path, dest)
    assert r["rows"] == 30                      # tombstones applied
    # any engine reads the export with zero manifest knowledge
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT COUNT(*), MAX(k) FROM read_parquet('{dest}/*.parquet')"
    ).fetchone()
    assert n == (30, 29)
    # bootstrap a new versioned table from the export
    path2 = str(tmp_path / "reborn")
    r2 = import_snapshot(spark, dest, path2, schema)
    assert r2["version"] == 1
    a = {(x["k"], x["price"])
         for x in read_versioned(spark, path).collect()}
    b = {(x["k"], x["price"])
         for x in read_versioned(spark, path2).collect()}
    assert a == b
