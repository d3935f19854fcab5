"""Deletion-vector tests: delete without rewriting data files; lazy
physical resolution via merge/compaction; CDF and vacuum integration."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.lakehouse import (
    _load_manifest,
    _local,
    compact_versioned,
    delete_versioned,
    list_versions,
    merge_into_versioned_parquet,
    read_versioned,
    table_changes,
    vacuum_versioned,
    with_bucket_partition,
)
from flink_cdc_dsql_master_spark.schema import Schema


def _seed(spark, n=40, buckets=8):
    rows = [(i, float(i * 10), "A") for i in range(n)]
    base = spark.createDataFrame(rows, "k long, price double, status string")
    b1 = (base.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(base.schema, primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="dv_tbl_"), "t")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", buckets), schema)
    return path, schema


def test_delete_rewrites_no_data_files(spark):
    path, _ = _seed(spark)
    m1 = _load_manifest(_local(path), 1)
    r = delete_versioned(spark, path, F.col("k") % 5 == 0, ["k"])
    assert r["version"] == 2 and r["deleted"] == 8
    m2 = _load_manifest(_local(path), 2)
    assert m2["files"] == m1["files"]          # zero data files touched
    assert m2["dv"] and m2["pks"] == ["k"]
    got = {r2["k"] for r2 in read_versioned(spark, path).collect()}
    assert got == {i for i in range(40) if i % 5 != 0}
    # time travel to pre-delete still sees everything
    v1 = {r1["k"] for r1 in read_versioned(spark, path, 1).collect()}
    assert v1 == set(range(40))


def test_deletes_accumulate_and_noop_predicate(spark):
    path, _ = _seed(spark)
    delete_versioned(spark, path, F.col("k") < 5, ["k"])
    delete_versioned(spark, path, F.col("k") >= 35, ["k"])
    got = {r["k"] for r in read_versioned(spark, path).collect()}
    assert got == set(range(5, 35))
    # re-deleting already-deleted rows is a no-op commit
    r = delete_versioned(spark, path, F.col("k") < 5, ["k"])
    assert r["deleted"] == 0 and r["version"] == 3
    assert list_versions(path) == [1, 2, 3]


def test_merge_resurrects_and_resolves_tombstones(spark):
    path, schema = _seed(spark)
    delete_versioned(spark, path, F.col("k").isin(3, 7), ["k"])
    # upsert key 3 again -> must be visible with the NEW image
    up = spark.createDataFrame(
        [(3, 999.0, "B", "+U", 5)],
        "k long, price double, status string, __op string, __seq long")
    merge_into_versioned_parquet(
        path, with_bucket_partition(up, "k", 8), schema)
    snap = {r["k"]: r["price"] for r in read_versioned(spark, path).collect()}
    assert snap[3] == 999.0
    assert 7 not in snap
    # key 7's tombstone: either resolved physically (same bucket as 3)
    # or still carried in the dv — read semantics identical either way
    m = _load_manifest(_local(path), list_versions(path)[-1])
    if m["dv"]:
        dv = spark.read.parquet(os.path.join(_local(path), m["dv"]))
        assert {r["k"] for r in dv.collect()} <= {7}


def test_compaction_resolves_tombstones_physically(spark):
    path, schema = _seed(spark)
    # second batch so partitions hold 2 files and compaction has work
    b2 = spark.createDataFrame(
        [(i, float(i), "C", "+I", 2) for i in range(40, 80)],
        "k long, price double, status string, __op string, __seq long")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b2, "k", 8), schema)
    delete_versioned(spark, path, F.col("k") % 2 == 0, ["k"])
    before = {r["k"] for r in read_versioned(spark, path).collect()}
    r = compact_versioned(path)
    assert r["compacted"]
    m = _load_manifest(_local(path), r["version"])
    assert m["dv"] is None              # all partitions compacted
    after = {r2["k"] for r2 in read_versioned(spark, path).collect()}
    assert after == before == {i for i in range(80) if i % 2 == 1}
    # physically gone: raw file read (no dv) misses the deleted keys
    raw = spark.read.parquet(
        *[os.path.join(_local(path), rel)
          for fs in m["files"].values() for rel in fs])
    assert {r3["k"] for r3 in raw.collect()} == after


def test_change_feed_emits_dv_deletes(spark):
    path, _ = _seed(spark)
    delete_versioned(spark, path, F.col("k").isin(2, 12), ["k"])
    cdf = table_changes(spark, path, 1, 2, ["k"])
    got = {(r["k"], r["_change_type"]) for r in cdf.collect()}
    assert got == {(2, "delete"), (12, "delete")}
    # and the dv rows carry the full deleted images
    prices = {r["k"]: r["price"] for r in cdf.collect()}
    assert prices == {2: 20.0, 12: 120.0}


def test_change_feed_no_double_count_after_resolution(spark):
    """v2 tombstones key 6; v3 rewrites its partition (resolving the
    tombstone physically). The v2->v3 feed must NOT re-report key 6's
    delete — its logical disappearance happened at v2."""
    path, schema = _seed(spark)
    delete_versioned(spark, path, F.col("k") == 6, ["k"])
    up = spark.createDataFrame(
        [(14, 888.0, "B", "+U", 9)],  # k=14: same bucket mod 8? any write
        "k long, price double, status string, __op string, __seq long")
    merge_into_versioned_parquet(
        path, with_bucket_partition(up, "k", 8), schema)
    cdf = {(r["k"], r["_change_type"])
           for r in table_changes(spark, path, 2, 3, ["k"]).collect()}
    assert (6, "delete") not in cdf


def test_vacuum_gc_unreferenced_dv_sidecars(spark):
    path, _ = _seed(spark)
    delete_versioned(spark, path, F.col("k") == 1, ["k"])
    delete_versioned(spark, path, F.col("k") == 2, ["k"])
    dvd = os.path.join(_local(path), "_dv")
    assert len(os.listdir(dvd)) == 2
    r = vacuum_versioned(path, keep_last=1)
    assert r["removed_dv_sidecars"] == 1
    assert len(os.listdir(dvd)) == 1
    got = {row["k"] for row in read_versioned(spark, path).collect()}
    assert got == set(range(40)) - {1, 2}


# ------------------------------------------------- bloom point lookups


def _two_batch_table(spark):
    path, schema = _seed(spark)                       # keys 0..39
    b2 = spark.createDataFrame(
        [(i, float(i), "C", "+I", 2) for i in range(40, 80)],
        "k long, price double, status string, __op string, __seq long")
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, with_bucket_partition,
    )
    merge_into_versioned_parquet(
        path, with_bucket_partition(b2, "k", 8), schema)
    return path, schema


def test_bloom_index_skips_where_minmax_cannot(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        index_bloom_versioned, plan_files, read_versioned,
    )

    path, _ = _two_batch_table(spark)
    r = index_bloom_versioned(path, "k")
    assert r["indexed"] == 16                  # 8 buckets x 2 batches
    # hash-bucketed layout: every batch-1 file spans ~the whole 0..39
    # range, so min/max stats keep most files for a point key
    ranged = plan_files(path, key_range=("k", 12, 12))
    pointed = plan_files(path, point=("k", 12))
    assert pointed["skipped"] > ranged["skipped"]
    assert pointed["skipped"] >= 13            # ~1 real + <=2 FP of 16
    got = read_versioned(spark, path, point=("k", 12)).collect()
    assert [(x["k"], x["price"]) for x in got] == [(12, 120.0)]


def test_bloom_negative_lookup_reads_nothing(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        index_bloom_versioned, plan_files, read_versioned,
    )

    path, _ = _two_batch_table(spark)
    index_bloom_versioned(path, "k")
    plan = plan_files(path, point=("k", 123456789))
    assert plan["total"] - plan["skipped"] <= 1    # at most an FP file
    assert read_versioned(spark, path, point=("k", 123456789)) \
        .count() == 0


def test_merge_keeps_bloom_index_fresh(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        _load_manifest, _local, index_bloom_versioned,
        merge_into_versioned_parquet, plan_files, read_versioned,
        with_bucket_partition,
    )

    path, schema = _two_batch_table(spark)
    index_bloom_versioned(path, "k")
    b3 = spark.createDataFrame(
        [(i, float(i), "D", "+I", 3) for i in range(80, 120)],
        "k long, price double, status string, __op string, __seq long")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b3, "k", 8), schema)
    m = _load_manifest(_local(path), 4)
    rels = {rel for fs in m["files"].values() for rel in fs}
    assert set(m["file_blooms"]) == rels       # every live file indexed
    plan = plan_files(path, point=("k", 97))
    assert plan["skipped"] >= plan["total"] - 3
    got = read_versioned(spark, path, point=("k", 97)).collect()
    assert [(x["k"], x["status"]) for x in got] == [(97, "D")]


# --------------------------------------------- metadata-only aggregates


def test_metadata_aggregate_matches_scan(spark):
    from flink_cdc_dsql_master_spark.lakehouse import metadata_aggregate

    path, _ = _two_batch_table(spark)
    agg = metadata_aggregate(path)
    real = read_versioned(spark, path).agg(
        F.count("*"), F.min("k"), F.max("k")).collect()[0]
    assert agg["n_rows"] == real[0] == 80
    assert agg["minmax_exact"] is True
    assert agg["columns"]["k"] == [real[1], real[2]] == [0, 79]


def test_metadata_aggregate_exact_count_under_dv(spark):
    from flink_cdc_dsql_master_spark.lakehouse import (
        compact_versioned, metadata_aggregate,
    )

    path, _ = _two_batch_table(spark)
    delete_versioned(spark, path, F.col("k") >= 70, ["k"])
    agg = metadata_aggregate(path)
    assert agg["n_rows"] == read_versioned(spark, path).count() == 70
    # tombstones may hold the max: min/max demoted to bounds
    assert agg["minmax_exact"] is False
    assert agg["columns"]["k"] == [0, 79]      # bound, not exact
    # physical resolution restores exactness
    compact_versioned(path)
    agg2 = metadata_aggregate(path)
    assert agg2["minmax_exact"] is True
    assert agg2["n_rows"] == 70
    assert agg2["columns"]["k"] == [0, 69]


# ------------------------------------------------- z-order clustering


def test_zorder_clustering_prunes_both_dimensions(spark):
    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.lakehouse import (
        cluster_versioned, merge_into_versioned_parquet, plan_files,
        read_versioned, with_bucket_partition,
    )
    from flink_cdc_dsql_master_spark.schema import Schema

    rows = [(i, i % 32, (i * 7) % 32) for i in range(512)]
    b1 = (spark.createDataFrame(rows, "k long, a long, b long")
          .withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="zo_tbl_"), "t")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", 2), schema)
    before = {(r["k"], r["a"], r["b"])
              for r in read_versioned(spark, path).collect()}
    with pytest.raises(ValueError, match="exactly one"):
        cluster_versioned(path, "a", zorder_cols=["a", "b"])
    r = cluster_versioned(path, zorder_cols=["a", "b"],
                          files_per_partition=8)
    assert r["clustered"]
    q = [("a", 0, 7), ("b", 0, 7)]
    plan = plan_files(path, key_range=q)
    # a narrow box on (a, b) must skip most of the 16 z-ordered files
    assert plan["skipped"] >= plan["total"] // 2
    # logical content unchanged, and the row filter returns the exact box
    after = {(r2["k"], r2["a"], r2["b"])
             for r2 in read_versioned(spark, path).collect()}
    assert after == before
    got = {(r3["a"], r3["b"])
           for r3 in read_versioned(spark, path, key_range=q).collect()}
    assert got == {(a, b) for _, a, b in rows if a <= 7 and b <= 7}


# -------------------------------------------- hidden partition transforms


def test_day_transform_hidden_partition_pruning(spark):
    import datetime as dt

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, partitions_for_range, plan_files,
        read_versioned, with_transform_partition,
    )
    from flink_cdc_dsql_master_spark.schema import Schema

    base = dt.datetime(2026, 3, 1, 0, 30)
    rows = [(i, base + dt.timedelta(hours=i), float(i))
            for i in range(96)]                       # 4 days hourly
    b1 = (spark.createDataFrame(rows, "k long, ts timestamp, v double")
          .withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="hp_tbl_"), "t")
    merge_into_versioned_parquet(
        path, with_transform_partition(b1, "day(ts)"), schema)

    lo, hi = dt.datetime(2026, 3, 2), dt.datetime(2026, 3, 3, 23, 59)
    parts = partitions_for_range("day(ts)", lo, hi)
    assert parts == ("range", "2026-03-02", "2026-03-03")
    plan = plan_files(path, parts=parts)
    assert plan["skipped"] >= 2 and plan["total"] >= 4   # 2 of 4 days out
    got = (read_versioned(spark, path, parts=parts)
           .where((F.col("ts") >= lo) & (F.col("ts") <= hi)))
    want = [(k, ts, v) for k, ts, v in rows if lo <= ts <= hi]
    assert sorted((r["k"], r["ts"], r["v"]) for r in got.collect()) \
        == sorted(want)


def test_truncate_transform_set_pruning(spark):
    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, partitions_for_range, plan_files,
        read_versioned, with_transform_partition,
    )
    from flink_cdc_dsql_master_spark.schema import Schema

    b1 = (spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double")
        .withColumn(OP_COLUMN, F.lit("+I"))
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="hp_tr_"), "t")
    merge_into_versioned_parquet(
        path, with_transform_partition(b1, "truncate(10, k)"), schema)
    parts = partitions_for_range("truncate(10, k)", 35, 54)
    assert parts == ("set", ["30", "40", "50"])
    plan = plan_files(path, parts=parts)
    assert plan["total"] - plan["skipped"] == 3     # 3 of 10 width-10 bins
    got = (read_versioned(spark, path, parts=parts)
           .where(F.col("k").between(35, 54)))
    assert sorted(r["k"] for r in got.collect()) == list(range(35, 55))


def test_dv_carry_forward_is_key_aware_across_partition_move(spark):
    """ADVICE r5: a key deleted (DV'd) while living in partition A, then
    re-upserted into partition B (mutable partition transform moved it),
    must come back — the carried tombstone may not suppress the new
    image via the PK-only anti-join in read_versioned."""
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, read_versioned)

    rows = [(i, float(i), f"p{i % 4}") for i in range(20)]
    base = spark.createDataFrame(rows, "k long, price double, part string")
    schema = Schema.of(base.drop("part").schema, primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="dv_move_"), "t")
    b1 = (base.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    merge_into_versioned_parquet(path, b1, schema)
    # DV-delete key 3 (lives in part p3)
    delete_versioned(spark, path, F.col("k") == 3, ["k"])
    assert 3 not in {r["k"] for r in
                     read_versioned(spark, path).collect()}
    # re-upsert key 3 into a DIFFERENT partition (p0)
    up = spark.createDataFrame([(3, 999.0, "p0")],
                               "k long, price double, part string") \
        .withColumn(OP_COLUMN, F.lit("+U")) \
        .withColumn(SEQ_COLUMN, F.lit(2).cast("long"))
    merge_into_versioned_parquet(path, up, schema)
    got = {r["k"]: r["price"] for r in
           read_versioned(spark, path).collect()}
    assert got[3] == 999.0  # resurrected, not suppressed


def test_track_partition_moves_rewrites_old_partition(spark):
    """ADVICE r5: with a mutable partition column, an upsert that moves
    a key must not leave the old image live in the untouched partition.
    track_partition_moves=True extends the rewrite set with the key's
    current partition."""
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, read_versioned)

    rows = [(i, float(i), f"d{i % 3}") for i in range(12)]
    base = spark.createDataFrame(rows, "k long, price double, part string")
    schema = Schema.of(base.drop("part").schema, primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="move_tbl_"), "t")
    b1 = (base.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    merge_into_versioned_parquet(path, b1, schema)
    # key 5 lived in d2; its update lands in d0 (partition moved)
    up = spark.createDataFrame([(5, 555.0, "d0")],
                               "k long, price double, part string") \
        .withColumn(OP_COLUMN, F.lit("+U")) \
        .withColumn(SEQ_COLUMN, F.lit(2).cast("long"))
    r = merge_into_versioned_parquet(path, up, schema,
                                     track_partition_moves=True)
    assert set(r["rewritten"]) >= {"d0"}
    rows2 = read_versioned(spark, path).collect()
    ks = [row["k"] for row in rows2]
    assert sorted(ks) == sorted(set(ks)), "duplicate PK after move"
    got = {row["k"]: row["price"] for row in rows2}
    assert got[5] == 555.0


def test_bloom_canonicalizes_numeric_representations(spark):
    """ADVICE r5: Decimal('7.0000') at index time vs 7.0 / 7 literals at
    plan time must hash identically — a representation mismatch is a
    silent false-negative prune (missing rows)."""
    from decimal import Decimal

    from flink_cdc_dsql_master_spark.lakehouse import (_bloom_canon,
                                                       _bloom_hashes)

    assert _bloom_canon(Decimal("7.0000")) == _bloom_canon(7.0) \
        == _bloom_canon(7)
    assert _bloom_canon(Decimal("7.2500")) == _bloom_canon(7.25)
    assert _bloom_canon("7") != _bloom_canon(7)  # strings stay distinct
    assert _bloom_hashes(Decimal("42.00"), 1024, 4) == \
        _bloom_hashes(42, 1024, 4)


def test_bloom_index_rejects_temporal_column(spark):
    """Temporal literals have no canonical text form — indexing must
    fail fast instead of silently mis-pruning later."""
    import datetime

    from flink_cdc_dsql_master_spark.lakehouse import (
        index_bloom_versioned, merge_into_versioned_parquet)

    rows = [(i, datetime.datetime(2024, 1, 1 + i)) for i in range(5)]
    base = spark.createDataFrame(rows, "k long, ts timestamp")
    schema = Schema.of(base.schema, primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="bloom_ts_"), "t")
    b1 = (base.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", 4), schema)
    with pytest.raises(ValueError, match="temporal"):
        index_bloom_versioned(path, "ts")
