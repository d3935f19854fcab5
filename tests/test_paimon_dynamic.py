"""Paimon PK dynamic-bucket mode + changelog-producer (VERDICT r12
next-round #4/#5): stable hash-index bucket assignment growing with the
keyspace, spec index layout (big-endian int32 HASH files + avro index
manifest, snapshot.indexManifest), compaction preserving assignment,
and the `changelog-producer: input` face round-tripping through
read_paimon_pk_changelog."""

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.avro_io import read_container
from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.paimon_pk import (
    DYNAMIC_BUCKET,
    _read_hash_file,
    append_paimon_pk,
    compact_paimon_pk,
    read_paimon_pk,
    read_paimon_pk_changelog,
    write_paimon_pk,
)
from flink_cdc_dsql_master_spark.schema import Schema


def _cl(spark, rows):
    return spark.createDataFrame(
        rows, f"k int, name string, v double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


SCHEMA = Schema.of([("k", "INT NOT NULL"), ("name", "STRING"),
                    ("v", "DOUBLE")], primary_keys=["k"])


def _snapshot(dest, sid=None):
    snap_dir = os.path.join(dest, "snapshot")
    if sid is None:
        sid = int(open(os.path.join(snap_dir, "LATEST")).read())
    with open(os.path.join(snap_dir, f"snapshot-{sid}")) as f:
        return json.load(f)


def _index_map(dest):
    """hash → bucket from the LATEST snapshot's index."""
    snap = _snapshot(dest)
    name = snap["indexManifest"]
    _, entries = read_container(os.path.join(dest, "index", name))
    out = {}
    for e in entries:
        for h in _read_hash_file(
                os.path.join(dest, "index", str(e["_FILE_NAME"]))):
            out[h] = int(e["_BUCKET"])
    return out


def test_dynamic_bucket_grows_and_stays_stable(spark, tmp_path):
    dest = str(tmp_path / "t")
    # target 10 rows/bucket: 25 keys → 3 buckets
    write_paimon_pk(spark, _cl(spark, [
        (i, f"n{i}", float(i), "+I", 1) for i in range(25)
    ]), dest, SCHEMA, buckets=DYNAMIC_BUCKET,
        dynamic_bucket_target_rows=10)

    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["options"]["bucket"] == "-1"
    assert sj["options"]["dynamic-bucket.target-row-num"] == "10"

    idx1 = _index_map(dest)
    assert len(idx1) == 25
    buckets1 = set(idx1.values())
    assert buckets1 == {0, 1, 2}
    # per-bucket occupancy respects the target
    from collections import Counter
    occ = Counter(idx1.values())
    assert occ[0] == 10 and occ[1] == 10 and occ[2] == 5

    # append: 10 existing keys updated + 20 new → bucket 2 fills to
    # 10, new buckets open; existing assignments NEVER move
    append_paimon_pk(spark, _cl(spark, [
        (i, f"u{i}", float(i) + 0.5, "+U", 2) for i in range(10)
    ] + [
        (i, f"n{i}", float(i), "+I", 2) for i in range(25, 45)
    ]), dest)
    idx2 = _index_map(dest)
    assert len(idx2) == 45
    for h, b in idx1.items():
        assert idx2[h] == b  # stability
    occ2 = Counter(idx2.values())
    assert occ2[2] == 10 and max(occ2) >= 3  # grew past 3 buckets
    assert all(c <= 10 for c in occ2.values())

    # merge-on-read state exact
    got = {r["k"]: (r["name"], r["v"])
           for r in read_paimon_pk(spark, dest).collect()}
    assert len(got) == 45
    assert got[3] == ("u3", 3.5) and got[30] == ("n30", 30.0)

    # layout: bucket dirs on disk match the index's bucket set
    dirs = {d for d in os.listdir(dest) if d.startswith("bucket-")}
    assert {f"bucket-{b}" for b in occ2} <= dirs


def test_dynamic_bucket_stable_across_restart_and_replay(spark,
                                                         tmp_path):
    """A 'restart' is just a fresh writer against the same table — the
    index is table metadata, so assignment survives; a replayed
    commitIdentifier commits nothing and leaves the index untouched."""
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1),
                                       (2, "b", 2.0, "+I", 2)]),
                    dest, SCHEMA, buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=2,
                    commit_identifier=0)
    idx1 = _index_map(dest)
    append_paimon_pk(spark, _cl(spark, [(1, "a2", 1.5, "+U", 3),
                                        (3, "c", 3.0, "+I", 4)]),
                     dest, commit_identifier=1)
    idx2 = _index_map(dest)
    assert all(idx2[h] == b for h, b in idx1.items())
    snap_before = _snapshot(dest)

    # crash-replay of batch 1: no snapshot, no index change
    out = append_paimon_pk(spark, _cl(spark, [(1, "a2", 1.5, "+U", 3)]),
                           dest, commit_identifier=1)
    assert out.get("skipped") is True
    assert _snapshot(dest) == snap_before

    got = sorted((r["k"], r["name"]) for r in
                 read_paimon_pk(spark, dest).collect())
    assert got == [(1, "a2"), (2, "b"), (3, "c")]


def test_dynamic_bucket_compaction_preserves_assignment(spark,
                                                        tmp_path):
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [
        (i, f"n{i}", float(i), "+I", 1) for i in range(12)
    ]), dest, SCHEMA, buckets=DYNAMIC_BUCKET,
        dynamic_bucket_target_rows=5)
    append_paimon_pk(spark, _cl(spark, [
        (2, "x", 9.0, "+U", 2), (5, "y", 9.0, "-D", 3)]), dest)
    idx = _index_map(dest)
    before = sorted((r["k"], r["name"], r["v"])
                    for r in read_paimon_pk(spark, dest).collect())
    compact_paimon_pk(spark, dest)
    after = sorted((r["k"], r["name"], r["v"])
                   for r in read_paimon_pk(spark, dest).collect())
    assert after == before
    # compacted files live in the buckets the index assigns: walk the
    # post-compaction manifests
    from flink_cdc_dsql_master_spark.paimon_pk import _live_paths
    import pyarrow.parquet as pq
    khash_of = {r["k"]: r["h"] for r in
                _cl(spark, [(k, "", 0.0, "+I", 1)
                            for k in range(12)])
                .select("k", F.hash("k").alias("h")).collect()}
    for path, _sid, _p in _live_paths(dest):
        b = int(os.path.basename(os.path.dirname(path))
                .split("-", 1)[1])
        t = pq.read_table(path, columns=["_KEY_k"])
        for k in t["_KEY_k"].to_pylist():
            assert idx[khash_of[k]] == b
    # the compaction snapshot carries the index forward
    assert _snapshot(dest)["indexManifest"] is not None


def test_dynamic_bucket_partitioned_with_null_partition(spark,
                                                        tmp_path):
    """Dynamic buckets + hive partitions, INCLUDING a NULL partition
    value (__HIVE_DEFAULT_PARTITION__): the assignment joins must be
    null-safe — a plain column-equality join would silently DROP the
    null partition's rows (inner join) instead of assigning them."""
    from flink_cdc_dsql_master_spark.paimon_pk import append_paimon_pk

    dest = str(tmp_path / "t")
    schema = Schema.of([("k", "INT NOT NULL"), ("dt", "INT"),
                        ("v", "DOUBLE")],
                       primary_keys=["k"], partition_keys=["dt"])

    def cl(rows):
        return spark.createDataFrame(
            rows, f"k int, dt int, v double, {OP_COLUMN} string, "
                  f"{SEQ_COLUMN} long")

    write_paimon_pk(spark, cl([
        (1, 0, 1.0, "+I", 1), (2, 1, 2.0, "+I", 2),
        (3, None, 3.0, "+I", 3),      # NULL partition value
        (4, None, 4.0, "+I", 4),
    ]), dest, schema, buckets=DYNAMIC_BUCKET,
        dynamic_bucket_target_rows=2)
    # stability for the null partition across a second commit
    append_paimon_pk(spark, cl([
        (3, None, 3.5, "+U", 5), (5, None, 5.0, "+I", 6),
    ]), dest)

    got = sorted((r["k"], r["dt"], r["v"])
                 for r in read_paimon_pk(spark, dest).collect())
    assert got == [(1, 0, 1.0), (2, 1, 2.0), (3, None, 3.5),
                   (4, None, 4.0), (5, None, 5.0)]
    assert os.path.isdir(
        os.path.join(dest, "dt=__HIVE_DEFAULT_PARTITION__"))


def test_compaction_merges_index_files(spark, tmp_path):
    """Per-commit index files accumulate one per touched bucket;
    compaction rewrites each bucket's chain as ONE sorted hash file
    with an identical hash→bucket mapping."""
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA, buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=100)
    for i in range(2, 6):  # 4 more commits touching bucket 0
        append_paimon_pk(spark, _cl(spark,
                                    [(i, f"n{i}", float(i), "+I", i)]),
                         dest)
    idx_before = _index_map(dest)
    snap = _snapshot(dest)
    _, entries = read_container(
        os.path.join(dest, "index", snap["indexManifest"]))
    assert len(entries) == 5  # one file per commit

    compact_paimon_pk(spark, dest)
    idx_after = _index_map(dest)
    assert idx_after == idx_before
    snap2 = _snapshot(dest)
    _, entries2 = read_container(
        os.path.join(dest, "index", snap2["indexManifest"]))
    assert len(entries2) == 1  # merged to one file per bucket
    # merged file is sorted (binary-search-friendly)
    hs = _read_hash_file(os.path.join(
        dest, "index", str(entries2[0]["_FILE_NAME"])))
    assert hs == sorted(hs) and len(hs) == 5


def test_changelog_producer_roundtrip(spark, tmp_path):
    """write upserts/deletes over three commits → read the changelog →
    reapply → hash-equal to merge-on-read state; snapshots carry
    changelogManifestList + changelogRecordCount."""
    from flink_cdc_dsql_master_spark.partitioning import apply_changelog

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [
        (1, "a", 1.0, "+I", 1), (2, "b", 2.0, "+I", 2),
        (3, "c", 3.0, "+I", 3)]),
        dest, SCHEMA, buckets=2, changelog_producer="input")
    append_paimon_pk(spark, _cl(spark, [
        (2, "b2", 2.5, "+U", 4), (4, "d", 4.0, "+I", 5)]), dest)
    append_paimon_pk(spark, _cl(spark, [(3, "c", 3.0, "-D", 6)]), dest)

    snap = _snapshot(dest)
    assert snap["changelogManifestList"]
    assert snap["changelogRecordCount"] == 1  # the -D commit

    cl = read_paimon_pk_changelog(spark, dest)
    ops = sorted((r["k"], r[OP_COLUMN]) for r in cl.collect())
    assert ops == [(1, "+I"), (2, "+I"), (2, "+U"), (3, "+I"),
                   (3, "-D"), (4, "+I")]

    reapplied = sorted(
        (r["k"], r["name"], r["v"])
        for r in apply_changelog(cl, ["k"]).select(
            "k", "name", "v").collect())
    state = sorted((r["k"], r["name"], r["v"])
                   for r in read_paimon_pk(spark, dest).collect())
    assert reapplied == state == [(1, "a", 1.0), (2, "b2", 2.5),
                                  (4, "d", 4.0)]

    # changelog files are hard-links of the data files (no extra bytes)
    linked = 0
    for dirpath, _d, names in os.walk(dest):
        for n in names:
            if n.startswith("changelog-"):
                assert os.stat(os.path.join(dirpath, n)).st_nlink >= 2
                linked += 1
    assert linked >= 3


def test_changelog_plus_dynamic_and_expire_gc(spark, tmp_path):
    """Both options together; expiring old snapshots reclaims their
    changelog files but keeps live data + the index."""
    from flink_cdc_dsql_master_spark.paimon_export import (
        expire_paimon_snapshots)

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA, buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=4,
                    changelog_producer="input")
    append_paimon_pk(spark, _cl(spark, [(2, "b", 2.0, "+I", 2)]), dest)
    append_paimon_pk(spark, _cl(spark, [(1, "a2", 1.1, "+U", 3)]), dest)

    cl_files_before = [os.path.join(dp, n)
                       for dp, _d, ns in os.walk(dest) for n in ns
                       if n.startswith("changelog-")]
    assert len(cl_files_before) == 3
    expire_paimon_snapshots(spark, dest, keep_last=1)
    cl_files_after = [os.path.join(dp, n)
                      for dp, _d, ns in os.walk(dest) for n in ns
                      if n.startswith("changelog-")]
    # snapshots 1-2 expired → their changelog files reclaimed
    assert len(cl_files_after) == 1
    # live data + index intact
    got = sorted((r["k"], r["name"])
                 for r in read_paimon_pk(spark, dest).collect())
    assert got == [(1, "a2"), (2, "b")]
    assert len(_index_map(dest)) == 2


def test_changelog_producer_rejects_unknown_mode(spark, tmp_path):
    with pytest.raises(ValueError, match="changelog-producer"):
        write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                        str(tmp_path / "t"), SCHEMA,
                        changelog_producer="lookup")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.sets(st.integers(min_value=0, max_value=60),
                        min_size=1, max_size=25),
                min_size=1, max_size=3),
       st.integers(min_value=2, max_value=7))
def test_assignment_matches_reference_model(spark, tmp_path_factory,
                                            batches, target):
    """Property: for ANY commit sequence and target size, the
    distributed assigner equals the slow sequential reference —
    sorted-by-hash fill of existing buckets to target, then new
    buckets — and never moves a key."""
    from pyspark.sql import functions as F

    dest = str(tmp_path_factory.mktemp("dynprop") / "t")

    # reference model, keyed by the SAME hash the engine uses
    keys = sorted({k for b in batches for k in b})
    hrows = spark.createDataFrame([(k,) for k in keys], "k int") \
        .select("k", F.hash("k").alias("h")).collect()
    h_of = {r["k"]: r["h"] for r in hrows}
    ref: dict[int, int] = {}
    counts: dict[int, int] = {}
    for batch in batches:
        for h in sorted(h_of[k] for k in batch):
            if h in ref:
                continue
            for b in sorted(counts) + [max(counts, default=-1) + 1]:
                if counts.get(b, 0) < target:
                    ref[h] = b
                    counts[b] = counts.get(b, 0) + 1
                    break

    first = True
    for i, batch in enumerate(batches):
        cl = _cl(spark, [(k, f"n{k}", float(k), "+I", i + 1)
                         for k in sorted(batch)])
        if first:
            write_paimon_pk(spark, cl, dest, SCHEMA,
                            buckets=DYNAMIC_BUCKET,
                            dynamic_bucket_target_rows=target)
            first = False
        else:
            append_paimon_pk(spark, cl, dest)

    assert _index_map(dest) == ref
    got = sorted(r["k"] for r in read_paimon_pk(spark, dest).collect())
    assert got == keys


def test_schema_carried_target_rows_wins_unless_kwarg_passed(spark):
    """ADVICE r14: a schema-carried 'dynamic-bucket.target-row-num'
    passes through unless the caller EXPLICITLY passes the kwarg —
    the default no longer silently overwrites it."""
    import shutil
    import tempfile

    import flink_cdc_dsql_master_spark.paimon_pk as P

    def mkdest():
        d = tempfile.mkdtemp(prefix="tr_opt_")
        shutil.rmtree(d)
        return d

    cl = (spark.range(0, 10)
          .select(F.col("id").cast("int").alias("k"),
                  (F.col("id") * 1.0).alias("v"))
          .withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    base_schema = Schema.of([("k", "INT NOT NULL"), ("v", "DOUBLE")],
                            primary_keys=["k"])
    carried = Schema(base_schema.struct, base_schema.primary_keys,
                     base_schema.partition_keys,
                     {"dynamic-bucket.target-row-num": "7"},
                     base_schema.comment)

    dest = mkdest()
    write_paimon_pk(spark, cl, dest, carried, buckets=DYNAMIC_BUCKET)
    assert P._pk_options(P._local(dest))[
        "dynamic-bucket.target-row-num"] == "7"

    dest = mkdest()
    write_paimon_pk(spark, cl, dest, carried, buckets=DYNAMIC_BUCKET,
                    dynamic_bucket_target_rows=3)
    assert P._pk_options(P._local(dest))[
        "dynamic-bucket.target-row-num"] == "3"

    dest = mkdest()  # neither carried nor passed → documented default
    write_paimon_pk(spark, cl, dest, base_schema,
                    buckets=DYNAMIC_BUCKET)
    assert P._pk_options(P._local(dest))[
        "dynamic-bucket.target-row-num"] == \
        str(P.DEFAULT_DYNAMIC_BUCKET_TARGET_ROWS)
