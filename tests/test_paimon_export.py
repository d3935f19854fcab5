"""Paimon export face (reference capability
flink-cdc-pipeline-connector-paimon/): layout conformance to the public
Paimon spec pages (snapshot/schema JSON shapes, Avro manifest chain,
relative file-name resolution) plus the strict on-disk round-trip."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.lakehouse import (
    merge_into_versioned_parquet, with_bucket_partition)
from flink_cdc_dsql_master_spark.paimon_export import (
    MANIFEST_ENTRY_SCHEMA, MANIFEST_FILE_META_SCHEMA, export_paimon,
    read_paimon)
from flink_cdc_dsql_master_spark.schema import Schema


def _versioned_table(spark, base):
    df = spark.range(1, 201).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("price"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string"))
        .alias("status"))
    b1 = (df.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    b2 = (df.where(F.col("k") % 4 == 0)
          .withColumn("price", F.col("price") + 100.0)
          .withColumn(OP_COLUMN, F.lit("+U"))
          .withColumn(SEQ_COLUMN, F.lit(2).cast("long"))
          .unionByName(df.where(F.col("k") % 9 == 0)
                       .withColumn(OP_COLUMN, F.lit("-D"))
                       .withColumn(SEQ_COLUMN, F.lit(2).cast("long"))))
    schema = Schema.of(df.schema, primary_keys=["k"])
    path = os.path.join(base, "t_ver")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", 4), schema)
    merge_into_versioned_parquet(
        path, with_bucket_partition(b2, "k", 4), schema)
    return path, df


def test_export_roundtrip_and_layout(spark):
    base = tempfile.mkdtemp(prefix="paimon_exp_")
    path, df = _versioned_table(spark, base)
    dest = os.path.join(base, "t_paimon")
    info = export_paimon(spark, path, dest)
    assert info["rows"] > 0 and info["files"] > 0

    # layout: spec directories + hints + relative names
    assert open(os.path.join(dest, "snapshot", "LATEST")).read() == "1"
    snap = json.load(open(os.path.join(dest, "snapshot", "snapshot-1")))
    assert snap["commitKind"] == "APPEND" and snap["schemaId"] == 0
    assert "/" not in snap["baseManifestList"]  # bare file names
    assert snap["totalRecordCount"] == info["rows"]
    sch = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert [f["name"] for f in sch["fields"]] == ["k", "price", "status"]
    assert sch["fields"][0]["id"] == 0
    assert sch["primaryKeys"] == [] and sch["options"]["bucket"] == "-1"
    assert all(n.startswith("data-") and n.endswith(".parquet")
               for n in os.listdir(os.path.join(dest, "bucket-0")))
    # no staging residue; data files live ONLY under bucket-0
    assert sorted(os.listdir(dest)) == ["bucket-0", "manifest",
                                        "schema", "snapshot"]

    # strict on-disk round-trip vs the source snapshot
    back = read_paimon(spark, dest).select("k", "price", "status")
    from flink_cdc_dsql_master_spark.lakehouse import read_versioned
    want = read_versioned(spark, path).select("k", "price", "status")
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0
    assert back.schema["k"].dataType.simpleString() == "bigint"


def test_manifest_delete_entries_fold(spark):
    """A DELETE manifest entry (compaction rewrite) removes its file
    from the live set — the manifest-chain fold a real reader does."""
    from flink_cdc_dsql_master_spark.avro_io import (read_container,
                                                     write_container)

    base = tempfile.mkdtemp(prefix="paimon_fold_")
    path, _ = _versioned_table(spark, base)
    dest = os.path.join(base, "t_paimon")
    export_paimon(spark, path, dest)
    man_dir = os.path.join(dest, "manifest")
    snap = json.load(open(os.path.join(dest, "snapshot", "snapshot-1")))
    _, metas = read_container(
        os.path.join(man_dir, snap["deltaManifestList"]))
    _, entries = read_container(
        os.path.join(man_dir, metas[0]["_FILE_NAME"]))
    victim = entries[0]["_FILE"]["_FILE_NAME"]

    before = read_paimon(spark, dest).count()
    victim_rows = entries[0]["_FILE"]["_ROW_COUNT"]

    # append a second manifest deleting the first file, referenced by a
    # second delta in a snapshot-2
    delete_entry = dict(entries[0], _KIND=1)
    mlen = write_container(os.path.join(man_dir, "manifest-del-0"),
                           MANIFEST_ENTRY_SCHEMA, [delete_entry])
    write_container(
        os.path.join(man_dir, "manifest-list-del-1"),
        MANIFEST_FILE_META_SCHEMA,
        [{"_VERSION": 2, "_FILE_NAME": "manifest-del-0",
          "_FILE_SIZE": mlen, "_NUM_ADDED_FILES": 0,
          "_NUM_DELETED_FILES": 1,
          "_PARTITION_STATS": {"_MIN_VALUES": b"", "_MAX_VALUES": b"",
                               "_NULL_COUNTS": None},
          "_SCHEMA_ID": 0}])
    snap2 = dict(snap, id=2,
                 baseManifestList=snap["deltaManifestList"],
                 deltaManifestList="manifest-list-del-1",
                 commitKind="COMPACT")
    with open(os.path.join(dest, "snapshot", "snapshot-2"), "w") as f:
        json.dump(snap2, f)
    with open(os.path.join(dest, "snapshot", "LATEST"), "w") as f:
        f.write("2")

    after = read_paimon(spark, dest)
    assert after.count() == before - victim_rows
    files = [os.path.basename(p) for p in
             after.select(F.input_file_name()).distinct().collect()
             for p in [p[0]]]
    assert victim not in files


def test_unmappable_type_fails_loudly(spark):
    from flink_cdc_dsql_master_spark.paimon_export import _paimon_field
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="no paimon mapping"):
        _paimon_field(0, T.StructField(
            "m", T.MapType(T.StringType(), T.LongType())))
    f = _paimon_field(3, T.StructField("d", T.DecimalType(12, 2), False))
    assert f == {"id": 3, "name": "d", "type": "DECIMAL(12, 2) NOT NULL"}


def test_import_paimon_bootstraps_versioned_table(spark):
    """Paimon warehouse → versioned lakehouse migration: the imported
    table time-travels and merges like a native one."""
    from flink_cdc_dsql_master_spark.lakehouse import read_versioned
    from flink_cdc_dsql_master_spark.paimon_export import import_paimon

    base = tempfile.mkdtemp(prefix="paimon_imp_")
    path, df = _versioned_table(spark, base)
    dest = os.path.join(base, "t_paimon")
    export_paimon(spark, path, dest)

    schema = Schema.of(df.schema, primary_keys=["k"])
    newpath = os.path.join(base, "t_reborn")
    info = import_paimon(spark, dest, newpath, schema, n_buckets=4)
    assert info["version"] == 1
    want = read_versioned(spark, path).select("k", "price", "status")
    got = read_versioned(spark, newpath).select("k", "price", "status")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_reexport_leaves_no_orphans(spark):
    """Re-exporting to the same dest is a fresh export: no data file
    from the previous run survives unreferenced next to the new
    snapshot."""
    base = tempfile.mkdtemp(prefix="paimon_re_")
    path, _ = _versioned_table(spark, base)
    dest = os.path.join(base, "t_paimon")
    export_paimon(spark, path, dest)
    first = set(os.listdir(os.path.join(dest, "bucket-0")))
    export_paimon(spark, path, dest)
    second = set(os.listdir(os.path.join(dest, "bucket-0")))
    assert not (first & second)  # old files gone, only the new run's
    back = read_paimon(spark, dest)
    assert back.count() > 0


def test_yaml_paimon_sink_e2e(spark, tmp_path):
    """The reference pipeline's `sink: type: paimon` shape: values
    source → transform → route → keyed LWW apply → Paimon append-table
    layout, read back strictly through the on-disk chain."""
    from tests.test_pipeline_compose import transform_table

    from flink_cdc_dsql_master_spark.compose import BatchComposer
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon
  path: "{base}"
transform:
  - source-table: default_namespace.default_schema.\\.*
    projection: "id, UPPER(name) AS name, age"
route:
  - source-table: default_namespace.default_schema.\\.*
    sink-table: warehouse.db.people
pipeline:
  name: to-paimon
""")
    pipe.source.config["script"] = transform_table()
    BatchComposer(spark, pipe).run()
    back = read_paimon(spark, f"{base}/people")
    got = sorted((r["id"], r["name"], r["age"]) for r in back.collect())
    assert got == [(1, "ALICE", 18), (2, "BOB", 30)]
    assert os.path.exists(f"{base}/people/snapshot/LATEST")


def test_schema_parser_accepts_external_spellings():
    from flink_cdc_dsql_master_spark.paimon_export import \
        _schema_from_paimon
    from pyspark.sql import types as T

    st = _schema_from_paimon({"fields": [
        {"id": 0, "name": "a", "type": "VARCHAR(32) NOT NULL"},
        {"id": 1, "name": "b", "type": "TIMESTAMP(3)"},
        {"id": 2, "name": "c", "type": "NUMERIC(8, 3)"},
        {"id": 3, "name": "d", "type": "VARBINARY(16)"}]})
    assert [f.dataType for f in st.fields] == [
        T.StringType(), T.TimestampType(), T.DecimalType(8, 3),
        T.BinaryType()]
    assert st.fields[0].nullable is False

    with pytest.raises(ValueError, match="unsupported paimon type"):
        _schema_from_paimon({"fields": [
            {"id": 0, "name": "m", "type": "MAP<INT, INT>"}]})


def test_append_snapshot_chain_and_time_travel(spark, tmp_path):
    """Multi-snapshot appends (the reference streaming PaimonSink's
    per-checkpoint commit cadence): snapshot-2's base re-lists
    snapshot-1's manifests, LATEST advances while EARLIEST stays, and
    snapshot_id= pins a historical read (scan.snapshot-id)."""
    from flink_cdc_dsql_master_spark.paimon_export import (append_paimon,
                                                           write_paimon)

    dest = str(tmp_path / "t")
    df1 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    df2 = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    write_paimon(spark, df1, dest)
    info = append_paimon(spark, df2, dest)
    assert info["snapshot_id"] == 2

    assert open(os.path.join(dest, "snapshot", "LATEST")).read() == "2"
    assert open(os.path.join(dest, "snapshot", "EARLIEST")).read() == "1"
    snap2 = json.load(open(os.path.join(dest, "snapshot", "snapshot-2")))
    assert snap2["totalRecordCount"] == 150
    assert snap2["deltaRecordCount"] == 50

    assert read_paimon(spark, dest).count() == 150
    assert read_paimon(spark, dest, snapshot_id=1).count() == 100

    # schema drift on append fails loudly
    bad = spark.range(3).select(F.col("id").alias("other"))
    with pytest.raises(ValueError, match="do not match schema-0"):
        append_paimon(spark, bad, dest)


def test_paimon_append_sink_writer(spark, tmp_path):
    """The streaming sink_writer face: per-batch snapshots for
    insert-only streams; retractions fail loudly."""
    from flink_cdc_dsql_master_spark.paimon_export import \
        make_paimon_append_sink_writer
    from flink_cdc_dsql_master_spark.schema import TableId

    base = str(tmp_path / "wh")
    writer = make_paimon_append_sink_writer(base)
    tid = TableId.parse("wh.db.logs")
    b1 = spark.createDataFrame([(1, "a", "+I", 1), (2, "b", "+I", 2)],
                               f"id long, v string, {OP_COLUMN} string, "
                               f"{SEQ_COLUMN} long")
    b2 = spark.createDataFrame([(3, "c", "+I", 3)],
                               f"id long, v string, {OP_COLUMN} string, "
                               f"{SEQ_COLUMN} long")
    writer(tid, b1, None)
    writer(tid, b2, None)
    got = read_paimon(spark, f"{base}/logs")
    assert sorted((r["id"], r["v"]) for r in got.collect()) == \
        [(1, "a"), (2, "b"), (3, "c")]
    assert read_paimon(spark, f"{base}/logs",
                       snapshot_id=1).count() == 2

    upd = spark.createDataFrame([(1, "x", "+U", 4)],
                                f"id long, v string, {OP_COLUMN} string, "
                                f"{SEQ_COLUMN} long")
    with pytest.raises(ValueError, match="insert-only"):
        writer(tid, upd, None)


def test_compact_paimon_rewrites_live_set(spark, tmp_path):
    """COMPACT snapshot: DELETE entries retire every pre-compaction
    file, the rewritten files carry the rows, time travel still reads
    the pre-compaction snapshots, and a post-compaction append chains
    on normally."""
    from flink_cdc_dsql_master_spark.paimon_export import (append_paimon,
                                                           compact_paimon,
                                                           write_paimon)

    dest = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    write_paimon(spark, mk(0, 60), dest)
    append_paimon(spark, mk(60, 100), dest)
    before_files = set(os.listdir(os.path.join(dest, "bucket-0")))

    info = compact_paimon(spark, dest)
    assert info["snapshot_id"] == 3 and info["rows"] == 100
    assert info["compacted"] == len(before_files)

    snap3 = json.load(open(os.path.join(dest, "snapshot", "snapshot-3")))
    assert snap3["commitKind"] == "COMPACT"
    assert snap3["deltaRecordCount"] == 0  # rewrite adds no rows

    after = read_paimon(spark, dest)
    assert after.count() == 100
    used = {os.path.basename(p[0]) for p in
            after.select(F.input_file_name()).distinct().collect()}
    assert not (used & before_files)  # only rewritten files are read
    # history intact
    assert read_paimon(spark, dest, snapshot_id=2).count() == 100
    assert read_paimon(spark, dest, snapshot_id=1).count() == 60

    append_paimon(spark, mk(100, 110), dest)
    assert read_paimon(spark, dest).count() == 110


def test_expire_snapshots_reclaims_compacted_files(spark, tmp_path):
    """snapshot.num-retained retention: expiring the pre-compaction
    snapshots reclaims exactly the files no retained snapshot can see;
    the retained chain keeps reading, and time travel to an expired id
    fails cleanly (its snapshot file is gone)."""
    from flink_cdc_dsql_master_spark.paimon_export import (
        append_paimon, compact_paimon, expire_paimon_snapshots,
        write_paimon)

    dest = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    write_paimon(spark, mk(0, 60), dest)
    append_paimon(spark, mk(60, 100), dest)
    pre_compact = set(os.listdir(os.path.join(dest, "bucket-0")))
    compact_paimon(spark, dest)

    # keep_last=2 retains snapshots 2 and 3 — snapshot 2 still sees the
    # pre-compaction files, so nothing may be reclaimed yet
    info = expire_paimon_snapshots(spark, dest, keep_last=2)
    assert info["expired"] == 1 and info["data_files_deleted"] == 0
    assert read_paimon(spark, dest, snapshot_id=2).count() == 100

    info = expire_paimon_snapshots(spark, dest, keep_last=1)
    assert info["expired"] == 1
    assert info["data_files_deleted"] == len(pre_compact)
    left = set(os.listdir(os.path.join(dest, "bucket-0")))
    assert not (left & pre_compact)

    assert read_paimon(spark, dest).count() == 100
    assert open(os.path.join(dest, "snapshot", "EARLIEST")).read() == "3"
    with pytest.raises(FileNotFoundError):
        read_paimon(spark, dest, snapshot_id=1)


def test_manifest_entry_avro_roundtrip_property(tmp_path):
    """Property: arbitrary ManifestEntry records (nested DataFileMeta,
    nullable unions, arrays, bytes) survive the container round-trip
    byte-exactly — the codec claim the whole paimon face rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_cdc_dsql_master_spark.avro_io import (read_container,
                                                     write_container)

    names = st.text(alphabet="abcdefg-0123456789.", min_size=1,
                    max_size=40)
    longs = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
    nonneg = st.integers(min_value=0, max_value=2 ** 63 - 1)
    entry = st.fixed_dictionaries({
        "_VERSION": st.just(2),
        "_KIND": st.integers(min_value=0, max_value=1),
        "_PARTITION": st.binary(max_size=32),
        "_BUCKET": st.integers(min_value=0, max_value=4096),
        "_TOTAL_BUCKETS": st.sampled_from([-1, 1, 16]),
        "_FILE": st.fixed_dictionaries({
            "_FILE_NAME": names,
            "_FILE_SIZE": nonneg,
            "_ROW_COUNT": nonneg,
            "_MIN_KEY": st.binary(max_size=16),
            "_MAX_KEY": st.binary(max_size=16),
            "_KEY_STATS": st.fixed_dictionaries({
                "_MIN_VALUES": st.binary(max_size=16),
                "_MAX_VALUES": st.binary(max_size=16),
                "_NULL_COUNTS": st.none() | st.lists(
                    longs, max_size=4)}),
            "_VALUE_STATS": st.fixed_dictionaries({
                "_MIN_VALUES": st.binary(max_size=16),
                "_MAX_VALUES": st.binary(max_size=16),
                "_NULL_COUNTS": st.none() | st.lists(
                    longs, max_size=4)}),
            "_MIN_SEQUENCE_NUMBER": longs,
            "_MAX_SEQUENCE_NUMBER": longs,
            "_SCHEMA_ID": nonneg,
            "_LEVEL": st.integers(min_value=0, max_value=5),
            "_EXTRA_FILES": st.lists(names, max_size=3),
            "_CREATION_TIME": st.none() | nonneg,
            "_DELETE_ROW_COUNT": st.none() | nonneg,
            "_EMBEDDED_FILE_INDEX": st.none() | st.binary(max_size=8),
            "_FILE_SOURCE": st.none() | st.integers(min_value=0,
                                                    max_value=1),
        }),
    })

    @settings(max_examples=40, deadline=None)
    @given(st.lists(entry, max_size=5))
    def roundtrip(entries):
        p = str(tmp_path / "m.avro")
        write_container(p, MANIFEST_ENTRY_SCHEMA, entries)
        schema, back = read_container(p)
        assert back == entries
        assert schema == MANIFEST_ENTRY_SCHEMA

    roundtrip()


def test_compact_preserves_sequence_ranges(spark, tmp_path):
    """ADVICE r11: compaction used to restart sequence numbers at 0
    while the consumed chain occupied 0..N-1, so an external reader
    ordering on _MIN/_MAX_SEQUENCE_NUMBER could mis-order, and a later
    append (seq_base = totalRecordCount) overlapped the compacted
    range. The rewritten files now span exactly the consumed entries'
    sequence range, and a post-compaction append stays disjoint."""
    from flink_cdc_dsql_master_spark.avro_io import read_container
    from flink_cdc_dsql_master_spark.paimon_export import (append_paimon,
                                                           compact_paimon,
                                                           write_paimon)

    dest = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    write_paimon(spark, mk(0, 60), dest)
    append_paimon(spark, mk(60, 100), dest)
    compact_paimon(spark, dest)
    append_paimon(spark, mk(100, 110), dest)

    def entries(snap_id):
        snap = json.load(open(os.path.join(
            dest, "snapshot", f"snapshot-{snap_id}")))
        out = []
        for lst in (snap["baseManifestList"], snap["deltaManifestList"]):
            if not lst:
                continue
            _, metas = read_container(os.path.join(dest, "manifest", lst))
            for m in metas:
                _, es = read_container(
                    os.path.join(dest, "manifest", m["_FILE_NAME"]))
                out.extend(es)
        return out

    from flink_cdc_dsql_master_spark.paimon_export import (_KIND_ADD,
                                                           _KIND_DELETE)
    compacted = [e["_FILE"] for e in entries(3)
                 if e["_KIND"] == _KIND_ADD and e["_FILE"].get(
                     "_FILE_SOURCE") == 1]
    consumed = [e["_FILE"] for e in entries(3)
                if e["_KIND"] == _KIND_DELETE]
    assert compacted and consumed
    assert (min(f["_MIN_SEQUENCE_NUMBER"] for f in compacted)
            == min(f["_MIN_SEQUENCE_NUMBER"] for f in consumed))
    assert (max(f["_MAX_SEQUENCE_NUMBER"] for f in compacted)
            == max(f["_MAX_SEQUENCE_NUMBER"] for f in consumed) == 99)
    # the post-compaction append's range is disjoint above the rewrite
    appended = [e["_FILE"] for e in entries(4) if e["_KIND"] == _KIND_ADD
                and e["_FILE"].get("_FILE_SOURCE") != 1
                and e["_FILE"]["_MIN_SEQUENCE_NUMBER"] >= 100]
    assert appended
    assert min(f["_MIN_SEQUENCE_NUMBER"] for f in appended) == 100


def test_batch_keyless_paimon_rejects_retractions(spark, tmp_path):
    """ADVICE r11: the batch composer's keyless paimon branch silently
    appended -U/-D rows as ordinary data (the streaming face raised).
    Both faces now fail loudly on a retraction in a keyless changelog."""
    from flink_cdc_dsql_master_spark.compose import BatchComposer
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml
    from flink_cdc_dsql_master_spark.testing import EventScript

    t1 = "default_namespace.default_schema.table1"
    script = EventScript()
    script.create_table(t1, Schema.of(
        [("id", "INT NOT NULL"), ("name", "STRING")], primary_keys=[]))
    script.insert(t1, (1, "Alice"), (2, "Bob"))
    script.delete(t1, (2, "Bob"))

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon
  path: "{base}"
pipeline:
  name: keyless-retraction
""")
    pipe.source.config["script"] = script
    with pytest.raises(ValueError, match="insert-only"):
        BatchComposer(spark, pipe).run()
