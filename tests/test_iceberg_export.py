"""Iceberg export face: Avro codec conformance + layout round-trip."""

from __future__ import annotations

import io
import json
import os

import pytest

from flink_cdc_dsql_master_spark.avro_io import (decode_value, encode_value,
                                                 read_container,
                                                 write_container)


def test_avro_zigzag_golden_bytes():
    """Pin the varint-zigzag encoding against the Avro spec's own
    published examples (spec §Binary encoding: 0→00, -1→01, 1→02,
    -2→03, 2→04, -64→7f, 64→80 01)."""
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
             2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, expect in cases.items():
        buf = io.BytesIO()
        encode_value(buf, n, "long")
        assert buf.getvalue() == expect, n
        assert decode_value(io.BytesIO(expect), "long") == n


def test_avro_record_union_roundtrip():
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "double"}},
        {"name": "d", "type": {"type": "map", "values": "int"}},
        {"name": "e", "type": {"type": "record", "name": "empty",
                               "fields": []}},
    ]}
    rec = {"a": -123456789, "b": None, "c": [1.5, -2.25],
           "d": {"x": 1, "y": -7}, "e": {}}
    rec2 = {"a": 7, "b": "héllo", "c": [], "d": {}, "e": {}}
    buf = io.BytesIO()
    encode_value(buf, rec, schema)
    encode_value(buf, rec2, schema)
    buf.seek(0)
    assert decode_value(buf, schema) == rec
    assert decode_value(buf, schema) == rec2


def test_avro_container_roundtrip(tmp_path):
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"}]}
    recs = [{"k": i, "s": f"row{i}"} for i in range(257)]
    p = str(tmp_path / "t.avro")
    write_container(p, schema, recs, metadata={"custom": b"tag"})
    got_schema, got = read_container(p)
    assert got == recs
    assert got_schema == schema


def test_iceberg_layout_and_roundtrip(spark, sf_dir, tmp_path):
    """The exported layout is spec-shaped: v2 metadata.json with
    field-id'd schema, manifest-list → manifest → data files; read-back
    through the layout equals the source snapshot."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.iceberg_export import (export_iceberg,
                                                            read_iceberg)
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, read_versioned, with_bucket_partition)
    from flink_cdc_dsql_master_spark.schema import Schema

    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select(F.col("o_orderkey").alias("k"),
                   F.col("o_totalprice").alias("price"))
           .limit(500)
           .withColumn(OP_COLUMN, F.lit("+I"))
           .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(spark.read.parquet(f"{sf_dir}/orders.parquet")
                       .select(F.col("o_orderkey").alias("k"),
                               F.col("o_totalprice").alias("price")).schema,
                       primary_keys=["k"])
    path = str(tmp_path / "ver")
    merge_into_versioned_parquet(
        path, with_bucket_partition(src, "k", 4), schema)
    dest = str(tmp_path / "ice")
    info = export_iceberg(spark, path, dest)
    assert info["rows"] == 500 and info["files"] >= 1

    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        meta = json.load(f)
    assert meta["format-version"] == 2
    fields = meta["schemas"][0]["fields"]
    assert [f["name"] for f in fields] == ["k", "price"]
    assert all(isinstance(f["id"], int) for f in fields)
    snap = meta["snapshots"][0]
    assert snap["snapshot-id"] == meta["current-snapshot-id"]
    # spec: file_path/manifest_path/manifest-list are full URIs
    assert snap["manifest-list"].startswith("file://")
    _, manifests = read_container(snap["manifest-list"][7:])
    assert manifests[0]["added_rows_count"] == 500
    assert manifests[0]["added_files_count"] == info["files"]
    assert manifests[0]["manifest_path"].startswith("file://")

    back = read_iceberg(spark, dest).orderBy("k")
    exp = read_versioned(spark, path).drop("part").orderBy("k")
    assert back.collect() == exp.collect()


def test_avro_property_roundtrip(tmp_path):
    """Property: any value assembled from the codec's supported types
    survives an encode → container write → read → decode round-trip."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {"type": "record", "name": "p", "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": "boolean"},
        {"name": "arr", "type": {"type": "array",
                                 "items": ["null", "long"]}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}
    rec_st = st.fixed_dictionaries({
        "i": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        "s": st.none() | st.text(max_size=40),
        "b": st.booleans(),
        "arr": st.lists(st.none() | st.integers(min_value=-(2 ** 31),
                                                max_value=2 ** 31),
                        max_size=8),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10),
                             max_size=5),
    })

    counter = [0]

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec_st, max_size=10))
    def check(recs):
        counter[0] += 1
        p = str(tmp_path / f"prop_{counter[0]}.avro")
        write_container(p, schema, recs)
        got_schema, got = read_container(p)
        assert got == recs
        assert got_schema == schema

    check()


def test_iceberg_rejects_unmappable_type(spark, tmp_path):
    from flink_cdc_dsql_master_spark.iceberg_export import _iceberg_schema

    df = spark.range(1).selectExpr("array(1, 2) AS a")
    with pytest.raises(ValueError, match="no iceberg mapping"):
        _iceberg_schema(df.schema)


def test_export_iceberg_inplace_zero_copy(spark, tmp_path):
    """VERDICT r9 #6: the zero-copy export writes ONLY metadata —
    manifest entries reference the versioned table's existing parquet
    by file:// URI (pinned: no data files under dest), carry min/max
    bound maps from the commit-time footer stats, and the strict
    layout re-read equals the source snapshot."""
    import json
    import os

    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.iceberg_export import (
        export_iceberg_inplace, read_iceberg)
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, read_versioned,
        with_bucket_partition)
    from flink_cdc_dsql_master_spark.schema import Schema

    src = (spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("price"))
        .withColumn(OP_COLUMN, F.lit("+I"))
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(src.drop(OP_COLUMN, SEQ_COLUMN).schema,
                       primary_keys=["k"])
    path = str(tmp_path / "ver")
    merge_into_versioned_parquet(
        path, with_bucket_partition(src, "k", 4), schema)

    dest = str(tmp_path / "ice_inplace")
    info = export_iceberg_inplace(spark, path, dest)
    assert info["rows"] == 500
    assert info["data_files_copied"] == 0
    # ZERO data files under dest — metadata only
    assert not os.path.exists(os.path.join(dest, "data"))
    assert sorted(os.listdir(dest)) == ["metadata"]

    # every manifest entry points INTO the source table by URI and
    # carries bound maps for the PK column
    from flink_cdc_dsql_master_spark.avro_io import read_container

    with open(os.path.join(dest, "metadata", "v1.metadata.json")) as f:
        meta = json.load(f)
    snap = meta["snapshots"][0]
    _, manifests = read_container(snap["manifest-list"][7:])
    _, entries = read_container(manifests[0]["manifest_path"][7:])
    assert entries, "no manifest entries"
    import struct

    for e in entries:
        fp = e["data_file"]["file_path"]
        assert fp.startswith("file://") and path in fp
        lb = e["data_file"]["lower_bounds"]
        ub = e["data_file"]["upper_bounds"]
        assert lb and ub  # commit-time stats present for the PK
        lo = struct.unpack("<q", dict(
            (b["key"], b["value"]) for b in lb)[1])[0]
        hi = struct.unpack("<q", dict(
            (b["key"], b["value"]) for b in ub)[1])[0]
        assert 0 <= lo <= hi <= 499

    back = read_iceberg(spark, dest).orderBy("k")
    exp = read_versioned(spark, path).drop("part").orderBy("k")
    assert back.collect() == exp.collect()


def test_export_iceberg_inplace_refuses_dv(spark, tmp_path):
    """A snapshot with outstanding deletion vectors cannot be expressed
    as a plain data-file manifest — the in-place export must refuse
    loudly instead of resurrecting deleted rows."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.iceberg_export import \
        export_iceberg_inplace
    from flink_cdc_dsql_master_spark.lakehouse import (
        delete_versioned, merge_into_versioned_parquet,
        with_bucket_partition)
    from flink_cdc_dsql_master_spark.schema import Schema

    src = (spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .withColumn(OP_COLUMN, F.lit("+I"))
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(src.drop(OP_COLUMN, SEQ_COLUMN).schema,
                       primary_keys=["k"])
    path = str(tmp_path / "ver_dv")
    merge_into_versioned_parquet(
        path, with_bucket_partition(src, "k", 4), schema)
    delete_versioned(spark, path, "k % 10 = 0", ["k"])

    with _pytest.raises(ValueError, match="deletion-vector"):
        export_iceberg_inplace(spark, path, str(tmp_path / "ice2"))


def test_read_iceberg_bound_map_data_skipping(spark, tmp_path):
    """The in-place export's bound maps are FUNCTIONAL: a key_range read
    skips every file whose bounds prove disjointness (pinned by counting
    kept paths), and the result still exactly equals the row-level
    filter."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.iceberg_export import (
        export_iceberg_inplace, read_iceberg)
    from flink_cdc_dsql_master_spark.lakehouse import (
        merge_into_versioned_parquet, with_bucket_partition)
    from flink_cdc_dsql_master_spark.schema import Schema

    # range-partitioned keys → per-file key ranges are disjoint
    src = (spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("v"))
        .withColumn(OP_COLUMN, F.lit("+I"))
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(src.drop(OP_COLUMN, SEQ_COLUMN).schema,
                       primary_keys=["k"])
    path = str(tmp_path / "ver")
    # bucket on k: each of the 8 partitions holds a hash slice; instead
    # use a range-ish partition by k // 500 so bounds are informative
    b = src.withColumn("part", (F.col("k") / 500).cast("int"))
    merge_into_versioned_parquet(path, b, schema)
    dest = str(tmp_path / "ice")
    export_iceberg_inplace(spark, path, dest)

    full = read_iceberg(spark, dest)
    narrow = read_iceberg(spark, dest, key_range=("k", 100, 150))
    rows = narrow.orderBy("k").collect()
    assert [r["k"] for r in rows] == list(range(100, 151))
    # pruning evidence: the narrow read must touch fewer files
    n_full = full.rdd.getNumPartitions()
    n_narrow = narrow.rdd.getNumPartitions()
    assert n_narrow < n_full
    # fully-disjoint range → zero files, empty frame, schema intact
    empty = read_iceberg(spark, dest, key_range=("k", 10 ** 9,
                                                 2 * 10 ** 9))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "v"]
