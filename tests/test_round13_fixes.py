"""Round-13 fixes (ADVICE r12): DATE primary-key / partition columns in
Paimon PK tables, fail-loud unsupported partition types, atomic
commitIdentifier snapshot writes, the NULL-op keyless-paimon guard, and
the escape-aware DDL quote walks."""

import datetime
import json
import os

import pytest
from pyspark.sql import types as T

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.paimon_pk import (
    parse_binary_row,
    read_paimon_pk,
    serialize_binary_row,
    write_paimon_pk,
)
from flink_cdc_dsql_master_spark.schema import Schema, TableId

D = datetime.date


# -- DATE BinaryRow + PK/partition columns (ADVICE r12 medium) ---------------

def test_binary_row_date_roundtrip():
    fields = [T.StructField("dt", T.DateType()),
              T.StructField("k", T.IntegerType())]
    data = serialize_binary_row([D(2024, 3, 1), 7], fields)
    assert parse_binary_row(data, fields) == [D(2024, 3, 1), 7]
    # ISO strings (what hive-path parsing used to hand over raw) and
    # pre-converted epoch-day ints both serialize to the same bytes
    assert serialize_binary_row(["2024-03-01", 7], fields) == data
    epoch_days = (D(2024, 3, 1) - D(1970, 1, 1)).days
    assert serialize_binary_row([epoch_days, 7], fields) == data
    # nulls still ride the null bits
    assert parse_binary_row(
        serialize_binary_row([None, 1], fields), fields) == [None, 1]


def _date_cl(spark, rows):
    return spark.createDataFrame(
        rows, f"k int, dt date, v double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


def test_date_primary_key_pk_table(spark, tmp_path):
    """A DATE column IN the primary key: parquet footer stats hand back
    datetime.date — the manifest key bounds must serialize (used to
    TypeError on int(date))."""
    dest = str(tmp_path / "t")
    schema = Schema.of(
        [("k", "INT NOT NULL"), ("dt", "DATE NOT NULL"), ("v", "DOUBLE")],
        primary_keys=["k", "dt"])
    cl = _date_cl(spark, [
        (1, D(2024, 1, 1), 1.0, "+I", 1),
        (1, D(2024, 1, 2), 2.0, "+I", 2),
        (1, D(2024, 1, 1), 1.5, "+U", 3),   # update one (k, dt)
        (2, D(2024, 1, 2), 9.0, "+I", 4),
    ])
    write_paimon_pk(spark, cl, dest, schema, buckets=2)
    got = sorted((r["k"], r["dt"], r["v"])
                 for r in read_paimon_pk(spark, dest).collect())
    assert got == [(1, D(2024, 1, 1), 1.5), (1, D(2024, 1, 2), 2.0),
                   (2, D(2024, 1, 2), 9.0)]


def test_date_partition_key_pk_table(spark, tmp_path):
    """A DATE partition column: hive dirs are the ISO form, manifest
    _PARTITION BinaryRows carry epoch days (NOT the empty row), and
    merge-on-read re-attaches typed date values."""
    from flink_cdc_dsql_master_spark.avro_io import read_container
    from flink_cdc_dsql_master_spark.paimon_export import \
        _EMPTY_BINARY_ROW

    dest = str(tmp_path / "t")
    schema = Schema.of(
        [("k", "INT NOT NULL"), ("dt", "DATE NOT NULL"), ("v", "DOUBLE")],
        primary_keys=["k"], partition_keys=["dt"])
    cl = _date_cl(spark, [
        (1, D(2024, 1, 1), 1.0, "+I", 1),
        (2, D(2024, 1, 2), 2.0, "+I", 2),
        (1, D(2024, 1, 1), 1.5, "+U", 3),
    ])
    write_paimon_pk(spark, cl, dest, schema, buckets=2)

    assert os.path.isdir(os.path.join(dest, "dt=2024-01-01"))
    assert os.path.isdir(os.path.join(dest, "dt=2024-01-02"))

    # every manifest _PARTITION deserializes to a real date
    man_dir = os.path.join(dest, "manifest")
    part_fields = [T.StructField("dt", T.DateType())]
    seen = set()
    for name in os.listdir(man_dir):
        if not name.startswith("manifest-") or "list" in name:
            continue
        _, entries = read_container(os.path.join(man_dir, name))
        for e in entries:
            assert bytes(e["_PARTITION"]) != _EMPTY_BINARY_ROW
            seen.add(parse_binary_row(bytes(e["_PARTITION"]),
                                      part_fields)[0])
    assert seen == {D(2024, 1, 1), D(2024, 1, 2)}

    got = sorted((r["k"], r["dt"], r["v"])
                 for r in read_paimon_pk(spark, dest).collect())
    assert got == [(1, D(2024, 1, 1), 1.5), (2, D(2024, 1, 2), 2.0)]


def test_unsupported_partition_type_fails_at_create(spark, tmp_path):
    """A DOUBLE partition key can't serialize into a _PARTITION
    BinaryRow — table create must refuse instead of writing manifests
    whose EMPTY partition rows resolve wrong file paths."""
    schema = Schema.of(
        [("k", "INT NOT NULL"), ("w", "DOUBLE")],
        primary_keys=["k"], partition_keys=["w"])
    cl = spark.createDataFrame(
        [(1, 0.5, "+I", 1)],
        f"k int, w double, {OP_COLUMN} string, {SEQ_COLUMN} long")
    with pytest.raises(ValueError, match="partition key"):
        write_paimon_pk(spark, cl, str(tmp_path / "t"), schema,
                        buckets=2)


# -- atomic commitIdentifier (ADVICE r12 low) ---------------------------------

def test_snapshot_written_once_with_real_identifier(spark, tmp_path):
    """The snapshot JSON carries its real commitIdentifier from the
    first write — there is no rewrite window after LATEST advances in
    which a crash leaves the batch sentinel behind."""
    import flink_cdc_dsql_master_spark.paimon_export as pe

    dest = str(tmp_path / "t")
    schema = Schema.of([("k", "INT NOT NULL"), ("v", "DOUBLE")],
                       primary_keys=["k"])
    cl = spark.createDataFrame(
        [(1, 1.0, "+I", 1)],
        f"k int, v double, {OP_COLUMN} string, {SEQ_COLUMN} long")

    writes = []
    real_open = open

    def spying_open(path, mode="r", *a, **kw):
        if "w" in mode and os.path.basename(str(path)).startswith(
                "snapshot-"):
            writes.append(str(path))
        return real_open(path, mode, *a, **kw)

    import builtins
    orig = builtins.open
    builtins.open = spying_open
    try:
        write_paimon_pk(spark, cl, dest, schema, buckets=1,
                        commit_identifier=42)
    finally:
        builtins.open = orig

    snap_writes = [p for p in writes if p.endswith("snapshot-1")]
    assert len(snap_writes) == 1  # written ONCE, not write-then-rewrite
    with open(os.path.join(dest, "snapshot", "snapshot-1")) as f:
        snap = json.load(f)
    assert snap["commitIdentifier"] == 42
    assert snap["commitIdentifier"] != pe._BATCH_COMMIT_IDENTIFIER


# -- NULL-op keyless guard (ADVICE r12 low) -----------------------------------

def test_keyless_paimon_null_op_fails_loudly(spark, tmp_path):
    """A NULL op row must trip the insert-only guard too — plain
    `!= '+I'` drops NULLs under three-valued logic and appends them as
    ordinary data."""
    from flink_cdc_dsql_master_spark.compose import (BatchComposer,
                                                     PipelineResult)
    from flink_cdc_dsql_master_spark.pipeline import parse_pipeline_yaml

    base = str(tmp_path / "warehouse")
    pipe = parse_pipeline_yaml(f"""
source:
  type: values
sink:
  type: paimon
  path: "{base}"
pipeline:
  name: null-op-guard
""")
    comp = BatchComposer(spark, pipe)
    df = spark.createDataFrame(
        [(1, "a", "+I", 1), (2, "b", None, 2)],
        f"id int, name string, {OP_COLUMN} string, {SEQ_COLUMN} long")
    schema = Schema.of([("id", "INT NOT NULL"), ("name", "STRING")],
                       primary_keys=[])
    tid = TableId.parse("default_namespace.default_schema.t1")
    with pytest.raises(ValueError, match="insert-only"):
        comp._default_sink(tid, df, schema, PipelineResult())
