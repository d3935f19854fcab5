"""Iceberg-format export of a versioned-lakehouse snapshot.

The reference ships pipeline connectors writing Paimon / Iceberg tables
(``flink-cdc-pipeline-connector-iceberg/``,
``flink-cdc-pipeline-connector-paimon/``) so downstream engines with an
existing catalog can read CDC output natively. This module is the export
face of that capability for the in-repo versioned lakehouse
(:mod:`.lakehouse`): :func:`export_iceberg` materializes a pinned
snapshot as an **Iceberg v2 table layout** —

    dest/data/*.parquet                      (snapshot rows, DVs applied)
    dest/metadata/manifest-*.avro            (one data-file entry per file)
    dest/metadata/snap-*.avro                (the manifest list)
    dest/metadata/v1.metadata.json           (table metadata, spec v2)
    dest/metadata/version-hint.text          (HadoopTables pointer)

following the public Iceberg table-spec (format-version 2): field-id'd
schemas, unpartitioned spec, append snapshot with sequence number 1, and
Avro manifest/manifest-list files per the spec's required v2 fields.
Manifests are written with the repo's own minimal Avro codec
(:mod:`.avro_io`) because no Avro library exists in this environment.

Verification honesty: the sandbox has no external Iceberg reader (DuckDB
cannot install its iceberg extension offline), so :func:`read_iceberg`
re-reads the export strictly through the on-disk layout — version-hint →
metadata.json → manifest-list Avro (decoded against the embedded writer
schema) → manifest Avro → live parquet files — and the conformance query
hash-checks the round-trip against an oracle recomputing the expected
snapshot from pristine inputs. That proves layout + codec fidelity
in-sandbox; cross-engine reads are documented as the first thing a real
deployment should smoke-test.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, types as T

from .avro_io import read_container, write_container
from .lakehouse import (_load_manifest, _local, list_versions,
                        read_versioned)

_SPARK_TO_ICEBERG = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.DateType: "date",
    T.TimestampType: "timestamptz",
    T.BinaryType: "binary",
}


def _iceberg_schema(schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        if isinstance(f.dataType, T.DecimalType):
            t = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        else:
            try:
                t = _SPARK_TO_ICEBERG[type(f.dataType)]
            except KeyError:
                raise ValueError(
                    f"no iceberg mapping for column {f.name!r} type "
                    f"{f.dataType.simpleString()}") from None
        fields.append({"id": i, "name": f.name,
                       "required": not f.nullable, "type": t})
    return {"type": "struct", "schema-id": 0, "fields": fields}


# Iceberg spec v2 manifest-entry schema (required fields only; column
# stats are optional and omitted). field-id attributes ride along in the
# Avro schema JSON exactly as the spec requires for name-independent
# resolution.
_DATA_FILE = {
    "type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition",
         "type": {"type": "record", "name": "r102", "fields": []},
         "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ],
}
MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _DATA_FILE, "field-id": 2},
    ],
}

# Iceberg spec v2 manifest-list entry (manifest_file) — all v2-required.
MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_ADDED = 1  # manifest-entry status
_DATA = 0   # content: data (not deletes)


def export_iceberg(spark, path: str, dest: str,
                   version: int | None = None) -> dict:
    """Export a pinned versioned-lakehouse snapshot as an Iceberg v2
    table at ``dest``. Returns {version, snapshot_id, rows, files,
    dest}. Like :func:`.lakehouse.export_snapshot` this is a full
    materialized copy (tombstones/DVs applied) — the share face for an
    engine that owns an Iceberg catalog but knows nothing about the
    in-family manifest log."""
    import pyarrow.parquet as pq

    df: DataFrame = read_versioned(spark, path, version)
    # the in-family bucket-partition column is manifest plumbing, not
    # table data — an external engine must not see it
    part_col = _load_manifest(_local(path),
                              list_versions(path)[-1]
                              if version is None else version)["part_col"]
    if part_col in df.columns:
        df = df.drop(part_col)
    local = _local(dest)
    data_dir = os.path.join(local, "data")
    meta_dir = os.path.join(local, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(data_dir)

    files = []
    total_rows = 0
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(data_dir, name)
        n = pq.read_metadata(fp).num_rows
        files.append((fp, n, os.path.getsize(fp)))
        total_rows += n

    src_versions = list_versions(path)
    v = src_versions[-1] if version is None else version
    snapshot_id = 1000 + v  # deterministic per exported version
    run = uuid.uuid4().hex

    manifest_path = os.path.join(meta_dir, f"manifest-{run}.avro")
    entries = [{
        "status": _ADDED, "snapshot_id": snapshot_id,
        "sequence_number": 1, "file_sequence_number": 1,
        "data_file": {
            "content": _DATA, "file_path": fp, "file_format": "PARQUET",
            "partition": {}, "record_count": n, "file_size_in_bytes": sz,
        },
    } for fp, n, sz in files]
    mlen = write_container(
        manifest_path, MANIFEST_ENTRY_SCHEMA, entries,
        metadata={"schema": json.dumps(
            _iceberg_schema(df.schema)).encode("utf-8"),
            "partition-spec": b"[]", "partition-spec-id": b"0",
            "format-version": b"2", "content": b"data"})

    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1-{run}.avro")
    write_container(list_path, MANIFEST_FILE_SCHEMA, [{
        "manifest_path": manifest_path, "manifest_length": mlen,
        "partition_spec_id": 0, "content": _DATA,
        "sequence_number": 1, "min_sequence_number": 1,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files), "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": total_rows,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }])

    now_ms = int(time.time() * 1000)
    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": local,
        "last-sequence-number": 1,
        "last-updated-ms": now_ms,
        "last-column-id": len(df.schema.fields),
        "current-schema-id": 0,
        "schemas": [_iceberg_schema(df.schema)],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id,
                          "type": "branch"}},
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": 1,
            "timestamp-ms": now_ms,
            "summary": {"operation": "append",
                        "added-data-files": str(len(files)),
                        "added-records": str(total_rows)},
            "manifest-list": list_path,
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id,
                          "timestamp-ms": now_ms}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return {"version": v, "snapshot_id": snapshot_id, "rows": total_rows,
            "files": len(files), "dest": local}


def read_iceberg(spark, dest: str) -> DataFrame:
    """Read an Iceberg table strictly through its on-disk layout — the
    independent verification path for :func:`export_iceberg` (and a
    reader for any unpartitioned v2 table whose manifests use the codec
    subset :mod:`.avro_io` supports)."""
    local = _local(dest)
    meta_dir = os.path.join(local, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = f.read().strip()
    with open(os.path.join(meta_dir, f"v{hint}.metadata.json")) as f:
        meta = json.load(f)
    snap_id = meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == snap_id)
    _, manifests = read_container(snap["manifest-list"])
    paths = []
    for m in manifests:
        _, entries = read_container(m["manifest_path"])
        for e in entries:
            # status 2 = DELETED; content 0 = data files
            if e["status"] != 2 and e["data_file"]["content"] == _DATA:
                paths.append(e["data_file"]["file_path"])
    if not paths:
        raise ValueError(f"{dest}: snapshot {snap_id} lists no data files")
    return spark.read.parquet(*paths)


def import_iceberg(spark, src: str, path: str, schema,
                   part_col: str = "part", n_buckets: int = 16) -> dict:
    """Bootstrap a versioned-lakehouse table from an Iceberg table's
    current snapshot — the inverse face of :func:`export_iceberg`, and
    the migration path for a user with an existing Iceberg catalog: rows
    land as one +I changelog batch through the normal merge, so
    stats/blooms/manifest discipline apply from version 1 (exactly like
    :func:`.lakehouse.import_snapshot` over plain parquet)."""
    from .events import OP_COLUMN, SEQ_COLUMN
    from .lakehouse import (merge_into_versioned_parquet,
                            with_bucket_partition)
    from pyspark.sql import functions as F

    df = read_iceberg(spark, src)
    b = (df.withColumn(OP_COLUMN, F.lit("+I"))
         .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    b = with_bucket_partition(b, schema.primary_keys[0], n_buckets,
                              part_col)
    return merge_into_versioned_parquet(path, b, schema, part_col)
