"""Paimon-format export of a versioned-lakehouse snapshot.

The reference ships a Paimon pipeline connector
(``flink-cdc-pipeline-connector-paimon/`` — ``PaimonMetadataApplier.java``
creates/alters tables through the Paimon catalog, ``PaimonWriter.java`` /
``PaimonCommitter.java`` write data files and commit snapshots) so
downstream engines with a Paimon catalog can read CDC output natively.
This module is that capability's export face for the in-repo versioned
lakehouse (:mod:`.lakehouse`): :func:`export_paimon` materializes a
pinned snapshot as an **Apache Paimon append-table layout** —

    dest/schema/schema-0                    (table schema, JSON)
    dest/snapshot/snapshot-1 + LATEST/EARLIEST hints
    dest/manifest/manifest-list-*-{0,1}     (base = empty, delta; Avro)
    dest/manifest/manifest-*-0              (one entry per file; Avro)
    dest/bucket-0/data-*.parquet            (snapshot rows, DVs applied)

following the public Paimon table spec (paimon.apache.org, "Concepts →
Spec": Snapshot / Schema / Manifest / DataFile): an unpartitioned
append table (no primary keys, ``bucket = -1`` unaware mode, all files
at level 0 in ``bucket-0/``), snapshot id 1 of kind APPEND with the
batch commit identifier (Long.MAX_VALUE, what Paimon's
BatchWriteBuilder commits under). Manifests are Avro object-container
files written with the repo's own codec (:mod:`.avro_io`) using
Paimon's serializer field naming (``_VERSION``/``_KIND``/``_FILE``…);
file names inside snapshot/manifest/data-file metadata are RELATIVE
(bare file names), resolved against ``manifest/`` and
``bucket-<n>/`` exactly as Paimon resolves them.

Two deliberate simplifications, both legal Paimon values, documented
here for the cross-engine smoke test a real deployment should run
first: per-file key/value stats are written as Paimon's EMPTY stats
(arity-0 BinaryRow min/max + null counts absent — "no pruning
information", the ``metadata.stats-mode = none`` shape), and the
``_PARTITION`` of every entry is the arity-0 BinaryRow (unpartitioned
table). BinaryRow values ride in the length-prefixed segment form
``SerializationUtils.serializeBinaryRow`` uses: 4-byte big-endian
length + the row's fixed part (an arity-0 row is its 8-byte
header/null-bits word).

There is no zero-copy variant: Paimon resolves data-file names
RELATIVE to the table's bucket directory (the newer external-path
field is not universal), so an in-place export cannot reference the
lakehouse's existing files the way :func:`.iceberg_export.
export_iceberg_inplace` does — Iceberg stays the zero-copy face, and
:func:`export_paimon` documents itself as a materialized copy.

Verification honesty: no external Paimon reader exists in this
environment, so :func:`read_paimon` re-reads the export strictly
through the on-disk layout — LATEST hint → snapshot JSON → base +
delta manifest lists (Avro, decoded against the embedded writer
schema) → manifests → ADD/DELETE entry folding → bucket-relative
parquet — and the conformance query hash-checks the round-trip against
an oracle recomputing the expected snapshot from pristine inputs.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid

from pyspark.sql import DataFrame, types as T

from .avro_io import read_container, write_container
from .lakehouse import _load_manifest, _local, list_versions, read_versioned

# Paimon SQL-style type strings (spec "Data Types")
_SPARK_TO_PAIMON = {
    T.BooleanType: "BOOLEAN",
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.StringType: "STRING",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP(6)",
    T.BinaryType: "BYTES",
}

# Paimon's batch commits all carry this identifier
# (BatchWriteBuilder semantics: one terminal commit, MAX_VALUE)
_BATCH_COMMIT_IDENTIFIER = (1 << 63) - 1

# an arity-0 BinaryRow in serializeBinaryRow's length-prefixed segment
# form: 4-byte length + the row's 8-byte header/null-bits word
_EMPTY_BINARY_ROW = struct.pack(">i", 8) + b"\x00" * 8

# SimpleStats with no information (metadata.stats-mode = none):
# empty min/max rows, null counts absent
_EMPTY_STATS = {"_MIN_VALUES": _EMPTY_BINARY_ROW,
                "_MAX_VALUES": _EMPTY_BINARY_ROW,
                "_NULL_COUNTS": None}

_SIMPLE_STATS = {
    "type": "record", "name": "SimpleStats", "fields": [
        {"name": "_MIN_VALUES", "type": "bytes"},
        {"name": "_MAX_VALUES", "type": "bytes"},
        {"name": "_NULL_COUNTS",
         "type": ["null", {"type": "array", "items": "long"}],
         "default": None},
    ],
}

# ManifestEntry Avro record (spec "Manifest"; serializer field naming)
MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "org.apache.paimon.avro.generated.record",
    "fields": [
        {"name": "_VERSION", "type": "int"},
        {"name": "_KIND", "type": "int"},        # 0 = ADD, 1 = DELETE
        {"name": "_PARTITION", "type": "bytes"},  # serialized BinaryRow
        {"name": "_BUCKET", "type": "int"},
        {"name": "_TOTAL_BUCKETS", "type": "int"},
        {"name": "_FILE", "type": {
            "type": "record", "name": "DataFileMeta", "fields": [
                {"name": "_FILE_NAME", "type": "string"},
                {"name": "_FILE_SIZE", "type": "long"},
                {"name": "_ROW_COUNT", "type": "long"},
                {"name": "_MIN_KEY", "type": "bytes"},
                {"name": "_MAX_KEY", "type": "bytes"},
                {"name": "_KEY_STATS", "type": _SIMPLE_STATS},
                {"name": "_VALUE_STATS", "type": {
                    "type": "record", "name": "SimpleStats2",
                    "fields": _SIMPLE_STATS["fields"]}},
                {"name": "_MIN_SEQUENCE_NUMBER", "type": "long"},
                {"name": "_MAX_SEQUENCE_NUMBER", "type": "long"},
                {"name": "_SCHEMA_ID", "type": "long"},
                {"name": "_LEVEL", "type": "int"},
                {"name": "_EXTRA_FILES",
                 "type": {"type": "array", "items": "string"}},
                {"name": "_CREATION_TIME", "type": ["null", "long"],
                 "default": None},
                {"name": "_DELETE_ROW_COUNT", "type": ["null", "long"],
                 "default": None},
                {"name": "_EMBEDDED_FILE_INDEX",
                 "type": ["null", "bytes"], "default": None},
                {"name": "_FILE_SOURCE", "type": ["null", "int"],
                 "default": None},  # 0 = APPEND
            ]}},
    ],
}

# ManifestFileMeta Avro record (one row per manifest in a manifest list)
MANIFEST_FILE_META_SCHEMA = {
    "type": "record", "name": "org.apache.paimon.avro.generated.record",
    "fields": [
        {"name": "_VERSION", "type": "int"},
        {"name": "_FILE_NAME", "type": "string"},
        {"name": "_FILE_SIZE", "type": "long"},
        {"name": "_NUM_ADDED_FILES", "type": "long"},
        {"name": "_NUM_DELETED_FILES", "type": "long"},
        {"name": "_PARTITION_STATS", "type": _SIMPLE_STATS},
        {"name": "_SCHEMA_ID", "type": "long"},
    ],
}

_KIND_ADD, _KIND_DELETE = 0, 1


def _paimon_field(fid: int, f: T.StructField) -> dict:
    if isinstance(f.dataType, T.DecimalType):
        t = f"DECIMAL({f.dataType.precision}, {f.dataType.scale})"
    else:
        try:
            t = _SPARK_TO_PAIMON[type(f.dataType)]
        except KeyError:
            raise ValueError(
                f"no paimon mapping for column {f.name!r} type "
                f"{f.dataType.simpleString()}") from None
    if not f.nullable:
        t += " NOT NULL"
    return {"id": fid, "name": f.name, "type": t}


def _write_schema(local: str, schema: T.StructType) -> None:
    fields = [_paimon_field(i, f) for i, f in enumerate(schema.fields)]
    os.makedirs(os.path.join(local, "schema"), exist_ok=True)
    with open(os.path.join(local, "schema", "schema-0"), "w") as f:
        json.dump({
            "version": 3,
            "id": 0,
            "fields": fields,
            "highestFieldId": len(fields) - 1,
            "partitionKeys": [],
            "primaryKeys": [],
            "options": {"bucket": "-1"},  # unaware mode: append table
            "timeMillis": int(time.time() * 1000),
        }, f, indent=2)


def _write_snapshot(local: str, snap_id: int, base_list: str,
                    delta_list: str, total: int, delta: int,
                    earliest: bool = False, schema_id: int = 0,
                    commit_identifier=None,
                    changelog_list: str | None = None,
                    changelog_rows: int = 0,
                    index_manifest: str | None = None) -> None:
    """Write ``snapshot-<id>`` then advance LATEST. The snapshot JSON is
    written ONCE with its real ``commitIdentifier`` (default: the batch
    sentinel) — never rewritten after LATEST moves, so a crash can't
    leave a committed snapshot carrying the sentinel and let a replayed
    micro-batch slip past the idempotence filter."""
    snap_dir = os.path.join(local, "snapshot")
    os.makedirs(snap_dir, exist_ok=True)
    with open(os.path.join(snap_dir, f"snapshot-{snap_id}"), "w") as f:
        json.dump({
            "version": 3,
            "id": snap_id,
            "schemaId": schema_id,
            "baseManifestList": base_list,
            "deltaManifestList": delta_list,
            "changelogManifestList": changelog_list,
            "indexManifest": index_manifest,
            "commitUser": str(uuid.uuid4()),
            "commitIdentifier": (_BATCH_COMMIT_IDENTIFIER
                                 if commit_identifier is None
                                 else commit_identifier),
            "commitKind": "APPEND",
            "timeMillis": int(time.time() * 1000),
            "logOffsets": {},
            "totalRecordCount": total,
            "deltaRecordCount": delta,
            "changelogRecordCount": changelog_rows,
            "watermark": None,
        }, f, indent=2)
    with open(os.path.join(snap_dir, "LATEST"), "w") as f:
        f.write(str(snap_id))
    if earliest:
        with open(os.path.join(snap_dir, "EARLIEST"), "w") as f:
            f.write(str(snap_id))


def _stage_data_files(df: DataFrame, local: str):
    """Write ``df`` as parquet into ``local/bucket-0`` under fresh
    paimon data-file names. Returns (run_id, [(name, rows, size)],
    total_rows)."""
    import pyarrow.parquet as pq

    bucket_dir = os.path.join(local, "bucket-0")
    os.makedirs(bucket_dir, exist_ok=True)
    tmp = os.path.join(local, "_staging")
    df.write.mode("overwrite").parquet(tmp)

    run = uuid.uuid4().hex
    files = []  # (paimon_name, rows, size)
    total_rows = 0
    idx = 0
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        pname = f"data-{run}-{idx}.parquet"
        os.replace(os.path.join(tmp, name),
                   os.path.join(bucket_dir, pname))
        fp = os.path.join(bucket_dir, pname)
        n = pq.read_metadata(fp).num_rows
        files.append((pname, n, os.path.getsize(fp)))
        total_rows += n
        idx += 1
    for leftover in os.listdir(tmp):
        os.remove(os.path.join(tmp, leftover))
    os.rmdir(tmp)
    return run, files, total_rows


def _write_add_manifest(man_dir: str, run: str, files, seq_base: int):
    """One manifest of ADD entries over ``files``; sequence numbers
    continue from ``seq_base`` (a later snapshot's rows sequence after
    every earlier one, like Paimon's per-commit sequence ranges).
    Returns (manifest_name, byte_length)."""
    now_ms = int(time.time() * 1000)
    manifest_name = f"manifest-{run}-0"
    entries = []
    seq = seq_base
    for pname, n, sz in files:
        entries.append({
            "_VERSION": 2, "_KIND": _KIND_ADD,
            "_PARTITION": _EMPTY_BINARY_ROW,
            "_BUCKET": 0, "_TOTAL_BUCKETS": -1,
            "_FILE": {
                "_FILE_NAME": pname, "_FILE_SIZE": sz, "_ROW_COUNT": n,
                # append table: no keys — empty rows, level 0
                "_MIN_KEY": _EMPTY_BINARY_ROW,
                "_MAX_KEY": _EMPTY_BINARY_ROW,
                "_KEY_STATS": dict(_EMPTY_STATS),
                "_VALUE_STATS": dict(_EMPTY_STATS),
                "_MIN_SEQUENCE_NUMBER": seq,
                "_MAX_SEQUENCE_NUMBER": seq + max(n - 1, 0),
                "_SCHEMA_ID": 0, "_LEVEL": 0, "_EXTRA_FILES": [],
                "_CREATION_TIME": now_ms,
                "_DELETE_ROW_COUNT": 0,
                "_EMBEDDED_FILE_INDEX": None,
                "_FILE_SOURCE": 0,  # APPEND
            },
        })
        seq += n
    mlen = write_container(os.path.join(man_dir, manifest_name),
                           MANIFEST_ENTRY_SCHEMA, entries)
    return manifest_name, mlen


def write_paimon(spark, df: DataFrame, dest: str) -> dict:
    """Write a plain DataFrame as a complete single-snapshot Paimon
    append table at ``dest`` — the layout writer behind
    :func:`export_paimon`, and the ``sink: type: paimon`` face of the
    batch composer (the reference pipeline's PaimonDataSink writes the
    same shape through the Paimon catalog). Returns
    {snapshot_id, rows, files, dest}."""
    local = _local(dest)
    # fresh-export semantics (like export_iceberg's overwrite): a
    # re-export to the same dest must not leave the previous run's
    # data files orphaned next to a snapshot that no longer lists them
    import shutil
    for sub in ("bucket-0", "manifest", "snapshot", "schema",
                "_staging"):
        shutil.rmtree(os.path.join(local, sub), ignore_errors=True)
    bucket_dir = os.path.join(local, "bucket-0")
    os.makedirs(bucket_dir, exist_ok=True)
    run, files, total_rows = _stage_data_files(df, local)

    _write_schema(local, df.schema)

    man_dir = os.path.join(local, "manifest")
    os.makedirs(man_dir, exist_ok=True)
    manifest_name, mlen = _write_add_manifest(man_dir, run, files,
                                              seq_base=0)

    # snapshot-1: base list is EMPTY (nothing before this commit),
    # delta list carries the new manifest — Paimon's first-commit shape
    base_list = f"manifest-list-{run}-0"
    delta_list = f"manifest-list-{run}-1"
    write_container(os.path.join(man_dir, base_list),
                    MANIFEST_FILE_META_SCHEMA, [])
    write_container(os.path.join(man_dir, delta_list),
                    MANIFEST_FILE_META_SCHEMA, [{
                        "_VERSION": 2, "_FILE_NAME": manifest_name,
                        "_FILE_SIZE": mlen,
                        "_NUM_ADDED_FILES": len(files),
                        "_NUM_DELETED_FILES": 0,
                        "_PARTITION_STATS": dict(_EMPTY_STATS),
                        "_SCHEMA_ID": 0,
                    }])

    _write_snapshot(local, 1, base_list, delta_list,
                    total=total_rows, delta=total_rows, earliest=True)

    return {"snapshot_id": 1, "rows": total_rows,
            "files": len(files), "dest": local}


def export_paimon(spark, path: str, dest: str,
                  version: int | None = None) -> dict:
    """Export a pinned versioned-lakehouse snapshot as a Paimon append
    table at ``dest`` (materialized copy — tombstones/DVs applied; see
    the module docstring for why Paimon has no zero-copy variant).
    Returns {version, snapshot_id, rows, files, dest}."""
    df: DataFrame = read_versioned(spark, path, version)
    # the in-family bucket-partition column is manifest plumbing, not
    # table data — an external engine must not see it
    part_col = _load_manifest(_local(path),
                              list_versions(path)[-1]
                              if version is None else version)["part_col"]
    if part_col in df.columns:
        df = df.drop(part_col)
    out = write_paimon(spark, df, dest)
    src_versions = list_versions(path)
    out["version"] = src_versions[-1] if version is None else version
    return out


def _schema_from_paimon(schema_json: dict) -> T.StructType:
    fields = []
    for f in schema_json["fields"]:
        t = f["type"]
        nullable = not t.endswith(" NOT NULL")
        base = t[: -len(" NOT NULL")] if not nullable else t
        if base.startswith(("DECIMAL", "NUMERIC")):
            p, s = base[base.index("(") + 1:base.index(")")].split(",")
            dt: T.DataType = T.DecimalType(int(p), int(s))
        # spellings an external paimon-core table may use beyond our
        # writer's canon (spec "Data Types")
        elif base.startswith(("VARCHAR", "CHAR", "STRING")):
            dt = T.StringType()
        elif base.startswith("TIMESTAMP"):  # TIMESTAMP(p) [WITH ...]
            dt = T.TimestampType()
        elif base.startswith(("BYTES", "VARBINARY", "BINARY")):
            dt = T.BinaryType()
        else:
            inv = {v: k for k, v in _SPARK_TO_PAIMON.items()}
            try:
                dt = inv[base]()
            except KeyError:
                raise ValueError(
                    f"unsupported paimon type {t!r} for column "
                    f"{f['name']!r}") from None
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def read_paimon(spark, dest: str,
                snapshot_id: int | None = None) -> DataFrame:
    """Read a Paimon append table strictly through its on-disk layout —
    the independent verification path for :func:`export_paimon`:
    LATEST hint → snapshot JSON → base + delta manifest lists →
    manifests → fold ADD/DELETE entries → bucket-relative parquet.
    DELETE entries (compaction rewrites) remove their file from the
    live set, exactly how Paimon folds a manifest chain.
    ``snapshot_id`` pins a historical snapshot (Paimon's
    ``scan.snapshot-id`` time travel) instead of LATEST. A table whose
    schema declares ``primaryKeys`` routes to the merge-on-read PK
    reader (:func:`.paimon_pk.read_paimon_pk`)."""
    local = _local(dest)
    with open(os.path.join(local, "schema", "schema-0")) as f:
        if json.load(f).get("primaryKeys"):
            from .paimon_pk import read_paimon_pk

            return read_paimon_pk(spark, dest, snapshot_id)
    if snapshot_id is not None:
        snap_id = snapshot_id
    else:
        with open(os.path.join(local, "snapshot", "LATEST")) as f:
            snap_id = int(f.read().strip())
    with open(os.path.join(local, "snapshot",
                           f"snapshot-{snap_id}")) as f:
        snap = json.load(f)
    man_dir = os.path.join(local, "manifest")

    manifests = []
    for list_name in (snap["baseManifestList"],
                      snap["deltaManifestList"]):
        if not list_name:
            continue
        _, metas = read_container(os.path.join(man_dir, list_name))
        manifests.extend(m["_FILE_NAME"] for m in metas)

    live: dict[tuple, str] = {}  # (bucket, file_name) → path
    for mname in manifests:
        _, entries = read_container(os.path.join(man_dir, mname))
        for e in entries:
            key = (e["_BUCKET"], e["_FILE"]["_FILE_NAME"])
            if e["_KIND"] == _KIND_ADD:
                live[key] = os.path.join(
                    local, f"bucket-{e['_BUCKET']}",
                    e["_FILE"]["_FILE_NAME"])
            elif e["_KIND"] == _KIND_DELETE:
                live.pop(key, None)
            else:
                raise ValueError(
                    f"{mname}: unknown manifest-entry kind "
                    f"{e['_KIND']}")
    with open(os.path.join(local, "schema",
                           f"schema-{snap['schemaId']}")) as f:
        declared = _schema_from_paimon(json.load(f))
    if not live:
        return spark.createDataFrame([], declared)
    df = spark.read.parquet(*sorted(live.values()))
    # fail loudly if the data files drifted from schema-N — silently
    # returning whatever the parquet says would mask a corrupt export
    if [f.name for f in df.schema.fields] != \
            [f.name for f in declared.fields]:
        raise ValueError(
            f"{dest}: data-file columns "
            f"{[f.name for f in df.schema.fields]} do not match "
            f"schema-{snap['schemaId']} "
            f"{[f.name for f in declared.fields]}")
    return df


def import_paimon(spark, src: str, path: str, schema,
                  part_col: str = "part", n_buckets: int = 16) -> dict:
    """Bootstrap a versioned-lakehouse table from a Paimon append
    table's current snapshot — the inverse face of
    :func:`export_paimon` and the migration path for a user with an
    existing Paimon warehouse (the mirror of
    :func:`.iceberg_export.import_iceberg`): rows land as one +I
    changelog batch through the normal merge, so stats/blooms/manifest
    discipline apply from version 1."""
    from pyspark.sql import functions as F

    from .events import OP_COLUMN, SEQ_COLUMN
    from .lakehouse import (merge_into_versioned_parquet,
                            with_bucket_partition)

    df = read_paimon(spark, src)
    b = (df.withColumn(OP_COLUMN, F.lit("+I"))
         .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    if not schema.primary_keys:
        raise ValueError(
            "import requires a schema with primary keys — the "
            "versioned lakehouse buckets and merges by key")
    b = with_bucket_partition(b, schema.primary_keys[0], n_buckets,
                              part_col)
    return merge_into_versioned_parquet(path, b, schema, part_col)


def append_paimon(spark, df: DataFrame, dest: str) -> dict:
    """Commit one more APPEND snapshot to an existing Paimon append
    table — the per-checkpoint commit shape of the reference's
    streaming PaimonSink (PaimonWriter.java prepares data files,
    PaimonCommitter.java commits one snapshot per checkpoint). The new
    snapshot's BASE manifest list is the previous snapshot's base +
    delta manifests re-listed (the full live view), its DELTA is the
    one new manifest; sequence numbers continue after every earlier
    row's. LATEST advances, EARLIEST stays — so
    ``read_paimon(dest, snapshot_id=N)`` time-travels the chain."""
    local = _local(dest)
    with open(os.path.join(local, "snapshot", "LATEST")) as f:
        prev_id = int(f.read().strip())
    with open(os.path.join(local, "snapshot",
                           f"snapshot-{prev_id}")) as f:
        prev = json.load(f)
    declared = _schema_from_paimon(json.load(open(os.path.join(
        local, "schema", f"schema-{prev['schemaId']}"))))
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in declared.fields]
    if got != want:
        raise ValueError(
            f"append columns {[(n, t.simpleString()) for n, t in got]} "
            f"do not match schema-{prev['schemaId']} "
            f"{[(n, t.simpleString()) for n, t in want]} — evolve the "
            "table (new schema-N) before appending a drifted batch")

    run, files, new_rows = _stage_data_files(df, local)
    man_dir = os.path.join(local, "manifest")
    manifest_name, mlen = _write_add_manifest(
        man_dir, run, files, seq_base=prev["totalRecordCount"])

    # base = previous base + delta manifests, re-listed
    prev_metas = []
    for list_name in (prev["baseManifestList"],
                      prev["deltaManifestList"]):
        if not list_name:
            continue
        _, metas = read_container(os.path.join(man_dir, list_name))
        prev_metas.extend(metas)
    base_list = f"manifest-list-{run}-0"
    delta_list = f"manifest-list-{run}-1"
    write_container(os.path.join(man_dir, base_list),
                    MANIFEST_FILE_META_SCHEMA, prev_metas)
    write_container(os.path.join(man_dir, delta_list),
                    MANIFEST_FILE_META_SCHEMA, [{
                        "_VERSION": 2, "_FILE_NAME": manifest_name,
                        "_FILE_SIZE": mlen,
                        "_NUM_ADDED_FILES": len(files),
                        "_NUM_DELETED_FILES": 0,
                        "_PARTITION_STATS": dict(_EMPTY_STATS),
                        "_SCHEMA_ID": 0,
                    }])
    snap_id = prev_id + 1
    _write_snapshot(local, snap_id, base_list, delta_list,
                    total=prev["totalRecordCount"] + new_rows,
                    delta=new_rows)
    return {"snapshot_id": snap_id, "rows": new_rows,
            "files": len(files), "dest": local}


def make_paimon_append_sink_writer(base: str):
    """``sink_writer(table_id, df, schema)`` callable for the streaming
    composers: each micro-batch commits one APPEND snapshot per routed
    table (first batch creates the table) — the reference streaming
    PaimonSink's per-checkpoint commit cadence for INSERT-ONLY streams
    (an append table cannot express updates/deletes; retraction ops
    fail loudly rather than silently appending stale images — route
    keyed changelogs to the versioned lakehouse or the batch `paimon`
    sink instead)."""
    from pyspark.sql import functions as F

    from .events import OP_COLUMN, SEQ_COLUMN

    def writer(table_id, df: DataFrame, schema) -> None:
        spark = df.sparkSession
        if OP_COLUMN in df.columns:
            bad = df.where(~F.col(OP_COLUMN).isin("+I")).limit(1).count()
            if bad:
                raise ValueError(
                    "paimon append sink is insert-only; got a "
                    "retraction/update op — use the keyed batch "
                    "paimon sink or the versioned lakehouse")
        data = df.drop(*[c for c in (OP_COLUMN, SEQ_COLUMN,
                                     "__table_id", "__op_ts")
                         if c in df.columns])
        dest = f"{base}/{table_id.table}"
        if os.path.exists(os.path.join(_local(dest), "snapshot",
                                       "LATEST")):
            append_paimon(spark, data, dest)
        else:
            write_paimon(spark, data, dest)

    return writer


def compact_paimon(spark, dest: str) -> dict:
    """Full compaction: rewrite the live file set into fresh data files
    and commit a COMPACT snapshot whose one manifest carries DELETE
    entries for every old file plus ADD entries for the rewritten ones
    — the manifest shape Paimon's compaction commits, and the real
    writer for the DELETE-fold path :func:`read_paimon` implements. At
    scale this is the small-files remedy for a long append chain: the
    next read folds to the compacted files only. PK tables compact
    through :func:`.paimon_pk.compact_paimon_pk` (merge-aware)."""
    local = _local(dest)
    with open(os.path.join(local, "schema", "schema-0")) as f:
        if json.load(f).get("primaryKeys"):
            from .paimon_pk import compact_paimon_pk

            return compact_paimon_pk(spark, dest)
    with open(os.path.join(local, "snapshot", "LATEST")) as f:
        prev_id = int(f.read().strip())
    with open(os.path.join(local, "snapshot",
                           f"snapshot-{prev_id}")) as f:
        prev = json.load(f)
    man_dir = os.path.join(local, "manifest")

    # fold the current chain to the live set (same walk as read_paimon)
    live: dict[tuple, dict] = {}
    for list_name in (prev["baseManifestList"],
                      prev["deltaManifestList"]):
        if not list_name:
            continue
        _, metas = read_container(os.path.join(man_dir, list_name))
        for m in metas:
            _, entries = read_container(
                os.path.join(man_dir, m["_FILE_NAME"]))
            for e in entries:
                key = (e["_BUCKET"], e["_FILE"]["_FILE_NAME"])
                if e["_KIND"] == _KIND_ADD:
                    live[key] = e
                else:
                    live.pop(key, None)
    if not live:
        return {"snapshot_id": prev_id, "rows": 0, "files": 0,
                "dest": local, "compacted": 0}

    paths = [os.path.join(local, f"bucket-{b}", n)
             for b, n in sorted(live)]
    df = spark.read.parquet(*paths)
    run, files, total_rows = _stage_data_files(df, local)
    now_entries = [dict(e, _KIND=_KIND_DELETE) for e in live.values()]
    # A real Paimon compaction preserves the inputs' sequence ranges on
    # the rewritten output; restarting at 0 would let an external
    # reader using _MIN/_MAX_SEQUENCE_NUMBER mis-order the compacted
    # rows against a later append (whose seq_base continues from
    # totalRecordCount). Span exactly the consumed entries' range.
    seq = min(e["_FILE"]["_MIN_SEQUENCE_NUMBER"] for e in live.values())
    now_ms = int(time.time() * 1000)
    for pname, n, sz in files:
        now_entries.append({
            "_VERSION": 2, "_KIND": _KIND_ADD,
            "_PARTITION": _EMPTY_BINARY_ROW,
            "_BUCKET": 0, "_TOTAL_BUCKETS": -1,
            "_FILE": {
                "_FILE_NAME": pname, "_FILE_SIZE": sz, "_ROW_COUNT": n,
                "_MIN_KEY": _EMPTY_BINARY_ROW,
                "_MAX_KEY": _EMPTY_BINARY_ROW,
                "_KEY_STATS": dict(_EMPTY_STATS),
                "_VALUE_STATS": dict(_EMPTY_STATS),
                "_MIN_SEQUENCE_NUMBER": seq,
                "_MAX_SEQUENCE_NUMBER": seq + max(n - 1, 0),
                "_SCHEMA_ID": 0,
                "_LEVEL": 5,  # compaction output: max level
                "_EXTRA_FILES": [],
                "_CREATION_TIME": now_ms,
                "_DELETE_ROW_COUNT": 0,
                "_EMBEDDED_FILE_INDEX": None,
                "_FILE_SOURCE": 1,  # COMPACT
            },
        })
        seq += n
    manifest_name = f"manifest-{run}-0"
    mlen = write_container(os.path.join(man_dir, manifest_name),
                           MANIFEST_ENTRY_SCHEMA, now_entries)

    # base = the previous full view; delta = the rewrite manifest
    prev_metas = []
    for list_name in (prev["baseManifestList"],
                      prev["deltaManifestList"]):
        if not list_name:
            continue
        _, metas = read_container(os.path.join(man_dir, list_name))
        prev_metas.extend(metas)
    base_list = f"manifest-list-{run}-0"
    delta_list = f"manifest-list-{run}-1"
    write_container(os.path.join(man_dir, base_list),
                    MANIFEST_FILE_META_SCHEMA, prev_metas)
    write_container(os.path.join(man_dir, delta_list),
                    MANIFEST_FILE_META_SCHEMA, [{
                        "_VERSION": 2, "_FILE_NAME": manifest_name,
                        "_FILE_SIZE": mlen,
                        "_NUM_ADDED_FILES": len(files),
                        "_NUM_DELETED_FILES": len(live),
                        "_PARTITION_STATS": dict(_EMPTY_STATS),
                        "_SCHEMA_ID": 0,
                    }])
    snap_id = prev_id + 1
    _write_snapshot(local, snap_id, base_list, delta_list,
                    total=total_rows, delta=0)
    # mark the commit kind honestly (COMPACT, not APPEND)
    sp = os.path.join(local, "snapshot", f"snapshot-{snap_id}")
    snap = json.load(open(sp))
    snap["commitKind"] = "COMPACT"
    with open(sp, "w") as f:
        json.dump(snap, f, indent=2)
    return {"snapshot_id": snap_id, "rows": total_rows,
            "files": len(files), "dest": local,
            "compacted": len(live)}


def _fold_snapshot(local: str, snap_id: int):
    """(live data-file paths, referenced manifest/list names) of one
    snapshot — the same walk read_paimon does, kept for GC math.
    Partitioned PK tables resolve each entry's hive partition directory
    from its ``_PARTITION`` BinaryRow."""
    with open(os.path.join(local, "snapshot",
                           f"snapshot-{snap_id}")) as f:
        snap = json.load(f)
    with open(os.path.join(local, "schema", "schema-0")) as f:
        sj0 = json.load(f)
    pkeys = list(sj0.get("partitionKeys") or [])
    pfields = []
    if pkeys:
        from .paimon_pk import parse_binary_row, partition_dir_of

        struct0 = _schema_from_paimon(sj0)
        pfields = [struct0[k] for k in pkeys]
    man_dir = os.path.join(local, "manifest")
    lists, manifests = [], []
    live: dict[tuple, str] = {}
    for list_name in (snap["baseManifestList"],
                      snap["deltaManifestList"]):
        if not list_name:
            continue
        lists.append(list_name)
        _, metas = read_container(os.path.join(man_dir, list_name))
        for m in metas:
            manifests.append(m["_FILE_NAME"])
            _, entries = read_container(
                os.path.join(man_dir, m["_FILE_NAME"]))
            for e in entries:
                key = (bytes(e["_PARTITION"]), e["_BUCKET"],
                       e["_FILE"]["_FILE_NAME"])
                if e["_KIND"] == _KIND_ADD:
                    base = local
                    if pkeys and e["_PARTITION"] != _EMPTY_BINARY_ROW:
                        base = os.path.join(local, partition_dir_of(
                            pkeys, parse_binary_row(e["_PARTITION"],
                                                    pfields)))
                    live[key] = os.path.join(
                        base, f"bucket-{e['_BUCKET']}",
                        e["_FILE"]["_FILE_NAME"])
                else:
                    live.pop(key, None)
    files = set(live.values())
    # changelog-producer files: owned by exactly this snapshot (never
    # folded forward), so expiring the snapshot reclaims them
    cl_list = snap.get("changelogManifestList")
    if cl_list:
        lists.append(cl_list)
        _, metas = read_container(os.path.join(man_dir, cl_list))
        for m in metas:
            manifests.append(m["_FILE_NAME"])
            _, entries = read_container(
                os.path.join(man_dir, m["_FILE_NAME"]))
            for e in entries:
                base = local
                if pkeys and e["_PARTITION"] != _EMPTY_BINARY_ROW:
                    base = os.path.join(local, partition_dir_of(
                        pkeys, parse_binary_row(e["_PARTITION"],
                                                pfields)))
                files.add(os.path.join(base, f"bucket-{e['_BUCKET']}",
                                       e["_FILE"]["_FILE_NAME"]))
    # dynamic-bucket hash index: manifest + hash files (hash files are
    # usually shared forward — the keep-set of retained snapshots
    # protects them; a superseded manifest is reclaimed)
    idx_manifest = snap.get("indexManifest")
    if idx_manifest:
        idx_dir = os.path.join(local, "index")
        files.add(os.path.join(idx_dir, idx_manifest))
        _, entries = read_container(os.path.join(idx_dir, idx_manifest))
        for e in entries:
            files.add(os.path.join(idx_dir, str(e["_FILE_NAME"])))
    return files, set(lists), set(manifests)


def expire_paimon_snapshots(spark, dest: str,
                            keep_last: int = 1) -> dict:
    """Expire all but the newest ``keep_last`` snapshots (Paimon's
    ``snapshot.num-retained`` retention): EARLIEST advances, expired
    snapshot files are removed, and data files / manifests / manifest
    lists referenced by NO remaining snapshot's fold are deleted —
    after a compaction this is what actually reclaims the
    pre-compaction files. Liveness is exact (union of the remaining
    snapshots' folds), so a file still visible to any retained
    snapshot — time travel included — is never touched."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    local = _local(dest)
    snap_dir = os.path.join(local, "snapshot")
    with open(os.path.join(snap_dir, "LATEST")) as f:
        latest = int(f.read().strip())
    with open(os.path.join(snap_dir, "EARLIEST")) as f:
        earliest = int(f.read().strip())
    cutoff = max(latest - keep_last + 1, earliest)
    if cutoff <= earliest:
        return {"expired": 0, "data_files_deleted": 0,
                "earliest": earliest}

    keep_files: set = set()
    keep_lists: set = set()
    keep_manifests: set = set()
    for sid in range(cutoff, latest + 1):
        fls, lsts, mans = _fold_snapshot(local, sid)
        keep_files |= fls
        keep_lists |= lsts
        keep_manifests |= mans

    dropped_files = 0
    for sid in range(earliest, cutoff):
        fls, lsts, mans = _fold_snapshot(local, sid)
        for fp in fls - keep_files:
            if os.path.exists(fp):
                os.remove(fp)
                dropped_files += 1
        man_dir = os.path.join(local, "manifest")
        for name in (lsts | mans) - keep_lists - keep_manifests:
            p = os.path.join(man_dir, name)
            if os.path.exists(p):
                os.remove(p)
        os.remove(os.path.join(snap_dir, f"snapshot-{sid}"))
    with open(os.path.join(snap_dir, "EARLIEST"), "w") as f:
        f.write(str(cutoff))
    return {"expired": cutoff - earliest,
            "data_files_deleted": dropped_files, "earliest": cutoff}
