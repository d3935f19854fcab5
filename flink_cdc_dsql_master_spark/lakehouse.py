"""Partitioned copy-on-write MERGE: lakehouse-sink mechanics on plain parquet.

Reference counterparts: the lake/warehouse pipeline sinks
(``flink-cdc-connect/flink-cdc-pipeline-connectors/{paimon,iceberg,...}``)
whose capability contract is "upsert a changelog + apply DDL" into a
table format that rewrites only affected files. Neither Delta nor
Iceberg ships in this sandbox, so this module implements the two
mechanisms those formats actually contribute — **file-level pruning on
merge** and an **atomic, crash-recoverable commit** — on hive-layout
parquet, with the same changelog reduction (``last_write_wins``) feeding
it that feeds every other sink.

Design (a miniature copy-on-write table format):

- the table lives at ``path/<part_col>=<v>/part-*.parquet`` (hive
  layout, so any engine — Spark, DuckDB, Trino — reads it with
  partition discovery and prunes partition predicates);
- the partition column must be a pure function of the primary key
  (:func:`with_bucket_partition` provides the portable Knuth-bucket
  default) so a key's row can never move between partitions and a merge
  touches exactly the partitions present in the batch;
- MERGE reads ONLY the affected partitions (partition-pruned scan —
  at 100 TB a batch touching 3 of 10k partitions reads 0.03% of the
  table), anti-joins the changed keys, unions the new images, and
  writes the result to a sibling staging dir;
- publish is manifest-logged: a ``_txn/pending.json`` marker (written
  via temp-file + ``os.rename``, the POSIX atomic) lists the affected
  partition values; each partition dir is then swapped by renames.
  A crash anywhere in the publish window is rolled FORWARD by
  :func:`recover_partitioned_merge` on the next merge — the Delta
  ``_delta_log`` idea reduced to its crash-consistency core. Partitions
  outside the manifest are never touched, so concurrent readers of
  unaffected partitions see no window at all.

Deletes whose partition ends up empty drop the whole partition dir
(recorded in the manifest so recovery can finish the drop).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, functions as F
from .pinning import pin

from .events import (INTERNAL_COLUMNS, OP_COLUMN, OP_DELETE, SEQ_COLUMN,
                     UPSERT_OPS)
from .partitioning import bucket_expr, last_write_wins
from .schema import Schema

TXN_DIR = "_txn"
PENDING = "pending.json"


def with_bucket_partition(df: DataFrame, key: str, n_buckets: int = 16,
                          col_name: str = "part") -> DataFrame:
    """Attach the SQL-portable Knuth bucket of an integral PK as the
    partition column (same arithmetic in Spark and DuckDB, so partition
    placement itself is oracle-checkable)."""
    return df.withColumn(col_name, bucket_expr(key, n_buckets))


def _local(path: str) -> str:
    return path[7:] if path.startswith("file://") else path


def _part_dir(local: str, part_col: str, value) -> str:
    return os.path.join(local, f"{part_col}={value}")


def _default_changelog_cols(changelog: DataFrame) -> DataFrame:
    """A plain-row batch (no changelog columns — e.g. the
    foreach_batch_writer data path after transform/coerce) merges as
    all-upserts: default op +I, seq 0."""
    if OP_COLUMN not in changelog.columns:
        changelog = changelog.withColumn(OP_COLUMN, F.lit("+I"))
    if SEQ_COLUMN not in changelog.columns:
        changelog = changelog.withColumn(
            SEQ_COLUMN, F.lit(0).cast("long"))
    return changelog


def recover_partitioned_merge(path: str) -> bool:
    """Roll forward a merge interrupted in its publish window.

    Returns True if a pending transaction was found and completed. Safe
    to call any time; every step is idempotent."""
    local = _local(path)
    marker = os.path.join(local, TXN_DIR, PENDING)
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        m = json.load(f)
    staging = m["staging"]
    part_col = m["part_col"]
    for v in m["publish"]:
        live = _part_dir(local, part_col, v)
        old = live + ".__old__"
        tmpd = _part_dir(staging, part_col, v)
        if os.path.exists(tmpd):
            if os.path.exists(live) and not os.path.exists(old):
                os.rename(live, old)
            if not os.path.exists(live):
                os.rename(tmpd, live)
            else:
                # live was already the new data (rename raced a crash);
                # staging copy is redundant
                shutil.rmtree(tmpd, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
    for v in m["drop"]:
        shutil.rmtree(_part_dir(local, part_col, v), ignore_errors=True)
    os.remove(marker)
    shutil.rmtree(staging, ignore_errors=True)
    return True


def merge_into_partitioned_parquet(path: str, changelog: DataFrame,
                                   schema: Schema,
                                   part_col: str = "part",
                                   constraints: list | None = None
                                   ) -> dict:
    """Copy-on-write MERGE of a changelog batch into a hive-partitioned
    parquet table, rewriting ONLY the partitions the batch touches.

    ``part_col`` must already be a column of ``changelog`` and a pure
    function of the primary key (see :func:`with_bucket_partition`).
    Returns {"rewritten": [...], "dropped": [...]} partition values —
    the pruning evidence the tests assert on.
    """
    spark = changelog.sparkSession
    pks = list(schema.primary_keys)
    changelog = _default_changelog_cols(changelog)
    local = _local(path)
    os.makedirs(os.path.join(local, TXN_DIR), exist_ok=True)
    recover_partitioned_merge(path)

    # checkpointed: the LWW-collapsed batch is consumed several times
    # (affected-partition collect, changed-key anti-join, upsert union)
    # — without this each consumer re-runs the PK shuffle. Batch-
    # proportional storage, GC-reclaimed after the commit returns.
    final = last_write_wins(changelog, pks).transform(pin)
    if constraints:
        # CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT analog):
        # validated against the batch's UPSERT images BEFORE anything is
        # staged — a violating batch commits nothing. [(name, Column)]
        imgs = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
        for cname, cexpr in constraints:
            bad = imgs.where(~F.coalesce(cexpr, F.lit(False)))
            n_bad = bad.count()
            if n_bad:
                sample = bad.select(*pks).limit(3).collect()
                raise ConstraintViolation(
                    f"constraint '{cname}' violated by {n_bad} rows, "
                    f"e.g. keys {[tuple(r) for r in sample]}")
    affected = sorted(
        r[0] for r in final.select(part_col).distinct().collect())
    if not affected:
        return {"rewritten": [], "dropped": []}
    upserts = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
    drop_cols = [c for c in INTERNAL_COLUMNS
                 if c in changelog.columns]

    has_table = any(e.startswith(f"{part_col}=")
                    for e in os.listdir(local))
    if has_table:
        # partition-pruned read: only the affected partition dirs are
        # scanned (PartitionFilters on the hive partition column);
        # mergeSchema so a post-evolution batch can merge into partitions
        # whose files predate an ADD COLUMN
        cur = (spark.read.option("mergeSchema", "true").parquet(local)
               .where(F.col(part_col).isin(*affected)))
        changed_keys = final.select(*pks).distinct()
        keep = cur.join(changed_keys, on=pks, how="left_anti")
        out = keep.unionByName(upserts.drop(*drop_cols),
                               allowMissingColumns=True)
    else:
        out = upserts.drop(*drop_cols)

    staging = local.rstrip("/") + f".__cow_{uuid.uuid4().hex[:12]}__"
    shutil.rmtree(staging, ignore_errors=True)
    out.write.partitionBy(part_col).mode("overwrite").parquet(staging)

    written = {e.split("=", 1)[1] for e in os.listdir(staging)
               if e.startswith(f"{part_col}=")}
    publish = [v for v in affected if str(v) in written]
    drop = [v for v in affected if str(v) not in written]

    # atomic commit point: once pending.json is in place the txn WILL
    # complete (here or in recovery); before it, staging is invisible
    marker = os.path.join(local, TXN_DIR, PENDING)
    tmp_marker = marker + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp_marker, "w") as f:
        json.dump({"staging": staging, "part_col": part_col,
                   "publish": publish, "drop": drop,
                   "ts": time.time()}, f)
    os.rename(tmp_marker, marker)

    for v in publish:
        live = _part_dir(local, part_col, v)
        old = live + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(live):
            os.rename(live, old)
        os.rename(_part_dir(staging, part_col, v), live)
        shutil.rmtree(old, ignore_errors=True)
    for v in drop:
        shutil.rmtree(_part_dir(local, part_col, v), ignore_errors=True)
    os.remove(marker)
    shutil.rmtree(staging, ignore_errors=True)
    return {"rewritten": publish, "dropped": drop}


def read_partitioned(spark, path: str) -> DataFrame:
    """Read the table (hive partition discovery; rolls forward a pending
    txn first so readers never see a torn publish).

    ``mergeSchema`` is on: after a mid-stream ADD COLUMN only the
    partitions touched since carry the new column — untouched partitions
    keep their original files (that's the point of COW), so the reader
    must union schemas and NULL-fill, exactly like Delta/Iceberg readers
    do over mixed-generation files."""
    recover_partitioned_merge(path)
    return spark.read.option("mergeSchema", "true").parquet(_local(path))


# ------------------------------------------------------------------------
# Versioned (snapshot-isolated) variant: manifest-logged commits over
# IMMUTABLE data files — the Delta/Iceberg snapshot core. Where the COW
# merge above swaps partition directories in place (readers of affected
# partitions see old-or-new, history destroyed), the versioned table
# never renames a live file: each merge lands new uniquely-named files
# beside the old ones and commits by atomically publishing manifest
# v{N+1} listing the live file set. Reads pin a manifest, so:
#   - commit is ONE rename (no recovery window at all: a crash before
#     the manifest rename leaves orphan files invisible to every reader,
#     swept by vacuum);
#   - time travel = read an older manifest;
#   - concurrent readers keep a consistent snapshot for as long as they
#     hold it, even across merges (snapshot isolation).
# ------------------------------------------------------------------------

LOG_DIR = "_log"
DV_DIR = "_dv"


def _manifest_file(local: str, version: int) -> str:
    return os.path.join(local, LOG_DIR, f"v{version:012d}.json")


def list_versions(path: str) -> list[int]:
    logd = os.path.join(_local(path), LOG_DIR)
    if not os.path.isdir(logd):
        return []
    return sorted(int(e[1:13]) for e in os.listdir(logd)
                  if e.startswith("v") and e.endswith(".json"))


def _load_manifest(local: str, version: int) -> dict:
    with open(_manifest_file(local, version)) as f:
        return json.load(f)


def export_snapshot(spark, path: str, dest: str,
                    version: int | None = None) -> dict:
    """Materialize a pinned snapshot (tombstones applied, version
    resolved) as a PLAIN parquet directory any engine reads with no
    manifest knowledge — the share/backup face. The export is a full
    copy by definition; for in-family sharing use a tag instead."""
    df = read_versioned(spark, path, version)
    df.write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    versions = list_versions(path)
    return {"version": versions[-1] if version is None else version,
            "rows": n, "dest": dest}


def import_snapshot(spark, src: str, path: str, schema,
                    part_col: str = "part", n_buckets: int = 16) -> dict:
    """Bootstrap a versioned table from a plain parquet snapshot: the
    rows land as one +I changelog batch through the normal merge (so
    stats/blooms/manifest discipline all apply from version 1)."""
    df = spark.read.parquet(src)
    b = (df.withColumn(OP_COLUMN, F.lit("+I"))
         .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    b = with_bucket_partition(b, schema.primary_keys[0], n_buckets,
                              part_col)
    return merge_into_versioned_parquet(path, b, schema, part_col)


def tag_version(path: str, tag: str, version: int | None = None) -> dict:
    """Name a snapshot (Iceberg tag / git-tag analog): ``tag`` resolves
    to a pinned version forever after. Tags are immutable — re-tagging
    an existing name raises; retag by deleting first. Default: latest."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][\w.-]*", tag):
        raise ValueError(f"bad tag name {tag!r}")
    # version-shaped names are unreachable through the '@' ref grammar
    # (catalog resolves '@vN' pins BEFORE tag lookup — ADVICE r5; '@ts:'
    # pins can't collide, tag names can't contain ':'), so reject them
    # up front instead of committing a silently shadowed tag
    if _re.fullmatch(r"v\d+", tag):
        raise ValueError(
            f"tag name {tag!r} collides with the '@vN' version-pin "
            "grammar and would be unreachable — pick a "
            "non-version-shaped name")
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    target = os.path.join(local, LOG_DIR, f"tag_{tag}.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"tag": tag, "version": v, "ts": time.time()}, f)
    try:
        os.link(tmp, target)   # immutable: exclusive create
    except FileExistsError:
        raise ValueError(f"tag {tag!r} already exists") from None
    finally:
        os.remove(tmp)
    return {"tag": tag, "version": v}


def resolve_tag(path: str, tag: str) -> int:
    target = os.path.join(_local(path), LOG_DIR, f"tag_{tag}.json")
    if not os.path.exists(target):
        raise KeyError(f"unknown tag {tag!r}")
    with open(target) as f:
        return json.load(f)["version"]


def delete_tag(path: str, tag: str) -> None:
    target = os.path.join(_local(path), LOG_DIR, f"tag_{tag}.json")
    if not os.path.exists(target):
        raise KeyError(f"unknown tag {tag!r}")
    os.remove(target)


def list_tags(path: str) -> dict[str, int]:
    logd = os.path.join(_local(path), LOG_DIR)
    out = {}
    if os.path.isdir(logd):
        for e in os.listdir(logd):
            if e.startswith("tag_") and e.endswith(".json"):
                with open(os.path.join(logd, e)) as f:
                    d = json.load(f)
                out[d["tag"]] = d["version"]
    return out


def version_as_of(path: str, ts: float) -> int:
    """Timestamp time travel: the newest version committed at or before
    ``ts`` (unix seconds) — SELECT ... TIMESTAMP AS OF. Raises if the
    table has no version that old."""
    local = _local(path)
    cands = [v for v in list_versions(path)
             if _load_manifest(local, v)["ts"] <= ts]
    if not cands:
        raise ValueError(f"no version committed at or before {ts}")
    return cands[-1]


class ConstraintViolation(ValueError):
    """A merge batch violated a CHECK constraint; nothing was
    committed."""


class CommitConflictError(RuntimeError):
    """A concurrent commit touched the same partitions (or raced this
    writer 5 times) — the optimistic-concurrency loser. Re-read and
    retry the transaction."""


def _commit_manifest(local: str, version: int, manifest: dict) -> None:
    """Exclusive-create commit: os.link fails with FileExistsError if a
    concurrent writer already published this version — the loser can
    never silently overwrite the winner (os.rename would)."""
    target = _manifest_file(local, version)
    tmp = target + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, target)  # THE commit point (atomic, exclusive)
    finally:
        os.remove(tmp)


def _staged_file(local: str, staged_id: str) -> str:
    return os.path.join(local, LOG_DIR, f"staged_{staged_id}.json")


def _load_staged(local: str, staged_id: str) -> dict:
    p = _staged_file(local, staged_id)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no staged commit {staged_id}")
    with open(p) as f:
        return json.load(f)


def read_staged(spark, path: str, staged_id: str) -> DataFrame:
    """Audit face of write-audit-publish: the staged (not yet
    published) files — exactly what publish would make visible for the
    rewritten partitions. Run DQ checks here; publish only on pass."""
    local = _local(path)
    st = _load_staged(local, staged_id)
    paths = [os.path.join(local, rel)
             for fs in st["new_files"].values() for rel in fs]
    if not paths:
        from pyspark.sql import types as _T
        return spark.createDataFrame(
            [], _T.StructType.fromJson(json.loads(st["schema"])))
    return (spark.read.option("mergeSchema", "true")
            .option("basePath", local).parquet(*paths))


def publish_staged(spark, path: str, staged_id: str) -> dict:
    """Publish a staged commit through the SAME optimistic-concurrency
    loop as a direct merge: commits that landed since the stage's base
    snapshot rebase if disjoint, conflict if they touched the staged
    partitions. The staged manifest is consumed on success."""
    local = _local(path)
    st = _load_staged(local, staged_id)
    r = _occ_commit(spark, path, local, st["part_col"], st["base_v"],
                    set(st["affected"]),
                    {k: list(v) for k, v in st["new_files"].items()},
                    st["new_stats"], st["new_rels"], st["schema"],
                    st.get("epoch"), st["pks"])
    os.remove(_staged_file(local, staged_id))
    return r


def discard_staged(path: str, staged_id: str) -> None:
    """Abandon a staged commit (failed audit): drop the staged
    manifest; its files are orphans the next vacuum reclaims."""
    os.remove(_staged_file(_local(path), staged_id))


def _occ_commit(spark, path: str, local: str, part_col: str,
                base_v: int, affected, new_files: dict,
                new_stats: dict, new_rels: list, schema_json: str,
                epoch, pks: list) -> dict:
    """The optimistic-concurrency commit loop (Delta/Iceberg OCC),
    shared by direct merges and staged (write-audit-publish) commits.

    The transaction read snapshot ``base_v``; commits that landed since
    then REBASE cleanly iff they touched disjoint partitions (their
    partitions carry forward from the CURRENT latest manifest, ours
    come from the staged rewrite — sound because nobody else touched
    ours, checked below). Overlap => CommitConflictError: the staged
    rewrite was computed against stale content. The commit itself is an
    exclusive os.link, so two racers can never both publish the same
    version — the loser just takes another lap."""
    rewritten = sorted(new_files)
    dropped = [v for v in affected if v not in new_files]
    for _attempt in range(5):
        cur_versions = list_versions(path)
        latest_v = cur_versions[-1] if cur_versions else 0
        for v2 in cur_versions:
            if v2 <= base_v:
                continue
            m2 = _load_manifest(local, v2)
            touched = set(m2["op"].get("rewritten", [])) | \
                set(m2["op"].get("dropped", []))
            if m2["op"].get("dv_deleted"):
                # a DV commit tombstones rows in specific partitions;
                # old manifests without the record conflict conservatively
                dvp = m2["op"].get("dv_parts")
                touched |= set(dvp) if dvp is not None else set(affected)
            if touched & set(affected):
                raise CommitConflictError(
                    f"version {v2} touched partitions "
                    f"{sorted(touched & set(affected))} after this "
                    f"transaction's base snapshot {base_v}")
        base_m = _load_manifest(local, latest_v) if cur_versions else None
        lat_files = base_m["files"] if base_m else {}
        lat_stats = base_m.get("file_stats", {}) if base_m else {}
        files = {v: sorted(fs) for v, fs in lat_files.items()
                 if v not in affected}
        files.update({v: sorted(fs) for v, fs in new_files.items()})
        file_stats = {rel: lat_stats[rel]
                      for fs in files.values() for rel in fs
                      if rel in lat_stats}
        file_stats.update(new_stats)
        new_version = latest_v + 1
        # tombstones in rewritten partitions were just resolved
        # physically (and any changelog key's partition is rewritten, so
        # a re-upsert of a DV'd key resurrects cleanly); the rest carry
        # forward FROM THE LATEST manifest (concurrent deletes to other
        # partitions survive the rebase)
        dv_rel, dv_rows = None, 0
        lat_dv = base_m.get("dv") if base_m else None
        if lat_dv:
            dv_lat = spark.read.parquet(os.path.join(local, lat_dv))
            dv_rest = dv_lat.where(
                ~F.col(part_col).cast("string").isin(list(affected)))
            # key-aware carry-forward (ADVICE r5): a tombstone whose PK
            # was just re-upserted into a DIFFERENT partition (mutable
            # partition transform moved the key) must NOT survive — the
            # PK-only anti-join in read_versioned would suppress the new
            # image. Any PK physically present in this commit's new
            # files outranks a carried tombstone (PKs are unique, so a
            # live row and a live tombstone for one key cannot coexist).
            if new_rels and pks:
                batch_pks = (spark.read.option("mergeSchema", "true")
                             .option("basePath", local)
                             .parquet(*[os.path.join(local, r)
                                        for r in new_rels])
                             .select(*pks).distinct())
                dv_rest = dv_rest.join(batch_pks, on=pks,
                                       how="left_anti")
            dv_rows = dv_rest.count()
            if dv_rows:
                dv_rel = _write_dv(dv_rest, local, new_version)
        manifest = {"version": new_version, "ts": time.time(),
                    "part_col": part_col, "schema": schema_json,
                    "files": files, "file_stats": file_stats,
                    "epoch": epoch, "dv": dv_rel, "pks": pks,
                    "dv_rows": dv_rows,
                    "op": {"rewritten": rewritten, "dropped": dropped}}
        if base_m:
            manifest.update(
                _refresh_blooms(local, base_m, files, new_rels))
        try:
            _commit_manifest(local, new_version, manifest)
        except FileExistsError:
            continue  # lost the publish race: rebase and retry
        return {"version": new_version, "rewritten": rewritten,
                "dropped": dropped}
    raise CommitConflictError("lost the publish race 5 times")


def merge_into_versioned_parquet(path: str, changelog: DataFrame,
                                 schema: Schema, part_col: str = "part",
                                 epoch: str | None = None,
                                 base_version: int | None = None,
                                 constraints: list | None = None,
                                 stage_only: bool = False,
                                 track_partition_moves: bool = False
                                 ) -> dict:
    """MERGE a changelog batch into a versioned parquet table, committing
    a new manifest version. Only the partitions the batch touches are
    re-materialized (their files re-written under new names); untouched
    partitions carry their existing files forward BY REFERENCE in the
    new manifest — zero IO for the 99.97% of a 100 TB table a batch
    doesn't touch. Returns {"version", "rewritten", "dropped"}.

    PARTITION-COLUMN CONTRACT (ADVICE r5): by default the partition
    value must be a pure function of the primary key
    (``with_bucket_partition`` — a key can never change partitions), so
    "rewrite the batch's partitions" reaches every old image of every
    changed key. With a MUTABLE hidden-partition transform
    (``with_transform_partition`` over an updatable column like
    day(ts)), an upsert can MOVE a key to a new partition; pass
    ``track_partition_moves=True`` and the merge extends the rewrite
    set with the batch keys' CURRENT partitions (one PK semi-join probe
    against the base snapshot — batch-key-proportional output, a scan
    the stable-key default never pays), so the old image is physically
    dropped instead of surviving as a duplicate PK.

    ``epoch`` makes the commit IDEMPOTENT under foreachBatch replay: a
    merge whose epoch equals the latest manifest's is a no-op (the
    crashed run already committed this batch), so a restart replaying
    the last micro-batch neither double-applies it nor mints a
    duplicate version."""
    spark = changelog.sparkSession
    pks = list(schema.primary_keys)
    changelog = _default_changelog_cols(changelog)
    local = _local(path)
    os.makedirs(os.path.join(local, LOG_DIR), exist_ok=True)

    versions = list_versions(path)
    base_v = (versions[-1] if versions else 0) \
        if base_version is None else base_version
    if base_version is not None and base_version not in (versions or [0]):
        if not (base_version == 0 and not versions):
            raise ValueError(f"base_version {base_version} not in "
                             f"{versions}")
    prev_files: dict[str, list[str]] = {}
    prev_stats: dict[str, dict] = {}
    prev_dv_rel: str | None = None
    if versions and base_v:
        prev_m = _load_manifest(local, base_v)
        prev_files = prev_m["files"]
        prev_stats = prev_m.get("file_stats", {})
        prev_dv_rel = prev_m.get("dv")
        if epoch is not None:
            # replay detection scans ALL retained manifests, not just
            # the latest: the in-band-DDL path commits several
            # segment-epochs per micro-batch, so a crash-restart can
            # replay an epoch that is no longer the newest commit
            for v in versions:
                mv = prev_m if v == versions[-1] \
                    else _load_manifest(local, v)
                if mv.get("epoch") == epoch:
                    return {"version": mv["version"], "rewritten": [],
                            "dropped": [], "replayed_epoch": epoch}

    # INITIAL-LOAD fast path: with no pre-existing files there is no
    # cur-read / anti-join / affected-partition pre-collect — one LWW
    # shuffle feeding one partitioned write, and the affected set falls
    # out of the staging directory listing for free (one Spark job
    # instead of two; first loads are the common bulk-ingest case).
    initial_load = not prev_files and not constraints \
        and not track_partition_moves
    if initial_load:
        final = last_write_wins(changelog, pks)
        affected: list[str] = []  # derived from the staging dirs below
    else:
        final = last_write_wins(changelog, pks)
        # pin (eager localCheckpoint — a full materialization pass of
        # the batch) ONLY when several ACTIONS consume the LWW output:
        # the constraint counts. In the default merge `final` has
        # exactly ONE consumer — the staged write's upsert side — and
        # both the affected-partition set and the changed-key set are
        # collected from the RAW batch instead (the partition value and
        # the key set are invariant under LWW collapse), so the
        # checkpoint pass was pure per-commit overhead (guide §1.2).
        if constraints:
            final = final.transform(pin)
    if constraints:
        imgs = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
        for cname, cexpr in constraints:
            bad = imgs.where(~F.coalesce(cexpr, F.lit(False)))
            n_bad = bad.count()
            if n_bad:
                sample = bad.select(*pks).limit(3).collect()
                raise ConstraintViolation(
                    f"constraint '{cname}' violated by {n_bad} rows, "
                    f"e.g. keys {[tuple(r) for r in sample]}")
    if not initial_load:
        # collected from the RAW changelog, not the LWW output: the
        # partition value is a pure function of the primary key (the
        # stable-partition contract), so every key's events share one
        # partition and the two distinct sets are equal — but the raw
        # distinct is a map-side partial aggregate over the batch scan,
        # not a consumer of the full PK window. (Under a MUTABLE
        # transform a multi-moved key can make this a superset — the
        # extra partitions rewrite to identical content, and the
        # move probe below still extends the set with current homes.)
        affected = sorted(
            str(r[0])
            for r in changelog.select(part_col).distinct().collect())
    if track_partition_moves and prev_files:
        # mutable partition transform: a changed key may currently live
        # in a partition the batch's own images don't touch — probe the
        # base snapshot for the keys' current partitions and rewrite
        # those too (the rewrite's changed-keys anti-join then drops the
        # moved keys' old images physically)
        all_paths = [os.path.join(local, rel)
                     for fs in prev_files.values() for rel in fs]
        if all_paths:
            tbl = (spark.read.option("mergeSchema", "true")
                   .option("basePath", local).parquet(*all_paths))
            moved = (tbl.join(changelog.select(*pks).distinct(), on=pks,
                              how="leftsemi")
                     .select(part_col).distinct().collect())
            affected = sorted(set(affected)
                              | {str(r[0]) for r in moved})
    if not affected and not initial_load:
        return {"version": versions[-1] if versions else 0,
                "rewritten": [], "dropped": []}
    upserts = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
    drop_cols = [c for c in INTERNAL_COLUMNS
                 if c in changelog.columns]

    cur_paths = [os.path.join(local, rel)
                 for v in affected for rel in prev_files.get(v, [])]
    if cur_paths:
        cur = (spark.read.option("mergeSchema", "true")
               .option("basePath", local).parquet(*cur_paths))
        if prev_dv_rel:
            # rewriting these partitions resolves their tombstones
            # physically: the new files simply omit the DV'd rows
            dv_prev = spark.read.parquet(
                os.path.join(local, prev_dv_rel))
            cur = cur.join(dv_prev.select(*pks).distinct(),
                           on=pks, how="left_anti")
        changed_keys = final.select(*pks).distinct()
        keep = cur.join(changed_keys, on=pks, how="left_anti")
        out = keep.unionByName(upserts.drop(*drop_cols),
                               allowMissingColumns=True)
    else:
        out = upserts.drop(*drop_cols)

    staging = local.rstrip("/") + f".__ver_{uuid.uuid4().hex[:12]}__"
    shutil.rmtree(staging, ignore_errors=True)
    out.write.partitionBy(part_col).mode("overwrite").parquet(staging)

    # move staged files (globally-unique spark part file names) into the
    # live partition dirs — additive only, invisible until the manifest
    # publishes them
    new_files: dict[str, list[str]] = {}
    for entry in os.listdir(staging):
        if not entry.startswith(f"{part_col}="):
            continue
        v = entry.split("=", 1)[1]
        live_dir = os.path.join(local, entry)
        os.makedirs(live_dir, exist_ok=True)
        for fn in os.listdir(os.path.join(staging, entry)):
            if not fn.endswith(".parquet"):
                continue
            os.rename(os.path.join(staging, entry, fn),
                      os.path.join(live_dir, fn))
            new_files.setdefault(v, []).append(f"{entry}/{fn}")
    shutil.rmtree(staging, ignore_errors=True)
    if initial_load:
        affected = sorted(new_files)
        if not affected:
            return {"version": versions[-1] if versions else 0,
                    "rewritten": [], "dropped": []}

    # footer min/max of the PK columns per NEW file (data pages never
    # read); carried-forward files keep their recorded stats — the
    # data-skipping index plan_files() prunes with
    new_rels = [rel for fs in new_files.values() for rel in fs]
    new_stats = collect_file_stats(local, new_rels, pks)

    if stage_only:
        # write-audit-publish: the physical write happened (files are
        # in the partition dirs but referenced by NO published
        # manifest — invisible to every reader), the COMMIT is held in
        # a staged manifest until publish_staged(). Audits read the
        # staged files; a failed audit discards the stage and the
        # orphaned files vacuum away.
        staged_id = uuid.uuid4().hex[:12]
        staged = {"staged_id": staged_id, "ts": time.time(),
                  "base_v": base_v, "affected": list(affected),
                  "new_files": new_files, "new_stats": new_stats,
                  "new_rels": new_rels, "schema": out.schema.json(),
                  "part_col": part_col, "pks": pks, "epoch": epoch}
        target = os.path.join(local, LOG_DIR,
                              f"staged_{staged_id}.json")
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(staged, f)
        os.rename(tmp, target)
        return {"staged_id": staged_id,
                "rewritten": sorted(new_files)}

    return _occ_commit(spark, path, local, part_col, base_v, affected,
                       new_files, new_stats, new_rels,
                       out.schema.json(), epoch, pks)


def _read_dv(spark, local: str, m: dict):
    """The manifest's deletion-vector sidecar as a DataFrame (full
    tombstoned rows incl. the partition column), or None."""
    rel = m.get("dv")
    if not rel:
        return None
    return spark.read.parquet(os.path.join(local, rel))


def _write_dv(dv_df, local: str, version: int) -> str:
    rel = os.path.join(DV_DIR, f"dv_v{version:012d}_{uuid.uuid4().hex[:8]}")
    dv_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(local, rel))
    return rel


def delete_versioned(spark, path: str, predicate,
                     primary_keys: list[str]) -> dict:
    """DELETE by predicate WITHOUT rewriting any data file — the
    deletion-vector mechanism of modern table formats (Delta DVs,
    Iceberg positional deletes), keyed by primary key: the matching
    rows are recorded in a sidecar parquet referenced by the new
    manifest, and every reader anti-joins them out. Write
    amplification for a sparse delete on a 100 TB table drops from
    "rewrite every touched file" to "append |deleted| rows" — the
    difference between a GDPR erasure batch costing TBs of IO and KBs.
    Tombstones are physically resolved lazily: the next MERGE,
    compaction, or re-cluster of a partition rewrites it WITHOUT the
    tombstoned rows and drops them from the sidecar.

    The sidecar stores the FULL deleted rows (not just keys) so the
    change data feed can emit proper delete records for DV-only
    commits. Returns {"version", "deleted", "dv_total"}."""
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    m = _load_manifest(local, versions[-1])
    part_col = m["part_col"]
    snap = read_versioned(spark, path)  # applies current DV already
    hits = snap.where(predicate)
    n_hits = hits.count()
    if not n_hits:
        return {"version": versions[-1], "deleted": 0,
                "dv_total": None}
    prev = _read_dv(spark, local, m)
    dv = hits if prev is None else prev.unionByName(
        hits, allowMissingColumns=True).dropDuplicates(primary_keys)
    new_version = versions[-1] + 1
    dv_rel = _write_dv(dv, local, new_version)
    dv_total = spark.read.parquet(
        os.path.join(local, dv_rel)).count()
    manifest = {"version": new_version, "ts": time.time(),
                "part_col": part_col, "schema": m["schema"],
                "files": m["files"],
                "file_stats": m.get("file_stats", {}),
                "dv": dv_rel, "pks": primary_keys,
                "dv_rows": dv_total,
                "op": {"rewritten": [], "dropped": [],
                       "dv_deleted": n_hits,
                       "dv_parts": sorted(
                           str(r[0]) for r in hits.select(part_col)
                           .distinct().collect())}}
    manifest.update(_refresh_blooms(local, m, m["files"], []))
    try:
        _commit_manifest(local, new_version, manifest)
    except FileExistsError:
        raise CommitConflictError(
            f"version {new_version} was committed concurrently") \
            from None
    return {"version": new_version, "deleted": n_hits,
            "dv_total": dv_total}


def read_versioned(spark, path: str, version: int | None = None,
                   key_range: tuple | None = None,
                   point: tuple | None = None,
                   as_of_ts: float | None = None,
                   parts: tuple | None = None) -> DataFrame:
    """Read a versioned table at ``version`` (default: latest) — time
    travel is just pinning an older manifest. The file list is explicit,
    so readers are isolated from concurrent merges. ``key_range =
    (col, lo, hi)`` engages manifest-recorded footer stats to skip
    files that provably hold no row in range (data skipping); the
    matching filter is ALSO applied row-level, so the result is exactly
    the range — skipping is an IO optimization, never a semantics
    change."""
    local = _local(path)
    if as_of_ts is not None:
        if version is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        version = version_as_of(path, as_of_ts)
    plan = plan_files(path, version, key_range, point, parts)
    if not plan["paths"]:
        from pyspark.sql import types as _T
        return spark.createDataFrame(
            [], _T.StructType.fromJson(json.loads(plan["schema"])))
    df = (spark.read.option("mergeSchema", "true")
          .option("basePath", local).parquet(*plan["paths"]))
    if key_range is not None:
        ranges = key_range if isinstance(key_range, list) \
            else [key_range]
        for col, lo, hi in ranges:
            df = df.where(F.col(col).between(lo, hi))
    if point is not None:
        df = df.where(F.col(point[0]) == point[1])
    if plan.get("dv"):
        dv = (spark.read.parquet(os.path.join(local, plan["dv"]))
              .select(*plan["pks"]).distinct())
        df = df.join(dv, on=plan["pks"], how="left_anti")
    return df


def table_history(path: str) -> list[dict]:
    """Commit log, newest first: (version, ts, rewritten, dropped,
    n_files) per manifest — the DESCRIBE HISTORY face."""
    local = _local(path)
    out = []
    for v in reversed(list_versions(path)):
        m = _load_manifest(local, v)
        out.append({"version": m["version"], "ts": m["ts"],
                    "rewritten": m["op"]["rewritten"],
                    "dropped": m["op"]["dropped"],
                    "n_files": sum(len(fs) for fs in m["files"].values())})
    return out


def vacuum_versioned(path: str, keep_last: int = 1) -> dict:
    """Expire old versions: retain the newest ``keep_last`` manifests,
    delete every data file referenced by NO retained manifest (including
    orphans from crashed pre-commit merges). Returns counts."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    local = _local(path)
    versions = list_versions(path)
    keep, expire = versions[-keep_last:], versions[:-keep_last]
    # tag-pinned snapshots stay readable: their manifests and files are
    # retained regardless of keep_last
    tagged = sorted(set(list_tags(path).values()) & set(expire))
    keep = sorted(set(keep) | set(tagged))
    expire = [v for v in expire if v not in tagged]
    live: set[str] = set()
    for v in keep:
        for fs in _load_manifest(local, v)["files"].values():
            live.update(fs)
    # staged (write-audit-publish) commits are live until published or
    # discarded — their files must survive vacuum
    logd_ = os.path.join(local, LOG_DIR)
    for entry in os.listdir(logd_):
        if entry.startswith("staged_") and entry.endswith(".json"):
            with open(os.path.join(logd_, entry)) as f:
                for fs in json.load(f)["new_files"].values():
                    live.update(fs)
    removed = 0
    for entry in os.listdir(local):
        if "=" not in entry or not os.path.isdir(
                os.path.join(local, entry)):
            continue
        for fn in os.listdir(os.path.join(local, entry)):
            rel = f"{entry}/{fn}"
            if fn.endswith(".parquet") and rel not in live:
                os.remove(os.path.join(local, entry, fn))
                removed += 1
        if not os.listdir(os.path.join(local, entry)):
            os.rmdir(os.path.join(local, entry))
    live_dv = {_load_manifest(local, v).get("dv") for v in keep}
    dvd = os.path.join(local, DV_DIR)
    removed_dv = 0
    if os.path.isdir(dvd):
        for entry in os.listdir(dvd):
            if os.path.join(DV_DIR, entry) not in live_dv:
                shutil.rmtree(os.path.join(dvd, entry),
                              ignore_errors=True)
                removed_dv += 1
    for v in expire:
        os.remove(_manifest_file(local, v))
    return {"expired_versions": expire, "removed_files": removed,
            "retained_versions": keep, "removed_dv_sidecars": removed_dv}


def table_changes(spark, path: str, from_version: int, to_version: int,
                  primary_keys: list[str],
                  part_col: str = "part",
                  include_preimages: bool = False) -> DataFrame:
    """Change data feed: reconstruct the changelog between two committed
    versions (the Delta CDF / Iceberg changelog-scan face) — rows with
    ``_change_type`` in {insert, update_postimage, delete}.

    Scale shape: the two snapshots share every untouched partition's
    files BY REFERENCE (same manifest entries), so the diff only needs
    to read partitions whose file lists differ between the manifests —
    the same pruning merge enjoys. Within those partitions it is one
    full-outer hash join on the primary key; update detection compares
    the full row struct (null-safe) engine-side."""
    local = _local(path)
    versions = list_versions(path)
    for v in (from_version, to_version):
        if v not in versions:
            raise ValueError(f"version {v} not in {versions}")
    m_from = _load_manifest(local, from_version)
    m_to = _load_manifest(local, to_version)
    changed_parts = sorted(
        v for v in set(m_from["files"]) | set(m_to["files"])
        if m_from["files"].get(v) != m_to["files"].get(v))

    def _read(m, parts):
        paths = [os.path.join(local, rel)
                 for v in parts for rel in m["files"].get(v, [])]
        if not paths:
            from pyspark.sql import types as _T
            return spark.createDataFrame(
                [], _T.StructType.fromJson(json.loads(m["schema"])))
        df = (spark.read.option("mergeSchema", "true")
              .option("basePath", local).parquet(*paths))
        dv = _read_dv(spark, local, m)
        if dv is not None:
            # each snapshot's logical content EXCLUDES its tombstones;
            # without this a later physical resolution of an old DV row
            # would read as a spurious delete
            df = df.join(dv.select(*primary_keys).distinct(),
                         on=primary_keys, how="left_anti")
        return df

    old = _read(m_from, changed_parts)
    new = _read(m_to, changed_parts)
    # the diff may cross a schema-evolution boundary (ADD/DROP COLUMN
    # between the versions): compare over the COLUMN UNION, null-filling
    # whichever side predates the column — matching the mergeSchema
    # semantics of the reads themselves
    data_cols = sorted(
        (set(new.columns) | set(old.columns)) - {part_col})
    for c in data_cols:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None))
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None))
    o = old.select(*[F.col(c).alias(f"__o_{c}") for c in old.columns])
    join_cond = [o[f"__o_{k}"].eqNullSafe(new[k]) for k in primary_keys]
    j = new.join(o, join_cond, "full_outer")
    new_key = new[primary_keys[0]]
    old_key = o[f"__o_{primary_keys[0]}"]
    same = [new[c].eqNullSafe(o[f"__o_{c}"]) for c in data_cols]
    unchanged = same[0]
    for s in same[1:]:
        unchanged = unchanged & s
    change = (F.when(old_key.isNull(), F.lit("insert"))
              .when(new_key.isNull(), F.lit("delete"))
              .when(unchanged, F.lit(None))
              .otherwise(F.lit("update_postimage")))
    out_cols = [F.coalesce(new[c], o[f"__o_{c}"]).alias(c)
                for c in data_cols]
    diff = (j.select(*out_cols, change.alias("_change_type"))
            .where(F.col("_change_type").isNotNull()))
    if include_preimages:
        # Delta-CDF parity: updates also emit their BEFORE image, which
        # is what lets signed-partial IVM consumers (retraction algebra)
        # maintain aggregates from the feed alone
        pre = (j.where(change.eqNullSafe(F.lit("update_postimage")))
               .select(*[o[f"__o_{c}"].alias(c) for c in data_cols],
                       F.lit("update_preimage").alias("_change_type")))
        diff = diff.unionByName(pre)
    # DV-only deletes: tombstones added between the versions in
    # partitions whose FILES did not change (file-diff can't see them —
    # the sidecar carries the full deleted rows precisely for this)
    dv_to = _read_dv(spark, local, m_to)
    if dv_to is not None:
        new_dels = dv_to
        dv_from = _read_dv(spark, local, m_from)
        if dv_from is not None:
            new_dels = new_dels.join(
                dv_from.select(*primary_keys).distinct(),
                on=primary_keys, how="left_anti")
        if changed_parts:
            new_dels = new_dels.where(
                ~F.col(part_col).cast("string").isin(changed_parts))
        for c in data_cols:
            if c not in new_dels.columns:
                new_dels = new_dels.withColumn(c, F.lit(None))
        diff = diff.unionByName(new_dels.select(
            *data_cols, F.lit("delete").alias("_change_type")))
    return diff


def compact_versioned(path: str, target_partitions: list[str] | None = None
                      ) -> dict:
    """Small-file compaction as a new manifest version: rewrite each
    targeted partition's files into one, commit manifest v{N+1} with the
    SAME logical content. Readers pinned to older versions keep the old
    small files (vacuum reclaims them once those versions expire) —
    compaction is just another snapshot-isolated commit, never an
    in-place mutation. Returns {"version", "compacted": {part: (files
    before, files after)}}."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    m = _load_manifest(local, versions[-1])
    part_col = m["part_col"]
    targets = [v for v in m["files"]
               if (target_partitions is None or v in target_partitions)
               and len(m["files"][v]) > 1]
    files = {v: list(fs) for v, fs in m["files"].items()}
    compacted = {}
    dv_df = _read_dv(spark, local, m)
    dv_pks = m.get("pks") or []
    for v in targets:
        old_paths = [os.path.join(local, rel) for rel in files[v]]
        df = (spark.read.option("mergeSchema", "true")
              .option("basePath", local).parquet(*old_paths))
        if dv_df is not None:
            # compaction resolves this partition's tombstones physically
            df = df.join(dv_df.select(*dv_pks).distinct(),
                         on=dv_pks, how="left_anti")
        staging = local.rstrip("/") + f".__cmp_{uuid.uuid4().hex[:12]}__"
        (df.drop(part_col).coalesce(1)
         .write.mode("overwrite").parquet(staging))
        live_dir = os.path.join(local, f"{part_col}={v}")
        new_rel = []
        for fn in os.listdir(staging):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(staging, fn),
                          os.path.join(live_dir, fn))
                new_rel.append(f"{part_col}={v}/{fn}")
        shutil.rmtree(staging, ignore_errors=True)
        compacted[v] = (len(files[v]), len(new_rel))
        files[v] = sorted(new_rel)
    if not compacted:
        return {"version": versions[-1], "compacted": {}}
    prev_stats = m.get("file_stats", {})
    stat_cols = sorted({c for s in prev_stats.values() for c in s})
    file_stats = {rel: prev_stats[rel]
                  for fs in files.values() for rel in fs
                  if rel in prev_stats}
    if stat_cols:
        fresh = [rel for v2, fs in files.items() if v2 in compacted
                 for rel in fs if rel not in prev_stats]
        file_stats.update(collect_file_stats(local, fresh, stat_cols))
    new_version = versions[-1] + 1
    dv_rel, dv_rows = None, 0
    if dv_df is not None:
        dv_rest = dv_df.where(~F.col(part_col).cast("string")
                              .isin(list(compacted)))
        dv_rows = dv_rest.count()
        if dv_rows:
            dv_rel = _write_dv(dv_rest, local, new_version)
    manifest = {"version": new_version, "ts": time.time(),
                "part_col": part_col, "schema": m["schema"],
                "files": files, "file_stats": file_stats,
                "dv": dv_rel, "pks": m.get("pks"),
                "dv_rows": dv_rows,
                "op": {"rewritten": sorted(compacted), "dropped": []}}
    manifest.update(_refresh_blooms(
        local, m, files,
        [rel for v2 in compacted for rel in files[v2]]))
    try:
        _commit_manifest(local, new_version, manifest)
    except FileExistsError:
        raise CommitConflictError(
            f"version {new_version} was committed concurrently") \
            from None
    return {"version": new_version, "compacted": compacted}


def _parquet_min_max(abs_path: str, cols: set[str]) -> dict:
    """Per-file min/max for ``cols`` straight from the parquet FOOTER
    (row-group statistics — no data pages read). Columns missing stats
    in any row group are omitted (absent stats = never skip, always
    safe)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    out: dict = {"__rows": md.num_rows}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if name not in cols or name in bad:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                out.pop(name, None)
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn = mn.decode("utf-8", "replace")
            if isinstance(mx, bytes):
                mx = mx.decode("utf-8", "replace")
            if name in out:
                out[name] = [min(out[name][0], mn), max(out[name][1], mx)]
            else:
                out[name] = [mn, mx]
    return out


def collect_file_stats(local: str, rels: list[str],
                       cols: list[str]) -> dict:
    return {rel: _parquet_min_max(os.path.join(local, rel), set(cols))
            for rel in rels}


def _bloom_canon(value) -> str:
    """Canonical hash key for a bloom value (ADVICE r5): index-time
    values come from pyarrow (Decimal('7.0000'), numpy scalars) while
    plan-time values are caller literals (7.0, 7) — hashing raw str()
    representations made equal values hash differently, and a bloom
    FALSE NEGATIVE silently prunes a file that contains the key. All
    numeric types collapse to one representation: integral values to
    'i:<int>', fractional to 'd:<plain-decimal>' (trailing zeros
    stripped, no exponent form)."""
    import datetime
    import decimal

    if value is None:
        return "\x00null"
    if isinstance(value, bool):
        return f"b:{int(value)}"
    if hasattr(value, "item") and not isinstance(
            value, (str, bytes)):  # numpy scalar → python scalar
        value = value.item()
    if isinstance(value, int):
        return f"i:{value}"
    if isinstance(value, float):
        if value != value:
            return "f:nan"
        if value in (float("inf"), float("-inf")):
            return f"f:{value}"
        d = decimal.Decimal(repr(value))
    elif isinstance(value, decimal.Decimal):
        d = value
    elif isinstance(value, (datetime.datetime, datetime.date)):
        return f"t:{value.isoformat()}"
    else:
        return f"s:{value}"
    if d == d.to_integral_value():
        return f"i:{int(d)}"
    return f"d:{format(d.normalize(), 'f')}"


def _bloom_hashes(value, m: int, k: int) -> list[int]:
    import hashlib

    canon = _bloom_canon(value)
    return [int(hashlib.md5(f"b{j}|{canon}".encode()).hexdigest()[:8],
                16) % m for j in range(k)]


# Bloom payload format version. v2 = canonicalized hash keys
# (_bloom_canon). Persisted blooms built before versioning (or under a
# different canonicalization) carry no/another version marker; probing
# them with current hashes would produce silent FALSE-NEGATIVE file
# pruning, so _bloom_may_contain treats any version mismatch as "may
# contain" (no pruning) until index_bloom_versioned rebuilds them.
BLOOM_FORMAT_VERSION = 2


def _build_bloom(values, bits_per_key: int = 10, k: int = 4) -> dict:
    m = max(64, len(values) * bits_per_key)
    bits = 0
    for v in values:
        for h in _bloom_hashes(v, m, k):
            bits |= 1 << h
    return {"m": m, "k": k, "bits": format(bits, "x"),
            "fmt": BLOOM_FORMAT_VERSION}


def _bloom_may_contain(bloom: dict, value) -> bool:
    if bloom.get("fmt") != BLOOM_FORMAT_VERSION:
        return True  # unknown/older format: never prune on it
    bits = int(bloom["bits"], 16)
    return all(bits >> h & 1
               for h in _bloom_hashes(value, bloom["m"], bloom["k"]))


def collect_file_blooms(local: str, rels: list[str], col: str,
                        bits_per_key: int = 10, k: int = 4) -> dict:
    """Per-file Bloom filter over ``col``'s values (footer-adjacent
    metadata read: pyarrow reads ONLY that column). 10 bits/key, k=4
    gives ~1% false positives — a false positive costs one extra file
    scan, never a wrong answer (the row filter still applies)."""
    import pyarrow.parquet as pq

    out = {}
    for rel in rels:
        vals = pq.read_table(os.path.join(local, rel),
                             columns=[col])[col].to_pylist()
        out[rel] = _build_bloom(vals, bits_per_key, k)
    return out


def _refresh_blooms(local: str, prev_m: dict,
                    files: dict[str, list[str]],
                    fresh_rels: list[str]) -> dict:
    """Carry per-file blooms for retained files; index fresh files
    under the table's bloom_spec. Returns manifest fields (empty dict
    if the table has no bloom index)."""
    spec = prev_m.get("bloom_spec")
    if not spec:
        return {}
    prev_b = prev_m.get("file_blooms", {})
    out = {rel: prev_b[rel] for fs in files.values() for rel in fs
           if rel in prev_b}
    if fresh_rels:
        newb = collect_file_blooms(local, fresh_rels, spec["col"],
                                   spec["bits_per_key"], spec["k"])
        out.update({rel: {spec["col"]: b} for rel, b in newb.items()})
    return {"file_blooms": out, "bloom_spec": spec}


def index_bloom_versioned(path: str, col: str, bits_per_key: int = 10,
                          k: int = 4) -> dict:
    """CREATE BLOOMFILTER INDEX analog: commit a new manifest version
    whose files are UNCHANGED but carry a per-file Bloom over ``col``
    — the point-lookup complement of the min/max stats index. Where
    range stats prove nothing on an unclustered high-cardinality key
    (every file spans the whole domain), the Bloom skips every file
    that provably lacks the key: a needle lookup on a 100 TB table
    reads ~1 file instead of a partition. Subsequent merges keep the
    index fresh automatically (carried files keep their blooms, new
    files are indexed at commit). Returns {"version", "indexed"}."""
    import pyarrow.parquet as pq

    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    m = _load_manifest(local, versions[-1])
    rels = [rel for fs in m["files"].values() for rel in fs]
    # temporal columns are rejected: a plan-time literal ('2024-01-01',
    # datetime, epoch int) has no single canonical text form, and any
    # representation mismatch is a silent false-negative prune (missing
    # rows). Numerics are safe via _bloom_canon; use min/max range
    # stats for temporal needles.
    if rels:
        f0 = pq.read_schema(os.path.join(local, rels[0])).field(col)
        import pyarrow as pa
        if (pa.types.is_temporal(f0.type)):
            raise ValueError(
                f"bloom index on temporal column {col!r} is unsupported "
                "(ambiguous literal representation would cause silent "
                "false-negative pruning); use key_range stats instead")
    blooms = {rel: {col: b} for rel, b in
              collect_file_blooms(local, rels, col, bits_per_key,
                                  k).items()}
    new_version = versions[-1] + 1
    manifest = dict(m)
    manifest.update({
        "version": new_version, "ts": time.time(),
        "file_blooms": blooms,
        "bloom_spec": {"col": col, "bits_per_key": bits_per_key,
                       "k": k},
        "op": {"rewritten": [], "dropped": [],
               "bloom_indexed": len(rels)}})
    try:
        _commit_manifest(local, new_version, manifest)
    except FileExistsError:
        raise CommitConflictError(
            f"version {new_version} was committed concurrently") \
            from None
    return {"version": new_version, "indexed": len(rels)}


def plan_files(path: str, version: int | None = None,
               key_range: tuple | None = None,
               point: tuple | None = None,
               parts: tuple | None = None) -> dict:
    """The data-skipping planner: resolve a version's file list and, if
    ``key_range = (col, lo, hi)`` is given, drop every file whose
    footer min/max (recorded in the manifest at commit time) proves it
    holds no row in [lo, hi]. Files without recorded stats are always
    kept. Returns {"paths", "skipped", "total"} — the pruning evidence
    tests assert on. At 100 TB this is the difference between scanning
    a partition and scanning the 2 files in it that cover the key."""
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _load_manifest(local, v)
    if parts is not None:
        kind = parts[0]
        if kind == "range":
            keep_part = lambda pv: parts[1] <= pv <= parts[2]
        elif kind == "set":
            allowed = set(parts[1])
            keep_part = lambda pv: pv in allowed
        else:
            raise ValueError(f"bad parts predicate {parts!r}")
        part_items = [(pv, fs) for pv, fs in m["files"].items()
                      if keep_part(pv)]
    else:
        part_items = list(m["files"].items())
    rels = [rel for _, fs in part_items for rel in fs]
    n_all = sum(len(fs) for fs in m["files"].values())
    stats = m.get("file_stats", {})
    if key_range is None:
        ranges = []
    elif isinstance(key_range, list):
        ranges = key_range  # AND of several (col, lo, hi) predicates
    else:
        ranges = [key_range]
    blooms = m.get("file_blooms", {})
    kept = []
    for rel in rels:
        fstats = stats.get(rel, {})
        skip = False
        for col, lo, hi in ranges:
            st = fstats.get(col)
            if st is not None and (st[1] < lo or st[0] > hi):
                skip = True
                break
        if not skip and point is not None:
            pcol, pval = point
            fb = blooms.get(rel, {}).get(pcol)
            if fb is not None and not _bloom_may_contain(fb, pval):
                skip = True
        if not skip:
            kept.append(rel)
    return {"paths": [os.path.join(local, rel) for rel in kept],
            "skipped": n_all - len(kept), "total": n_all,
            "schema": m["schema"], "dv": m.get("dv"),
            "pks": m.get("pks")}


def partition_transform_expr(spec: str):
    """Iceberg-style partition TRANSFORM -> a string partition-value
    Column (hidden partitioning: the table is partitioned by a
    FUNCTION of a data column, and readers prune by predicates on the
    data column — they never mention the partition column):

      identity(col) | day(ts_col) | month(ts_col) |
      truncate(W, col) | bucket(N, col)

    Values are strings (hive dir names); day/month use ISO formats so
    lexicographic order == chronological order (what makes range
    pruning a string comparison)."""
    import re as _re

    m = _re.fullmatch(r"(\w+)\(([^)]*)\)", spec.strip())
    if not m:
        raise ValueError(f"bad partition transform {spec!r}")
    fn, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
    if fn == "identity":
        return F.col(args[0]).cast("string")
    if fn == "day":
        return F.date_format(F.col(args[0]), "yyyy-MM-dd")
    if fn == "month":
        return F.date_format(F.col(args[0]), "yyyy-MM")
    if fn == "truncate":
        w = int(args[0])
        return (F.floor(F.col(args[1]) / w) * w).cast("long").cast("string")
    if fn == "bucket":
        n = int(args[0])
        return F.pmod(F.xxhash64(F.col(args[1])), F.lit(n)).cast("string")
    raise ValueError(f"unknown partition transform {fn!r}")


def with_transform_partition(df: DataFrame, spec: str,
                             part_col: str = "part") -> DataFrame:
    """Attach the hidden-partition value column for ``spec``.

    If ``spec`` derives from an UPDATABLE column (day(ts), truncate on a
    mutable attribute), an upsert can move a key across partitions —
    merge such tables with ``track_partition_moves=True`` (see the
    partition-column contract on merge_into_versioned_parquet).
    ``bucket(n, pk)`` specs are move-free by construction."""
    return df.withColumn(part_col, partition_transform_expr(spec))


def partitions_for_range(spec: str, lo, hi):
    """The partition-value predicate implied by ``col BETWEEN lo AND
    hi`` under ``spec`` — the planner half of hidden partitioning.
    Returns ("range", lo_s, hi_s) for order-preserving transforms
    (identity/day/month: ISO strings compare chronologically;
    truncate: explicit value set), or None when the transform cannot
    prune ranges (bucket — use partitions_for_point)."""
    import datetime as _dt
    import re as _re

    m = _re.fullmatch(r"(\w+)\(([^)]*)\)", spec.strip())
    fn, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
    if fn == "identity":
        return ("range", str(lo), str(hi))
    if fn in ("day", "month"):
        pat = "%Y-%m-%d" if fn == "day" else "%Y-%m"
        f = lambda v: v.strftime(pat) if isinstance(
            v, (_dt.date, _dt.datetime)) else str(v)
        return ("range", f(lo), f(hi))
    if fn == "truncate":
        w = int(args[0])
        vals = [str(b) for b in range((int(lo) // w) * w,
                                      (int(hi) // w) * w + 1, w)]
        return ("set", vals)
    return None


def partitions_for_point(spec: str, value):
    """The single partition value holding ``col == value``."""
    import re as _re

    m = _re.fullmatch(r"(\w+)\(([^)]*)\)", spec.strip())
    fn, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
    if fn == "bucket":
        # xxhash64 is engine-side; resolve via a 1-row local job is
        # overkill — callers with bucket specs prune via plan-time
        # evaluation in Spark; return None to read all partitions.
        return None
    r = partitions_for_range(spec, value, value)
    if r is None:
        return None
    return ("set", [r[1]]) if r[0] == "range" else r


def metadata_aggregate(path: str, version: int | None = None) -> dict:
    """Answer COUNT(*)/MIN/MAX from the MANIFEST alone — zero data
    files read (the Delta/Iceberg metadata-only query optimization):
    row counts come from the per-file footer counts recorded at commit
    (``__rows`` in file_stats), min/max from the recorded footer
    stats. On a 100 TB table this turns "how many rows" from a
    full-table scan into one JSON read.

    With live deletion vectors the count stays EXACT (tombstoned rows
    are counted at DV-commit time and subtracted) but min/max become
    BOUNDS — a tombstone could hold the extremum — so the result
    carries ``minmax_exact``: False until the next merge/compaction
    resolves the tombstones. Raises if any file predates row-count
    recording (recommit or compact to refresh)."""
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    v = versions[-1] if version is None else version
    m = _load_manifest(local, v)
    stats = m.get("file_stats", {})
    rels = [rel for fs in m["files"].values() for rel in fs]
    missing = [rel for rel in rels
               if "__rows" not in stats.get(rel, {})]
    if missing:
        raise ValueError(
            f"{len(missing)} files lack recorded row counts "
            "(pre-upgrade commits) — compact or re-merge to refresh")
    n = sum(stats[rel]["__rows"] for rel in rels) -         (m.get("dv_rows") or 0)
    cols: dict = {}
    stat_cols = {c for rel in rels for c in stats[rel] if c != "__rows"}
    for c in stat_cols:
        per = [stats[rel].get(c) for rel in rels]
        if any(p is None for p in per):
            continue  # not every file has stats for c: no sound bound
        cols[c] = [min(p[0] for p in per), max(p[1] for p in per)]
    return {"version": v, "n_rows": n,
            "minmax_exact": not m.get("dv"), "columns": cols}


def cluster_versioned(path: str, sort_col: str | None = None,
                      files_per_partition: int = 4,
                      target_partitions: list[str] | None = None,
                      zorder_cols: list[str] | None = None) -> dict:
    """Re-cluster partitions by ``sort_col`` as a new manifest version —
    the OPTIMIZE ... ZORDER analog for the one-dimension case: each
    targeted partition is rewritten as ``files_per_partition``
    range-partitioned, internally sorted files, so every file covers a
    NARROW band of the sort key and the manifest's footer-stats index
    (plan_files) can skip most files for a range predicate. Without
    clustering, every file of an unsorted ingest spans the whole key
    range and stats can prove nothing.

    Logical no-op, snapshot-isolated like compaction: older readers
    keep the unclustered files until their versions expire. Returns
    {"version", "clustered": {part: (files_before, files_after)}}."""
    from pyspark.sql import SparkSession, functions as _F

    if (sort_col is None) == (zorder_cols is None):
        raise ValueError("pass exactly one of sort_col / zorder_cols")
    spark = SparkSession.getActiveSession()
    local = _local(path)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    m = _load_manifest(local, versions[-1])
    part_col = m["part_col"]
    targets = [v for v in m["files"]
               if target_partitions is None or v in target_partitions]
    files = {v: list(fs) for v, fs in m["files"].items()}
    prev_stats = m.get("file_stats", {})
    key_cols = [sort_col] if sort_col else list(zorder_cols)
    stat_cols = sorted({c for s in prev_stats.values()
                        for c in s} | set(key_cols))
    clustered = {}
    file_stats = {}
    dv_df = _read_dv(spark, local, m)
    dv_pks = m.get("pks") or []
    for v in targets:
        old_paths = [os.path.join(local, rel) for rel in files[v]]
        df = (spark.read.option("mergeSchema", "true")
              .option("basePath", local).parquet(*old_paths))
        if dv_df is not None:
            df = df.join(dv_df.select(*dv_pks).distinct(),
                         on=dv_pks, how="left_anti")
        staging = local.rstrip("/") + f".__clu_{uuid.uuid4().hex[:12]}__"
        if zorder_cols:
            # multi-dimension OPTIMIZE ZORDER: range-partition + sort by
            # the Morton key so every file covers a narrow HYPERCUBE and
            # footer stats prune range predicates on ANY keyed dimension
            from .partitioning import zorder_key

            sort_expr = zorder_key(zorder_cols)
        else:
            sort_expr = _F.col(sort_col)
        (df.drop(part_col).withColumn("__zk", sort_expr)
         .repartitionByRange(files_per_partition, _F.col("__zk"))
         .sortWithinPartitions("__zk")
         .drop("__zk")
         .write.mode("overwrite").parquet(staging))
        live_dir = os.path.join(local, f"{part_col}={v}")
        new_rel = []
        for fn in os.listdir(staging):
            if fn.endswith(".parquet"):
                os.rename(os.path.join(staging, fn),
                          os.path.join(live_dir, fn))
                new_rel.append(f"{part_col}={v}/{fn}")
        shutil.rmtree(staging, ignore_errors=True)
        clustered[v] = (len(files[v]), len(new_rel))
        files[v] = sorted(new_rel)
        file_stats.update(
            collect_file_stats(local, files[v], stat_cols))
    # untouched partitions keep their recorded stats
    file_stats.update({rel: prev_stats[rel]
                       for v2, fs in files.items() if v2 not in clustered
                       for rel in fs if rel in prev_stats})
    if not clustered:
        return {"version": versions[-1], "clustered": {}}
    new_version = versions[-1] + 1
    dv_rel, dv_rows = None, 0
    if dv_df is not None:
        dv_rest = dv_df.where(~_F.col(part_col).cast("string")
                              .isin(list(clustered)))
        dv_rows = dv_rest.count()
        if dv_rows:
            dv_rel = _write_dv(dv_rest, local, new_version)
    manifest = {"version": new_version, "ts": time.time(),
                "part_col": part_col, "schema": m["schema"],
                "files": files, "file_stats": file_stats,
                "dv": dv_rel, "pks": m.get("pks"),
                "dv_rows": dv_rows,
                "op": {"rewritten": sorted(clustered), "dropped": []}}
    manifest.update(_refresh_blooms(
        local, m, files,
        [rel for v2 in clustered for rel in files[v2]]))
    try:
        _commit_manifest(local, new_version, manifest)
    except FileExistsError:
        raise CommitConflictError(
            f"version {new_version} was committed concurrently") \
            from None
    return {"version": new_version, "clustered": clustered}
