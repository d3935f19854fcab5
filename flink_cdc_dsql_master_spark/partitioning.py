"""PK-hash partitioning + per-key last-write-wins discipline.

Reference counterparts:
- ``RegularPrePartitionOperator.java:54`` (partitionBy :104-110): route each
  DataChangeEvent to ``hash(tableId, pk values) % parallelism`` so one key
  is always applied by one sink subtask, preserving per-key order.
- ``DefaultDataChangeEventHashFunctionProvider.java:57-73``:
  ``Objects.hash(tableId, op?, pk values) & 0x7FFFFFFF``.

Spark design: within a micro-batch, per-key ordering is established by a
sequence column (binlog position / LSN analog) instead of operator-arrival
order — ``Window.partitionBy(pk).orderBy(desc(seq))`` + ``row_number() = 1``
reduces the batch to one final image per key (last-write-wins), which an
idempotent upsert applies atomically. Across batches, foreachBatch is a
serial barrier, so no cross-batch race exists. ``repartition(n, pk)`` before
the sink gives the same one-key-one-writer property as the reference's hash
shuffle.

Scale notes (100 TB): the window dedup is one hash shuffle on the PK — the
minimum possible; AQE handles skewed keys (skew-join/partition splitting are
enabled in session.py). ``bucket_expr`` uses a multiplicative/bit-mix hash
expressed in pure Catalyst arithmetic so it is portable (oracle-checkable in
any SQL engine) and stays inside whole-stage codegen; ``xxhash64`` is used
for the non-portable fast path on arbitrary types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window

from .events import (OP_COLUMN, OP_DELETE, OP_INSERT, OP_TRUNCATE,
                     OP_UPDATE_AFTER, OP_UPDATE_BEFORE, SEQ_COLUMN,
                     UPSERT_OPS)

# Knuth multiplicative constant (2^32 / phi) — portable across SQL engines
_KNUTH = 2654435761


def bucket_expr(key: Column | str, num_buckets: int) -> Column:
    """Deterministic, SQL-portable bucket for an integral key.

    ``((key * 2654435761) mod 2^31) mod n`` — multiplicative hashing in plain
    integer arithmetic (same result in Spark, DuckDB, Postgres), Catalyst-
    codegen friendly. For composite/string keys use :func:`hash_bucket_expr`.
    """
    k = F.col(key) if isinstance(key, str) else key
    # pre-mod keeps key * KNUTH < 2^62 (int64-safe for any input)
    k31 = F.pmod(k.cast("long"), F.lit(2147483648))
    mixed = F.pmod(k31 * F.lit(_KNUTH), F.lit(2147483648))
    return F.pmod(mixed, F.lit(num_buckets)).cast("int")


def hash_bucket_expr(keys: list[Column | str], num_buckets: int) -> Column:
    """Fast-path bucket for arbitrary key tuples: xxhash64 & 0x7FFFFFFF mod n
    (DefaultDataChangeEventHashFunctionProvider.java:57-73 analog)."""
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return F.pmod(
        F.xxhash64(*cols).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(num_buckets)
    ).cast("int")


def repartition_by_key(df: DataFrame, primary_keys: list[str],
                       num_partitions: int | None = None) -> DataFrame:
    """One-key-one-writer partitioning before a sink (PrePartition parity)."""
    cols = [F.col(c) for c in primary_keys]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def salt_keys(df: DataFrame, key: str, num_salts: int,
              salt_col: str = "__salt") -> DataFrame:
    """Append a deterministic salt (0..num_salts-1) derived from the row's
    OTHER content via a random-ish spray, splitting one hot key across
    `num_salts` reducers. Join the salted side against the small side
    exploded ×num_salts (`explode_salts`). AQE's skew-join handles most
    cases automatically; salting is the manual override for extreme keys.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)).cast("int"))


def explode_salts(df: DataFrame, num_salts: int,
                  salt_col: str = "__salt") -> DataFrame:
    """Replicate the small side once per salt value for a salted join."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))


def last_write_wins(df: DataFrame, primary_keys: list[str],
                    seq_col: str | None = None) -> DataFrame:
    """Reduce a changelog batch to the final event per key.

    Keeps the row with the highest sequence per PK (ties broken by op rank:
    a delete after an upsert with the same seq wins — matches the
    apply-in-order semantics of the reference sink). One shuffle on the PK.
    """
    seq = seq_col or (SEQ_COLUMN if SEQ_COLUMN in df.columns else None)
    order = []
    if seq is not None:
        order.append(F.col(seq).desc())
    # Op-rank tie-break for equal seq (a -U/+U pair decoded from one log
    # offset shares one seq): -D (2) > upsert images (1) > -U before-image
    # (0), so the retraction can never shadow its own after-image.
    order.append(
        F.when(F.col(OP_COLUMN) == OP_DELETE, 2)
        .when(F.col(OP_COLUMN).isin(*UPSERT_OPS), 1)
        .otherwise(0).desc())
    w = Window.partitionBy(*[F.col(c) for c in primary_keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(df: DataFrame, primary_keys: list[str],
                    seq_col: str | None = None,
                    truncate_aware: bool = False) -> DataFrame:
    """Materialize a changelog into its final table state.

    last-write-wins per key, then drop keys whose final event is DELETE and
    strip internal columns — the exact state an upsert sink would leave in
    the target table. This is the batch-mode oracle of the reference's
    ``INSERT .. ON CONFLICT DO UPDATE`` + DELETE sink
    (DsqlBatchSinkFunction.java:121-180).

    ``truncate_aware=True`` additionally honors ``-T`` whole-table
    truncate rows (the reference's TruncateTableEvent inside a changelog,
    e.g. pgoutput 'T' messages): every event sequenced at or before the
    LAST truncate is discarded before LWW — DELETE-all semantics, with
    later re-inserts surviving. Cost: one scalar aggregate + a broadcast
    filter; opt-in so the common truncate-free path pays nothing.
    """
    if truncate_aware:
        seq = seq_col or SEQ_COLUMN
        trunc = (df.where(F.col(OP_COLUMN) == OP_TRUNCATE)
                 .agg(F.max(F.col(seq)).alias("__trunc_seq")))
        df = (df.where(F.col(OP_COLUMN) != OP_TRUNCATE)
              .crossJoin(F.broadcast(trunc))
              .where(F.col("__trunc_seq").isNull()
                     | (F.col(seq) > F.col("__trunc_seq")))
              .drop("__trunc_seq"))
    final = last_write_wins(df, primary_keys, seq_col)
    final = final.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
    drop = [c for c in (OP_COLUMN, SEQ_COLUMN, "__table_id", "__op_ts")
            if c in final.columns]
    return final.drop(*drop)


def scd2_history(df: DataFrame, primary_keys: list[str],
                 seq_col: str | None = None) -> DataFrame:
    """Materialize a changelog as a type-2 slowly-changing-dimension
    history: one row per key VERSION with ``valid_from_seq`` /
    ``valid_to_seq`` (NULL = still open) and ``is_current``.

    Each upsert image opens a version valid from its sequence; the key's
    next event (a newer image or a delete) closes it. Delete events close
    the running version without opening one, so a deleted key has no
    current row; a later re-insert opens a fresh version. Before-images
    (-U) are ignored — they duplicate their after-image's content.

    The reference's sinks only keep the latest image
    (DsqlBatchSinkFunction upsert semantics); SCD2 is the lakehouse
    history-table extension of the same changelog. Cost: ONE PK-hash
    shuffle for the lead() window — identical to ``last_write_wins``.
    """
    seq = seq_col or SEQ_COLUMN
    eventful = df.where(F.col(OP_COLUMN) != OP_UPDATE_BEFORE)
    w = (Window.partitionBy(*[F.col(c) for c in primary_keys])
         .orderBy(F.col(seq).asc()))
    versioned = eventful.withColumn("__nxt", F.lead(F.col(seq)).over(w))
    out = (versioned.where(F.col(OP_COLUMN).isin(*UPSERT_OPS))
           .withColumn("valid_from_seq", F.col(seq).cast("long"))
           .withColumn("valid_to_seq", F.col("__nxt").cast("long"))
           .withColumn("is_current", F.col("__nxt").isNull()))
    drop = [c for c in (OP_COLUMN, seq, "__nxt", "__table_id", "__op_ts")
            if c in out.columns]
    return out.drop(*drop)


def minimal_changelog(df: DataFrame, existing_keys: DataFrame,
                      primary_keys: list[str],
                      seq_col: str | None = None) -> DataFrame:
    """Normalize a changelog batch to the MINIMAL op set against a target.

    Per key: reduce to the final image (last-write-wins), then rewrite the
    op against what the sink already holds — final upsert becomes +I for
    an absent key / +U for a present one; a final delete for an absent key
    is dropped entirely (net no-op, e.g. insert+delete inside one batch).
    Sinks replaying the result touch each key at most once and never issue
    dead deletes — the reference's upsert batching
    (DsqlBatchSinkFunction.java:121-180) gets exactly this row set.

    ``existing_keys`` needs only the PK columns. Cost: the LWW window
    shuffle + one left join on the PK (broadcast when the key set is a
    dimension; co-partitioned hash join otherwise).
    """
    final = last_write_wins(df, primary_keys, seq_col)
    marker = existing_keys.select(
        *[F.col(c) for c in primary_keys]).distinct() \
        .withColumn("__exists", F.lit(True))
    joined = final.join(marker, primary_keys, "left")
    is_present = F.col("__exists").isNotNull()
    out = (joined
           .where(F.col(OP_COLUMN).isin(*UPSERT_OPS) | is_present)
           .withColumn(
               OP_COLUMN,
               F.when(F.col(OP_COLUMN) == OP_DELETE, OP_DELETE)
               .when(is_present, OP_UPDATE_AFTER)
               .otherwise(OP_INSERT)))
    return out.drop("__exists")


def scd2_apply_increment(history: DataFrame | None, batch: DataFrame,
                         primary_keys: list[str],
                         seq_col: str | None = None) -> DataFrame:
    """Fold one changelog batch into an existing SCD2 history.

    Open versions of keys appearing in the batch are closed at the key's
    first batch sequence; the batch's own versions append via
    :func:`scd2_history`. Applying a changelog in any batch partitioning
    yields the identical history to one-shot ``scd2_history`` (the
    incremental-maintenance invariant, pytest-enforced).

    Cost per batch: the batch's own LWW-window shuffle + ONE key join
    against the history — never a history rescan-and-rebuild.

    Assumes batches arrive in sequence order (every batch event newer
    than the history's latest for its key) — exactly what the
    foreachBatch serial barrier over an ordered changelog source
    guarantees; out-of-order cross-batch delivery would need a
    rebuild of the affected keys from retained raw events.
    """
    seq = seq_col or SEQ_COLUMN
    inc = scd2_history(batch, primary_keys, seq_col)
    if history is None:
        return inc
    # Close open versions at the first EVENTFUL seq, mirroring
    # scd2_history's -U exclusion: a before-image may carry a lower seq
    # than its paired after-image, and including it would make the
    # incremental fold diverge from a one-shot rebuild.
    firsts = (batch.where(F.col(OP_COLUMN) != OP_UPDATE_BEFORE)
              .groupBy(*primary_keys)
              .agg(F.min(F.col(seq)).cast("long").alias("__first_seq")))
    touched = F.col("__first_seq").isNotNull()
    closed = (history.join(firsts, primary_keys, "left")
              .withColumn(
                  "valid_to_seq",
                  F.when(F.col("is_current") & touched,
                         F.col("__first_seq"))
                  .otherwise(F.col("valid_to_seq")))
              .withColumn("is_current",
                          F.col("is_current") & ~touched)
              .drop("__first_seq"))
    return closed.unionByName(inc)


def merge_presence_state(state: DataFrame | None, delta: DataFrame,
                         keys: list[str]) -> DataFrame:
    """Fold signed presence deltas (rows carrying ``seq`` long and
    ``sign`` ±1) into a keyed membership state: latest event per key
    wins (LWW on seq; at equal seq the positive sign wins, so a -U/+U
    image pair nets to presence), and keys whose winning sign is
    negative drop out — no tombstones, since any later re-add carries a
    higher seq. The index-maintenance primitive shared by the inverted
    index (term, doc) and ANN bucket (bucket, vec) sync paths."""
    merged = delta if state is None else state.unionByName(delta)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col("seq").desc(), F.col("sign").desc())
    return (merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn")
            .where(F.col("sign") > 0))


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` of each column's
    non-negative integer value — pure Catalyst bit arithmetic (codegen,
    SQL-portable, hence oracle-checkable).

    Sorting/range-partitioning by this key before a parquet write
    co-locates rows that are close in EVERY dimension, so min/max
    row-group stats prune multi-dimensional range predicates — the
    OPTIMIZE ZORDER BY of Delta/Iceberg, as a plain column expression.
    With d columns the key uses d·bits bits (keep ≤ 63).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    acc = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.pmod(F.col(c).cast("long"), F.lit(1 << bits))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(
                F.shiftleft(bit, i * n + j).cast("long"))
    return acc


def scd2_as_of(history: DataFrame, seq: int) -> DataFrame:
    """Point-in-time read over an SCD2 history: the table state AS OF
    sequence ``seq`` — rows whose version interval covers it
    (``valid_from_seq <= seq < valid_to_seq``, open intervals unbounded).
    A pure filter over the history (partition-prunable when the history
    is laid out by valid_from ranges); with :func:`scd2_history` this
    gives time travel over any changelog without a table format.
    """
    return (history.where(
        (F.col("valid_from_seq") <= F.lit(seq))
        & (F.col("valid_to_seq").isNull()
           | (F.col("valid_to_seq") > F.lit(seq))))
        .drop("valid_from_seq", "valid_to_seq", "is_current"))
