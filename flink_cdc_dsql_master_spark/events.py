"""Change-event model.

Reference counterparts (flink-cdc-common .../event/):
- ``DataChangeEvent.java:34`` — tableId/before/after/op/meta; ops INSERT,
  UPDATE, REPLACE, DELETE (OperationType.java:26-31).
- Schema change events: CreateTableEvent, AddColumnEvent (with
  FIRST/LAST/BEFORE/AFTER position), DropColumnEvent, RenameColumnEvent,
  AlterColumnTypeEvent, DropTableEvent, TruncateTableEvent.
- ``FlushEvent`` — a sink-flush barrier. Not needed on Spark: foreachBatch
  is already a synchronous per-micro-batch barrier.

Spark design (SURVEY §1.1): a CDC micro-batch is a *flattened after-image
DataFrame* plus an ``__op`` column; DELETE rows carry the before image in
the data columns (Debezium-flattened convention), so upsert sinks always
key off the data columns. Schema change events never enter a DataFrame —
they are driver-side control flow (dataclasses below).

Op codes match the reference's metadata column ``__data_event_type__``:
``+I`` insert, ``-U`` update-before, ``+U`` update-after, ``-D`` delete.
REPLACE is materialized as ``+U`` (same sink behavior: upsert).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, functions as F

from .schema import Schema, TableId

OP_COLUMN = "__op"
TABLE_ID_COLUMN = "__table_id"
SEQ_COLUMN = "__seq"  # per-row change sequence (binlog pos / LSN analog)
OP_TS_COLUMN = "__op_ts"  # source commit timestamp (MySQL op_ts analog)

# Every harness-internal metadata column. Sinks/encoders/mergers exclude
# THIS tuple (never a hand-typed subset) so a future metadata column can't
# leak into wire payloads or persisted tables at one forgotten site —
# op_ts appears in output only when a transform explicitly projects it
# (reference: metadata columns are opt-in projections, TransformParser).
INTERNAL_COLUMNS = (OP_COLUMN, TABLE_ID_COLUMN, SEQ_COLUMN, OP_TS_COLUMN)

OP_INSERT = "+I"
OP_UPDATE_BEFORE = "-U"
OP_UPDATE_AFTER = "+U"
OP_DELETE = "-D"
# whole-table truncate marker (all payload columns NULL) — the row-level
# carrier of the reference's TruncateTableEvent (TruncateTableEvent.java:30)
# when it arrives inside a changelog stream (e.g. pgoutput 'T' messages)
OP_TRUNCATE = "-T"

# ops that contribute a *current* image (upsert side)
UPSERT_OPS = (OP_INSERT, OP_UPDATE_AFTER)


class ColumnPosition(Enum):
    FIRST = "FIRST"
    LAST = "LAST"
    BEFORE = "BEFORE"
    AFTER = "AFTER"


@dataclass(frozen=True)
class SchemaChangeEvent:
    table_id: TableId


@dataclass(frozen=True)
class CreateTableEvent(SchemaChangeEvent):
    schema: Schema


@dataclass(frozen=True)
class AddColumnEvent(SchemaChangeEvent):
    """Add one column. `type_string` is a reference type (types.parse_type).

    ``generated`` marks a MySQL generated column: ``"VIRTUAL"`` values
    are never written to binlog row images (the present bitmap excludes
    them; the decode yields NULL — the Debezium behavior), ``"STORED"``
    values ARE logged and the column behaves like an ordinary one."""

    name: str
    type_string: str
    position: ColumnPosition = ColumnPosition.LAST
    anchor: str | None = None  # existing column for BEFORE/AFTER
    default: str | None = None
    generated: str | None = None  # None | "VIRTUAL" | "STORED"


@dataclass(frozen=True)
class DropColumnEvent(SchemaChangeEvent):
    name: str


@dataclass(frozen=True)
class RenameColumnEvent(SchemaChangeEvent):
    old_name: str
    new_name: str


@dataclass(frozen=True)
class AlterColumnTypeEvent(SchemaChangeEvent):
    name: str
    new_type_string: str


@dataclass(frozen=True)
class DropTableEvent(SchemaChangeEvent):
    pass


@dataclass(frozen=True)
class TruncateTableEvent(SchemaChangeEvent):
    pass


def is_changelog(df: DataFrame) -> bool:
    return OP_COLUMN in df.columns


def data_columns(df: DataFrame) -> list[str]:
    """The payload columns of a changelog frame (order preserved)."""
    internal = {OP_COLUMN, TABLE_ID_COLUMN, SEQ_COLUMN}
    return [c for c in df.columns if c not in internal]


def as_changelog(df: DataFrame, op: str = OP_INSERT,
                 table_id: str | None = None) -> DataFrame:
    """Tag a plain DataFrame as a changelog of `op` rows."""
    out = df
    if OP_COLUMN not in out.columns:
        out = out.withColumn(OP_COLUMN, F.lit(op))
    if table_id is not None and TABLE_ID_COLUMN not in out.columns:
        out = out.withColumn(TABLE_ID_COLUMN, F.lit(table_id))
    return out
