"""Runtime schema evolution: event application + behavior policies.

Reference counterparts:
- ``SchemaUtils.java`` (621 LoC) — applies each SchemaChangeEvent type to a
  Schema (applySchemaChangeEvent dispatch).
- ``SchemaChangeBehavior.java:27-33`` — IGNORE / LENIENT / TRY_EVOLVE /
  EVOLVE / EXCEPTION.
- ``SchemaDerivator.rewriteSchemaChangeEvents`` (:185-210): EVOLVE/
  TRY_EVOLVE/EXCEPTION pass events through; LENIENT rewrites ADD_COLUMN to
  nullable-append, DROP_COLUMN to keep-but-nullable, RENAME_COLUMN to
  add-new-keep-old; IGNORE forwards only CreateTableEvents.
- ``SchemaCoordinator.java:389-465`` — coordination flow; on Spark the whole
  FlushEvent/RPC machinery collapses into a driver-side function called
  between micro-batches (foreachBatch is already a global barrier).

Everything here is driver-side pure-Python on Schema objects — zero data
movement. The data plane follows up with ``merging.coerce_dataframe`` (pure
Catalyst casts) into the evolved schema.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T

from .events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from .merging import merge_fields
from .schema import Schema, SchemaManager, TableId
from .types import parse_type, to_struct_field


class SchemaChangeBehavior(Enum):
    IGNORE = "IGNORE"
    LENIENT = "LENIENT"
    TRY_EVOLVE = "TRY_EVOLVE"
    EVOLVE = "EVOLVE"
    EXCEPTION = "EXCEPTION"


class SchemaEvolveError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# event application (SchemaUtils.applySchemaChangeEvent parity)
# ---------------------------------------------------------------------------

def apply_schema_change(schema: Schema | None,
                        event: SchemaChangeEvent) -> Schema | None:
    """Apply one schema-change event; returns the new Schema (None = table
    dropped)."""
    if isinstance(event, CreateTableEvent):
        return event.schema
    if schema is None:
        raise SchemaEvolveError(
            f"no schema for {event.table_id}; CreateTableEvent must come first")
    if isinstance(event, AddColumnEvent):
        new_field = to_struct_field(
            event.name, parse_type(event.type_string),
            default=event.default,
            generated=getattr(event, "generated", None))
        fields = list(schema.struct.fields)
        if any(f.name == event.name for f in fields):
            raise SchemaEvolveError(f"column {event.name!r} already exists")
        if event.position == ColumnPosition.FIRST:
            fields.insert(0, new_field)
        elif event.position == ColumnPosition.LAST:
            fields.append(new_field)
        else:
            idx = _index_of(fields, event.anchor)
            if event.position == ColumnPosition.BEFORE:
                fields.insert(idx, new_field)
            else:  # AFTER
                fields.insert(idx + 1, new_field)
        return schema.with_struct(T.StructType(fields))
    if isinstance(event, DropColumnEvent):
        fields = [f for f in schema.struct.fields if f.name != event.name]
        if len(fields) == len(schema.struct.fields):
            raise SchemaEvolveError(f"no such column {event.name!r}")
        return Schema(
            T.StructType(fields),
            tuple(k for k in schema.primary_keys if k != event.name),
            tuple(k for k in schema.partition_keys if k != event.name),
            schema.options, schema.comment,
        )
    if isinstance(event, RenameColumnEvent):
        fields = []
        found = False
        for f in schema.struct.fields:
            if f.name == event.old_name:
                fields.append(T.StructField(
                    event.new_name, f.dataType, f.nullable, f.metadata))
                found = True
            else:
                fields.append(f)
        if not found:
            raise SchemaEvolveError(f"no such column {event.old_name!r}")
        ren = {event.old_name: event.new_name}
        return Schema(
            T.StructType(fields),
            tuple(ren.get(k, k) for k in schema.primary_keys),
            tuple(ren.get(k, k) for k in schema.partition_keys),
            schema.options, schema.comment,
        )
    if isinstance(event, AlterColumnTypeEvent):
        fields = []
        found = False
        for f in schema.struct.fields:
            if f.name == event.name:
                fields.append(to_struct_field(
                    f.name, parse_type(event.new_type_string)))
                found = True
            else:
                fields.append(f)
        if not found:
            raise SchemaEvolveError(f"no such column {event.name!r}")
        return schema.with_struct(T.StructType(fields))
    if isinstance(event, DropTableEvent):
        return None
    if isinstance(event, TruncateTableEvent):
        return schema  # data-only event; schema unchanged
    raise SchemaEvolveError(f"unknown schema change event {event!r}")


def _index_of(fields: list[T.StructField], name: str | None) -> int:
    for i, f in enumerate(fields):
        if f.name == name:
            return i
    raise SchemaEvolveError(f"anchor column {name!r} not found")


# ---------------------------------------------------------------------------
# behavior policies (SchemaDerivator.rewriteSchemaChangeEvents parity)
# ---------------------------------------------------------------------------

def _lenientize(old: Schema | None,
                event: SchemaChangeEvent) -> list[SchemaChangeEvent]:
    """LENIENT rewrites (SchemaDerivator.lenientize*: :212-280)."""
    if isinstance(event, AddColumnEvent):
        # forced nullable, appended LAST
        ts = event.type_string
        if ts.upper().endswith("NOT NULL"):
            ts = ts[: -len("NOT NULL")].strip()
        return [AddColumnEvent(event.table_id, event.name, ts,
                               ColumnPosition.LAST, None, event.default)]
    if isinstance(event, DropColumnEvent):
        # keep the column; it simply stops receiving values (nullable fill)
        return []
    if isinstance(event, RenameColumnEvent):
        # add the new name (nullable, same type), keep the old column
        if old is None or not old.has_column(event.old_name):
            return []
        f = old.field(event.old_name)
        new_events: list[SchemaChangeEvent] = []
        if not old.has_column(event.new_name):
            new_events.append(AddColumnEvent(
                event.table_id, event.new_name,
                _spark_field_type_string(f), ColumnPosition.LAST))
        return new_events
    if isinstance(event, TruncateTableEvent):
        # reference parity: LENIENT ignores table-level truncates (and
        # drops — handled in on_event) at the sink; the data-plane -T
        # changelog path is a separate, behavior-independent mechanism
        return []
    return [event]


def _spark_field_type_string(f: T.StructField) -> str:
    """Render a StructField back to a reference type string (best effort)."""
    dt = f.dataType
    m = {
        T.BooleanType: "BOOLEAN", T.ByteType: "TINYINT",
        T.ShortType: "SMALLINT", T.IntegerType: "INT", T.LongType: "BIGINT",
        T.FloatType: "FLOAT", T.DoubleType: "DOUBLE", T.StringType: "STRING",
        T.BinaryType: "BYTES", T.DateType: "DATE",
        T.TimestampNTZType: "TIMESTAMP", T.TimestampType: "TIMESTAMP_LTZ",
    }
    for cls, name in m.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return "STRING"


class SchemaEvolver:
    """Driver-side evolution policy engine over a SchemaManager registry."""

    def __init__(self, manager: SchemaManager | None = None,
                 behavior: SchemaChangeBehavior = SchemaChangeBehavior.LENIENT):
        self.manager = manager or SchemaManager()
        self.behavior = behavior
        # the POLICY-APPLIED events of the last on_event call — what a
        # sink's MetadataApplier must see (the reference forwards
        # SchemaDerivator's REWRITTEN events, never the raw upstream
        # one: under LENIENT a DropColumnEvent applies as NOTHING, and
        # issuing the raw DROP at the sink would contradict the evolved
        # schema that kept the column)
        self.last_applied: list[SchemaChangeEvent] = []

    def on_event(self, event: SchemaChangeEvent) -> Schema | None:
        """Process one upstream schema-change event; returns the evolved
        (sink-side) schema after policy application (None if dropped)."""
        tid = event.table_id
        # original side always tracks upstream truth
        orig = self.manager.latest_original(tid)
        new_orig = apply_schema_change(orig, event)
        if new_orig is None:
            if self.behavior == SchemaChangeBehavior.EXCEPTION:
                raise SchemaEvolveError(
                    "Unexpected schema change events occurred in "
                    "EXCEPTION mode. Job will fail now. "
                    f"(event: {type(event).__name__} on {tid})")
            if self.behavior in (SchemaChangeBehavior.LENIENT,
                                 SchemaChangeBehavior.IGNORE):
                # the reference's LENIENT/IGNORE modes ignore
                # table-level drops at the sink (the same tolerance
                # that keeps a dropped COLUMN): upstream truth forgets
                # the table, the evolved (sink) side keeps its data —
                # forwarding the raw DROP would destroy the sink's
                # history in the mode built to preserve it
                self.manager.original.pop(tid, None)
                self.last_applied = []
                return self.manager.latest_evolved(tid)
            # EVOLVE/TRY_EVOLVE: the drop IS the applied event —
            # leaving the previous call's last_applied in place made
            # the composers fire stale events instead of
            # DropTableEvent (round-11 review #1)
            self.manager.drop(tid)
            self.last_applied = [event]
            return None
        self.manager.register_original(tid, new_orig)

        b = self.behavior
        if b == SchemaChangeBehavior.EXCEPTION:
            if not isinstance(event, CreateTableEvent):
                # reference-parity text: SchemaCoordinator.java:389-400
                # throws SchemaEvolveException(event, "Unexpected schema
                # change events occurred in EXCEPTION mode. Job will fail
                # now.") for any non-CreateTable event
                raise SchemaEvolveError(
                    "Unexpected schema change events occurred in "
                    "EXCEPTION mode. Job will fail now. "
                    f"(event: {type(event).__name__} on {tid})")
            evolved_events: list[SchemaChangeEvent] = [event]
        elif b == SchemaChangeBehavior.IGNORE:
            evolved_events = [event] if isinstance(event, CreateTableEvent) else []
        elif b == SchemaChangeBehavior.LENIENT:
            evolved = self.manager.latest_evolved(tid)
            evolved_events = ([event] if isinstance(event, CreateTableEvent)
                              else _lenientize(evolved, event))
        else:  # EVOLVE / TRY_EVOLVE
            evolved_events = [event]

        cur = self.manager.latest_evolved(tid)
        applied: list[SchemaChangeEvent] = []
        for ev in evolved_events:
            try:
                cur = apply_schema_change(cur, ev)
                applied.append(ev)
            except SchemaEvolveError:
                if b == SchemaChangeBehavior.TRY_EVOLVE:
                    continue  # tolerate failure, keep old evolved schema
                raise
        self.last_applied = applied
        if cur is not None:
            self.manager.register_evolved(tid, cur)
        return cur

    def infer_drift_events(self, tid: TableId,
                           incoming: Schema) -> list[SchemaChangeEvent]:
        """Detect schema drift between a new batch's schema and the registry
        (batch-mode analog of source-emitted schema events): new columns →
        AddColumnEvent, type changes → AlterColumnTypeEvent (widened via the
        merge lattice)."""
        cur = self.manager.latest_original(tid)
        if cur is None:
            return [CreateTableEvent(tid, incoming)]
        events: list[SchemaChangeEvent] = []
        for f in incoming.struct.fields:
            if not cur.has_column(f.name):
                events.append(AddColumnEvent(
                    tid, f.name, _spark_field_type_string(f)))
            else:
                cf = cur.field(f.name)
                if cf.dataType != f.dataType:
                    widened = merge_fields(cf, f)
                    if widened.dataType != cf.dataType:
                        events.append(AlterColumnTypeEvent(
                            tid, f.name, _spark_field_type_string(widened)))
        return events
