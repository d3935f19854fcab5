"""Values-style fixture source + collect sink (the test backbone).

Reference counterparts:
- ``ValuesDataSourceHelper.java:52-70`` — scripted event sets
  (SINGLE_SPLIT_SINGLE_TABLE, TRANSFORM_TABLE, ...) that every mini-cluster
  golden test consumes.
- ``ValuesDataSink`` / ``ValuesDatabase.java`` — collects events as strings
  like ``DataChangeEvent{tableId=..., before=[], after=[1, Alice], op=INSERT}``
  and maintains an in-memory table applying schema changes; the golden
  oracle of ``FlinkPipelineTransformITCase`` (:155-211).

Spark design: an event script is a plain Python list of SchemaChangeEvents
and (op, row) tuples; ``to_changelog_df`` turns the data events of one table
into a changelog DataFrame (``__op``, ``__seq`` columns), and
``CollectSink`` renders golden strings from a result DataFrame so ported
conformance cases can assert on stable text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .events import (
    OP_COLUMN,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    SEQ_COLUMN,
    CreateTableEvent,
    SchemaChangeEvent,
)
from .schema import Schema, TableId

_OP_NAME = {OP_INSERT: "INSERT", OP_UPDATE_BEFORE: "UPDATE_BEFORE",
            OP_UPDATE_AFTER: "UPDATE_AFTER", OP_DELETE: "DELETE"}


@dataclass
class DataEvent:
    table_id: TableId
    op: str  # +I / -U / +U / -D
    row: tuple


@dataclass
class EventScript:
    """An ordered script of schema + data events (one source 'split')."""

    events: list = field(default_factory=list)

    def create_table(self, table_id: str | TableId, schema: Schema) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        self.events.append(CreateTableEvent(tid, schema))
        return self

    def insert(self, table_id: str | TableId, *rows: tuple) -> "EventScript":
        return self._data(table_id, OP_INSERT, rows)

    def update(self, table_id: str | TableId, before: tuple,
               after: tuple) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        self.events.append(DataEvent(tid, OP_UPDATE_BEFORE, before))
        self.events.append(DataEvent(tid, OP_UPDATE_AFTER, after))
        return self

    def delete(self, table_id: str | TableId, *rows: tuple) -> "EventScript":
        return self._data(table_id, OP_DELETE, rows)

    def _data(self, table_id, op, rows) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        for r in rows:
            self.events.append(DataEvent(tid, op, r))
        return self

    # -- materialization ----------------------------------------------------

    def table_ids(self) -> list[TableId]:
        out = []
        for e in self.events:
            if e.table_id not in out:
                out.append(e.table_id)
        return out

    def schema_events(self) -> list[SchemaChangeEvent]:
        return [e for e in self.events if isinstance(e, SchemaChangeEvent)]

    def schema_of(self, tid: TableId) -> Schema:
        for e in self.events:
            if isinstance(e, CreateTableEvent) and e.table_id == tid:
                return e.schema
        raise KeyError(f"no CreateTableEvent for {tid}")

    def to_changelog_df(self, spark: SparkSession,
                        tid: TableId) -> DataFrame:
        """Data events of one table → changelog DataFrame with __op/__seq.

        __seq is the script position — the binlog-position analog that
        downstream last-write-wins relies on.
        """
        schema = self.schema_of(tid)
        rows = []
        for seq, e in enumerate(self.events):
            if isinstance(e, DataEvent) and e.table_id == tid:
                rows.append(tuple(e.row) + (e.op, seq))
        struct = schema.struct.add(OP_COLUMN, "string", False)
        struct = struct.add(SEQ_COLUMN, "long", False)
        return spark.createDataFrame(rows, struct)


def single_split_single_table(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """SINGLE_SPLIT_SINGLE_TABLE parity (ValuesDataSourceHelper.java:173-265):
    CreateTable, 3 inserts, add more rows, an update and a delete."""
    schema = Schema.of([("col1", "STRING"), ("col2", "STRING")],
                       primary_keys=["col1"])
    s = EventScript()
    s.create_table(table, schema)
    s.insert(table, ("1", "1"), ("2", "2"), ("3", "3"))
    s.update(table, ("2", "2"), ("2", "x"))
    s.delete(table, ("3", "3"))
    return s


def transform_table(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """TRANSFORM_TABLE parity (ValuesDataSourceHelper.java:574+): id/name/age
    shape used across FlinkPipelineTransformITCase."""
    schema = Schema.of(
        [("id", "INT NOT NULL"), ("name", "STRING"), ("age", "INT")],
        primary_keys=["id"])
    s = EventScript()
    s.create_table(table, schema)
    s.insert(table, (1, "Alice", 18), (2, "Bob", 20))
    s.update(table, (2, "Bob", 20), (2, "Bob", 30))
    return s


def multi_transform_tables(
        ns: str = "default_namespace.default_schema") -> EventScript:
    """The mytable1/mytable2 pair used across FlinkPipelineTransformITCase
    (FIXTURES.md §1): inserts, an update with both images, and a delete."""
    t1, t2 = f"{ns}.mytable1", f"{ns}.mytable2"
    s1 = Schema.of(
        [("id", "INT NOT NULL"), ("name", "STRING"), ("age", "INT")],
        primary_keys=["id"])
    s2 = Schema.of(
        [("id", "BIGINT NOT NULL"), ("name", "VARCHAR(255)"),
         ("age", "TINYINT"), ("description", "STRING")],
        primary_keys=["id"])
    s = EventScript()
    s.create_table(t1, s1)
    s.insert(t1, (1, "Alice", 18), (2, "Bob", 20))
    s.update(t1, (2, "Bob", 20), (2, "Bob", 30))
    s.create_table(t2, s2)
    s.insert(t2, (3, "Carol", 15, "student"), (4, "Derrida", 25, "student"))
    s.delete(t2, (4, "Derrida", 25, "student"))
    return s


class CollectSink:
    """Golden-string collector (ValuesDataSink parity)."""

    @staticmethod
    def render(df: DataFrame, table_id: TableId) -> list[str]:
        """Render a changelog DataFrame as reference-style event strings,
        in __seq order when present."""
        cols = [c for c in df.columns if c not in (OP_COLUMN, SEQ_COLUMN,
                                                   "__table_id")]
        has_seq = SEQ_COLUMN in df.columns
        rows = df.collect()
        if has_seq:
            rows = sorted(rows, key=lambda r: r[SEQ_COLUMN])
        out = []
        for r in rows:
            vals = ", ".join(_fmt(r[c]) for c in cols)
            op = _OP_NAME.get(r[OP_COLUMN], r[OP_COLUMN]) if OP_COLUMN in df.columns else "INSERT"
            out.append(
                f"DataChangeEvent{{tableId={table_id.identifier()}, "
                f"after=[{vals}], op={op}}}")
        return out


def _fmt(v) -> str:
    if v is None:
        return "null"
    return str(v)
