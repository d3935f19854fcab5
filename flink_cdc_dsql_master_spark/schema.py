"""TableId, table-pattern selectors, Schema wrapper, versioned SchemaManager.

Reference counterparts:
- ``TableId`` — flink-cdc-common .../event/TableId.java:48 (3-part
  namespace.schemaName.tableName).
- ``Selectors`` — common/schema/Selectors.java (regex-ish ``db.\\.*``
  patterns matched per part).
- ``Schema`` — common/schema/Schema.java:51-59 (ordered columns +
  primaryKeys + partitionKeys + options + comment).
- ``SchemaManager`` — runtime .../schema/common/SchemaManager.java:56-68
  (versioned ``Map<TableId, SortedMap<Integer, Schema>>`` for original and
  evolved schemas).

Spark design: Schema wraps a ``StructType`` (PKs / partition keys / options
carried alongside; per-column metadata in StructField.metadata). The
versioned registry is a plain driver-side dict, JSON-checkpointable.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, replace

from pyspark.sql import types as T

from .types import CDC_META_KEY, parse_type, to_struct_field


@dataclass(frozen=True, order=True)
class TableId:
    namespace: str
    schema_name: str
    table: str

    @staticmethod
    def parse(s: str) -> "TableId":
        parts = s.split(".")
        if len(parts) == 1:
            return TableId("", "", parts[0])
        if len(parts) == 2:
            return TableId("", parts[0], parts[1])
        if len(parts) == 3:
            return TableId(parts[0], parts[1], parts[2])
        raise ValueError(f"table id has more than 3 parts: {s!r}")

    def identifier(self) -> str:
        parts = [p for p in (self.namespace, self.schema_name, self.table)]
        while parts and parts[0] == "":
            parts = parts[1:]
        return ".".join(parts) if parts else self.table

    def __str__(self) -> str:  # pragma: no cover
        return self.identifier()


class Selector:
    """Table pattern: up to 3 dot-separated regex fragments.

    Exact parity with the reference's Selectors/Predicates
    (common/schema/Selectors.java + utils/Predicates.java): the pattern is
    split on *unescaped* dots, ``\\.`` becomes a literal dot inside the
    part regex (so ``db\\.*`` is a ONE-part pattern matching table names
    against ``db.*``), each part is full-matched case-insensitively, and a
    pattern with fewer than 3 parts only matches TableIds whose leading
    parts are empty (Selectors.java:56-70).
    """

    def __init__(self, pattern: str):
        self.pattern = pattern
        # RegExSplitterByDot parity: skip empty fragments, trim each part
        parts = [
            p.strip().replace("\\.", ".")
            for p in re.split(r"(?<!\\)\.", pattern)
            if p.strip()
        ]
        if len(parts) > 3:
            raise ValueError(f"selector has more than 3 parts: {pattern!r}")
        self._parts = [re.compile(f"(?:{p})", re.IGNORECASE) for p in parts]

    def matches(self, tid: TableId) -> bool:
        preds = [None] * (3 - len(self._parts)) + list(self._parts)
        ns_p, schema_p, table_p = preds

        def test(p: re.Pattern | None, v: str) -> bool:
            return p is not None and p.fullmatch(v) is not None

        if not tid.namespace:
            if not tid.schema_name:
                return test(table_p, tid.table)
            return test(schema_p, tid.schema_name) and test(table_p, tid.table)
        return (
            test(ns_p, tid.namespace)
            and test(schema_p, tid.schema_name)
            and test(table_p, tid.table)
        )


class Selectors:
    """Comma-separated list of Selector patterns (any-match)."""

    def __init__(self, patterns: str):
        self._selectors = [Selector(p.strip()) for p in patterns.split(",") if p.strip()]

    def matches(self, tid: TableId) -> bool:
        return any(s.matches(tid) for s in self._selectors)


@dataclass(frozen=True)
class Schema:
    """Ordered columns + PKs + partition keys + options + comment."""

    struct: T.StructType
    primary_keys: tuple[str, ...] = ()
    partition_keys: tuple[str, ...] = ()
    options: tuple[tuple[str, str], ...] = ()
    comment: str | None = None

    @staticmethod
    def of(columns: list[tuple[str, str]] | T.StructType,
           primary_keys: list[str] | tuple[str, ...] = (),
           partition_keys: list[str] | tuple[str, ...] = (),
           options: dict | None = None,
           comment: str | None = None) -> "Schema":
        """Build from [(name, reference-type-string), ...] or a StructType."""
        if isinstance(columns, T.StructType):
            struct = columns
        else:
            struct = T.StructType(
                [to_struct_field(n, parse_type(t)) for n, t in columns]
            )
        return Schema(
            struct,
            tuple(primary_keys),
            tuple(partition_keys),
            tuple(sorted((options or {}).items())),
            comment,
        )

    @property
    def column_names(self) -> list[str]:
        return [f.name for f in self.struct.fields]

    def field(self, name: str) -> T.StructField:
        return self.struct[name]

    def has_column(self, name: str) -> bool:
        return name in self.struct.fieldNames()

    def with_struct(self, struct: T.StructType) -> "Schema":
        return replace(self, struct=struct)

    def to_json(self) -> str:
        return json.dumps({
            "struct": self.struct.jsonValue(),
            "primary_keys": list(self.primary_keys),
            "partition_keys": list(self.partition_keys),
            "options": dict(self.options),
            "comment": self.comment,
        })

    @staticmethod
    def from_json(s: str) -> "Schema":
        d = json.loads(s)
        return Schema(
            T.StructType.fromJson(d["struct"]),
            tuple(d["primary_keys"]),
            tuple(d["partition_keys"]),
            tuple(sorted(d["options"].items())),
            d.get("comment"),
        )


class SchemaManager:
    """Versioned schema registry (driver side).

    Keeps ``{TableId: {version: Schema}}`` for both *original* (upstream)
    and *evolved* (post-route/transform, as applied at the sink) schemas,
    mirroring the reference SchemaManager. Checkpointable to JSON.
    """

    def __init__(self) -> None:
        self.original: dict[TableId, dict[int, Schema]] = {}
        self.evolved: dict[TableId, dict[int, Schema]] = {}
        # tombstones: DROP TABLE pops both stores, so without this a
        # dropped table is indistinguishable from a never-seen one —
        # and the DDL composers must keep SKIPPING (not flushing) a
        # dropped table's segments in LATER micro-batches too, or a
        # create-if-missing sink writer resurrects it (wave-3 #3)
        self.dropped: set[TableId] = set()

    @staticmethod
    def _latest(m: dict[int, Schema]) -> Schema:
        return m[max(m)]

    def register_original(self, tid: TableId, schema: Schema) -> int:
        self.dropped.discard(tid)  # re-create clears the tombstone
        return self._register(self.original, tid, schema)

    def register_evolved(self, tid: TableId, schema: Schema) -> int:
        return self._register(self.evolved, tid, schema)

    def _register(self, store: dict, tid: TableId, schema: Schema) -> int:
        versions = store.setdefault(tid, {})
        if versions and self._latest(versions) == schema:
            return max(versions)
        v = max(versions) + 1 if versions else 0
        versions[v] = schema
        return v

    def latest_original(self, tid: TableId) -> Schema | None:
        m = self.original.get(tid)
        return self._latest(m) if m else None

    def latest_evolved(self, tid: TableId) -> Schema | None:
        m = self.evolved.get(tid)
        return self._latest(m) if m else None

    def drop(self, tid: TableId) -> None:
        self.original.pop(tid, None)
        self.evolved.pop(tid, None)
        self.dropped.add(tid)

    def is_dropped(self, tid: TableId) -> bool:
        return tid in self.dropped

    def to_json(self) -> str:
        def ser(store: dict[TableId, dict[int, Schema]]):
            return {
                tid.identifier(): {str(v): s.to_json() for v, s in m.items()}
                for tid, m in store.items()
            }
        return json.dumps({"original": ser(self.original),
                           "evolved": ser(self.evolved),
                           "dropped": sorted(t.identifier()
                                             for t in self.dropped)})

    @staticmethod
    def from_json(s: str) -> "SchemaManager":
        d = json.loads(s)
        mgr = SchemaManager()
        for key, store in (("original", mgr.original), ("evolved", mgr.evolved)):
            for tid_s, versions in d[key].items():
                store[TableId.parse(tid_s)] = {
                    int(v): Schema.from_json(sj) for v, sj in versions.items()
                }
        # absent in pre-tombstone checkpoints — default to no drops
        mgr.dropped = {TableId.parse(t) for t in d.get("dropped", [])}
        return mgr


def field_cdc_meta(f: T.StructField) -> dict:
    try:
        return (f.metadata or {}).get(CDC_META_KEY, {})
    except Exception:  # metadata may be None
        return {}
