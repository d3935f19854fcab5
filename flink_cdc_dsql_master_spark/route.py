"""Table routing: fan-out replication and fan-in merge.

Reference: ``flink-cdc-runtime/.../operators/schema/common/TableIdRouter.java``
(route :76-108): an ordered list of RouteRule(source-table pattern, sink
table, replace-symbol). A source TableId routes to **every** matching rule's
sink (fan-out); no match → identity. ``replace-symbol`` templating substitutes
the source *table name* into the sink string
(``resolveReplacement``: ``sinkTable.replace(symbol, source.getTableName())``,
docs/content/docs/core-concept/route.md:33-87). Many sources mapping to one
sink = fan-in; the sink schema is the least-common-type merge of the group
(``groupSourceTablesByRouteRule``, SchemaDerivator.deduceMergedCreateTableEvent).

Spark design: routing is a driver-side pure function used when dispatching
per-table micro-batch writes; fan-in materializes as ``unionByName`` after
``coerce_dataframe`` into the merged schema — all Catalyst casts, no UDFs,
no extra shuffle (union is a narrow op; the sink write partitioning governs
the only shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .merging import coerce_dataframe, merge_schemas
from .schema import Schema, Selectors, TableId


@dataclass(frozen=True)
class RouteRule:
    """One YAML ``route:`` entry (composer/definition/RouteDef.java:37-40)."""

    source_table: str
    sink_table: str
    replace_symbol: str | None = None


class TableIdRouter:
    """Pure routing function (TableIdRouter.java:42-108 parity)."""

    def __init__(self, rules: list[RouteRule]):
        self._rules = [(Selectors(r.source_table), r) for r in rules]
        self._cache: dict[TableId, list[TableId]] = {}

    def route(self, tid: TableId) -> list[TableId]:
        """All sink TableIds for a source table; identity when none match."""
        hit = self._cache.get(tid)
        if hit is not None:
            return hit
        out = []
        for sel, rule in self._rules:
            if sel.matches(tid):
                if rule.replace_symbol:
                    sink = rule.sink_table.replace(rule.replace_symbol, tid.table)
                else:
                    sink = rule.sink_table
                out.append(TableId.parse(sink))
        if not out:
            out = [tid]
        self._cache[tid] = out
        return out

    def group_sources_by_sink(
            self, source_tids: list[TableId]) -> dict[TableId, list[TableId]]:
        """sink TableId → ordered source TableIds feeding it (fan-in groups).

        Parity: groupSourceTablesByRouteRule (TableIdRouter.java:110+) —
        the sink-side grouping that drives schema merging.
        """
        groups: dict[TableId, list[TableId]] = {}
        for src in source_tids:
            for sink in self.route(src):
                groups.setdefault(sink, []).append(src)
        return groups


def merged_sink_schema(schemas: list[Schema]) -> Schema:
    """Least-common-type widened schema for a fan-in group."""
    if not schemas:
        raise ValueError("fan-in group with no source schemas")
    out = schemas[0]
    for s in schemas[1:]:
        out = merge_schemas(out, s)
    return out


def fan_in(frames: list[DataFrame], schemas: list[Schema]) -> tuple[DataFrame, Schema]:
    """Merge N source DataFrames into one sink frame with the widened schema.

    Each frame is coerced (Catalyst casts, NULL-fill for missing columns)
    into the merged schema, then unioned by name. Scale note: union is
    narrow — no shuffle; each input keeps its partitioning until the sink.
    """
    target = merged_sink_schema(schemas)
    coerced = [coerce_dataframe(df, target) for df in frames]
    # align internal column presence across inputs (union needs same shape)
    common = set(coerced[0].columns)
    for df in coerced[1:]:
        common &= set(df.columns)
    coerced = [df.select(*[c for c in df.columns if c in common])
               for df in coerced]
    out = coerced[0]
    for df in coerced[1:]:
        out = out.unionByName(df)
    return out, target
