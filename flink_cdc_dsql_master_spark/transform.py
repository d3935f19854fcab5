"""Projection/filter transform engine (the reference's "query engine").

Reference counterparts:
- ``PostTransformOperator.java:66`` — per-event projection + filter
  (processElement :128, processDataChangeEvent :275-336, transformSchema
  :341, transformRecord :358). Dispatch semantics replicated exactly: all
  matching rules are tried **in order**, the first rule whose filter passes
  emits its projection, events passing no rule are dropped; tables matching
  no rule at all pass through unchanged (processElement returns the event
  as-is when no transform applies).
- ``PreTransformOperator.java:68`` — column pruning: only columns referenced
  by any projection/filter/primary-key/partition-key survive upstream of the
  shuffle (referenced set: TransformParser.generateReferencedColumns
  :207-254).
- Rule surface: ``flink-cdc-composer/.../definition/TransformDef.java:45-52``
  (source-table regex, projection, filter, primary-keys, partition-keys,
  table-options, converter-after-transform).
- ``SoftDeleteConverter.java:40`` — DELETE → INSERT carrying the before
  image; runs *after* projection so a projected ``__data_event_type__``
  metadata column keeps the original ``-D``.
- Metadata columns (``parser/metadata/MetadataColumns.java:28-40``):
  ``__namespace_name__``, ``__schema_name__``, ``__table_name__`` (from the
  TableId) and ``__data_event_type__`` (the op code).

Spark design: a transform is a pure DataFrame→DataFrame function built from
``F.expr`` over the rewritten dialect (exprs.py), so Catalyst sees a plain
Project/Filter — predicate pushdown, column pruning and whole-stage codegen
all apply. The filter can reference both pre-projection columns and computed
columns (TransformFilterProcessor evaluates against preRow *and* postRow,
:111), which we express by materializing computed columns under temp names
before filtering, then selecting the final shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .events import (OP_COLUMN, OP_DELETE, OP_INSERT, OP_TS_COLUMN,
                     SEQ_COLUMN, TABLE_ID_COLUMN)
from .exprs import (
    Ident,
    Node,
    ProjectionItem,
    filter_sql,
    parse_expr,
    parse_projection,
    referenced_columns,
    _bool,
)
from .schema import Selectors, TableId

METADATA_COLUMNS = (
    "__namespace_name__",
    "__schema_name__",
    "__table_name__",
    "__data_event_type__",
)

# Source-supplied metadata (reference SupportedMetadataColumn, e.g. the
# mysql connector's OpTsMetadataColumn): plain-named columns a transform
# may reference ONLY when the source actually provides the backing
# internal column — referencing op_ts on a source without it fails with
# the same unknown-column error as any other missing column.
SOURCE_METADATA_COLUMNS = {"op_ts": OP_TS_COLUMN}

SOFT_DELETE = "SOFT_DELETE"


@dataclass(frozen=True)
class TransformRule:
    """One YAML ``transform:`` entry (TransformDef.java:45-52)."""

    source_table: str
    projection: str | None = None
    filter: str | None = None
    primary_keys: tuple[str, ...] = ()
    partition_keys: tuple[str, ...] = ()
    table_options: tuple[tuple[str, str], ...] = ()
    converter_after_transform: str | None = None

    def selectors(self) -> Selectors:
        return Selectors(self.source_table)


def _substitute(n: Node, mapping: dict[str, str]) -> Node:
    """Rename identifiers in an AST (used to point at temp columns)."""
    import copy

    n2 = copy.deepcopy(n)

    def walk(x: Node) -> None:
        if isinstance(x, Ident):
            if x.name in mapping:
                x.name = mapping[x.name]
            return
        for f_name in vars(x):
            v = getattr(x, f_name)
            if isinstance(v, Node):
                walk(v)
            elif isinstance(v, (list, tuple)):
                for item in v:
                    if isinstance(item, Node):
                        walk(item)
                    elif isinstance(item, tuple):
                        for sub in item:
                            if isinstance(sub, Node):
                                walk(sub)

    walk(n2)
    return n2


@dataclass
class _CompiledRule:
    rule: TransformRule
    items: list[ProjectionItem] | None  # None → identity projection
    filter_ast: Node | None
    refs: list[str] = field(default_factory=list)


class TransformEngine:
    """Applies the ordered transform-rule list to per-table DataFrames."""

    def __init__(self, rules: list[TransformRule]):
        self._compiled: list[_CompiledRule] = []
        for r in rules:
            items = parse_projection(r.projection) if r.projection else None
            fast = parse_expr(r.filter) if r.filter else None
            refs = referenced_columns(r.projection, r.filter)
            self._compiled.append(_CompiledRule(r, items, fast, refs))

    # -- rule lookup --------------------------------------------------------

    def rules_for(self, tid: TableId) -> list[_CompiledRule]:
        return [c for c in self._compiled
                if c.rule.selectors().matches(tid)]

    # -- pre-transform column pruning (PreTransformOperator parity) --------

    def pruned_columns(self, tid: TableId, all_columns: list[str]) -> list[str]:
        """Columns that must survive upstream for this table.

        A ``*`` projection (or a table with no matching rule, or a rule with
        no projection) keeps everything; otherwise the union of
        projection/filter references + PK/partition keys, in source order.
        """
        matching = self.rules_for(tid)
        if not matching:
            return all_columns
        needed: set[str] = set()
        for c in matching:
            if c.items is None or any(i.is_star for i in c.items):
                return all_columns
            needed.update(c.refs)
            needed.update(c.rule.primary_keys)
            needed.update(c.rule.partition_keys)
        return [c for c in all_columns if c in needed]

    def prune(self, df: DataFrame, tid: TableId) -> DataFrame:
        internal = (OP_COLUMN, TABLE_ID_COLUMN, SEQ_COLUMN, OP_TS_COLUMN)
        data_cols = [c for c in df.columns if c not in internal]
        keep = self.pruned_columns(tid, data_cols)
        if keep == data_cols:
            return df
        passthrough = [c for c in internal if c in df.columns]
        return df.select(*keep, *passthrough)

    # -- post-transform -----------------------------------------------------

    def apply(self, df: DataFrame, tid: TableId) -> DataFrame:
        """Project + filter a (changelog or plain) DataFrame for `tid`.

        Multiple matching rules follow the reference's first-filter-pass
        dispatch (PostTransformOperator.java:289-331): row goes to the first
        rule whose filter accepts it; rows accepted by no rule are dropped.
        All matching rules must produce the same output columns (they feed
        one evolved table schema).
        """
        matching = self.rules_for(tid)
        if not matching:
            return df
        has_op = OP_COLUMN in df.columns
        internal_names = (OP_COLUMN, TABLE_ID_COLUMN, SEQ_COLUMN,
                          OP_TS_COLUMN)
        source_cols = [col for col in df.columns
                       if col not in internal_names]
        internal = [col for col in internal_names if col in df.columns]

        # one shared frame: metadata columns + every rule's computed columns
        # under per-rule temp names, so all predicates resolve on it
        work = df
        meta_exprs = {
            "__namespace_name__": F.lit(tid.namespace),
            "__schema_name__": F.lit(tid.schema_name),
            "__table_name__": F.lit(tid.table),
            "__data_event_type__": (F.col(OP_COLUMN) if has_op
                                    else F.lit(OP_INSERT)),
        }
        for m in METADATA_COLUMNS:
            if m not in work.columns:
                work = work.withColumn(m, meta_exprs[m])
        source_meta = set()
        for name, backing in SOURCE_METADATA_COLUMNS.items():
            if backing in df.columns:
                source_meta.add(name)
                if name not in work.columns:
                    work = work.withColumn(name, F.col(backing))

        plans = []  # (final_cols, tmp_map, pred_column_or_None, rule)
        for idx, c in enumerate(matching):
            # reference error parity (testTransformErrorMessage :2531):
            # unknown columns fail fast with the SqlValidator message, and a
            # projection must keep every declared primary key
            aliases = ({i.alias for i in c.items
                        if not i.is_star and i.expr_sql != f"`{i.alias}`"}
                       if c.items is not None else set())
            avail = (set(source_cols) | set(METADATA_COLUMNS)
                     | source_meta | aliases)
            for ref in c.refs:
                if ref not in avail:
                    raise ValueError(
                        f"Column '{ref}' not found in any table")
            tmp_map: dict[str, str] = {}
            if c.items is None:
                final_cols = list(source_cols)
            else:
                final_cols = []
                for item in c.items:
                    if item.is_star:
                        for col in source_cols:
                            if col not in final_cols:
                                final_cols.append(col)
                    else:
                        tmp = f"__xf{idx}_{item.alias}"
                        tmp_map[item.alias] = tmp
                        work = work.withColumn(tmp, F.expr(item.expr_sql))
                        if item.alias not in final_cols:
                            final_cols.append(item.alias)
            for k in c.rule.primary_keys:
                if k not in final_cols:
                    raise ValueError(
                        f'Unable to find column "{k}" which is defined as '
                        f'primary key')
            pred = None
            if c.filter_ast is not None:
                fast = (_substitute(c.filter_ast, tmp_map)
                        if tmp_map else c.filter_ast)
                # filter context: pushdown-friendly rendering (bare
                # comparisons reach the parquet scan as PushedFilters);
                # row-equivalent to the two-valued form — see filter_sql
                pred = F.expr(filter_sql(fast))
            plans.append((final_cols, tmp_map, pred, c.rule))

        out: DataFrame | None = None
        prior = None  # matched by an earlier rule
        for final_cols, tmp_map, pred, rule in plans:
            keep = pred if pred is not None else F.lit(True)
            if prior is not None:
                keep = keep & ~prior
            part = work.where(keep)
            sel = [F.col(tmp_map[col]).alias(col) if col in tmp_map
                   else F.col(col) for col in final_cols]
            sel += [F.col(col) for col in internal]
            part = part.select(*sel)
            # converter-after-transform (SoftDeleteConverter.java:40)
            if rule.converter_after_transform == SOFT_DELETE and has_op:
                part = part.withColumn(
                    OP_COLUMN,
                    F.when(F.col(OP_COLUMN) == OP_DELETE, F.lit(OP_INSERT))
                    .otherwise(F.col(OP_COLUMN)),
                )
            if out is None:
                out = part
            else:
                if set(part.columns) != set(out.columns):
                    raise ValueError(
                        "multiple transform rules for one table must emit "
                        f"the same columns; got {out.columns} vs {part.columns}")
                out = out.unionByName(part)
            if pred is None:
                break  # unconditional rule claims everything remaining
            # two-valued accumulator: a filter-context pred may be NULL for
            # a row (dropped); the NEXT rule must still see "not matched"
            # (TRUE after negation), so coalesce before negating
            cp = F.coalesce(pred, F.lit(False))
            prior = cp if prior is None else (prior | cp)
        return out
