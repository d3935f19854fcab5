"""Reference type system ↔ Spark types.

The reference defines its lattice in
``flink-cdc-common/src/main/java/org/apache/flink/cdc/common/types/DataTypes.java``
(BINARY/VARBINARY/BOOLEAN/TINYINT/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/CHAR/
VARCHAR/STRING/DECIMAL/DATE/TIME/TIMESTAMP/TIMESTAMP_TZ/TIMESTAMP_LTZ/
ARRAY/MAP/ROW) with nullability as a property of the type. Mapping decided
in SURVEY.md §1.3:

- TIME(p)          → IntegerType (millis of day) + logical tag
- TIMESTAMP(p)     → TimestampNTZType
- TIMESTAMP_LTZ(p) → TimestampType (Spark TIMESTAMP is LTZ-semantics)
- TIMESTAMP_TZ(p)  → StringType ISO-8601 with offset + logical tag
- CHAR(n)/VARCHAR(n) → StringType, length kept as metadata for sink DDL
- DECIMAL(p>38, s) → clamp is lossy, so widen to StringType + tag

Logical tags and declared lengths travel in ``StructField.metadata`` under
the ``cdc`` key so sink DDL generation (e.g. ``VARCHAR(n)`` emission like
the reference's DsqlSchemaMapper.java:194-213) can reproduce them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

CDC_META_KEY = "cdc"

# logical-type tags (values of metadata {"cdc": {"logical": <tag>}})
TAG_TIME = "TIME"  # int millis-of-day
TAG_TIMESTAMP_TZ = "TIMESTAMP_TZ"  # string with offset
TAG_BIG_DECIMAL = "BIG_DECIMAL"  # decimal wider than Spark's 38 → string
TAG_CHAR = "CHAR"
TAG_VARCHAR = "VARCHAR"

_SPARK_MAX_DECIMAL_PRECISION = 38


@dataclass(frozen=True)
class CdcType:
    """A parsed reference type: name + params + nullability."""

    name: str
    precision: int | None = None
    scale: int | None = None
    length: int | None = None
    nullable: bool = True
    element: "CdcType | None" = None  # ARRAY
    key: "CdcType | None" = None  # MAP
    value: "CdcType | None" = None  # MAP
    fields: tuple[tuple[str, "CdcType"], ...] = field(default=())  # ROW

    def not_null(self) -> "CdcType":
        return CdcType(
            self.name, self.precision, self.scale, self.length, False,
            self.element, self.key, self.value, self.fields,
        )


_TYPE_RE = re.compile(
    r"^\s*(?P<name>[A-Z_]+)\s*(?:\(\s*(?P<p1>\d+)\s*(?:,\s*(?P<p2>\d+)\s*)?\))?"
    r"\s*(?P<notnull>NOT\s+NULL)?\s*$",
    re.IGNORECASE,
)


def parse_type(s: str) -> CdcType:
    """Parse a reference type string like ``DECIMAL(10,2) NOT NULL``."""
    su = s.strip()
    up = su.upper()
    if up.startswith("ARRAY<"):
        inner = su[su.index("<") + 1 : su.rindex(">")]
        return CdcType("ARRAY", element=parse_type(inner))
    if up.startswith("MAP<"):
        inner = su[su.index("<") + 1 : su.rindex(">")]
        k, v = _split_top(inner)
        return CdcType("MAP", key=parse_type(k), value=parse_type(v))
    if up.startswith("ROW<"):
        inner = su[su.index("<") + 1 : su.rindex(">")]
        fields = []
        for part in _split_all_top(inner):
            name, _, type_s = part.strip().partition(" ")
            if not type_s:
                raise ValueError(f"ROW field needs 'name type': {part!r}")
            fields.append((name.strip("`"), parse_type(type_s)))
        return CdcType("ROW", fields=tuple(fields))
    m = _TYPE_RE.match(su)
    if not m:
        raise ValueError(f"cannot parse type: {s!r}")
    name = m.group("name").upper()
    p1 = int(m.group("p1")) if m.group("p1") else None
    p2 = int(m.group("p2")) if m.group("p2") else None
    nullable = m.group("notnull") is None
    if name in ("CHAR", "VARCHAR", "BINARY", "VARBINARY"):
        return CdcType(name, length=p1, nullable=nullable)
    if name in ("DECIMAL", "NUMERIC"):
        return CdcType("DECIMAL", precision=p1 or 10, scale=p2 or 0, nullable=nullable)
    if name in ("TIME", "TIMESTAMP", "TIMESTAMP_TZ", "TIMESTAMP_LTZ"):
        return CdcType(name, precision=p1, nullable=nullable)
    return CdcType(name, nullable=nullable)


def _split_top(s: str) -> tuple[str, str]:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i], s[i + 1 :]
    raise ValueError(f"expected two type args in {s!r}")


def _split_all_top(s: str) -> list[str]:
    """Split on top-level commas (depth-aware for nested <...>)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def to_spark_type(t: CdcType) -> tuple[T.DataType, dict]:
    """Map a CdcType to (Spark DataType, cdc-metadata dict)."""
    n = t.name
    meta: dict = {}
    if n == "BOOLEAN":
        return T.BooleanType(), meta
    if n == "TINYINT":
        return T.ByteType(), meta
    if n == "SMALLINT":
        return T.ShortType(), meta
    if n in ("INT", "INTEGER"):
        return T.IntegerType(), meta
    if n == "BIGINT":
        return T.LongType(), meta
    if n == "FLOAT":
        return T.FloatType(), meta
    if n == "DOUBLE":
        return T.DoubleType(), meta
    if n == "DECIMAL":
        if (t.precision or 10) > _SPARK_MAX_DECIMAL_PRECISION:
            meta["logical"] = TAG_BIG_DECIMAL
            meta["precision"] = t.precision
            meta["scale"] = t.scale
            return T.StringType(), meta
        return T.DecimalType(t.precision or 10, t.scale or 0), meta
    if n == "CHAR":
        meta["logical"] = TAG_CHAR
        meta["length"] = t.length
        return T.StringType(), meta
    if n == "VARCHAR":
        if t.length is not None:
            meta["logical"] = TAG_VARCHAR
            meta["length"] = t.length
        return T.StringType(), meta
    if n == "STRING":
        return T.StringType(), meta
    if n in ("BINARY", "VARBINARY", "BYTES"):
        if t.length is not None:
            meta["length"] = t.length
        return T.BinaryType(), meta
    if n == "DATE":
        return T.DateType(), meta
    if n == "TIME":
        meta["logical"] = TAG_TIME
        meta["precision"] = t.precision
        return T.IntegerType(), meta
    if n == "TIMESTAMP":
        return T.TimestampNTZType(), meta
    if n == "TIMESTAMP_LTZ":
        return T.TimestampType(), meta
    if n == "TIMESTAMP_TZ":
        meta["logical"] = TAG_TIMESTAMP_TZ
        meta["precision"] = t.precision
        return T.StringType(), meta
    if n == "ARRAY":
        el, _ = to_spark_type(t.element)  # type: ignore[arg-type]
        return T.ArrayType(el, t.element.nullable), meta  # type: ignore[union-attr]
    if n == "MAP":
        k, _ = to_spark_type(t.key)  # type: ignore[arg-type]
        v, _ = to_spark_type(t.value)  # type: ignore[arg-type]
        return T.MapType(k, v, t.value.nullable), meta  # type: ignore[union-attr]
    if n == "ROW":
        fields = [
            T.StructField(fn, to_spark_type(ft)[0], ft.nullable)
            for fn, ft in t.fields
        ]
        return T.StructType(fields), meta
    raise ValueError(f"unsupported reference type: {n}")


def to_struct_field(name: str, t: CdcType, comment: str | None = None,
                    default: str | None = None,
                    generated: str | None = None) -> T.StructField:
    spark_t, meta = to_spark_type(t)
    md: dict = {}
    if meta:
        md[CDC_META_KEY] = meta
    if comment:
        md["comment"] = comment
    if default is not None:
        md.setdefault(CDC_META_KEY, {})["default"] = default
    if generated is not None:
        # "VIRTUAL": never in binlog row images → decode yields NULL
        md.setdefault(CDC_META_KEY, {})["generated"] = generated
    return T.StructField(name, spark_t, t.nullable, md or None)


# ---------------------------------------------------------------------------
# Spark type → reference DDL name (for sink DDL emission, DsqlSchemaMapper
# parity: DECIMAL(p,s) / TIMESTAMP / TIMESTAMPTZ / VARCHAR(n))
# ---------------------------------------------------------------------------

def to_sql_ddl(f: T.StructField, dialect: str = "dsql") -> str:
    """Render a StructField as an ANSI/Postgres-ish DDL type.

    ``dialect="dsql"`` (default) emits the reference target's types —
    including DECIMAL(p>38) verbatim, which Aurora DSQL / Postgres
    NUMERIC accepts natively. ``dialect="duckdb"`` adapts for engines
    whose decimal ceiling is 38 (DuckDB, and Spark itself): BIG_DECIMAL
    columns become VARCHAR holding the canonical digit string — the
    same lossless tagged-string policy the engine uses in-flight."""
    dt = f.dataType
    meta = (f.metadata or {}).get(CDC_META_KEY, {}) if f.metadata else {}
    logical = meta.get("logical")
    if logical == TAG_TIME:
        return "TIME"
    if logical == TAG_TIMESTAMP_TZ:
        return "TIMESTAMPTZ"
    if logical == TAG_BIG_DECIMAL:
        if dialect == "duckdb":
            return "VARCHAR"
        return f"DECIMAL({meta['precision']},{meta['scale']})"
    if logical == TAG_CHAR:
        return f"CHAR({meta['length']})"
    if logical == TAG_VARCHAR:
        return f"VARCHAR({meta['length']})"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "SMALLINT"  # no 1-byte int in Postgres/DSQL
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMPTZ"
    if isinstance(dt, T.ArrayType):
        return to_sql_ddl(T.StructField(f.name, dt.elementType)) + "[]"
    return "TEXT"  # maps/structs/json → TEXT (json) at the sink
