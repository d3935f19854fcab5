"""Type-widening lattice + schema merging for fan-in routes.

Behavioral parity with the reference's SchemaMergingUtils
(flink-cdc-common .../utils/SchemaMergingUtils.java): ``getLeastCommonType``
(:462), the TYPE_MERGING_TREE (:918-994), ``mergeDecimalType`` (:545-571),
``mergeTimestampType`` (:496), ``getNumericPrecision`` (:586), and
``deduceMergedCreateTableEvent``-style column-union merging. One deliberate
difference: where the reference *throws* on a decimal merge exceeding
precision 38, we decay to STRING (documented; Spark's DecimalType caps at
38 and a hard failure would kill a 1000-executor job for one bad column).

Everything here is a driver-side pure function on Spark StructTypes — no
data movement. Runtime value coercion into the widened schema
(``coerce_dataframe``) compiles to plain Catalyst ``cast``s, which keep
whole-stage codegen intact at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from .schema import Schema, field_cdc_meta
from .types import (
    CDC_META_KEY,
    TAG_BIG_DECIMAL,
    TAG_CHAR,
    TAG_TIME,
    TAG_TIMESTAMP_TZ,
    TAG_VARCHAR,
)

# internal kind names (reference type roots)
_STRING = "STRING"
_DOUBLE = "DOUBLE"
_FLOAT = "FLOAT"
_DECIMAL = "DECIMAL"
_BIGINT = "BIGINT"
_INT = "INT"
_SMALLINT = "SMALLINT"
_TINYINT = "TINYINT"
_TS = "TIMESTAMP"
_TS_LTZ = "TIMESTAMP_LTZ"
_TS_TZ = "TIMESTAMP_TZ"
_DATE = "DATE"
_TIME = "TIME"
_BOOLEAN = "BOOLEAN"
_BINARY = "BINARY"
_COMPLEX = "COMPLEX"

# TYPE_MERGING_TREE parity (SchemaMergingUtils.java:921-994): for each kind,
# the ordered chain of kinds it can decay to. DECIMAL handled specially.
_MERGING_TREE: dict[str, list[str]] = {
    _STRING: [_STRING],
    _BOOLEAN: [_STRING],
    _BINARY: [_STRING],
    _DOUBLE: [_DOUBLE, _STRING],
    _FLOAT: [_FLOAT, _DOUBLE, _STRING],
    _DECIMAL: [_STRING],
    _BIGINT: [_BIGINT, _DECIMAL, _DOUBLE, _STRING],
    _INT: [_INT, _BIGINT, _DECIMAL, _DOUBLE, _STRING],
    _SMALLINT: [_SMALLINT, _INT, _BIGINT, _DECIMAL, _FLOAT, _DOUBLE, _STRING],
    _TINYINT: [_TINYINT, _SMALLINT, _INT, _BIGINT, _DECIMAL, _FLOAT, _DOUBLE, _STRING],
    _TS_TZ: [_TS_TZ, _STRING],
    _TS_LTZ: [_TS_LTZ, _TS_TZ, _STRING],
    _TS: [_TS, _TS_LTZ, _TS_TZ, _STRING],
    _DATE: [_DATE, _TS, _TS_LTZ, _TS_TZ, _STRING],
    _TIME: [_STRING],
    _COMPLEX: [_STRING],
}

# getNumericPrecision parity (SchemaMergingUtils.java:586-601)
_NUMERIC_PRECISION = {_TINYINT: 3, _SMALLINT: 5, _INT: 10, _BIGINT: 19}

_MAX_DECIMAL_PRECISION = 38


def _kind(f: T.StructField) -> str:
    dt, meta = f.dataType, field_cdc_meta(f)
    logical = meta.get("logical")
    if isinstance(dt, T.StringType):
        if logical == TAG_TIMESTAMP_TZ:
            return _TS_TZ
        return _STRING  # CHAR/VARCHAR/BIG_DECIMAL decay straight to STRING
    if isinstance(dt, T.IntegerType):
        return _TIME if logical == TAG_TIME else _INT
    if isinstance(dt, T.BooleanType):
        return _BOOLEAN
    if isinstance(dt, T.ByteType):
        return _TINYINT
    if isinstance(dt, T.ShortType):
        return _SMALLINT
    if isinstance(dt, T.LongType):
        return _BIGINT
    if isinstance(dt, T.FloatType):
        return _FLOAT
    if isinstance(dt, T.DoubleType):
        return _DOUBLE
    if isinstance(dt, T.DecimalType):
        return _DECIMAL
    if isinstance(dt, T.DateType):
        return _DATE
    if isinstance(dt, T.TimestampNTZType):
        return _TS
    if isinstance(dt, T.TimestampType):
        return _TS_LTZ
    if isinstance(dt, T.BinaryType):
        return _BINARY
    return _COMPLEX


def _spark_type_for_kind(kind: str, a: T.StructField, b: T.StructField) -> T.DataType:
    if kind == _STRING:
        return T.StringType()
    if kind == _DOUBLE:
        return T.DoubleType()
    if kind == _FLOAT:
        return T.FloatType()
    if kind == _BIGINT:
        return T.LongType()
    if kind == _INT:
        return T.IntegerType()
    if kind == _SMALLINT:
        return T.ShortType()
    if kind == _TINYINT:
        return T.ByteType()
    if kind == _DATE:
        return T.DateType()
    if kind == _TS:
        return T.TimestampNTZType()
    if kind == _TS_LTZ:
        return T.TimestampType()
    if kind == _TS_TZ:
        return T.StringType()
    if kind == _DECIMAL:
        # one side is DECIMAL, the other an exact-numeric kind; see caller
        raise AssertionError("decimal handled in merge_fields")
    raise AssertionError(f"unexpected merged kind {kind}")


def _merge_decimal(a_kind: str, a_dt: T.DataType, b_kind: str,
                   b_dt: T.DataType) -> T.DataType:
    """mergeDecimalType parity (decays to STRING instead of throwing)."""
    if a_kind == _DECIMAL and b_kind == _DECIMAL:
        la, lb = a_dt, b_dt
        assert isinstance(la, T.DecimalType) and isinstance(lb, T.DecimalType)
        int_digits = max(la.precision - la.scale, lb.precision - lb.scale)
        scale = max(la.scale, lb.scale)
        if int_digits + scale > _MAX_DECIMAL_PRECISION:
            return T.StringType()
        return T.DecimalType(int_digits + scale, scale)
    dec_dt = a_dt if a_kind == _DECIMAL else b_dt
    other_kind = b_kind if a_kind == _DECIMAL else a_kind
    assert isinstance(dec_dt, T.DecimalType)
    if other_kind in _NUMERIC_PRECISION:
        p = max(dec_dt.precision, dec_dt.scale + _NUMERIC_PRECISION[other_kind])
        if p <= _MAX_DECIMAL_PRECISION:
            return T.DecimalType(p, dec_dt.scale)
        return T.StringType()
    return T.StringType()  # decimal + float/double/bool/... → STRING


def merge_fields(a: T.StructField, b: T.StructField) -> T.StructField:
    """Least-common-type of two same-named columns (getLeastCommonType)."""
    nullable = a.nullable or b.nullable
    ka, kb = _kind(a), _kind(b)
    meta_a = dict(a.metadata or {})

    if ka == kb and a.dataType == b.dataType:
        return T.StructField(a.name, a.dataType, nullable, a.metadata)

    if ka == _DECIMAL or kb == _DECIMAL:
        dt = _merge_decimal(ka, a.dataType, kb, b.dataType)
        return T.StructField(a.name, dt, nullable)

    if ka == kb:
        # same kind, different physical repr (e.g. both TIME) → keep a's
        return T.StructField(a.name, a.dataType, nullable, a.metadata)

    for kind in _MERGING_TREE[ka]:
        if kind in _MERGING_TREE[kb] or kind == kb:
            if kind == _DECIMAL:
                continue  # exact-numeric pairs resolve at their int kind first
            dt = _spark_type_for_kind(kind, a, b)
            md = None
            if kind == _TS_TZ:
                md = {CDC_META_KEY: {"logical": TAG_TIMESTAMP_TZ}}
            elif kind == _TIME:
                md = {CDC_META_KEY: {"logical": TAG_TIME}}
            return T.StructField(a.name, dt, nullable, md)
    return T.StructField(a.name, T.StringType(), nullable)


def is_type_compatible(current: T.StructField | None, upcoming: T.StructField) -> bool:
    """isDataTypeCompatible parity: can `upcoming` flow into `current` as-is?"""
    if current is None:
        return False
    if upcoming.nullable and not current.nullable:
        return False
    if current.dataType == upcoming.dataType:
        return True
    ck, uk = _kind(current), _kind(upcoming)
    if ck == _DECIMAL and isinstance(current.dataType, T.DecimalType):
        merged = merge_fields(current, upcoming)
        return merged.dataType == current.dataType
    # whole-tree contains check (SchemaMergingUtils.java:446-459); identity
    # for equal dataTypes is already covered above
    return ck in _MERGING_TREE[uk] or ck == uk


def merge_schemas(current: Schema, upcoming: Schema) -> Schema:
    """Column-union merge for fan-in routes (deduceMergedCreateTableEvent).

    Columns present in both → least-common-type; columns only in one side
    are kept and become nullable (LENIENT widening). Order: current's
    column order, then new upcoming columns appended in their order.
    Primary/partition keys: intersection of both sides' (a fan-in sink can
    only rely on keys every source provides).
    """
    cur_fields = {f.name: f for f in current.struct.fields}
    up_fields = {f.name: f for f in upcoming.struct.fields}
    out: list[T.StructField] = []
    for f in current.struct.fields:
        if f.name in up_fields:
            out.append(merge_fields(f, up_fields[f.name]))
        else:
            out.append(T.StructField(f.name, f.dataType, True, f.metadata))
    for f in upcoming.struct.fields:
        if f.name not in cur_fields:
            out.append(T.StructField(f.name, f.dataType, True, f.metadata))
    pks = tuple(k for k in current.primary_keys if k in upcoming.primary_keys)
    parts = tuple(k for k in current.partition_keys if k in upcoming.partition_keys)
    return Schema(T.StructType(out), pks, parts, current.options, current.comment)


def coerce_dataframe(df: DataFrame, target: Schema,
                     keep_extra: bool = False) -> DataFrame:
    """Project/cast a DataFrame into the target schema (coerceRow parity).

    Missing columns are filled with NULL; present columns are cast. All
    casts are Catalyst-native (stay inside whole-stage codegen). Internal
    changelog columns (``__op`` etc.) are passed through when present.
    """
    cols = []
    have = set(df.columns)
    for f in target.struct.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_extra:
        for c in df.columns:
            if not target.has_column(c):
                cols.append(F.col(c))
    else:
        for c in ("__op", "__table_id", "__seq", "__op_ts"):
            if c in have:
                cols.append(F.col(c))
    return df.select(*cols)
