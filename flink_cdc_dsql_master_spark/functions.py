"""Scalar-function compat layer with exact reference semantics.

Reference: ``flink-cdc-runtime/.../functions/SystemFunctionUtils.java``
(1097 LoC; registration in ``parser/TransformSqlOperatorTable.java:84-385``)
and the Janino translation rules in ``parser/JaninoCompiler.java:255-330``.

Semantics replicated here (file:line cites into the reference):

- ``=``   → ``valueEquals`` (SystemFunctionUtils.java:752): FALSE when either
  side is NULL, never NULL.
- ``<>``  → ``!valueEquals`` (JaninoCompiler.java:265): TRUE when either side
  is NULL.
- ``> >= < <=``, BETWEEN, IN: NULL operand → FALSE (SystemFunctionUtils.java
  :267-421 primitive comparisons guard ``value == null → false``).
- LIKE → Java ``Pattern.compile(regex).matcher(str).find()``
  (SystemFunctionUtils.java:456-458) — i.e. *unanchored regex*, which is
  exactly Spark's RLIKE; NULL input → FALSE.
- AND/OR/NOT compile to bare ``&&``/``||``/``!`` (JaninoCompiler.java:258-262)
  — two-valued logic, so boolean operands are coalesced to FALSE.
- CAST family (SystemFunctionUtils.java:765-1028): returns NULL when the
  conversion is not viable (class doc :48); numeric→integer narrows by Java
  truncation-toward-zero; string→integer falls back to parsing as double then
  narrowing (:870-894).
- ``UNIX_TIMESTAMP(s[, fmt])`` on parse failure returns ``Long.MIN_VALUE``
  (common/utils/DateTimeUtils.java ``unixTimestamp``, used at
  SystemFunctionUtils.java:94-101).
- ``DATE_FORMAT`` takes **Java SimpleDateFormat** patterns
  (common/utils/DateTimeUtils.java:formatTimestampMillis); Spark's
  ``date_format`` uses DateTimeFormatter patterns — ``translate_datetime_pattern``
  converts the common surface.
- TRIM(symbol, target, str) ignores its first two args and does a plain Java
  ``String.trim()`` (SystemFunctionUtils.java:427-429).
- SUBSTR/SUBSTRING 1-based, negative-from-end, out-of-range → empty string
  (SystemFunctionUtils.java:464-523) — matches Spark ``substring``.

Everything below is a pure-Catalyst Column combinator — no Python row UDFs
anywhere, so whole-stage codegen survives at 100 TB.

Deliberate deviations (documented):
- ``CONCAT(a, NULL)``: the reference's ``String.join`` renders Java ``"null"``
  text (:452-454); we skip NULLs (``concat_ws('')``) — the Java behavior is
  an artifact, not a spec.
- LIKE/NOT LIKE on a NULL input: the reference would NPE; we return
  FALSE/TRUE (two-valued), keeping the pipeline alive.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

LONG_MIN = -9223372036854775808

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _false_if_null(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _true_if_null(c: Column) -> Column:
    return F.coalesce(c, F.lit(True))


# ---------------------------------------------------------------------------
# comparisons (null → FALSE; <> is null → TRUE)
# ---------------------------------------------------------------------------

def value_equals(a: ColumnOrName, b: ColumnOrName) -> Column:
    """`=` parity: SystemFunctionUtils.valueEquals:752 (null → FALSE)."""
    a, b = _col(a), _col(b)
    return a.isNotNull() & b.isNotNull() & a.eqNullSafe(b)


def value_not_equals(a: ColumnOrName, b: ColumnOrName) -> Column:
    """`<>` parity: !valueEquals (JaninoCompiler.java:265; null → TRUE)."""
    return ~value_equals(a, b)


def gt(a: ColumnOrName, b: ColumnOrName) -> Column:
    return _false_if_null(_col(a) > _col(b))


def gte(a: ColumnOrName, b: ColumnOrName) -> Column:
    return _false_if_null(_col(a) >= _col(b))


def lt(a: ColumnOrName, b: ColumnOrName) -> Column:
    return _false_if_null(_col(a) < _col(b))


def lte(a: ColumnOrName, b: ColumnOrName) -> Column:
    return _false_if_null(_col(a) <= _col(b))


def between(v: ColumnOrName, lo: ColumnOrName, hi: ColumnOrName) -> Column:
    """betweenAsymmetric parity (SystemFunctionUtils.java:267-360)."""
    v = _col(v)
    return _false_if_null((v >= _col(lo)) & (v <= _col(hi)))


def not_between(v: ColumnOrName, lo: ColumnOrName, hi: ColumnOrName) -> Column:
    return ~between(v, lo, hi)


def in_(v: ColumnOrName, *values) -> Column:
    return _false_if_null(_col(v).isin(*[
        x if not isinstance(x, Column) else x for x in values]))


def not_in(v: ColumnOrName, *values) -> Column:
    return ~in_(v, *values)


def like(s: ColumnOrName, regex: str) -> Column:
    """Unanchored-regex LIKE (SystemFunctionUtils.java:456-458) = RLIKE."""
    return _false_if_null(_col(s).rlike(regex))


def not_like(s: ColumnOrName, regex: str) -> Column:
    return ~like(s, regex)


# ---------------------------------------------------------------------------
# logical (two-valued)
# ---------------------------------------------------------------------------

def and_(a: Column, b: Column) -> Column:
    return _false_if_null(a) & _false_if_null(b)


def or_(a: Column, b: Column) -> Column:
    return _false_if_null(a) | _false_if_null(b)


def not_(a: Column) -> Column:
    return ~_false_if_null(a)


# ---------------------------------------------------------------------------
# casts (null-on-failure + Java narrowing parity)
# ---------------------------------------------------------------------------

_INT_BOUNDS = {
    "tinyint": (-128, 127),
    "smallint": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "bigint": (LONG_MIN, 9223372036854775807),
}


def cast_to_integral(c: ColumnOrName, target: str) -> Column:
    """castToByte/Short/Integer/Long parity (SystemFunctionUtils.java:797-928).

    Numeric input: Java narrowing = truncate toward zero (Spark cast from
    double truncates the same way for in-range values). String input: try
    integral parse, else parse as double then narrow (:870-894); NULL when
    unparseable.
    """
    c = _col(c)
    direct = c.cast(target)
    via_double = c.cast("double").cast(target)
    return F.coalesce(direct, via_double)


def cast_to_boolean(c: ColumnOrName) -> Column:
    """castToBoolean parity (:772-795): non-zero numerics → TRUE, strings
    via Boolean.valueOf — 'true' case-insensitive → TRUE, anything else
    (including numeric-looking strings) → FALSE.
    """
    c = _col(c)
    as_num = c.cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("boolean"))
        .when(F.expr(f"typeof({_sql_ref(c)})") == "string",
              F.lower(c.cast("string")) == "true")
        .when(as_num.isNotNull(), as_num != 0.0)
        .otherwise(F.lower(c.cast("string")) == "true")
    )


def cast_to_string(c: ColumnOrName) -> Column:
    return _col(c).cast("string")


def cast_to_float(c: ColumnOrName) -> Column:
    return _col(c).cast("float")


def cast_to_double(c: ColumnOrName) -> Column:
    return _col(c).cast("double")


def cast_to_decimal(c: ColumnOrName, precision: int, scale: int) -> Column:
    """castToBigDecimal parity (:981-1007): setScale(HALF_UP), null if the
    value doesn't fit the precision — Spark's decimal cast does both."""
    return _col(c).cast(f"decimal({precision},{scale})")


def cast_to_timestamp(c: ColumnOrName) -> Column:
    """castToTimestamp (:1029-1045): ISO local date[-time] strings."""
    return _col(c).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

# SimpleDateFormat → Spark DateTimeFormatter pattern translation. The two
# dialects agree on y M d H m s S E a h K k D; differences that matter:
#  - SDF 'u' = day number of week  → Spark 'e' (rare; best-effort)
#  - SDF 'Z' = RFC822 zone (+0800) → Spark 'Z' compatible enough
#  - quoted literals '...' pass through unchanged
_SDF_SAFE = set("yMdHmsSEahKkDZz'")


def translate_datetime_pattern(fmt: str) -> str:
    """Translate a Java SimpleDateFormat pattern to a Spark-safe pattern.

    The overlapping subset (yyyy MM dd HH mm ss SSS a E z Z) is identical in
    both dialects; unknown letters are quoted so Spark treats them as
    literals instead of failing analysis.
    """
    out, i, n = [], 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "'":  # quoted literal — copy through to closing quote
            j = i + 1
            while j < n and fmt[j] != "'":
                j += 1
            out.append(fmt[i : j + 1])
            i = j + 1
        elif ch.isalpha() and ch not in _SDF_SAFE:
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def date_format(ts: ColumnOrName, fmt: str) -> Column:
    """DATE_FORMAT with SimpleDateFormat patterns (SystemFunctionUtils.java
    :103-119; pattern engine DateTimeUtils.formatTimestampMillis)."""
    return F.date_format(_col(ts), translate_datetime_pattern(fmt))


def unix_timestamp(s: ColumnOrName, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """UNIX_TIMESTAMP parity: Long.MIN_VALUE sentinel on parse failure
    (SystemFunctionUtils.java:94-101, DateTimeUtils.unixTimestamp)."""
    parsed = F.unix_timestamp(_col(s), translate_datetime_pattern(fmt))
    return F.coalesce(parsed, F.lit(LONG_MIN))


def from_unixtime(sec: ColumnOrName, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.from_unixtime(_col(sec), translate_datetime_pattern(fmt))


def to_date(s: ColumnOrName, fmt: str = "yyyy-MM-dd") -> Column:
    return F.to_date(_col(s), translate_datetime_pattern(fmt))


def to_timestamp(s: ColumnOrName, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(_col(s), translate_datetime_pattern(fmt))


_DIFF_UNITS = {"SECOND", "MINUTE", "HOUR", "DAY", "MONTH", "YEAR"}


def timestamp_diff(unit: str, a: ColumnOrName, b: ColumnOrName) -> Column:
    """TIMESTAMPDIFF(unit, from, to) (SystemFunctionUtils.java:145-242)."""
    u = unit.upper()
    if u not in _DIFF_UNITS:
        raise ValueError(f"unsupported TIMESTAMPDIFF unit {unit!r}")
    return F.expr(f"timestampdiff({u}, {_sql_ref(a)}, {_sql_ref(b)})").cast("int")


def timestamp_add(unit: str, n: ColumnOrName | int, ts: ColumnOrName) -> Column:
    u = unit.upper()
    if u not in _DIFF_UNITS:
        raise ValueError(f"unsupported TIMESTAMPADD unit {unit!r}")
    n_sql = str(n) if isinstance(n, int) else _sql_ref(n)
    return F.expr(f"timestampadd({u}, {n_sql}, {_sql_ref(ts)})")


def _sql_ref(c: ColumnOrName) -> str:
    if isinstance(c, str):
        return f"`{c}`"
    # Column → its SQL via the private _jc; fall back to str()
    try:
        return c._jc.toString()  # type: ignore[attr-defined]
    except Exception:  # pragma: no cover
        return str(c)


# ---------------------------------------------------------------------------
# string
# ---------------------------------------------------------------------------

def concat(*cols: ColumnOrName) -> Column:
    """CONCAT skipping NULLs (deviation from Java 'null' text — see module
    docstring)."""
    return F.concat_ws("", *[_col(c).cast("string") for c in cols])


def char_length(c: ColumnOrName) -> Column:
    return F.char_length(_col(c))


def trim(c: ColumnOrName) -> Column:
    """Java String.trim() (strips ASCII <= 0x20 from both ends,
    SystemFunctionUtils.java:427-429). Spark btrim default strips ' ' only;
    use regexp to match Java semantics for control chars."""
    return F.regexp_replace(
        F.regexp_replace(_col(c), r"^[\x00-\x20]+", ""), r"[\x00-\x20]+$", "")


def regexp_replace(c: ColumnOrName, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(_col(c), pattern, replacement)


def substr(c: ColumnOrName, pos: int, length: int | None = None) -> Column:
    if length is None:
        return F.substring(_col(c), pos, 2147483647)
    return F.substring(_col(c), pos, length)


# ---------------------------------------------------------------------------
# arithmetic / misc
# ---------------------------------------------------------------------------

def round_(c: ColumnOrName, d: int = 0) -> Column:
    """ROUND HALF_UP on decimals/doubles (SystemFunctionUtils.java:674-742)."""
    return F.round(_col(c), d)


def if_(cond: Column, a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.when(_false_if_null(cond), _col(a)).otherwise(_col(b))


# ---------------------------------------------------------------------------
# AI model functions (OpenAIEmbeddingModel.java:57-84 / OpenAIChatModel.java
# :55-75, TransformSqlOperatorTable.java:355-385 registers GET_EMBEDDING /
# AI_CHAT_PREDICT / AI_LANGCHAIN_PREDICT). The Spark-side shape — pandas_udf
# over Arrow batches, a pluggable batched transport with retry underneath —
# is the real, scale-correct design: one executor-side HTTP round trip per
# micro-batch chunk instead of the reference's per-row client call.
# ---------------------------------------------------------------------------

class ModelTransport:
    """Pluggable batched model-endpoint client.

    ``post(inputs: list) -> list`` is the single method a real client
    implements (e.g. urllib against an OpenAI-compatible /embeddings or
    /chat endpoint). The transport wraps every chunk in micro-batching
    (``batch_size``, sink.batch-size analog) and exponential-backoff retry
    (DsqlRetryHelper semantics applied to model calls). Runs inside the
    pandas_udf on executors — construct it with picklable callables.
    """

    def __init__(self, post, batch_size: int = 64, retry=None):
        from .sinks import RetryPolicy

        self.post = post
        self.batch_size = max(1, int(batch_size))
        self.retry = retry or RetryPolicy()

    def call(self, inputs: list) -> list:
        out = []
        for i in range(0, len(inputs), self.batch_size):
            chunk = inputs[i : i + self.batch_size]
            res = self.retry.run(lambda c=chunk: self.post(c))
            if len(res) != len(chunk):
                raise RuntimeError(
                    f"model endpoint returned {len(res)} results for a "
                    f"batch of {len(chunk)}")
            out.extend(res)
        return out


def _stub_embed_post(dim: int):
    """Deterministic fake /embeddings endpoint: element i of the unit
    vector is md5(text|i) scaled to [-1, 1), then L2-normalized. SQL-
    expressible on purpose (mirrors _stub_chat_post) so the full
    Arrow→transport→Arrow path is oracle-checkable: DuckDB replays the
    exact arithmetic via ('0x'||substr(md5(..),1,8))::BIGINT."""
    def np32(x: float) -> float:
        import struct

        return struct.unpack("f", struct.pack("f", x))[0]

    def post(texts):
        import hashlib
        import math

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            raw = [
                int(hashlib.md5(f"{t}|{i}".encode()).hexdigest()[:8], 16)
                / 2147483648.0 - 1.0
                for i in range(dim)
            ]
            nrm = math.sqrt(sum(x * x for x in raw)) or 1.0
            out.append([np32(x / nrm) for x in raw])
        return out

    return post


def _stub_chat_post(tag: str = "stub-reply"):
    """Deterministic fake /chat endpoint: prompt-hash echo. SQL-expressible
    on purpose (md5 exists in DuckDB) so the full Arrow→transport→Arrow
    path is oracle-checkable, not just rows-only."""
    def post(prompts):
        import hashlib

        return [None if p is None
                else f"[{tag}:{hashlib.md5(p.encode()).hexdigest()[:8]}]"
                for p in prompts]

    return post


def get_embedding_udf(embed_fn=None, dim: int = 64, transport=None):
    """pandas_udf for GET_EMBEDDING(text) → array<float>.

    Resolution order: `transport` (a ModelTransport), else legacy
    `embed_fn` (pandas.Series → pandas.Series), else the deterministic
    stub transport — every path is Arrow-batched.
    """
    from pyspark.sql.functions import pandas_udf

    def get_embedding(texts):
        import pandas as pd

        if embed_fn is not None:
            return embed_fn(texts)
        t = transport or ModelTransport(_stub_embed_post(dim))
        return pd.Series(t.call(texts.tolist()), index=texts.index)

    return pandas_udf(get_embedding, "array<float>")


def ai_chat_predict_udf(chat_fn=None, transport=None):
    """AI_CHAT_PREDICT(prompt) → string through the batched transport."""
    from pyspark.sql.functions import pandas_udf

    def ai_chat_predict(prompts):
        import pandas as pd

        if chat_fn is not None:
            return chat_fn(prompts)
        t = transport or ModelTransport(_stub_chat_post())
        return pd.Series(t.call(prompts.tolist()), index=prompts.index)

    return pandas_udf(ai_chat_predict, "string")


def ai_langchain_predict_udf(transport=None,
                             template: str = "Summarize: {input}"):
    """AI_LANGCHAIN_PREDICT(input) → string: a prompt template rendered
    around the input, then one batched model call — the langchain
    prompt-chain shape (TransformSqlOperatorTable.java:375-385) without the
    framework dependency. The template travels with the UDF, so the chain
    is defined at registration (YAML ``pipeline.model``) like the
    reference's."""
    from pyspark.sql.functions import pandas_udf

    def ai_langchain_predict(inputs):
        import pandas as pd

        t = transport or ModelTransport(_stub_chat_post("lc"))
        rendered = [None if x is None else template.replace("{input}", x)
                    for x in inputs.tolist()]
        return pd.Series(t.call(rendered), index=inputs.index)

    return pandas_udf(ai_langchain_predict, "string")


def register_model_functions(spark, embed_fn=None, chat_fn=None,
                             dim: int = 64, embed_transport=None,
                             chat_transport=None, langchain_transport=None,
                             langchain_template: str = "Summarize: {input}"
                             ) -> None:
    """Register GET_EMBEDDING / AI_CHAT_PREDICT / AI_LANGCHAIN_PREDICT so
    transform projection and filter strings can call them (the reference
    binds them from YAML ``pipeline.model`` definitions — ModelDef in
    pipeline.py)."""
    spark.udf.register("get_embedding",
                       get_embedding_udf(embed_fn, dim, embed_transport))
    spark.udf.register("ai_chat_predict",
                       ai_chat_predict_udf(chat_fn, chat_transport))
    spark.udf.register(
        "ai_langchain_predict",
        ai_langchain_predict_udf(langchain_transport, langchain_template))
