"""Reference SQL expression dialect → Spark SQL rewrite.

The reference parses per-table ``projection:`` / ``filter:`` strings with
Calcite (``TransformParser.parseProjectionExpression``:525 /
``parseFilterExpression``:554, MySQL-ish conformance :100-107), then compiles
the AST to Janino Java (``JaninoCompiler.java:110-135``). On Spark the same
surface becomes: parse here (small recursive-descent parser over exactly the
dialect the reference accepts — single-table expressions, no subqueries/joins,
``TransformParser.parseSelect`` :189-205 enforces that shape), then render to
a Spark SQL string with the reference's *semantics* baked in:

- ``=`` / ``<>``  → valueEquals / !valueEquals (null→FALSE / null→TRUE)
- ``> >= < <=``, BETWEEN, IN, LIKE → FALSE on NULL; LIKE is unanchored regex
  (RLIKE)
- AND / OR / NOT → two-valued (operands coalesced to FALSE)
- CAST → null-on-failure with the string→double→integral fallback chain
- temporal fns → SimpleDateFormat pattern translation + the
  ``UNIX_TIMESTAMP`` Long.MIN_VALUE sentinel

The resulting string goes through ``F.expr`` → Catalyst analysis → Tungsten
codegen; the whole layer is driver-side string work with zero runtime cost.

``parse_projection`` additionally handles the ``*`` wildcard and aliases, and
``referenced_columns`` reproduces ``TransformParser.generateReferencedColumns``
(:207-254) for pre-transform column pruning.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .functions import LONG_MIN, translate_datetime_pattern

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?[Ll]?)
  | (?P<string>'(?:[^']|'')*')
  | (?P<bquote>`[^`]+`)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><>|!=|>=|<=|\|\||[=<>+\-*/%(),.])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "IS", "NULL", "TRUE", "FALSE", "BETWEEN", "IN",
    "LIKE", "CASE", "WHEN", "THEN", "ELSE", "END", "CAST", "AS",
}


@dataclass
class _Tok:
    kind: str  # number | string | name | op | kw
    text: str


def _tokenize(s: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"cannot tokenize expression at: {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.upper() in _KEYWORDS:
            toks.append(_Tok("kw", text.upper()))
        else:
            toks.append(_Tok(kind, text))
    return toks


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Node:
    pass


@dataclass
class Lit(Node):
    sql: str  # rendered literal (dialect-neutral)


@dataclass
class Ident(Node):
    name: str


@dataclass
class Star(Node):
    pass


@dataclass
class Unary(Node):
    op: str  # '-' | '+' | 'NOT'
    x: Node


@dataclass
class Bin(Node):
    op: str
    a: Node
    b: Node


@dataclass
class Cmp(Node):
    op: str  # = <> > >= < <=
    a: Node
    b: Node


@dataclass
class Between(Node):
    v: Node
    lo: Node
    hi: Node
    negated: bool


@dataclass
class InList(Node):
    v: Node
    items: list
    negated: bool


@dataclass
class LikeOp(Node):
    s: Node
    pattern: Node
    negated: bool


@dataclass
class IsNull(Node):
    x: Node
    negated: bool


@dataclass
class IsBool(Node):
    x: Node
    value: bool  # IS TRUE / IS FALSE (IS NOT TRUE == IS FALSE per Janino)


@dataclass
class Func(Node):
    name: str  # upper-cased
    args: list


@dataclass
class Cast(Node):
    x: Node
    type_name: str
    p1: int | None = None
    p2: int | None = None


@dataclass
class Case(Node):
    operand: Node | None
    whens: list  # [(cond_or_value, result)]
    default: Node | None


_BOOL_NODES = (Cmp, Between, InList, LikeOp, IsNull, IsBool)


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> _Tok | None:
        t = self.peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise ValueError(f"expected {text or kind}, got {got.text if got else 'EOF'!r}")
        return t

    # --- grammar ---

    def expr(self) -> Node:
        return self.or_expr()

    def or_expr(self) -> Node:
        n = self.and_expr()
        while self.accept("kw", "OR"):
            n = Bin("OR", n, self.and_expr())
        return n

    def and_expr(self) -> Node:
        n = self.not_expr()
        while self.accept("kw", "AND"):
            n = Bin("AND", n, self.not_expr())
        return n

    def not_expr(self) -> Node:
        if self.accept("kw", "NOT"):
            return Unary("NOT", self.not_expr())
        return self.predicate()

    def predicate(self) -> Node:
        n = self.add_expr()
        t = self.peek()
        if t is not None and t.kind == "op" and t.text in (
                "=", "<>", "!=", ">", ">=", "<", "<="):
            self.next()
            op = "<>" if t.text == "!=" else t.text
            n = Cmp(op, n, self.add_expr())
        else:
            negated = False
            if t is not None and t.kind == "kw" and t.text == "NOT":
                nxt2 = (self.toks[self.i + 1]
                        if self.i + 1 < len(self.toks) else None)
                if nxt2 and nxt2.kind == "kw" and nxt2.text in (
                        "BETWEEN", "IN", "LIKE"):
                    self.next()
                    negated = True
                    t = self.peek()
            if t is not None and t.kind == "kw" and t.text == "BETWEEN":
                self.next()
                lo = self.add_expr()
                self.expect("kw", "AND")
                hi = self.add_expr()
                n = Between(n, lo, hi, negated)
            elif t is not None and t.kind == "kw" and t.text == "IN":
                self.next()
                self.expect("op", "(")
                items = [self.expr()]
                while self.accept("op", ","):
                    items.append(self.expr())
                self.expect("op", ")")
                n = InList(n, items, negated)
            elif t is not None and t.kind == "kw" and t.text == "LIKE":
                self.next()
                n = LikeOp(n, self.add_expr(), negated)
        # postfix IS [NOT] NULL/TRUE/FALSE chain — binds looser than the
        # comparison, so `id = 3 IS FALSE` means `(id = 3) IS FALSE`
        # (Calcite precedence; FlinkPipelineTransformITCase logical cases)
        while True:
            t = self.peek()
            if t is None or not (t.kind == "kw" and t.text == "IS"):
                return n
            self.next()
            negated = self.accept("kw", "NOT") is not None
            nxt = self.next()
            if nxt.kind == "kw" and nxt.text == "NULL":
                n = IsNull(n, negated)
            elif nxt.kind == "kw" and nxt.text in ("TRUE", "FALSE"):
                val = nxt.text == "TRUE"
                # Janino: IS NOT TRUE == IS FALSE, IS NOT FALSE == IS TRUE
                n = IsBool(n, (not val) if negated else val)
            else:
                raise ValueError(f"unsupported IS {nxt.text}")

    def add_expr(self) -> Node:
        n = self.mul_expr()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("+", "-", "||"):
                self.next()
                n = Bin(t.text, n, self.mul_expr())
            else:
                return n

    def mul_expr(self) -> Node:
        n = self.unary()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                self.next()
                n = Bin(t.text, n, self.unary())
            else:
                return n

    def unary(self) -> Node:
        t = self.peek()
        if t and t.kind == "op" and t.text in ("-", "+"):
            self.next()
            return Unary(t.text, self.unary())
        return self.primary()

    def primary(self) -> Node:
        t = self.next()
        if t.kind == "number":
            return Lit(t.text.rstrip("Ll"))
        if t.kind == "string":
            return Lit(t.text)
        if t.kind == "kw":
            if t.text == "NULL":
                return Lit("NULL")
            if t.text in ("TRUE", "FALSE"):
                return Lit(t.text.lower())
            if t.text == "CASE":
                return self._case()
            if t.text == "CAST":
                return self._cast()
            raise ValueError(f"unexpected keyword {t.text}")
        if t.kind == "bquote":
            return Ident(t.text[1:-1])
        if t.kind == "name":
            # niladic temporal functions usable without parens (Calcite)
            if t.text.upper() in ("LOCALTIME", "LOCALTIMESTAMP",
                                  "CURRENT_TIME", "CURRENT_TIMESTAMP",
                                  "CURRENT_DATE") and not (
                    self.peek() and self.peek().kind == "op"
                    and self.peek().text == "("):
                return Func(t.text.upper(), [])
            if self.accept("op", "("):
                name = t.text.upper()
                args: list[Node] = []
                if not self.accept("op", ")"):
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                return Func(name, args)
            return Ident(t.text)
        if t.kind == "op" and t.text == "(":
            n = self.expr()
            self.expect("op", ")")
            return n
        if t.kind == "op" and t.text == "*":
            return Star()
        raise ValueError(f"unexpected token {t.text!r}")

    def _case(self) -> Node:
        operand = None
        if not (self.peek() and self.peek().kind == "kw"
                and self.peek().text == "WHEN"):
            operand = self.expr()
        whens = []
        while self.accept("kw", "WHEN"):
            cond = self.expr()
            self.expect("kw", "THEN")
            whens.append((cond, self.expr()))
        default = self.expr() if self.accept("kw", "ELSE") else None
        self.expect("kw", "END")
        return Case(operand, whens, default)

    def _cast(self) -> Node:
        self.expect("op", "(")
        x = self.expr()
        self.expect("kw", "AS")
        tname = self.expect("name").text.upper()
        p1 = p2 = None
        if self.accept("op", "("):
            p1 = int(self.expect("number").text)
            if self.accept("op", ","):
                p2 = int(self.expect("number").text)
            self.expect("op", ")")
        self.expect("op", ")")
        return Cast(x, tname, p1, p2)


def parse_expr(s: str) -> Node:
    p = _Parser(_tokenize(s))
    n = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in expression: {p.peek().text!r}")
    return n


# ---------------------------------------------------------------------------
# rendering → Spark SQL
# ---------------------------------------------------------------------------

def _bool(n: Node) -> str:
    """Render a node in boolean context (two-valued: NULL → FALSE)."""
    if isinstance(n, _BOOL_NODES):
        return _sql(n)
    if isinstance(n, Bin) and n.op in ("AND", "OR"):
        return _sql(n)
    if isinstance(n, Unary) and n.op == "NOT":
        return _sql(n)
    return f"coalesce(cast({_sql(n)} as boolean), false)"


_DIRECT_FUNCS = {
    # reference name → spark name (1:1 passthrough)
    "ABS": "abs", "CEIL": "ceil", "CEILING": "ceil", "FLOOR": "floor",
    "ROUND": "round", "UUID": "uuid", "COALESCE": "coalesce",
    "UPPER": "upper", "LOWER": "lower", "CHAR_LENGTH": "char_length",
    "REGEXP_REPLACE": "regexp_replace", "SUBSTR": "substr",
    "SUBSTRING": "substring", "NOW": "current_timestamp",
    "CURRENT_TIMESTAMP": "current_timestamp", "LOCALTIMESTAMP": "localtimestamp",
    "CURRENT_DATE": "current_date",
    # LLM operators (registered pandas_udfs, functions.py)
    "GET_EMBEDDING": "get_embedding", "AI_CHAT_PREDICT": "ai_chat_predict",
    "AI_LANGCHAIN_PREDICT": "ai_langchain_predict",
}

_INTEGRAL_CASTS = {"TINYINT": "tinyint", "SMALLINT": "smallint",
                   "INT": "int", "INTEGER": "int", "BIGINT": "bigint"}


def _sql(n: Node) -> str:  # noqa: C901 (dispatch table would be longer)
    if isinstance(n, Lit):
        return n.sql
    if isinstance(n, Ident):
        return f"`{n.name}`"
    if isinstance(n, Star):
        return "*"
    if isinstance(n, Unary):
        if n.op == "NOT":
            return f"(NOT {_bool(n.x)})"
        return f"({n.op}{_sql(n.x)})"
    if isinstance(n, Bin):
        if n.op in ("AND", "OR"):
            return f"({_bool(n.a)} {n.op} {_bool(n.b)})"
        if n.op == "||":
            return (f"concat_ws('', cast({_sql(n.a)} as string), "
                    f"cast({_sql(n.b)} as string))")
        return f"({_sql(n.a)} {n.op} {_sql(n.b)})"
    if isinstance(n, Cmp):
        a, b = _sql(n.a), _sql(n.b)
        if n.op == "=":
            return f"(({a}) IS NOT NULL AND ({b}) IS NOT NULL AND ({a}) <=> ({b}))"
        if n.op == "<>":
            return f"(NOT (({a}) IS NOT NULL AND ({b}) IS NOT NULL AND ({a}) <=> ({b})))"
        return f"coalesce(({a}) {n.op} ({b}), false)"
    if isinstance(n, Between):
        v, lo, hi = _sql(n.v), _sql(n.lo), _sql(n.hi)
        base = f"coalesce(({v}) >= ({lo}) AND ({v}) <= ({hi}), false)"
        return f"(NOT {base})" if n.negated else base
    if isinstance(n, InList):
        items = ", ".join(_sql(i) for i in n.items)
        base = f"coalesce(({_sql(n.v)}) IN ({items}), false)"
        return f"(NOT {base})" if n.negated else base
    if isinstance(n, LikeOp):
        base = f"coalesce(({_sql(n.s)}) RLIKE ({_sql(n.pattern)}), false)"
        return f"(NOT {base})" if n.negated else base
    if isinstance(n, IsNull):
        return f"(({_sql(n.x)}) IS {'NOT ' if n.negated else ''}NULL)"
    if isinstance(n, IsBool):
        return f"(({_sql(n.x)}) <=> {str(n.value).lower()})"
    if isinstance(n, Case):
        parts = ["CASE"]
        if n.operand is not None:
            parts.append(_sql(n.operand))
            for cond, res in n.whens:
                parts.append(f"WHEN {_sql(cond)} THEN {_sql(res)}")
        else:
            for cond, res in n.whens:
                parts.append(f"WHEN {_bool(cond)} THEN {_sql(res)}")
        if n.default is not None:
            parts.append(f"ELSE {_sql(n.default)}")
        parts.append("END")
        return "(" + " ".join(parts) + ")"
    if isinstance(n, Cast):
        return _render_cast(n)
    if isinstance(n, Func):
        return _render_func(n)
    raise AssertionError(f"unhandled node {n!r}")


def _render_cast(n: Cast) -> str:
    x = _sql(n.x)
    t = n.type_name
    if t in _INTEGRAL_CASTS:
        st = _INTEGRAL_CASTS[t]
        # string→double→integral fallback (SystemFunctionUtils.java:870-894)
        return f"coalesce(cast({x} as {st}), cast(cast({x} as double) as {st}))"
    if t in ("FLOAT", "DOUBLE"):
        return f"cast({x} as {t.lower()})"
    if t in ("CHAR", "VARCHAR", "STRING"):
        return f"cast({x} as string)"
    if t in ("DECIMAL", "NUMERIC"):
        p, s = n.p1 or 10, n.p2 or 0
        return f"cast({x} as decimal({p},{s}))"
    if t == "BOOLEAN":
        # castToBoolean (SystemFunctionUtils.java:772-795): numerics →
        # non-zero, but STRING inputs go through Boolean.valueOf — so
        # '12.13' is FALSE (testNumericCastingsWithTruncation golden)
        return (f"(CASE WHEN ({x}) IS NULL THEN cast(null as boolean)"
                f" WHEN typeof({x}) = 'string' THEN lower({x}) = 'true'"
                f" WHEN cast({x} as double) IS NOT NULL THEN cast({x} as double) != 0.0d"
                f" ELSE lower(cast({x} as string)) = 'true' END)")
    if t == "TIMESTAMP":
        return f"cast({x} as timestamp_ntz)"
    if t == "DATE":
        return f"cast({x} as date)"
    raise ValueError(f"unsupported CAST target {t}")


def _lit_str(n: Node) -> str | None:
    """If n is a string literal, return its unquoted python value."""
    if isinstance(n, Lit) and n.sql.startswith("'"):
        return n.sql[1:-1].replace("''", "'")
    return None


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _render_func(n: Func) -> str:
    name, args = n.name, n.args
    a = [_sql(x) for x in args]
    if name in _DIRECT_FUNCS:
        return f"{_DIRECT_FUNCS[name]}({', '.join(a)})"
    if name == "CONCAT":
        casts = ", ".join(f"cast({x} as string)" for x in a)
        return f"concat_ws('', {casts})"
    if name == "TRIM":
        # Java String.trim(): strip ASCII <= 0x20 (SystemFunctionUtils.java:427)
        return (f"regexp_replace(regexp_replace({a[-1]}, "
                r"'^[\\x00-\\x20]+', ''), '[\\x00-\\x20]+$', '')")
    if name == "IF":
        return f"if({_bool(args[0])}, {a[1]}, {a[2]})"
    if name in ("LOCALTIME", "CURRENT_TIME"):
        return "date_format(current_timestamp(), 'HH:mm:ss')"
    if name == "DATE_FORMAT":
        fmt = _lit_str(args[1])
        f2 = _quote(translate_datetime_pattern(fmt)) if fmt is not None else a[1]
        return f"date_format({a[0]}, {f2})"
    if name == "UNIX_TIMESTAMP":
        if not args:
            return "unix_timestamp()"
        fmt = _lit_str(args[1]) if len(args) > 1 else "yyyy-MM-dd HH:mm:ss"
        f2 = _quote(translate_datetime_pattern(fmt))
        return f"coalesce(unix_timestamp({a[0]}, {f2}), {LONG_MIN}L)"
    if name == "FROM_UNIXTIME":
        fmt = _lit_str(args[1]) if len(args) > 1 else "yyyy-MM-dd HH:mm:ss"
        f2 = _quote(translate_datetime_pattern(fmt))
        return f"from_unixtime({a[0]}, {f2})"
    if name == "TO_DATE":
        fmt = _lit_str(args[1]) if len(args) > 1 else "yyyy-MM-dd"
        return f"to_date({a[0]}, {_quote(translate_datetime_pattern(fmt))})"
    if name == "TO_TIMESTAMP":
        fmt = _lit_str(args[1]) if len(args) > 1 else "yyyy-MM-dd HH:mm:ss"
        return f"to_timestamp({a[0]}, {_quote(translate_datetime_pattern(fmt))})"
    if name in ("TIMESTAMPDIFF", "TIMESTAMP_DIFF"):
        unit = args[0].name if isinstance(args[0], Ident) else _lit_str(args[0])
        return f"cast(timestampdiff({unit.upper()}, {a[1]}, {a[2]}) as int)"
    if name == "TIMESTAMPADD":
        unit = args[0].name if isinstance(args[0], Ident) else _lit_str(args[0])
        return f"timestampadd({unit.upper()}, {a[1]}, {a[2]})"
    # unknown → pass through (registered UDFs keep their name)
    return f"{name.lower()}({', '.join(a)})"


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def filter_sql(n: Node) -> str:
    """Render a boolean in FILTER context, pushdown-friendly.

    In a WHERE clause, NULL and FALSE both drop the row — so the reference's
    null→FALSE comparisons are row-equivalent to BARE SQL comparisons, and
    rendering them bare lets Catalyst push them into the parquet scan
    (PushedFilters / partition pruning — the coalesce() wrapper the
    projection context needs would block pushdown entirely). The forms
    whose NULL behavior genuinely differs from three-valued SQL keep the
    two-valued rendering: NOT (NULL must become TRUE, not drop), ``<>``
    (null→TRUE keeps rows), negated BETWEEN/IN/LIKE, and postfix IS.
    """
    if isinstance(n, Bin) and n.op in ("AND", "OR"):
        return f"({filter_sql(n.a)} {n.op} {filter_sql(n.b)})"
    if isinstance(n, Cmp) and n.op in (">", ">=", "<", "<=", "="):
        return f"(({_sql(n.a)}) {n.op} ({_sql(n.b)}))"
    if isinstance(n, Between) and not n.negated:
        return f"(({_sql(n.v)}) BETWEEN ({_sql(n.lo)}) AND ({_sql(n.hi)}))"
    if isinstance(n, InList) and not n.negated:
        items = ", ".join(_sql(i) for i in n.items)
        return f"(({_sql(n.v)}) IN ({items}))"
    if isinstance(n, LikeOp) and not n.negated:
        return f"(({_sql(n.s)}) RLIKE ({_sql(n.pattern)}))"
    return _bool(n)


def rewrite_filter(s: str) -> str:
    """Reference filter expression → Spark SQL boolean expression."""
    return filter_sql(parse_expr(s))


def rewrite_expr(s: str) -> str:
    """Reference value expression → Spark SQL expression."""
    return _sql(parse_expr(s))


@dataclass
class ProjectionItem:
    expr_sql: str | None  # None for '*'
    alias: str | None
    source: str  # original text
    refs: tuple[str, ...] = ()

    @property
    def is_star(self) -> bool:
        return self.expr_sql is None


def _split_projection(s: str) -> list[str]:
    """Split a projection list on top-level commas (paren/quote aware)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            i += 1
            while i < n:
                if s[i] == "'" and (i + 1 >= n or s[i + 1] != "'"):
                    break
                i += 2 if s[i] == "'" else 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def parse_projection(s: str) -> list[ProjectionItem]:
    """Parse ``a, b AS x, *, UPPER(name) AS uname`` into items.

    Mirrors TransformParser.generateProjectionColumns (:274-388): each item
    is either the asterisk or an expression with an optional alias; an
    expression without an alias must be a plain column reference.
    """
    items = []
    for part in _split_projection(s):
        if part == "*":
            items.append(ProjectionItem(None, None, part))
            continue
        toks = _tokenize(part)
        alias = None
        if len(toks) >= 2 and toks[-2].kind == "kw" and toks[-2].text == "AS":
            tail = toks[-1]
            if tail.kind == "name":
                alias = tail.text
            elif tail.kind == "bquote":
                alias = tail.text[1:-1]
            else:
                raise ValueError(f"bad alias in projection item: {part!r}")
            toks = toks[:-2]
        p = _Parser(toks)
        node = p.expr()
        if p.peek() is not None:
            raise ValueError(f"trailing tokens in projection item: {part!r}")
        if alias is None:
            if not isinstance(node, Ident):
                raise ValueError(
                    f"projection expression needs an alias: {part!r}")
            alias = node.name
        items.append(ProjectionItem(_sql(node), alias, part,
                                    tuple(collect_refs(node))))
    return items


def collect_refs(n: Node) -> list[str]:
    """Column names referenced by an expression (order-preserving, deduped).

    Parity: TransformParser.generateReferencedColumns (:207-254).
    """
    out: list[str] = []

    def walk(x: Node) -> None:
        if isinstance(x, Ident):
            if x.name not in out:
                out.append(x.name)
        elif isinstance(x, Unary):
            walk(x.x)
        elif isinstance(x, Bin):
            walk(x.a), walk(x.b)
        elif isinstance(x, Cmp):
            walk(x.a), walk(x.b)
        elif isinstance(x, Between):
            walk(x.v), walk(x.lo), walk(x.hi)
        elif isinstance(x, InList):
            walk(x.v)
            for i in x.items:
                walk(i)
        elif isinstance(x, LikeOp):
            walk(x.s), walk(x.pattern)
        elif isinstance(x, (IsNull, IsBool)):
            walk(x.x)
        elif isinstance(x, Cast):
            walk(x.x)
        elif isinstance(x, Case):
            if x.operand is not None:
                walk(x.operand)
            for c, r in x.whens:
                walk(c), walk(r)
            if x.default is not None:
                walk(x.default)
        elif isinstance(x, Func):
            for arg in x.args:
                if isinstance(arg, Ident) and x.name in (
                        "TIMESTAMPDIFF", "TIMESTAMP_DIFF", "TIMESTAMPADD"):
                    # first arg is a unit keyword, not a column
                    if arg is x.args[0]:
                        continue
                walk(arg)

    walk(n)
    return out


def referenced_columns(projection: str | None, filter_: str | None) -> list[str]:
    """All source columns referenced by a transform rule (for pruning)."""
    out: list[str] = []
    if projection:
        for item in parse_projection(projection):
            for r in item.refs:
                if r not in out:
                    out.append(r)
    if filter_:
        for r in collect_refs(parse_expr(filter_)):
            if r not in out:
                out.append(r)
    return out
