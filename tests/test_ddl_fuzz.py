"""DDL-parser property fuzz (VERDICT r11 next-round #5): generate ALTER
statements from a structured spec AST, render them with RANDOMIZED
surface forms — per-identifier quoting, keyword case, whitespace runs,
migration-tool comment prefixes, spec order, parenthesized multi-add,
trailing semicolons, adversarial quoted DEFAULT literals containing
', DROP x' — and assert :func:`parse_debezium_ddl` recovers exactly the
events a slow AST interpreter derives. The same discipline that caught
the avro long-range and zip-truncation bugs."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cdc_dsql_master_spark.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    DropColumnEvent,
    RenameColumnEvent,
)
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.sources import parse_debezium_ddl

TID = TableId.parse("db.sch.t1")

_NAMES = ["c1", "col_b", "Xy2", "value", "wide_col", "n"]
_TYPES = ["INT", "BIGINT", "DOUBLE", "TEXT", "VARCHAR(20)",
          "DECIMAL(10,2)"]

name_s = st.sampled_from(_NAMES)
type_s = st.sampled_from(_TYPES)

# defaults: numeric, word-ish, or a quoted literal with adversarial
# content (commas + spec keywords) that must NOT split the spec list
default_s = st.one_of(
    st.none(),
    st.sampled_from(["0", "42.5", "-7", "abc", "NULL"]),
    st.sampled_from(["'x'", "'a, DROP c1'", "'ADD, MODIFY'",
                     "'hello world'", "''",
                     # escaped quotes (round-13, ADVICE r12): MySQL
                     # backslash escape and doubled-quote forms, with
                     # adversarial '; '/', DROP' payloads behind them
                     r"'it\'s; x'", "'a''b, DROP c1'",
                     r"'back\\slash'"]),
)

add_spec = st.tuples(st.just("add"), name_s, type_s, st.booleans(),
                     default_s,
                     st.one_of(st.none(), st.just("FIRST"),
                               name_s.map(lambda n: ("AFTER", n))))
drop_spec = st.tuples(st.just("drop"), name_s)
modify_spec = st.tuples(st.just("modify"), name_s, type_s, st.booleans())
change_spec = st.tuples(st.just("change"), name_s, name_s, type_s,
                        st.booleans())
rename_spec = st.tuples(st.just("rename"), name_s, name_s)
spec_s = st.one_of(add_spec, drop_spec, modify_spec, change_spec,
                   rename_spec)


def _expected(spec) -> list:
    """Slow reference interpreter: spec AST → event list."""
    kind = spec[0]
    if kind == "add":
        _, name, typ, notnull, default, pos = spec
        ts = typ + (" NOT NULL" if notnull else "")
        if default is not None:
            if default.startswith("'"):
                from flink_cdc_dsql_master_spark.sources import \
                    _unescape_sql_literal
                default = _unescape_sql_literal(default[1:-1])
            elif default == "NULL":
                default = None
        position, anchor = ColumnPosition.LAST, None
        if pos == "FIRST":
            position = ColumnPosition.FIRST
        elif isinstance(pos, tuple):
            position, anchor = ColumnPosition.AFTER, pos[1]
        return [AddColumnEvent(TID, name, ts, position=position,
                               anchor=anchor, default=default)]
    if kind == "drop":
        return [DropColumnEvent(TID, spec[1])]
    if kind == "modify":
        _, name, typ, notnull = spec
        return [AlterColumnTypeEvent(
            TID, name, typ + (" NOT NULL" if notnull else ""))]
    if kind == "change":
        _, old, new, typ, notnull = spec
        out = []
        if old != new:
            out.append(RenameColumnEvent(TID, old, new))
        out.append(AlterColumnTypeEvent(
            TID, new, typ + (" NOT NULL" if notnull else "")))
        return out
    if kind == "rename":
        return [RenameColumnEvent(TID, spec[1], spec[2])]
    raise AssertionError(kind)


def _render_spec(spec, rnd) -> str:
    """Spec AST → randomized SQL surface form."""
    def q(ident):
        quote = rnd.draw(st.sampled_from(["", "`", '"']))
        return f"{quote}{ident}{quote}"

    def kw(word):
        return rnd.draw(st.sampled_from(
            [word.upper(), word.lower(), word.capitalize()]))

    col_kw = rnd.draw(st.sampled_from(["", kw("COLUMN") + " "]))
    kind = spec[0]
    if kind == "add":
        _, name, typ, notnull, default, pos = spec
        s = f"{kw('ADD')} {col_kw}{q(name)} {typ}"
        if notnull:
            s += f" {kw('NOT')} {kw('NULL')}"
        if default is not None:
            s += f" {kw('DEFAULT')} {default}"
        if pos == "FIRST":
            s += f" {kw('FIRST')}"
        elif isinstance(pos, tuple):
            s += f" {kw('AFTER')} {q(pos[1])}"
        return s
    if kind == "drop":
        return f"{kw('DROP')} {col_kw}{q(spec[1])}"
    if kind == "modify":
        _, name, typ, notnull = spec
        s = f"{kw('MODIFY')} {col_kw}{q(name)} {typ}"
        return s + (f" {kw('NOT')} {kw('NULL')}" if notnull else "")
    if kind == "change":
        _, old, new, typ, notnull = spec
        s = f"{kw('CHANGE')} {col_kw}{q(old)} {q(new)} {typ}"
        return s + (f" {kw('NOT')} {kw('NULL')}" if notnull else "")
    if kind == "rename":
        return f"{kw('RENAME')} {kw('COLUMN')} {q(spec[1])} " \
               f"{kw('TO')} {q(spec[2])}"
    raise AssertionError(kind)


COMMENT_PREFIXES = ["", "/* gh-ost */ ", "/* pt-online-schema-change */ ",
                    "-- migration 42\n", "# legacy tool\n",
                    "/* a */ /* b */ "]


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_alter_fuzz_matches_reference_interpreter(data):
    specs = data.draw(st.lists(spec_s, min_size=1, max_size=4))
    kw_table = data.draw(st.sampled_from(
        ["ALTER TABLE", "alter table", "Alter Table"]))
    table = data.draw(st.sampled_from(["t1", "db.t1", "`t1`",
                                       "db.`t1`", '"t1"']))
    comment = data.draw(st.sampled_from(COMMENT_PREFIXES))
    semi = data.draw(st.sampled_from(["", ";", " ;"]))
    ws = lambda: data.draw(st.sampled_from([" ", "  ", "\t", " \n "]))

    rendered = [_render_spec(s, data) for s in specs]
    stmt = (comment + kw_table + ws() + table + ws()
            + ("," + ws()).join(rendered) + semi)
    # normalize runs of whitespace the way real tools do NOT — the
    # parser must cope with the raw form
    got = parse_debezium_ddl(stmt, TID)
    expect = [e for s in specs for e in _expected(s)]
    assert got == expect, f"stmt={stmt!r}"


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_paren_multi_add_fuzz(data):
    """MySQL's parenthesized multi-add: ADD COLUMN (a INT, b TEXT)."""
    cols = data.draw(st.lists(
        st.tuples(name_s, type_s, st.booleans()),
        min_size=1, max_size=3, unique_by=lambda t: t[0]))
    kw_add = data.draw(st.sampled_from(
        ["ADD (", "add (", "ADD COLUMN (", "add column ("]))
    comment = data.draw(st.sampled_from(COMMENT_PREFIXES))
    body = ", ".join(f"{n} {t}" + (" NOT NULL" if nn else "")
                     for n, t, nn in cols)
    stmt = f"{comment}ALTER TABLE db.t1 {kw_add}{body})"
    got = parse_debezium_ddl(stmt, TID)
    expect = [AddColumnEvent(TID, n, t + (" NOT NULL" if nn else ""))
              for n, t, nn in cols]
    assert got == expect, f"stmt={stmt!r}"


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_multi_statement_and_noise_fuzz(data):
    """';'-joined statements parse independently; GRANT/SET/ANALYZE
    noise and ALGORITHM/LOCK online-DDL clauses contribute nothing."""
    spec = data.draw(spec_s)
    noise = data.draw(st.sampled_from(
        ["GRANT SELECT ON db.t1 TO 'u'@'%'",
         "SET autocommit=1", "ANALYZE TABLE t1", "FLUSH LOGS", ""]))
    tail = data.draw(st.sampled_from(
        ["", ", ALGORITHM=INPLACE", ", LOCK=NONE",
         ", ALGORITHM=INPLACE, LOCK=NONE"]))
    rendered = _render_spec(spec, data)
    stmt = f"{noise}; ALTER TABLE t1 {rendered}{tail}"
    got = parse_debezium_ddl(stmt, TID)
    assert got == _expected(spec), f"stmt={stmt!r}"


# -- round-12 fuzz findings, pinned -----------------------------------------

def test_mysql_dialect_types_normalize():
    """Fuzz findings: ENUM/SET value lists, UNSIGNED integrals,
    DOUBLE PRECISION, CHARACTER VARYING and display widths used to
    parse to NOTHING — silently skipping evolution (the exact failure
    the width guard then surfaces as a hard error one batch later)."""
    got = parse_debezium_ddl(
        "ALTER TABLE t ADD COLUMN e ENUM('a','b,c') NOT NULL, "
        "ADD u INT UNSIGNED, ADD d DOUBLE PRECISION, "
        "ADD v CHARACTER VARYING(30), ADD s SET('x','y'), "
        "ADD big BIGINT UNSIGNED, "
        "MODIFY c INT(11) UNSIGNED ZEROFILL", TID)
    assert [(e.name, e.type_string) for e in got[:-1]] == [
        ("e", "STRING NOT NULL"), ("u", "BIGINT"), ("d", "DOUBLE"),
        ("v", "VARCHAR(30)"), ("s", "STRING"), ("big", "DECIMAL(20,0)")]
    assert (got[-1].name, got[-1].new_type_string) == ("c", "BIGINT")


def test_mid_and_trailing_comments_do_not_drop_specs():
    """Fuzz finding: a /* mid */ comment inside one spec of a
    multi-spec ALTER made JUST that spec unparseable — silent PARTIAL
    application; a trailing '-- comment' killed a whole spec."""
    got = parse_debezium_ddl(
        "ALTER TABLE t ADD a INT /* mid */, DROP b", TID)
    assert [type(e).__name__ for e in got] == ["AddColumnEvent",
                                               "DropColumnEvent"]
    got = parse_debezium_ddl("ALTER TABLE t DROP COLUMN a -- old", TID)
    assert [e.name for e in got] == ["a"]
    # but quoted literals keep their comment-looking content
    got = parse_debezium_ddl(
        "ALTER TABLE t ADD n INT DEFAULT '--not comment'", TID)
    assert got[0].default == "--not comment"
    # and a quoted ';' does not split the statement
    got = parse_debezium_ddl(
        "ALTER TABLE t ADD d VARCHAR(10) DEFAULT 'a;b', DROP z", TID)
    assert len(got) == 2 and got[0].default == "a;b"


dialect_type_s = st.sampled_from(
    ["INT UNSIGNED", "BIGINT UNSIGNED", "DOUBLE PRECISION",
     "CHARACTER VARYING(12)", "ENUM('a','b')", "SET('p','q,r')",
     "TINYINT UNSIGNED ZEROFILL", "INT(11)"])

_NORMALIZED = {
    "INT UNSIGNED": "BIGINT", "BIGINT UNSIGNED": "DECIMAL(20,0)",
    "DOUBLE PRECISION": "DOUBLE", "CHARACTER VARYING(12)": "VARCHAR(12)",
    "ENUM('a','b')": "STRING", "SET('p','q,r')": "STRING",
    "TINYINT UNSIGNED ZEROFILL": "SMALLINT", "INT(11)": "INT"}


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_dialect_type_fuzz(data):
    typ = data.draw(dialect_type_s)
    name = data.draw(name_s)
    comment = data.draw(st.sampled_from(COMMENT_PREFIXES))
    mid = data.draw(st.sampled_from(["", " /* osc */ "]))
    trail = data.draw(st.sampled_from(["", " -- done", " # done"]))
    other = data.draw(st.sampled_from(["", ", DROP wide_col"]))
    stmt = (f"{comment}ALTER TABLE db.t1{mid} ADD {name} {typ}"
            f"{other}{trail}")
    got = parse_debezium_ddl(stmt, TID)
    want = len(other.split(",")) if other else 1
    assert len(got) == want, f"stmt={stmt!r} got={got}"
    assert got[0] == AddColumnEvent(TID, name, _NORMALIZED[typ]), \
        f"stmt={stmt!r}"


def test_column_attributes_do_not_skip_specs():
    """Round-12 probe findings #2: COMMENT strings, CHARACTER
    SET/COLLATE, ON UPDATE CURRENT_TIMESTAMP, AUTO_INCREMENT, inline
    UNIQUE/PRIMARY KEY, and generated columns all made the whole spec
    parse to NOTHING. A STORED generated column IS in binlog row
    images, so its ADD must apply as an ordinary column."""
    cases = {
        "ALTER TABLE t ADD c INT GENERATED ALWAYS AS (a+1) STORED":
            ("c", "INT", None),
        "ALTER TABLE t ADD c VARCHAR(20) AS (concat(a, ',', b)) "
        "STORED NOT NULL": ("c", "VARCHAR(20) NOT NULL", None),
        "ALTER TABLE t ADD c INT COMMENT 'a column'": ("c", "INT", None),
        "ALTER TABLE t ADD c INT CHARACTER SET utf8mb4 "
        "COLLATE utf8mb4_bin": ("c", "INT", None),
        "ALTER TABLE t ADD c TIMESTAMP DEFAULT CURRENT_TIMESTAMP "
        "ON UPDATE CURRENT_TIMESTAMP":
            ("c", "TIMESTAMP", "CURRENT_TIMESTAMP"),
        "ALTER TABLE t ADD c TIMESTAMP(3) DEFAULT CURRENT_TIMESTAMP(3)":
            ("c", "TIMESTAMP(3)", "CURRENT_TIMESTAMP"),
        "ALTER TABLE t ADD c INT AUTO_INCREMENT": ("c", "INT", None),
        # the scrubber is quote-aware: an 'AS (' inside a DEFAULT is
        # literal text, not a generated-column clause
        "ALTER TABLE t ADD c VARCHAR(5) DEFAULT 'AS (x)'":
            ("c", "VARCHAR(5)", "AS (x)"),
    }
    for stmt, (name, ts, default) in cases.items():
        [e] = parse_debezium_ddl(stmt, TID)
        assert (e.name, e.type_string, e.default) == (name, ts, default), \
            stmt
    # constraint-only ADDs still contribute nothing
    assert parse_debezium_ddl("ALTER TABLE t ADD PRIMARY KEY (k)",
                              TID) == []
    assert parse_debezium_ddl("ALTER TABLE t ADD INDEX idx (k)",
                              TID) == []
    # attribute on one spec never hides its multi-spec siblings
    got = parse_debezium_ddl(
        "ALTER TABLE t ADD c INT COMMENT 'has, comma', DROP d", TID)
    assert [type(e).__name__ for e in got] == ["AddColumnEvent",
                                               "DropColumnEvent"]


def test_quoted_keyword_identifiers_survive_scrub():
    """Review-wave fix: a backtick/double-quoted identifier that IS an
    attribute keyword (`unique`, `comment`) must stay a column name,
    and a '#' inside backticks must not truncate the statement."""
    [e] = parse_debezium_ddl("ALTER TABLE t ADD `unique` INT", TID)
    assert e.name == "unique"
    [e] = parse_debezium_ddl("ALTER TABLE t DROP `comment`", TID)
    assert e.name == "comment"
    got = parse_debezium_ddl("ALTER TABLE t ADD `col#1` INT, DROP b",
                             TID)
    assert [type(e).__name__ for e in got] == ["DropColumnEvent"]
