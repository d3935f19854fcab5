"""Property-fuzz of the in-band fan-in epoch sequencing (VERDICT r13
next-round #4, widened per VERDICT r14 #4): random interleavings of
DDL boundaries + INSERT/UPDATE/DELETE row events across 3 members,
both wire dialects, against a sequential single-threaded reference
applier.

The subsystem under test is the globally-sequenced flush-before-apply
in _multitable_fanin_inband_binlog_writer / _pgoutput_writer
(compose.py): ONE position/LSN-ordered boundary sequence over ALL
members, every member flushed per epoch under its schema current AT
those positions, boundary events applied only after the flush. The
reference model is trivial: walk the log once, in order, applying DDL
to per-member schemas, upserting inserts/updates (after-image) and
deleting deletes under the schema current at their position — whatever
interleaving hypothesis generates, the sink must equal that. Keys
OVERLAP across members and across op kinds on purpose: last-write-wins
must resolve by GLOBAL log order (__seq = pos·2 / LSN·2 comparable
across members), which is exactly where a sequencing counterexample
would hide — e.g. member a deleting a key member b re-inserts one
event later, or an update racing a DDL boundary on another member.
"""

import os
import tempfile

import duckdb
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    encode_delete_rows,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_update_rows,
    encode_write_rows,
    encode_xid,
)
from flink_cdc_dsql_master_spark.compose import compose_stream
from flink_cdc_dsql_master_spark.pipeline import (PipelineDef, SinkDef,
                                                  SourceDef)
from flink_cdc_dsql_master_spark.route import RouteRule
from flink_cdc_dsql_master_spark.sinks import (JdbcUpsertSink,
                                               schema_change_ddl)

MEMBERS = ("a", "b", "c")
MAX_DDL_PER_MEMBER = 2

# an op is (kind, member_index, key_slot); "ddl" past the per-member
# cap degrades to an insert so interleavings stay dense; updates and
# deletes target the same 4 key slots as inserts so cross-member,
# cross-kind collisions are the common case, not the rare one
OPS = st.lists(
    st.tuples(st.sampled_from(["ins", "ins", "upd", "del", "ddl"]),
              st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=3)),
    min_size=3, max_size=14)


def _duck_writer(db):
    def writer(tid, df, schema):
        sink = JdbcUpsertSink(lambda p=db: duckdb.connect(p), tid.table,
                              schema, parallel=False, dialect="duckdb")
        sink.ensure_table()
        sink.write_batch(df)
    return writer


def _duck_ddl(db):
    def on_ddl(tid, events, schema):
        con = duckdb.connect(db)
        try:
            for sql in schema_change_ddl(tid.table, events, schema):
                con.execute(sql)
            con.commit()
        finally:
            con.close()
    return on_ddl


def _reference_apply(ops):
    """Sequential single-threaded applier: per-member schemas evolve in
    log order; inserts AND updates upsert the after-image under the
    member's CURRENT column set (CDC +I/+U are both upserts into a PK
    sink); deletes remove the key. Returns (events, all added cols in
    log order, final key->{col: val} state)."""
    colnames = {m: ["k", "name"] for m in MEMBERS}
    ddl_count = {m: 0 for m in MEMBERS}
    added = []
    state: dict[int, dict] = {}
    seq = []
    t = 0
    for kind, mi, slot in ops:
        m = MEMBERS[mi]
        if kind == "ddl" and ddl_count[m] < MAX_DDL_PER_MEMBER:
            ddl_count[m] += 1
            col = f"{m}w{ddl_count[m]}"
            colnames[m].append(col)
            added.append(col)
            seq.append(("ddl", m, col))
        elif kind == "del":
            t += 1
            state.pop(slot, None)
            # the wire before-image carries the member's current arity;
            # only the PK matters to the applier
            vals = [slot, f"{m}{slot}d{t}"] + [
                0.0 for _ in range(len(colnames[m]) - 2)]
            seq.append(("del", m, vals))
        else:  # ins, upd, or ddl past the cap
            t += 1
            vals = [slot, f"{m}{slot}t{t}"] + [
                float(t * 10 + j)
                for j in range(len(colnames[m]) - 2)]
            state[slot] = dict(zip(colnames[m], vals))
            seq.append(("row", m, kind == "upd", vals))
    return seq, added, state


def _expected_rows(added, state):
    cols = ["k", "name"] + added
    return cols, sorted(
        tuple(state[k].get(c) for c in cols) for k in state)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(OPS)
def test_binlog_inband_fanin_matches_sequential_reference(spark, ops):
    seq, added, state = _reference_apply(ops)
    assume(state)  # at least one row lands, so the sink table exists

    base = tempfile.mkdtemp(prefix="fuzz_binlog_fanin_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    base_cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 30)]
    cols_of = {m: list(base_cols) for m in MEMBERS}
    parts = [MAGIC + encode_fde(120)]
    pos = 200
    for ev in seq:
        if ev[0] == "ddl":
            _, m, col = ev
            parts.append(encode_query(
                "db", f"ALTER TABLE sh_{m} ADD COLUMN {col} DOUBLE",
                pos))
            pos += 100
            cols_of[m].append((MYSQL_TYPE_DOUBLE, None))
            continue
        m = ev[1]
        tno = MEMBERS.index(m) + 1
        parts.append(encode_table_map(tno, "db", f"sh_{m}",
                                      cols_of[m], pos))
        pos += 50
        if ev[0] == "del":
            parts.append(encode_delete_rows(tno, cols_of[m], [ev[2]],
                                            pos))
        else:
            _, _, is_update, vals = ev
            if is_update:
                # synthetic before-image: same key, stale values
                before = [vals[0], "old"] + [0.0] * (len(vals) - 2)
                parts.append(encode_update_rows(
                    tno, cols_of[m], [(before, vals)], pos))
            else:
                parts.append(encode_write_rows(tno, cols_of[m], [vals],
                                               pos))
        pos += 50
    parts.append(encode_xid(9, pos))
    with open(f"{src}/seg1.binlog", "wb") as f:
        f.write(b"".join(parts))

    pipe = PipelineDef(
        source=SourceDef("file-binlog", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": f"db.s.sh_{m}", "mysql-table": f"sh_{m}",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]} for m in MEMBERS]}),
        sink=SinkDef("duckdb"),
        routes=tuple(RouteRule(f"db.s.sh_{m}", "out.db.fuzz")
                     for m in MEMBERS),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=_duck_ddl(db))
    q.awaitTermination(300)

    cols, want = _expected_rows(added, state)
    con = duckdb.connect(db)
    got = sorted(tuple(r) for r in con.execute(
        f"SELECT {', '.join(cols)} FROM fuzz").fetchall())
    con.close()
    assert got == want, (ops, got, want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(OPS)
def test_pgoutput_inband_fanin_matches_sequential_reference(spark, ops):
    from flink_cdc_dsql_master_spark.pgoutput import (encode_delete,
                                                      encode_frames,
                                                      encode_insert,
                                                      encode_relation,
                                                      encode_update)

    seq, added, state = _reference_apply(ops)
    assume(state)

    base = tempfile.mkdtemp(prefix="fuzz_pg_fanin_")
    src, ckpt = os.path.join(base, "seg"), os.path.join(base, "ckpt")
    db = os.path.join(base, "sink.duckdb")
    os.mkdir(src)

    base_cols = [("k", True, 20), ("name", False, 25)]
    cols_of = {m: list(base_cols) for m in MEMBERS}
    rel_of = {m: 7 + i for i, m in enumerate(MEMBERS)}
    msgs = []
    lsn = 100
    for m in MEMBERS:  # initial Relations
        msgs.append((lsn, encode_relation(rel_of[m], "public",
                                          f"sh_{m}", cols_of[m])))
        lsn += 10

    def as_text(vals):
        return [str(vals[0]), vals[1]] + [repr(v) for v in vals[2:]]

    for ev in seq:
        if ev[0] == "ddl":
            _, m, col = ev
            cols_of[m].append((col, False, 701))
            msgs.append((lsn, encode_relation(rel_of[m], "public",
                                              f"sh_{m}", cols_of[m])))
        elif ev[0] == "del":
            _, m, vals = ev
            msgs.append((lsn, encode_delete(rel_of[m], as_text(vals),
                                            old_kind="K")))
        else:
            _, m, is_update, vals = ev
            if is_update:
                before = [vals[0], "old"] + [0.0] * (len(vals) - 2)
                msgs.append((lsn, encode_update(rel_of[m],
                                                as_text(vals),
                                                as_text(before))))
            else:
                msgs.append((lsn, encode_insert(rel_of[m],
                                                as_text(vals))))
        lsn += 10
    with open(f"{src}/seg1.pgout", "wb") as f:
        f.write(encode_frames(msgs))

    pipe = PipelineDef(
        source=SourceDef("file-pgoutput", {
            "path": src, "in-band-ddl": True,
            "table-list": [
                {"table": f"db.public.sh_{m}", "pg-table": f"sh_{m}",
                 "schema": "k bigint, name string",
                 "primary-keys": ["k"]} for m in MEMBERS]}),
        sink=SinkDef("duckdb"),
        routes=tuple(RouteRule(f"db.public.sh_{m}", "out.db.pgfuzz")
                     for m in MEMBERS),
        config={"schema.change.behavior": "LENIENT"},
    )
    q = compose_stream(spark, pipe, ckpt, _duck_writer(db),
                       on_schema_change=_duck_ddl(db))
    q.awaitTermination(300)

    cols, want = _expected_rows(added, state)
    con = duckdb.connect(db)
    got = sorted(tuple(r) for r in con.execute(
        f"SELECT {', '.join(cols)} FROM pgfuzz").fetchall())
    con.close()
    assert got == want, (ops, got, want)
