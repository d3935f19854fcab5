"""Routing (TableIdRouterTest.java cases) + schema evolution
(SchemaManagerTest / SchemaUtilsTest / SchemaDerivator semantics)."""

import pytest
from pyspark.sql import types as T

from flink_cdc_dsql_master_spark.events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnPosition,
    CreateTableEvent,
    DropColumnEvent,
    DropTableEvent,
    RenameColumnEvent,
    TruncateTableEvent,
)
from flink_cdc_dsql_master_spark.evolve import (
    SchemaChangeBehavior,
    SchemaEvolveError,
    SchemaEvolver,
    apply_schema_change,
)
from flink_cdc_dsql_master_spark.route import RouteRule, TableIdRouter, fan_in
from flink_cdc_dsql_master_spark.schema import Schema, TableId

T1 = TableId.parse("db.sch.t1")


# --- routing (TableIdRouter.java:76-108) ---

def test_route_identity_when_no_match():
    r = TableIdRouter([RouteRule(r"other.\.*.\.*", "sink.s.t")])
    assert r.route(T1) == [T1]


def test_route_fan_out_multiple_matches():
    r = TableIdRouter([
        RouteRule(r"db.sch.t1", "sink1.s.a"),
        RouteRule(r"db.sch.\.*", "sink2.s.b"),
    ])
    assert r.route(T1) == [TableId.parse("sink1.s.a"),
                           TableId.parse("sink2.s.b")]


def test_route_replace_symbol_templating():
    # docs/content/docs/core-concept/route.md:33-87
    r = TableIdRouter([
        RouteRule(r"db.sch.\.*", "sink_db.sink_sch.ods_<>", "<>")])
    assert r.route(T1) == [TableId.parse("sink_db.sink_sch.ods_t1")]


def test_route_fan_in_grouping():
    r = TableIdRouter([RouteRule(r"db.sch.\.*", "sink.s.all")])
    groups = r.group_sources_by_sink(
        [T1, TableId.parse("db.sch.t2")])
    assert list(groups) == [TableId.parse("sink.s.all")]
    assert len(groups[TableId.parse("sink.s.all")]) == 2


def test_fan_in_union_with_widening(spark):
    a = spark.createDataFrame([(1, 10)], "k int, v int")
    b = spark.createDataFrame([(2, 3.5)], "k int, v double")
    sa = Schema.of(a.schema, primary_keys=["k"])
    sb = Schema.of(b.schema, primary_keys=["k"])
    out, schema = fan_in([a, b], [sa, sb])
    assert isinstance(schema.struct["v"].dataType, T.DoubleType)
    vals = sorted(r["v"] for r in out.collect())
    assert vals == [3.5, 10.0]


# --- event application (SchemaUtils parity) ---

BASE = Schema.of([("id", "INT NOT NULL"), ("name", "STRING")],
                 primary_keys=["id"])


def test_add_column_positions():
    s = apply_schema_change(BASE, AddColumnEvent(T1, "age", "INT"))
    assert s.column_names == ["id", "name", "age"]
    s = apply_schema_change(BASE, AddColumnEvent(
        T1, "age", "INT", ColumnPosition.FIRST))
    assert s.column_names == ["age", "id", "name"]
    s = apply_schema_change(BASE, AddColumnEvent(
        T1, "age", "INT", ColumnPosition.AFTER, anchor="id"))
    assert s.column_names == ["id", "age", "name"]


def test_drop_rename_alter():
    s = apply_schema_change(BASE, DropColumnEvent(T1, "name"))
    assert s.column_names == ["id"]
    s = apply_schema_change(BASE, RenameColumnEvent(T1, "name", "fullname"))
    assert s.column_names == ["id", "fullname"]
    s = apply_schema_change(BASE, AlterColumnTypeEvent(T1, "id", "BIGINT"))
    assert isinstance(s.struct["id"].dataType, T.LongType)


def test_drop_table_and_truncate():
    assert apply_schema_change(BASE, DropTableEvent(T1)) is None
    assert apply_schema_change(BASE, TruncateTableEvent(T1)) == BASE


def test_rename_updates_primary_keys():
    s = apply_schema_change(BASE, RenameColumnEvent(T1, "id", "pk"))
    assert s.primary_keys == ("pk",)


# --- behaviors (SchemaDerivator.rewriteSchemaChangeEvents :185-210) ---

def _evolver(behavior):
    ev = SchemaEvolver(behavior=behavior)
    ev.on_event(CreateTableEvent(T1, BASE))
    return ev


def test_lenient_add_column_forced_nullable():
    ev = _evolver(SchemaChangeBehavior.LENIENT)
    out = ev.on_event(AddColumnEvent(T1, "age", "INT NOT NULL"))
    assert out.struct["age"].nullable is True


def test_lenient_drop_keeps_column():
    ev = _evolver(SchemaChangeBehavior.LENIENT)
    out = ev.on_event(DropColumnEvent(T1, "name"))
    assert "name" in out.column_names  # kept, stops receiving values
    # original side does drop
    assert "name" not in ev.manager.latest_original(T1).column_names


def test_lenient_rename_adds_new_keeps_old():
    ev = _evolver(SchemaChangeBehavior.LENIENT)
    out = ev.on_event(RenameColumnEvent(T1, "name", "fullname"))
    assert "name" in out.column_names and "fullname" in out.column_names


def test_ignore_behavior_freezes_evolved():
    ev = _evolver(SchemaChangeBehavior.IGNORE)
    out = ev.on_event(AddColumnEvent(T1, "age", "INT"))
    assert "age" not in out.column_names
    assert "age" in ev.manager.latest_original(T1).column_names


def test_exception_behavior_raises():
    ev = _evolver(SchemaChangeBehavior.EXCEPTION)
    with pytest.raises(SchemaEvolveError):
        ev.on_event(AddColumnEvent(T1, "age", "INT"))


def test_evolve_behavior_applies():
    ev = _evolver(SchemaChangeBehavior.EVOLVE)
    out = ev.on_event(DropColumnEvent(T1, "name"))
    assert out.column_names == ["id"]


def test_drift_detection():
    ev = _evolver(SchemaChangeBehavior.LENIENT)
    incoming = Schema.of(
        [("id", "BIGINT NOT NULL"), ("name", "STRING"), ("age", "INT")],
        primary_keys=["id"])
    events = ev.infer_drift_events(T1, incoming)
    kinds = {type(e).__name__ for e in events}
    assert kinds == {"AddColumnEvent", "AlterColumnTypeEvent"}
