"""MySQL/Postgres source adapter tests (option surface + chunk planning)."""

import pytest

from flink_cdc_dsql_master_spark.connectors import (
    ConfigError,
    parse_mysql_source,
    parse_postgres_source,
    plan_snapshot,
)
from flink_cdc_dsql_master_spark.schema import TableId


MYSQL_MIN = {"hostname": "h", "tables": "db.\\.*", "server-id": "5400"}


def test_mysql_defaults_and_url():
    cfg = parse_mysql_source(dict(MYSQL_MIN))
    assert cfg.port == 3306
    assert cfg.startup_mode == "initial"
    assert cfg.chunk_size == 8096
    assert cfg.jdbc_url("db").startswith("jdbc:mysql://h:3306/db")


def test_mysql_missing_options():
    with pytest.raises(ConfigError):
        parse_mysql_source({"tables": "db.t"})
    with pytest.raises(ConfigError):
        parse_mysql_source({"hostname": "h", "tables": "db.t"})  # no server-id


def test_startup_mode_validation():
    with pytest.raises(ConfigError):
        parse_mysql_source({**MYSQL_MIN, "scan.startup.mode": "bogus"})
    with pytest.raises(ConfigError):
        parse_mysql_source({**MYSQL_MIN, "scan.startup.mode": "timestamp"})
    cfg = parse_mysql_source({**MYSQL_MIN, "scan.startup.mode": "timestamp",
                              "scan.startup.timestamp-millis": "1000"})
    assert cfg.startup_mode == "timestamp"


def test_table_pattern_resolution():
    cfg = parse_mysql_source(dict(MYSQL_MIN))
    got = cfg.match_tables(["db.users", "db.orders", "other.users"])
    assert got == [TableId.parse("db.users"), TableId.parse("db.orders")]


def test_postgres_defaults():
    cfg = parse_postgres_source({"hostname": "h", "tables": "s.t"})
    assert cfg.port == 5432
    assert cfg.options["decoding.plugin.name"] == "pgoutput"
    assert cfg.jdbc_url("db") == "jdbc:postgresql://h:5432/db"
    with pytest.raises(ConfigError):
        parse_postgres_source({"hostname": "h", "tables": "s.t",
                               "decoding.plugin.name": "nope"})


def test_snapshot_plan_even_chunks():
    cfg = parse_mysql_source(dict(MYSQL_MIN))
    plan = plan_snapshot(cfg, TableId.parse("db.t"), "id",
                         0, 99_999, 100_000)
    assert len(plan.predicates) == 13  # 100k rows / 8096 chunk size
    assert plan.predicates[0] == "id < 8096"


def test_snapshot_plan_uneven_marker():
    cfg = parse_mysql_source(dict(MYSQL_MIN))
    # sparse key space: factor far above upper bound → uneven path
    plan = plan_snapshot(cfg, TableId.parse("db.t"), "id",
                         0, 10_000_000_000, 1000)
    assert plan.predicates == []
