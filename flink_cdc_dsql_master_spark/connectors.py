"""MySQL / Postgres CDC pipeline-source adapters.

Reference counterparts:
- ``flink-cdc-pipeline-connector-mysql/.../source/MySqlDataSource.java`` and
  ``MySqlDataSourceOptions.java`` (startup modes :123, chunk size :89,
  fetch size :96, chunk-key column :218, distribution-factor bounds
  :192-217, connect retries / pool in mysql-to-dsql.yaml:12-15).
- ``flink-cdc-pipeline-connector-postgres/.../source/PostgresDataSource.java``
  (:40,109 — logical replication slot, pgoutput plugin).

Spark design (SURVEY §2.1): a CDC source is two cooperating plans —
1. **snapshot**: parallel chunked JDBC read (sources.chunked_jdbc_read,
   reusing the reference's distribution-factor chunking decision);
2. **stream**: change-log records (Debezium JSON from Kafka, or any
   offset-carrying feed) decoded by sources.decode_debezium_json, taken
   above the snapshot high-watermark (sources.SnapshotStreamHandoff).
No live database exists in this sandbox, so connection-using methods accept
a `reader` callable for tests; option parsing/validation, table-pattern
resolution and chunk planning — the connector's actual logic — are real.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .schema import Selectors, TableId

STARTUP_MODES = ("initial", "earliest-offset", "latest-offset",
                 "specific-offset", "timestamp", "snapshot")

# defaults straight from MySqlDataSourceOptions.java
DEFAULTS = {
    "port": 3306,
    "scan.startup.mode": "initial",
    "scan.incremental.snapshot.chunk.size": 8096,
    "scan.snapshot.fetch.size": 1024,
    "chunk-key.even-distribution.factor.upper-bound": 1000.0,
    "chunk-key.even-distribution.factor.lower-bound": 0.05,
    "connect.max-retries": 3,
    "connection.pool.size": 20,
    "server-time-zone": "UTC",
}

_PG_DEFAULTS = {
    "port": 5432,
    "decoding.plugin.name": "pgoutput",
    "slot.name": "flink",
}


class ConfigError(ValueError):
    pass


@dataclass
class JdbcSourceConfig:
    """Validated common config for a CDC pipeline source."""

    dialect: str  # 'mysql' | 'postgres'
    hostname: str
    port: int
    username: str | None
    password: str | None
    tables: str
    options: dict = field(default_factory=dict)

    @property
    def startup_mode(self) -> str:
        return str(self.options.get("scan.startup.mode",
                                    DEFAULTS["scan.startup.mode"]))

    @property
    def chunk_size(self) -> int:
        return int(self.options.get(
            "scan.incremental.snapshot.chunk.size",
            DEFAULTS["scan.incremental.snapshot.chunk.size"]))

    @property
    def chunk_key_column(self) -> str | None:
        return self.options.get("scan.incremental.snapshot.chunk.key-column")

    def jdbc_url(self, database: str) -> str:
        if self.dialect == "mysql":
            return (f"jdbc:mysql://{self.hostname}:{self.port}/{database}"
                    f"?serverTimezone="
                    f"{self.options.get('server-time-zone', 'UTC')}")
        return f"jdbc:postgresql://{self.hostname}:{self.port}/{database}"

    def selectors(self) -> Selectors:
        return Selectors(self.tables)

    def match_tables(self, available: list[str]) -> list[TableId]:
        """Resolve the `tables` pattern against discovered table names."""
        sel = self.selectors()
        out = []
        for t in available:
            tid = TableId.parse(t)
            if sel.matches(tid):
                out.append(tid)
        return out


def _parse_common(dialect: str, config: dict, defaults: dict) -> JdbcSourceConfig:
    cfg = dict(config)
    missing = [k for k in ("hostname", "tables") if not cfg.get(k)]
    if missing:
        raise ConfigError(f"{dialect} source missing options: {missing}")
    mode = str(cfg.get("scan.startup.mode", DEFAULTS["scan.startup.mode"]))
    if mode not in STARTUP_MODES:
        raise ConfigError(
            f"invalid scan.startup.mode {mode!r}; one of {STARTUP_MODES}")
    if mode == "specific-offset" and not (
            cfg.get("scan.startup.specific-offset.file")
            or cfg.get("scan.startup.specific-offset.gtid-set")
            or cfg.get("scan.startup.specific-offset.lsn")):
        raise ConfigError("specific-offset mode needs an offset option")
    if mode == "timestamp" and not cfg.get("scan.startup.timestamp-millis"):
        raise ConfigError("timestamp mode needs scan.startup.timestamp-millis")
    return JdbcSourceConfig(
        dialect=dialect,
        hostname=cfg.pop("hostname"),
        port=int(cfg.pop("port", defaults["port"])),
        username=cfg.pop("username", None),
        password=cfg.pop("password", None),
        tables=cfg.pop("tables"),
        options=cfg,
    )


def parse_mysql_source(config: dict) -> JdbcSourceConfig:
    """MySqlDataSourceOptions surface (server-id required for binlog)."""
    cfg = _parse_common("mysql", config, DEFAULTS)
    mode = cfg.startup_mode
    if mode != "snapshot" and not cfg.options.get("server-id"):
        raise ConfigError("mysql source needs server-id for binlog reading")
    return cfg


def parse_postgres_source(config: dict) -> JdbcSourceConfig:
    """PostgresDataSource surface (slot name / decoding plugin)."""
    merged = {**_PG_DEFAULTS, **config}
    cfg = _parse_common("postgres", merged, _PG_DEFAULTS)
    plugin = cfg.options.get("decoding.plugin.name", "pgoutput")
    if plugin not in ("pgoutput", "decoderbufs", "wal2json"):
        raise ConfigError(f"unknown decoding plugin {plugin!r}")
    return cfg


@dataclass
class SnapshotPlan:
    """Per-table chunked-read plan (what the reference's split assigner
    computes): table id, key column, chunk predicates."""

    table: TableId
    key_column: str
    predicates: list[str]


def plan_snapshot(cfg: JdbcSourceConfig, table: TableId, key_column: str,
                  min_v: int, max_v: int, row_count: int) -> SnapshotPlan:
    """Compute the snapshot chunk plan using the reference's
    distribution-factor decision (JdbcSourceChunkSplitter.java:109-349)."""
    from .sources import (
        EVEN_DISTRIBUTION_FACTOR_LOWER,
        EVEN_DISTRIBUTION_FACTOR_UPPER,
        distribution_factor,
        split_evenly_sized_chunks,
    )

    lower = float(cfg.options.get(
        "chunk-key.even-distribution.factor.lower-bound",
        EVEN_DISTRIBUTION_FACTOR_LOWER))
    upper = float(cfg.options.get(
        "chunk-key.even-distribution.factor.upper-bound",
        EVEN_DISTRIBUTION_FACTOR_UPPER))
    factor = distribution_factor(min_v, max_v, row_count)
    splits = split_evenly_sized_chunks(min_v, max_v, row_count,
                                       cfg.chunk_size)
    # uneven path marker: callers use approxQuantile bounds instead
    if not (lower <= factor <= upper):
        splits = []
    return SnapshotPlan(table, key_column,
                        [s.predicate(key_column) for s in splits])
