"""YAML pipeline front-end: YAML → PipelineDef.

Reference counterparts:
- ``CliFrontend.java:66`` / ``CliExecutor.run`` — entry.
- ``YamlPipelineDefinitionParser.parse`` (:106-119) — Jackson YAML →
  PipelineDef(SourceDef, SinkDef, [RouteDef], [TransformDef], [UdfDef],
  [ModelDef], Configuration) (``flink-cdc-composer/.../definition/``).
- Shape example: ``/root/reference/mysql-to-dsql.yaml``.

The dataclasses carry the exact YAML surface; ``compose.py`` turns a
PipelineDef into Spark execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .route import RouteRule
from .transform import TransformRule


@dataclass(frozen=True)
class SourceDef:
    type: str
    config: dict = field(default_factory=dict)

    @property
    def tables(self) -> str | None:
        return self.config.get("tables")


@dataclass(frozen=True)
class SinkDef:
    type: str
    config: dict = field(default_factory=dict)


@dataclass(frozen=True)
class UdfDef:
    name: str
    classpath: str  # dotted python path "pkg.module:callable"


@dataclass(frozen=True)
class ModelDef:
    name: str
    model: str
    config: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineDef:
    source: SourceDef
    sink: SinkDef
    routes: tuple[RouteRule, ...] = ()
    transforms: tuple[TransformRule, ...] = ()
    udfs: tuple[UdfDef, ...] = ()
    models: tuple[ModelDef, ...] = ()
    config: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return self.config.get("name", "pipeline")

    @property
    def parallelism(self) -> int:
        return int(self.config.get("parallelism", 1))

    @property
    def schema_change_behavior(self) -> str:
        # pipeline.schema.change.behavior (SchemaChangeBehavior.java:27-33)
        return str(self.config.get("schema.change.behavior", "LENIENT")).upper()


def parse_pipeline_yaml(text: str) -> PipelineDef:
    """Parse the reference's YAML pipeline shape
    (YamlPipelineDefinitionParser.java:106-119 parity)."""
    import yaml

    d = yaml.safe_load(text) or {}
    if "source" not in d or "sink" not in d:
        raise ValueError("pipeline YAML needs 'source' and 'sink' sections")

    src = dict(d["source"])
    source = SourceDef(type=src.pop("type", "values"), config=src)
    snk = dict(d["sink"])
    sink = SinkDef(type=snk.pop("type", "values"), config=snk)

    routes = tuple(
        RouteRule(
            source_table=r["source-table"],
            sink_table=r["sink-table"],
            replace_symbol=r.get("replace-symbol"),
        )
        for r in d.get("route", []) or []
    )
    transforms = tuple(
        TransformRule(
            source_table=t["source-table"],
            projection=t.get("projection"),
            filter=t.get("filter"),
            primary_keys=tuple(_split_csv(t.get("primary-keys"))),
            partition_keys=tuple(_split_csv(t.get("partition-keys"))),
            table_options=tuple(sorted(
                _parse_options(t.get("table-options")).items())),
            converter_after_transform=t.get("converter-after-transform"),
        )
        for t in d.get("transform", []) or []
    )
    pipe_cfg = dict(d.get("pipeline", {}) or {})
    udfs = tuple(
        UdfDef(u["name"], u["classpath"])
        for u in pipe_cfg.pop("user-defined-function", []) or []
    )
    models = tuple(
        ModelDef(m["model-name"], m.get("class-name", m.get("model", "")),
                 {k: v for k, v in m.items()
                  if k not in ("model-name", "class-name", "model")})
        for m in pipe_cfg.pop("model", []) or []
    )
    # fold checkpoint / restart-strategy blocks into config namespaced keys
    for sect in ("checkpoint", "restart-strategy"):
        for k, v in (d.get(sect, {}) or {}).items():
            pipe_cfg[f"{sect}.{k}"] = v
    return PipelineDef(source, sink, routes, transforms, udfs, models, pipe_cfg)


def load_pipeline(path: str) -> PipelineDef:
    with open(path, encoding="utf-8") as f:
        return parse_pipeline_yaml(f.read())


def _split_csv(v) -> list[str]:
    if not v:
        return []
    if isinstance(v, list):
        return [str(x).strip() for x in v]
    return [p.strip() for p in str(v).split(",") if p.strip()]


def _parse_options(v) -> dict:
    if not v:
        return {}
    if isinstance(v, dict):
        return {str(k): str(x) for k, x in v.items()}
    out = {}
    for part in str(v).split(","):
        if "=" in part:
            k, _, val = part.partition("=")
            out[k.strip()] = val.strip()
    return out
