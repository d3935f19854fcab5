"""Table catalog: named handles over the engine's table formats.

The front door a warehouse user expects: register tables once, then
read them by NAME with optional time travel, or pin them as Spark temp
views and use plain ``spark.sql``. Reference tie-in: the YAML pipeline
routes already name sink tables (``route.sink_table``); the catalog is
the read-side counterpart, resolving those names to the cow/versioned
parquet layouts the sinks write.

Ref grammar (``load``/``view``):

    orders                latest published version
    orders@v3             version time travel (versioned format)
    orders@ts:1786720000  timestamp time travel (unix seconds)

The catalog itself is a JSON-serializable dict — persist it next to the
warehouse root and every session (or engine) resolves the same names.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame

_REF = re.compile(
    r"^([A-Za-z_][\w.]*)(?:@(v\d+|ts:[\d.]+|[A-Za-z_][\w.-]*))?$")

FORMATS = ("versioned", "cow", "parquet")


class TableCatalog:
    def __init__(self) -> None:
        self._tables: dict[str, dict] = {}

    # -- registration -------------------------------------------------
    def register(self, name: str, path: str,
                 format: str = "versioned") -> None:
        if format not in FORMATS:
            raise ValueError(f"format must be one of {FORMATS}")
        self._tables[name] = {"path": path, "format": format}

    def names(self) -> list[str]:
        return sorted(self._tables)

    def entry(self, name: str) -> dict:
        if name not in self._tables:
            raise KeyError(f"unknown table {name!r}; "
                           f"registered: {self.names()}")
        return self._tables[name]

    # -- resolution ---------------------------------------------------
    def load(self, spark, ref: str) -> DataFrame:
        """Resolve a table ref (with optional @v / @ts time travel) to
        a DataFrame. Time travel requires the versioned format."""
        m = _REF.match(ref.strip())
        if not m:
            raise ValueError(f"bad table ref {ref!r}")
        name, pin = m.group(1), m.group(2)
        ent = self.entry(name)
        fmt, path = ent["format"], ent["path"]
        if pin is not None and fmt != "versioned":
            raise ValueError(
                f"{name} is format={fmt}: time travel needs 'versioned'")
        if fmt == "versioned":
            from .lakehouse import read_versioned

            if pin is None:
                return read_versioned(spark, path)
            if re.fullmatch(r"v\d+", pin):
                return read_versioned(spark, path, version=int(pin[1:]))
            if pin.startswith("ts:"):
                return read_versioned(spark, path,
                                      as_of_ts=float(pin[3:]))
            from .lakehouse import resolve_tag

            return read_versioned(spark, path,
                                  version=resolve_tag(path, pin))
        if fmt == "cow":
            from .lakehouse import read_partitioned

            return read_partitioned(spark, path)
        return spark.read.parquet(path)

    def view(self, spark, ref: str, as_name: str | None = None) -> str:
        """Pin a ref as a temp view (so plain ``spark.sql`` reads it)
        and return the view name. ``orders@v3`` defaults to view name
        ``orders_v3``."""
        vname = as_name or re.sub(r"[@:.]", "_", ref.strip())
        self.load(spark, ref).createOrReplaceTempView(vname)
        return vname

    def sql(self, spark, query: str, refs: list[str]) -> DataFrame:
        """Convenience: pin every ref as its default view name, then
        run the query."""
        for r in refs:
            self.view(spark, r)
        return spark.sql(query)

    # -- persistence --------------------------------------------------
    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._tables, f, indent=1, sort_keys=True)
        os.rename(tmp, path)

    @classmethod
    def load_from(cls, path: str) -> "TableCatalog":
        cat = cls()
        with open(path) as f:
            cat._tables = json.load(f)
        for name, ent in cat._tables.items():
            if ent.get("format") not in FORMATS:
                raise ValueError(f"corrupt catalog entry {name!r}")
        return cat
