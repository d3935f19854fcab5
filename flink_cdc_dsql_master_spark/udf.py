"""User-defined function registry.

Reference counterparts:
- ``common/udf/UserDefinedFunction.java`` — interface ``eval(...)``,
  ``getReturnType()``, ``open()``/``close()`` lifecycle.
- ``runtime/.../transform/UserDefinedFunctionDescriptor.java:40-112`` —
  name + classpath resolution (also accepts Flink ScalarFunction with
  reduced features :85-107).
- YAML surface: ``pipeline.user-defined-function`` entries with
  ``name`` + ``classpath`` (docs transform.md:360-404).

Spark design: a UDF is any Python callable (or a UserDefinedFunction
subclass with the reference lifecycle) registered under its YAML name via
``spark.udf.register`` — after which the expression rewriter's unknown-
function passthrough (exprs.py `_render_func` tail) makes it callable in
projection/filter strings exactly like the reference. Executors initialize
state lazily (module import time), mirroring ``open()``.

Scale note: plain Python UDFs are the row-at-a-time slow path — for hot
columns implement ``as_pandas=True`` (Arrow-batched) just like the model
functions. The registry supports both.
"""

from __future__ import annotations

import importlib

from pyspark.sql import SparkSession


class UserDefinedFunction:
    """Reference-shaped UDF base: override eval(); optional lifecycle."""

    #: Spark SQL type string for the return value (getReturnType parity)
    return_type: str = "string"

    def open(self) -> None:  # lifecycle parity (called once per executor use)
        pass

    def close(self) -> None:
        pass

    def eval(self, *args):  # pragma: no cover - abstract
        raise NotImplementedError


def _resolve(classpath: str):
    """'pkg.module:attr' or 'pkg.module.attr' → object."""
    if ":" in classpath:
        mod, _, attr = classpath.partition(":")
    else:
        mod, _, attr = classpath.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


def register_udf(spark: SparkSession, name: str, fn,
                 return_type: str | None = None,
                 as_pandas: bool = False) -> None:
    """Register a callable / UserDefinedFunction subclass under `name`."""
    if isinstance(fn, type) and issubclass(fn, UserDefinedFunction):
        inst = fn()
        inst.open()
        return_type = return_type or inst.return_type
        fn = inst.eval
    rt = return_type or "string"
    if as_pandas:
        from pyspark.sql.functions import pandas_udf

        spark.udf.register(name, pandas_udf(fn, rt))
    else:
        spark.udf.register(name, fn, rt)


def register_udfs(spark: SparkSession, udf_defs) -> None:
    """Register every YAML ``user-defined-function`` entry
    (pipeline.UdfDef name/classpath)."""
    for d in udf_defs:
        register_udf(spark, d.name, _resolve(d.classpath))
