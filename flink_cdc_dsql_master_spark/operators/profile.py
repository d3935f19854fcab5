"""Dataset profiling: per-column statistics in one scan.

The ingestion-time health check of a data platform: count / null count /
distinct cardinality / min / max for a column set, computed as a SINGLE
aggregate pass (every statistic folds into the same partial-aggregated
reduction — one job, one scan, one 1-row result unpivoted driver-free
into profile rows).

Scale: exact COUNT(DISTINCT) over many columns expands rows per distinct
aggregate; ``approx=True`` swaps in approx_count_distinct (mergeable
HyperLogLog partials — no expand, rsd ~2%), which is the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str],
                    approx: bool = False) -> DataFrame:
    """Profile ``cols``: one row per column with
    (col, n, n_null, n_distinct, min_v, max_v); min/max stringified so
    heterogeneous column types stack into one frame."""
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (F.approx_count_distinct if approx
                else F.countDistinct)
    aggs = []
    for c in cols:
        aggs.extend([
            F.count("*").alias(f"__n_{c}"),
            (F.count("*") - F.count(c)).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ])
    one = df.agg(*aggs)
    # unpivot via ONE explode-of-structs projection over the 1-row
    # aggregate — a union of per-column selects would re-plan (and
    # re-scan) the aggregate once per column
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"__n_{c}").cast("long").alias("n"),
            F.col(f"__null_{c}").cast("long").alias("n_null"),
            F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_v"),
            F.col(f"__max_{c}").alias("max_v"))
        for c in cols
    ]
    return (one.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))


def profile_distinct_kmv(df: DataFrame, cols: list[str],
                         k: int = 256, salt: str = "pf") -> DataFrame:
    """Per-column distinct-cardinality estimates via the KMV sketch
    (operators/sketches.py) — the ANALYZE TABLE statistics pass with
    three properties approx_count_distinct's HLL lacks: the estimate is
    md5-DETERMINISTIC (same answer on any engine → oracle-checkable and
    stable run-over-run for plan-regression diffing), EXACT below k,
    and the per-column partials merge losslessly across table shards.

    One scan: columns stack into (col, value) rows via an
    explode-of-structs projection; the distinct pre-collapse
    partial-aggregates map-side, so the shuffle carries one row per
    (column, distinct value). Returns (col, n_kept, distinct_est)."""
    if not cols:
        raise ValueError("no columns to profile")
    from .sketches import kmv_distinct

    stacked = (df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("s"))
        .select("s.*")
        .where(F.col("v").isNotNull()))
    return kmv_distinct(stacked, "v", ["col"], k=k, salt=salt)
