"""As-of (temporal nearest) join — a first-class operator Spark lacks.

Semantics match pandas.merge_asof / DuckDB ASOF JOIN: for every left row,
attach the single right row with the same key whose timestamp is the
closest at-or-before (``backward``) or at-or-after (``forward``) the left
timestamp, optionally within a ``tolerance``. Left rows with no match keep
NULLs (left-outer semantics).

100 TB design: the naive formulation — join on key with a range predicate,
then window-min over the matches — explodes to O(left × right-per-key)
intermediate rows before pruning. This implementation instead UNIONS the
two sides and runs ONE window pass:

    union(left+side=1, right+side=0)
      -> window partitionBy(key) orderBy(ts, side)
      -> last(right_cols, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
      -> keep side=1 rows

Cost = one hash shuffle on the key + one sort — the same shape as a plain
shuffle join, with zero row amplification regardless of how many right
rows precede each left row. Hot keys are ordinary sort-skew, handled by
AQE; there is no cross-product term anywhere. ``forward`` is the same
pass with the sort reversed.

Right-side determinism: if several right rows share (key, ts) the matched
row would be plan-dependent, so callers must pre-deduplicate (one row per
(key, ts)) — `dedupe_right` does it with max_by (latest writer wins),
mirroring the reference's LWW convention (PKHashDistributer semantics,
see partitioning.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def dedupe_right(right: DataFrame, by: str, on: str,
                 tie_break: str) -> DataFrame:
    """One row per (by, on): the row with the greatest `tie_break` wins
    (map-side-combinable aggregate, one shuffle)."""
    cols = list(right.columns)
    return (
        right.groupBy(by, on)
        .agg(F.max_by(F.struct(*cols), F.col(tie_break)).alias("__w"))
        .select("__w.*")
    )


def asof_join(left: DataFrame, right: DataFrame, *, left_on: str,
              right_on: str, left_by: str, right_by: str,
              direction: str = "backward",
              tolerance: Optional[Column] = None,
              right_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Left-outer as-of join. Returns every left row plus the matched
    right columns (NULL when no right row qualifies).

    tolerance: an interval/duration Column (e.g. ``F.expr("INTERVAL 7
    DAYS")``); a match farther than this from the left timestamp is
    nulled out, left row kept.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    rcols = [c for c in (right_cols or right.columns)
             if c not in (right_by, right_on)]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    lside = left.select(
        F.col(left_by).alias("__k"), F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(right.schema[right_on].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rcols],
    )
    rside = right.select(
        F.col(right_by).alias("__k"), F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        F.col(right_on).alias("__rt"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )

    # backward: ascending ts, right (side=0) sorts before left at equal ts
    # so an exactly-simultaneous right row is matchable. forward: same
    # trick on descending ts.
    order = ([F.col("__t").asc(), F.col("__side").asc()]
             if direction == "backward"
             else [F.col("__t").desc(), F.col("__side").asc()])
    w = (Window.partitionBy("__k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = ["__rt"] + [f"__r_{c}" for c in rcols]
    out = lside.unionByName(rside)
    for c in matched:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1)

    if tolerance is not None:
        gap = (F.col("__t") - F.col("__rt") if direction == "backward"
               else F.col("__rt") - F.col("__t"))
        keep = F.col("__rt").isNotNull() & (gap <= tolerance)
        for c in matched:
            out = out.withColumn(c, F.when(keep, F.col(c)))

    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c) for c in rcols],
    )


def asof_join_nearest(left: DataFrame, right: DataFrame, *,
                      on: "Sequence[tuple[str, str]]",
                      left_on: str, right_on: str,
                      tolerance_s: float,
                      left_id: str, right_id: str) -> DataFrame:
    """NEAREST as-of join: each left row matches the right row
    minimizing |right_ts - left_ts| within ``tolerance_s`` (pandas
    merge_asof direction='nearest'), ties broken backward-first then by
    ``right_id`` — a third direction beside backward/forward, the shape
    sensor-fusion alignment wants. Left-outer: unmatched lefts keep
    NULL right columns.

    Scale plan: candidates come from the BUCKETED interval join
    (joins.interval_join: (key, time-bucket) equi-join, O(2|L|+|R|)
    shuffle, never a per-key cross product); the argmin is one window
    over candidates partitioned by the left id. Tolerance bounds
    candidate fan-out exactly like the interval join it reuses."""
    from .joins import interval_join

    cand = interval_join(left, right, on, left_on, right_on,
                         -tolerance_s, tolerance_s)
    # parquet timestamps arrive as TIMESTAMP_NTZ; the session TZ is
    # pinned UTC so the cast is an identity relabel
    diff_us = (F.unix_micros(F.col(right_on).cast("timestamp"))
               - F.unix_micros(F.col(left_on).cast("timestamp")))
    w = Window.partitionBy(left_id).orderBy(
        F.abs(diff_us).asc(),
        F.when(diff_us <= 0, 0).otherwise(1).asc(),   # backward first
        F.col(right_id).asc())
    best = (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
    rcols = [c for c in right.columns]
    return left.join(best.select(left_id, *rcols), left_id, "left")
