"""Incremental view maintenance: additive rollup deltas with retractions.

The classic IVM discipline for distributive aggregates (COUNT/SUM, and
AVG = SUM/COUNT): every changelog event contributes a SIGNED partial —
inserts and update-after images add (+1), deletes and update-before
images subtract (-1) — so a maintained rollup converges to exactly the
aggregate of the net table state without ever rescanning history. This is
what keeps a continuous hour-grain rollup over a 100 TB/day changelog
feasible: each micro-batch touches only its own partials plus the
affected rollup groups.

The reference has no aggregation at all (SURVEY §2.6); this is the
Spark-native materialized-rollup capability a CDC engine feeds.
Reference tie-in: the signed-image convention is exactly the
+I/+U/-U/-D op algebra of DataChangeEvent (OperationType.java:26-31).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..events import OP_COLUMN, OP_DELETE, OP_INSERT, OP_UPDATE_AFTER, \
    OP_UPDATE_BEFORE


def sign_expr() -> Column:
    """+1 for images entering the table, -1 for images leaving it."""
    return (F.when(F.col(OP_COLUMN).isin(OP_INSERT, OP_UPDATE_AFTER), 1)
            .when(F.col(OP_COLUMN).isin(OP_DELETE, OP_UPDATE_BEFORE), -1)
            .otherwise(0))


def rollup_delta(changelog: DataFrame, group_cols: list[str],
                 value_col: str) -> DataFrame:
    """One micro-batch's signed partial aggregate per group:
    (group..., d_n, d_total). Map-side combine collapses the batch before
    its single shuffle on the group key."""
    s = sign_expr()
    return (changelog.groupBy(*group_cols)
            .agg(F.sum(s).cast("long").alias("d_n"),
                 F.sum(s * F.col(value_col)).alias("d_total")))


def merge_rollup(state: DataFrame | None, delta: DataFrame,
                 group_cols: list[str]) -> DataFrame:
    """Fold a delta into the maintained rollup; groups whose net count
    drops to zero vanish (their history netted out). Both sides are
    already at group grain, so the merge shuffles rollup-sized data —
    never the fact stream."""
    if state is None:
        merged = delta
    else:
        merged = state.unionByName(delta)
    return (merged.groupBy(*group_cols)
            .agg(F.sum("d_n").cast("long").alias("d_n"),
                 F.sum("d_total").alias("d_total"))
            .where(F.col("d_n") != 0))


def rollup_view(state: DataFrame) -> DataFrame:
    """Read the maintained state as the user-facing rollup
    (n, total, avg)."""
    return state.select(
        *[c for c in state.columns if c not in ("d_n", "d_total")],
        F.col("d_n").alias("n"), F.col("d_total").alias("total"),
        (F.col("d_total") / F.col("d_n")).alias("avg_value"))


# ---------------------------------------------------------------------------
# non-distributive aggregates: COUNT(DISTINCT) / MIN / MAX maintenance
# ---------------------------------------------------------------------------

def multiset_delta(changelog: DataFrame, group_cols: list[str],
                   value_col: str) -> DataFrame:
    """One micro-batch's signed MULTIPLICITY delta per (group, value).

    COUNT(DISTINCT), MIN and MAX are not distributive — a delete can
    only be applied if you know whether other rows still carry the same
    value (or a smaller/larger one). The classic IVM answer is a
    two-level state: maintain the multiset of values per group as
    (group, value, multiplicity); every non-distributive aggregate
    becomes a DISTRIBUTIVE view over it. State size is the number of
    distinct (group, value) pairs — the standard space trade, and the
    per-batch cost is one shuffle at (group, value) grain with map-side
    combine, never a history rescan."""
    s = sign_expr()
    return (changelog.groupBy(*group_cols, value_col)
            .agg(F.sum(s).cast("long").alias("d_mult")))


def merge_multiset(state: DataFrame | None, delta: DataFrame,
                   group_cols: list[str], value_col: str) -> DataFrame:
    """Fold a multiplicity delta into the maintained multiset; values
    whose net multiplicity reaches zero vanish."""
    merged = delta if state is None else state.unionByName(delta)
    return (merged.groupBy(*group_cols, value_col)
            .agg(F.sum("d_mult").cast("long").alias("d_mult"))
            .where(F.col("d_mult") != 0))


def multiset_view(state: DataFrame, group_cols: list[str],
                  value_col: str) -> DataFrame:
    """User-facing (n_distinct, min_value, max_value) per group — a
    plain distributive aggregate over the multiset state (rollup-sized
    input, one small shuffle)."""
    present = state.where(F.col("d_mult") > 0)
    return (present.groupBy(*group_cols)
            .agg(F.count("*").cast("long").alias("n_distinct"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value")))


def rewrite_aggregate(state: DataFrame, rollup_group_cols: list[str],
                      query_group_cols: list[str]) -> DataFrame:
    """Materialized-view SUBSUMPTION rewrite: answer
    ``SELECT g', COUNT(*), SUM(v), AVG(v) GROUP BY g'`` from the
    maintained rollup whenever the query grain is a subset of the
    rollup grain — COUNT/SUM are distributive, so re-aggregating the
    rollup-sized state gives the exact base-table answer without
    touching the fact table (the classic MV rewrite, here over the
    IVM-maintained state: the query costs O(|rollup|) regardless of
    fact volume). Raises when the grains don't subsume — the caller
    must fall back to the base scan."""
    missing = set(query_group_cols) - set(rollup_group_cols)
    if missing:
        raise ValueError(
            f"query groups {sorted(missing)} not in rollup grain "
            f"{rollup_group_cols}: rewrite unsound, scan the base")
    return (state.groupBy(*query_group_cols)
            .agg(F.sum("d_n").cast("long").alias("n"),
                 F.sum("d_total").alias("total"))
            .withColumn("avg_value", F.col("total") / F.col("n")))
