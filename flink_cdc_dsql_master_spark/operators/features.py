"""Feature-engineering operators for training-data preparation.

The supervised-learning half of the curation surface: turning raw
columns into model features WITHOUT leaking the target. Deterministic
(md5-fold) end to end, so feature values are reproducible run-over-run
and oracle-checkable — the same lineage discipline as operators/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode_oof(df: DataFrame, key_col: str, cat_col: str,
                      target_col: str, n_folds: int = 5,
                      prior_weight: float = 20.0,
                      salt: str = "te") -> DataFrame:
    """Out-of-fold target encoding with prior smoothing — the standard
    leakage-safe categorical encoding: each row's feature is the target
    mean of its category computed from the OTHER folds only (a row never
    contributes to its own feature), shrunk toward the global mean by
    ``prior_weight`` pseudo-observations so rare categories don't
    memorize their few targets.

    encoding(cat, fold) = (sum_cat − sum_cat_fold
                           + prior_weight · global_mean)
                          / (cnt_cat − cnt_cat_fold + prior_weight)

    Fold assignment is md5(salt‖key) % n_folds — deterministic, so the
    exact same rows land in the same folds on any engine and the
    feature table is replayable (the property feature-store lineage
    needs). Plan shape: ONE partial-agg shuffle on (cat, fold) — the
    leave-one-fold-out sums come from subtracting the fold's own
    partial from the category total (no per-fold re-scan), the global
    mean rides as a broadcast 1-row aggregate, and the result joins
    back to rows by (cat, fold) — broadcastable whenever
    |categories|·folds is dashboard-sized.

    Returns ``df`` plus (``__fold``, ``te_<cat_col>``).
    """
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    fold = (F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.col(key_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % n_folds).alias("__fold")
    rows = df.withColumn("__fold", fold)
    per_cf = (rows.groupBy(cat_col, "__fold")
              .agg(F.sum(target_col).alias("__s"),
                   F.count(target_col).alias("__c")))
    per_cat = (per_cf.groupBy(cat_col)
               .agg(F.sum("__s").alias("__cat_s"),
                    F.sum("__c").alias("__cat_c")))
    glob = df.agg(F.avg(target_col).alias("__gm"))
    enc = (per_cf.join(per_cat, cat_col)
           .crossJoin(F.broadcast(glob))
           .select(cat_col, "__fold",
                   ((F.col("__cat_s") - F.col("__s")
                     + F.lit(prior_weight) * F.col("__gm"))
                    / (F.col("__cat_c") - F.col("__c")
                       + F.lit(prior_weight)))
                   .alias(f"te_{cat_col}")))
    return rows.join(F.broadcast(enc), [cat_col, "__fold"])
