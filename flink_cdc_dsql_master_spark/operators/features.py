"""Feature-engineering operators for training-data preparation.

The supervised-learning half of the curation surface: turning raw
columns into model features WITHOUT leaking the target. Deterministic
(md5-fold) end to end, so feature values are reproducible run-over-run
and oracle-checkable — the same lineage discipline as operators/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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


def pareto_frontier(df: DataFrame, x_col: str, y_col: str,
                    buckets: int = 64) -> DataFrame:
    """2-D Pareto frontier (skyline), both dimensions MINIMIZED: the
    points no other point beats on both axes at once — the classic
    "cheapest AND smallest" multi-criteria query, whose naive form is
    an O(N²) NOT EXISTS self-join.

    Distributed shape (frontier-of-frontiers: skyline(A ∪ B) ⊆
    skyline(A) ∪ skyline(B)):
    1. collapse to min-y per distinct x — a partial-aggregating
       groupBy, after which x values are unique;
    2. LOCAL frontier per equi-width x-bucket via a running-min window
       (64-way parallel, each over 1/64 of the x-range);
    3. GLOBAL running-min pass over the ≤ Σ per-bucket survivors —
       frontier points only, typically a few hundred rows at any N.
    The single-partition window runs only on stage-3's tiny input;
    every N-sized pass is parallel. A point survives iff its y is
    strictly below the running min over all smaller x (ties on x were
    collapsed in stage 1; equal-y at larger x is dominated).

    Returns the frontier as (x, y) doubles, one row per frontier
    point."""
    pairs = df.select(F.col(x_col).cast("double").alias("x"),
                      F.col(y_col).cast("double").alias("y"))
    minper = pairs.groupBy("x").agg(F.min("y").alias("y"))
    stats = minper.agg(F.min("x").alias("__lo"), F.max("x").alias("__hi"))
    b = minper.crossJoin(F.broadcast(stats))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(buckets))
    bkt = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.lit(buckets - 1),
                F.floor((F.col("x") - F.col("__lo")) / width))).cast("long")
    b = b.withColumn("__bkt", bkt)
    w1 = Window.partitionBy("__bkt").orderBy("x") \
        .rowsBetween(Window.unboundedPreceding, -1)
    loc = (b.withColumn("__cm", F.min("y").over(w1))
           .where(F.col("__cm").isNull() | (F.col("y") < F.col("__cm"))))
    w2 = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    fin = (loc.withColumn("__cm2", F.min("y").over(w2))
           .where(F.col("__cm2").isNull()
                  | (F.col("y") < F.col("__cm2"))))
    return fin.select("x", "y")


def ols_fit(df: DataFrame, y_col: str, x1_col: str, x2_col: str,
            scale: int = 4) -> DataFrame:
    """Two-feature linear regression y = b0 + b1·x1 + b2·x2 by the
    normal equations — the ONE-PASS distributed shape: the whole fit
    reduces to 10 sufficient statistics (n, Σx, Σy, Σx², Σxy, …),
    which partial-aggregate map-side, shuffle as a single 10-number
    row, and solve driver-free with Cramer's rule on the 3×3 system.
    No iteration, no gradient steps, no data pass beyond the first —
    at 100 TB the fit costs exactly one scan.

    Determinism across engines: doubles summed in different partition
    orders drift in low-order bits, so the sums are accumulated in
    DECIMAL (exact, order-independent in both Spark and DuckDB); only
    the final ~20-op Cramer solve runs in doubles, from bit-identical
    inputs. Coefficients and R² are rounded to 6.

    Returns ONE row: (n, b0, b1, b2, r2)."""
    d = df.select(
        F.col(y_col).cast(f"decimal(18,{scale})").alias("y"),
        F.col(x1_col).cast(f"decimal(18,{scale})").alias("x1"),
        F.col(x2_col).cast(f"decimal(18,{scale})").alias("x2")) \
        .where(F.col("y").isNotNull() & F.col("x1").isNotNull()
               & F.col("x2").isNotNull())
    s = d.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    c = {k: F.col(k).cast("double") for k in
         ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y",
          "syy")}
    det = (c["n"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
           - c["s1"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
           + c["s2"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"]))
    d0 = (c["sy"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
          - c["s1"] * (c["s1y"] * c["s22"] - c["s12"] * c["s2y"])
          + c["s2"] * (c["s1y"] * c["s12"] - c["s11"] * c["s2y"]))
    d1 = (c["n"] * (c["s1y"] * c["s22"] - c["s12"] * c["s2y"])
          - c["sy"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
          + c["s2"] * (c["s1"] * c["s2y"] - c["s1y"] * c["s2"]))
    d2 = (c["n"] * (c["s11"] * c["s2y"] - c["s1y"] * c["s12"])
          - c["s1"] * (c["s1"] * c["s2y"] - c["s1y"] * c["s2"])
          + c["sy"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"]))
    b0, b1, b2 = d0 / det, d1 / det, d2 / det
    sse = (c["syy"] - b0 * c["sy"] - b1 * c["s1y"] - b2 * c["s2y"])
    sst = c["syy"] - c["sy"] * c["sy"] / c["n"]
    r2 = F.lit(1.0) - sse / sst
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(b0, 6).alias("b0"), F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"), F.round(r2, 6).alias("r2"))


def logistic_fit_gd(df: DataFrame, label_col: str, x1_col: str,
                    x2_col: str, steps: int = 3, lr: float = 0.5
                    ) -> DataFrame:
    """Binary logistic regression by full-batch gradient descent — the
    canonical ITERATIVE distributed fit (contrast ols_fit's one-pass
    closed form): each step is one scan producing three mergeable
    gradient sums (partial-aggregated map-side, shuffled as a single
    row, collected as ~24 bytes to the driver), then a scalar weight
    update. The featurized frame is persisted once, so T steps cost T
    cached scans and KB of driver traffic — the same shape at 100 TB
    with 1000 executors, no per-row driver involvement anywhere.

    Deterministic across engines: w starts at 0, the learning rate and
    step count are literals, and all per-step math is IEEE double over
    an associative-enough sum (differences are low-order bits that a
    round-to-6 on the outputs absorbs). Returns ONE row:
    (n, w0, w1, w2, log_loss) after `steps` updates."""
    d = (df.select(
            F.col(label_col).cast("double").alias("y"),
            F.col(x1_col).cast("double").alias("x1"),
            F.col(x2_col).cast("double").alias("x2"))
         .where(F.col("y").isNotNull() & F.col("x1").isNotNull()
                & F.col("x2").isNotNull())
         .persist())
    try:
        n = d.count()
        w0 = w1 = w2 = 0.0
        for _ in range(steps):
            z = F.lit(w0) + F.lit(w1) * F.col("x1") \
                + F.lit(w2) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("y")
            g = d.agg(F.sum(err).alias("g0"),
                      F.sum(err * F.col("x1")).alias("g1"),
                      F.sum(err * F.col("x2")).alias("g2")).first()
            w0 -= lr * g["g0"] / n
            w1 -= lr * g["g1"] / n
            w2 -= lr * g["g2"] / n
        z = F.lit(w0) + F.lit(w1) * F.col("x1") \
            + F.lit(w2) * F.col("x2")
        # BCE via the stable softplus form max(z,0) + ln(1+exp(-|z|)):
        # the direct log(1+exp(z)) overflows to inf for large positive z
        # (this is a general operator — callers need not scale features).
        # exp's argument here is always <= 0, so no overflow is possible;
        # the oracle SQL mirrors the identical expression shape.
        softplus = (F.greatest(z, F.lit(0.0))
                    + F.log(F.lit(1.0) + F.exp(-F.abs(z))))
        loss = d.agg((F.sum(softplus - F.col("y") * z) / n)
                     .alias("l")).first()
        return d.sparkSession.createDataFrame(
            [(n, round(w0, 6), round(w1, 6), round(w2, 6),
              round(loss["l"], 6))],
            "n long, w0 double, w1 double, w2 double, "
            "log_loss double")
    finally:
        d.unpersist()
