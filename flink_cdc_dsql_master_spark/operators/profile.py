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

from pyspark.sql import DataFrame, Window, functions as F


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


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (nats) of each column's value distribution —
    the information-density profile that flags near-constant columns
    (entropy ≈ 0, candidates for dictionary encoding / dropping) and
    key-like columns (entropy ≈ ln n). One partial-aggregating
    groupBy per column over (value → count), then a per-column fold
    of −Σ p·ln p; NULLs count as a regular value. Output one row per
    column: (col, n_distinct, entropy)."""
    if not cols:
        raise ValueError("no columns to profile")
    outs = []
    for c in cols:
        per = (df.groupBy(F.col(c).cast("string").alias("__v"))
               .agg(F.count("*").alias("__c")))
        tot = per.agg(F.sum("__c").alias("__n"))
        ent = (per.crossJoin(F.broadcast(tot))
               .agg(F.lit(c).alias("col"),
                    F.count("*").cast("long").alias("n_distinct"),
                    F.round(-F.sum(
                        (F.col("__c") / F.col("__n"))
                        * F.log(F.col("__c") / F.col("__n"))), 6)
                    .alias("entropy")))
        outs.append(ent)
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def psi_numeric(a: DataFrame, b: DataFrame, value_col: str,
                bins: int = 16) -> DataFrame:
    """Population Stability Index between two periods of a NUMERIC
    feature — the standard drift gate (PSI < 0.1 stable, > 0.25
    drifted): equi-width bins over the pooled min/max, Laplace-
    smoothed bin shares p̂ = (c + 0.5)/(n + 0.5·bins) so empty bins
    don't blow up the log, PSI = Σ (pa − pb)·ln(pa/pb).

    Plan: one 2-double pooled-range aggregate broadcast back, one
    partial-aggregating bin count per side (≤ bins rows each), a
    bins-row outer join, a 1-row fold. Both full-data passes are
    map-side; nothing scales with N but the two scans. Returns ONE
    row: (n_a, n_b, psi)."""
    av = a.select(F.col(value_col).cast("double").alias("__v")) \
        .where(F.col("__v").isNotNull())
    bv = b.select(F.col(value_col).cast("double").alias("__v")) \
        .where(F.col("__v").isNotNull())
    pooled = av.unionByName(bv).agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))

    def _binned(df: DataFrame, name: str) -> DataFrame:
        d = df.crossJoin(F.broadcast(pooled))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
        bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)) \
            .otherwise(F.least(
                F.lit(bins - 1),
                F.floor((F.col("__v") - F.col("__lo")) / width))) \
            .cast("long")
        return d.withColumn("bin", bin_).groupBy("bin").agg(
            F.count("*").alias(name))

    ca, cb = _binned(av, "ca"), _binned(bv, "cb")
    j = ca.join(cb, "bin", "full").select(
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"))
    na = j.agg(F.sum("ca").alias("__na"), F.sum("cb").alias("__nb"))
    jj = j.crossJoin(F.broadcast(na))
    pa = (F.col("ca") + 0.5) / (F.col("__na") + F.lit(0.5 * bins))
    pb = (F.col("cb") + 0.5) / (F.col("__nb") + F.lit(0.5 * bins))
    return jj.agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"))


def psi_categorical(a: DataFrame, b: DataFrame, cat_col: str
                    ) -> DataFrame:
    """PSI over a CATEGORICAL feature: each observed category is a
    bin (full outer join of the two sides' category counts), same
    Laplace smoothing with the pooled category count as the bin
    count. Returns ONE row: (n_a, n_b, psi)."""
    ca = a.groupBy(F.col(cat_col).cast("string").alias("__k")) \
        .agg(F.count("*").alias("ca"))
    cb = b.groupBy(F.col(cat_col).cast("string").alias("__k")) \
        .agg(F.count("*").alias("cb"))
    j = ca.join(cb, "__k", "full").select(
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"))
    tot = j.agg(F.sum("ca").alias("__na"), F.sum("cb").alias("__nb"),
                F.count("*").alias("__k"))
    jj = j.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + 0.5) / (F.col("__na") + 0.5 * F.col("__k"))
    pb = (F.col("cb") + 0.5) / (F.col("__nb") + 0.5 * F.col("__k"))
    return jj.agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"))


def dp_noisy_counts(df: DataFrame, group_col: str, epsilon: float = 1.0,
                    salt: str = "dp") -> DataFrame:
    """ε-differentially-private group counts via the Laplace
    mechanism with DETERMINISTIC seeded noise: u ~ Uniform(0,1) is
    derived from md5(salt‖group) (52-bit prefix — the repo-wide
    deterministic convention), noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|)
    (inverse-CDF Laplace, scale 1/ε for a count's sensitivity of 1).
    Seeded noise makes the release REPRODUCIBLE run-over-run (and
    oracle-replayable) — also the practical requirement that repeated
    publication of the same statistic must not average the noise away.
    Plan: one partial-aggregating count + per-row noise arithmetic.
    Returns (group, noisy_count) — true counts never leave the
    engine."""
    per = df.groupBy(F.col(group_col).alias("grp")) \
        .agg(F.count("*").alias("__c"))
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col("grp").cast("string"))),
        1, 13), 16, 10).cast("double") / F.lit(float(16 ** 13)))
    s = u - F.lit(0.5)
    noise = (-F.lit(1.0 / epsilon) * F.signum(s)
             * F.log(F.lit(1.0) - 2.0 * F.abs(s)))
    return per.select(
        "grp", F.round(F.col("__c") + noise, 4).alias("noisy_count"))


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent content checksum of a table: per-row 52-bit
    md5 digests folded with BOTH xor (cheap, overflow-free) and an
    exact DECIMAL sum (robust where xor would cancel duplicate pairs).
    Both folds are commutative+associative → partial-aggregate
    map-side and merge across partitions/shards in any order, so two
    tables have equal checksums iff (w.h.p.) they hold the same row
    multiset — the migration-validation primitive: compare a 100 TB
    source and its replicated copy by shipping ONE row per side, no
    sort, no join. NULLs are folded as an explicit sentinel so
    (NULL, 'x') and ('x', NULL) differ. Returns one row:
    (n_rows, xor_sig, sum_sig)."""
    if not cols:
        raise ValueError("no columns to checksum")
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00N")))
    rowstr = F.concat_ws("\x01", *parts)
    h = F.conv(F.substring(F.md5(rowstr), 1, 13), 16, 10).cast("long")
    return df.select(h.alias("__h")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.bit_xor("__h").alias("xor_sig"),
        F.sum(F.col("__h").cast("decimal(38,0)")).cast("string")
        .alias("sum_sig"))


def key_skew_profile(df: DataFrame, key_col: str,
                     top: int = 5) -> DataFrame:
    """Key-distribution skew report — the diagnosis a 100 TB join or
    groupBy needs BEFORE launching (a 40% hot key means salting or
    AQE skew-join, not a default hash partition): per-key counts
    (one partial-aggregating shuffle), then the Gini coefficient of
    the count distribution and the share held by the heaviest ``top``
    keys, computed by a window over the ≤ |distinct keys| collapsed
    rows. Gini = (2·Σ rank·c)/(n·Σc) − (n+1)/n over counts ranked
    ascending (0 = perfectly even, → 1 = one key holds everything).
    Returns one row: (n_keys, n_rows, gini, top_share)."""
    per = df.groupBy(key_col).agg(F.count("*").alias("__c"))
    w_asc = Window.orderBy(F.col("__c").asc(), F.col(key_col).asc())
    w_dsc = Window.orderBy(F.col("__c").desc(), F.col(key_col).asc())
    ranked = (per.withColumn("__r", F.row_number().over(w_asc))
              .withColumn("__rd", F.row_number().over(w_dsc)))
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("__r") * F.col("__c"))
             / (F.count("*") * F.sum("__c")))
            - (F.count("*") + F.lit(1.0)) / F.count("*"), 6)
        .alias("gini"),
        F.round(F.sum(F.when(F.col("__rd") <= top, F.col("__c"))
                      .otherwise(0)).cast("double")
                / F.sum("__c"), 6).alias("top_share"))
