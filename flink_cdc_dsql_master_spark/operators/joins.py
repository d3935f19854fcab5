"""Skew-resilient join helpers.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) is the first
line of defense and is ON in get_spark(); explicit salting is the
belt-and-braces for the cases AQE can't fix — a single pathological key
inside one shuffle block, or a non-AQE runtime. The salted plan is
RESULT-IDENTICAL to the plain join (the oracle checks exactly that):
only the physical row distribution changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def salted_join(left: DataFrame, right: DataFrame,
                on: Sequence[tuple[str, str]], n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Join with the left side's hot keys spread over ``n_salts`` shuffle
    partitions and the right side replicated ×n_salts to meet them.

    ``on``: [(left_col, right_col), ...] equi-join pairs.

    The salt is a deterministic hash of the whole left row, so rows of one
    hot key land in n_salts different reducers instead of one straggler.
    Cost: the right side shuffles n_salts× its size — use for
    fact×dimension skew (small-to-medium right), never fact×fact; at that
    point bucket both sides or let AQE split.

    Only ``inner`` and ``left`` are supported: replicating the right side
    would duplicate right-unmatched rows under right/full-outer semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got: {how}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got: {n_salts}")
    lcols, rcols = [p[0] for p in on], [p[1] for p in on]
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"ambiguous columns on both sides: {sorted(clash)}")

    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
               F.lit(n_salts)).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))

    cond = F.col("__salt") == F.col("__rsalt")
    rsalt = rsalt.withColumnRenamed("__salt", "__rsalt")
    for lc, rc in on:
        cond = cond & (lsalt[lc] == rsalt[rc])
    return (lsalt.join(rsalt, cond, how)
            .drop("__salt", "__rsalt"))


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int, sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (and optionally sort-bucketed) table.

    Bucketing pre-pays the shuffle ONCE at write time: any later join or
    aggregation keyed on `bucket_cols` between tables with the same
    bucket count reads co-located partitions and plans ZERO Exchange —
    the decisive optimization for a fact table joined every day at
    100 TB (test_bucketed_join_no_exchange proves the plan property)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def co_located_join(spark, left_table: str, right_table: str,
                    on, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables (shuffle-free when bucket
    counts match and the join keys are the bucket keys)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def interval_join(left: DataFrame, right: DataFrame,
                  on: Sequence[tuple[str, str]],
                  left_ts: str, right_ts: str,
                  lower_s: float, upper_s: float,
                  bucket_width_s: float | None = None) -> DataFrame:
    """Inner interval join: pairs where ``right[right_ts]`` lies in
    ``[left[left_ts] + lower_s, left[left_ts] + upper_s]`` and the equi-keys
    match (Flink DataStream/SQL interval-join semantics, microsecond-exact).

    Plan — time-bucketed equi-join, the scalable shape for a range
    predicate: both sides map each row to coarse time buckets of width
    ``max(upper_s - lower_s, 1µs)`` (or ``bucket_width_s``); the left row's
    interval spans at most 2 adjacent buckets, so it is exploded to ≤2
    (key, bucket) rows while the right side emits exactly 1. The join is
    then a plain hash equi-join on (keys…, bucket) — Catalyst/AQE handle
    it like any shuffle join — and the exact interval predicate filters
    inside the matched bucket. Shuffle is O(2·|L| + |R|) rows keyed by
    (key, bucket): never a per-key cross product, never a broadcast of a
    big side, and time-locality keeps bucket cardinality high (no skew
    pile-up on the key alone).

    Columns must be disjoint; only ``inner`` (an outer join would
    duplicate unmatched exploded left rows).
    """
    if upper_s < lower_s:
        raise ValueError(f"upper_s {upper_s} < lower_s {lower_s}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"ambiguous columns on both sides: {sorted(clash)}")
    lo_us = int(round(lower_s * 1_000_000))
    up_us = int(round(upper_s * 1_000_000))
    w_us = (int(round(bucket_width_s * 1_000_000)) if bucket_width_s
            else max(up_us - lo_us, 1))

    def _us(c: Column) -> Column:
        # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros needs an
        # instant — the session-UTC cast is applied to BOTH sides, so every
        # difference (the only thing the interval predicate sees) is exact
        return F.unix_micros(c.cast("timestamp"))

    lm = _us(F.col(left_ts))
    rm = _us(F.col(right_ts))
    le = left.withColumn(
        "__lb",
        F.explode(F.sequence(F.floor((lm + lo_us) / w_us),
                             F.floor((lm + up_us) / w_us))))
    ri = right.withColumn("__rb", F.floor(rm / w_us))

    lm2 = _us(le[left_ts])
    rm2 = _us(ri[right_ts])
    cond = le["__lb"] == ri["__rb"]
    for lc, rc in on:
        cond = cond & (le[lc] == ri[rc])
    cond = cond & (rm2 >= lm2 + lo_us) & (rm2 <= lm2 + up_us)
    return le.join(ri, cond, "inner").drop("__lb", "__rb")


def fuzzy_trigram_join(left: DataFrame, right: DataFrame,
                       left_key: str, right_key: str,
                       left_text: str, right_text: str,
                       threshold: float = 0.5) -> DataFrame:
    """Fuzzy entity-matching join: pairs whose normalized strings have
    character-trigram Jaccard similarity >= threshold.

    Candidate generation uses the AllPairs/PPJoin PREFIX FILTER
    (Bayardo et al., WWW'07): each row's trigrams are ordered by global
    ascending frequency and only the first ``|s| - ceil(t*|s|) + 1``
    (the prefix) are exploded into the candidate equi-join — provably
    complete for Jaccard >= t, and the frequent "stopword" grams that
    would otherwise connect everything to everything land OUTSIDE the
    prefix, so candidate volume tracks the rare-gram tail instead of the
    cross product (naive shared-trigram blocking degenerates to
    all-pairs on entity-name data where every row shares digit grams).
    Exact Jaccard verifies each distinct candidate pair.

    Cost: one gram-frequency aggregate (broadcast), one per-row window
    to rank grams, the prefix-gram equi-join, and the verify join —
    every shuffle is O(prefix grams) or O(candidates).
    """

    def grams(c):
        norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
        chars = F.split(norm, "")
        n = F.greatest(F.size(chars) - F.lit(3), F.lit(1))
        return F.array_distinct(F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws("", F.slice(chars, i + 1, 3))))

    a = left.select(F.col(left_key).alias("id_a"),
                    grams(F.col(left_text)).alias("__ga"))
    b = right.select(F.col(right_key).alias("id_b"),
                     grams(F.col(right_text)).alias("__gb"))
    ea = a.select("id_a", F.explode("__ga").alias("__g"))
    eb = b.select("id_b", F.explode("__gb").alias("__g"))
    gf = (ea.select("__g").unionAll(eb.select("__g"))
          .groupBy("__g").agg(F.count("*").alias("__gf")))

    def prefix(exploded, idc):
        w = Window.partitionBy(idc).orderBy("__gf", "__g")
        n = Window.partitionBy(idc)
        return (exploded.join(F.broadcast(gf), "__g")
                .withColumn("__rn", F.row_number().over(w))
                .withColumn("__n", F.count("*").over(n))
                .where(F.col("__rn")
                       <= F.col("__n")
                       - F.ceil(F.lit(threshold) * F.col("__n")) + 1)
                .select(idc, "__g"))

    cands = (prefix(ea, "id_a").join(prefix(eb, "id_b"), "__g")
             .select("id_a", "id_b").distinct())
    sized = (cands.join(a, "id_a").join(b, "id_b")
             .withColumn("__inter",
                         F.size(F.array_intersect("__ga", "__gb")))
             .withColumn("__union",
                         F.size("__ga") + F.size("__gb")
                         - F.col("__inter")))
    return (sized
            .withColumn("similarity",
                        F.col("__inter") / F.col("__union"))
            .where(F.col("similarity") >= threshold)
            .select("id_a", "id_b", "similarity"))


def record_linkage(left: DataFrame, right: DataFrame,
                   block: Sequence[tuple[str, str]],
                   comparisons: Sequence[tuple[str, Column]],
                   weights: dict[str, tuple[float, float]],
                   upper: float, lower: float) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage: candidate pairs come
    from BLOCKING (equi-join on coarse keys — the only thing that makes
    linkage feasible at scale: candidates are O(sum of block sizes²),
    never |L|x|R|); each field comparison contributes a log2 likelihood
    ratio — log2(m/u) on agreement, log2((1-m)/(1-u)) on disagreement —
    with LITERAL (m, u) probabilities, so scoring is pure codegen on top
    of one hash-join shuffle. Pairs with score >= ``upper`` are
    'match', <= ``lower`` 'nonmatch', else 'possible' (the clerical-
    review band).

    ``block``: [(left_col, right_col), ...] blocking keys.
    ``comparisons``: [(field_name, boolean Column over the joined
    frame), ...]; ``weights``: field_name -> (m, u).

    Skewed blocks (a too-coarse key) are AQE skew-split like any other
    hash join; the fix at 100 TB is more selective blocking keys, not a
    different join strategy."""
    import math

    cond = [left[l] == right[r] for l, r in block]
    joined = left.join(right, cond)
    score = F.lit(0.0)
    for name, agree in comparisons:
        m, u = weights[name]
        w_a = math.log2(m / u)
        w_d = math.log2((1.0 - m) / (1.0 - u))
        score = score + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
    score = F.round(score, 6)
    decision = (F.when(score >= F.lit(upper), F.lit("match"))
                .when(score <= F.lit(lower), F.lit("nonmatch"))
                .otherwise(F.lit("possible")))
    return joined.withColumn("fs_score", score).withColumn(
        "decision", decision)
