"""Distributed sketch operators: bounded-size mergeable summaries.

At 100 TB, exact answers to "how many distinct", "which keys are heavy",
and "what is the p99" either need a full shuffle of every key (distinct),
a full sort (quantiles), or per-key state proportional to the key space
(heavy hitters). Sketches replace those with FIXED-size state that merges
associatively — exactly the shape Spark's partial aggregation wants: each
task folds its partition into a tiny summary, the shuffle moves only the
summaries, and the merge is cheap. Every sketch here is built from
deterministic md5-derived hashing (the repo-wide convention from
``operators/sampling.hash_tag``), so the results — including the
*approximation error itself* — are bit-reproducible and replayable in any
SQL engine: the DuckDB oracle recomputes the same sketch and gets the
same estimate, which is what makes these oracle-checkable rather than
rows-only.

- **kmv_distinct**: K-minimum-values distinct-count sketch (Bar-Yossef
  et al.): keep the k smallest hash values per group; the k-th smallest,
  as a fraction u of the hash space, estimates distinct = (k-1)/u.
  State = k hashes per group regardless of cardinality; relative error
  ~ 1/sqrt(k-2).
- **countmin_sketch / countmin_estimate**: Count-Min (Cormode &
  Muthukrishnan): depth×width counter grid, point estimate = min over
  depth rows. State = depth·width counters TOTAL (not per key); estimates
  overcount only (never undercount), bias bounded by N·e/width per row.
- **histogram_quantiles**: fixed-bin equi-width histogram → interpolated
  quantiles. Two scans (min/max then counts) but state = `bins` counters;
  contrast with exact percentile which sorts every value.
- **bloom_filter_build / bloom_semi_join**: semi-join pruning via a
  broadcast Bloom bitmap — the runtime-filter pattern: build k·|dim|
  bit positions from the SMALL side, broadcast ≤ m set-bit positions,
  and filter the 100 TB fact side map-side before any join/shuffle.
  False positives are deterministic given (m, k, salt), so the filtered
  row set itself is oracle-replayable.

Reference anchor: the reference engine ships no sketch operators — this
family is part of the beyond-reference LLM-curation surface (SURVEY §2
extension), sized for the same scale posture as operators/dedup.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX13 = float(16 ** 13)  # 52-bit prefix → exact double fraction


def _h32(col: Column, salt: str) -> Column:
    """Deterministic 32-bit uniform hash of ``col`` (md5 prefix), as a
    non-negative long. DuckDB replay:
    ``('0x' || substr(md5(salt || CAST(x AS VARCHAR)), 1, 8))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16, 10).cast("long")


# ---------------------------------------------------------------- KMV ---

def kmv_partial(df: DataFrame, key_col: str, group_cols: list[str],
                k: int = 64, salt: str = "kmv") -> DataFrame:
    """The mergeable HALF of the KMV sketch: per group, the k smallest
    distinct key hashes — rows (``*group_cols``, __h). Partials from
    disjoint (or overlapping) shards merge LOSSLESSLY: the k smallest
    of a union of per-shard k-smallest sets is exactly the k smallest
    of the union, so sketch-of-merge == merge-of-sketches (the algebra
    a per-datacenter / per-day rollup of distinct counts needs)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    d = df.select(*group_cols, h.alias("__h")).distinct()
    # two-level k-min: a group with a billion distinct keys would
    # otherwise move EVERY hash into one window partition. Level 1
    # ranks within (group, first-hex-nibble) — 16-way parallel, each
    # sorting 1/16 of the hashes — and keeps k per bucket; the global
    # k smallest are necessarily among the per-bucket k smallest, so
    # level 2 ranks at most 16·k rows per group. Exactness preserved,
    # single-partition bottleneck gone.
    w1 = Window.partitionBy(*group_cols,
                            F.substring("__h", 1, 1)).orderBy("__h")
    pruned = (d.withColumn("__rn1", F.row_number().over(w1))
              .where(F.col("__rn1") <= k).drop("__rn1"))
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (pruned.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


def kmv_merge(parts: list[DataFrame], group_cols: list[str],
              k: int = 64) -> DataFrame:
    """Merge KMV partials (from :func:`kmv_partial`): union, re-dedup
    (overlapping shards may contribute the same hash), re-rank, keep k.
    Output has the same shape as a partial — merges compose."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    d = u.distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (d.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


def kmv_estimate(partial: DataFrame, group_cols: list[str],
                 k: int = 64) -> DataFrame:
    """Finalize a KMV partial into (``*group_cols``, n_kept,
    distinct_est) — exact when the group holds fewer than k distinct
    keys, else (k-1)/u_k."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = partial.withColumn("__rn", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.max("__rn").alias("n_kept"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"))
    u_k = (F.conv(F.substring("__hk", 1, 13), 16, 10).cast("double")
           / F.lit(_HEX13))
    est = (F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
           .otherwise(F.lit(float(k - 1)) / u_k))
    return agg.select(*group_cols, "n_kept",
                      F.round(est, 4).alias("distinct_est"))


def kmv_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                 k: int = 64, salt: str = "kmv") -> DataFrame:
    """Distinct-count estimate per group via the K-minimum-values sketch.

    Plan shape: one distinct on (group, hash) — which partial-aggregates
    map-side, so the shuffle carries at most one row per distinct key —
    then one group-partitioned window to rank hashes and keep k. At
    100 TB the window input is already collapsed to distinct hashes;
    per-group state after the rank filter is exactly k rows. When a group
    has fewer than k distinct keys the count is EXACT (n_kept < k);
    otherwise estimate = (k-1)/u_k with u_k the k-th smallest hash as a
    fraction of the hash space (first 13 hex chars = 52 bits, exact in a
    double).

    Returns one row per group: (``*group_cols``, n_kept, distinct_est).
    """
    return kmv_estimate(kmv_partial(df, key_col, group_cols, k, salt),
                        group_cols, k)


# ---------------------------------------------------------- Count-Min ---

def countmin_sketch(df: DataFrame, key_col: str, depth: int = 4,
                    width: int = 256, salt: str = "cm") -> DataFrame:
    """Build a Count-Min sketch: ``depth`` independent hash rows of
    ``width`` counters. Output: (d, cell, c) — at most depth·width rows
    TOTAL, independent of input size or key cardinality.

    The explode multiplies rows by ``depth`` before the groupBy, but the
    groupBy partial-aggregates map-side into ≤ depth·width cells per
    task, so the shuffle moves ≤ depth·width·tasks counter rows — the
    sketch property, preserved under Spark's execution model."""
    ex = df.select(F.col(key_col).cast("string").alias("__k")).withColumn(
        "d", F.explode(F.array(*[F.lit(i) for i in range(depth)])))
    cell = _h32(F.concat(F.col("d").cast("string"), F.lit("|"),
                         F.col("__k")), salt) % width
    return (ex.withColumn("cell", cell)
            .groupBy("d", "cell").agg(F.count("*").alias("c")))


def countmin_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge Count-Min sketches built with the SAME (depth, width,
    salt): cell-wise counter sum — CM is a linear sketch, so
    sketch(A ⊎ B) == sketch(A) + sketch(B) exactly (the algebra that
    lets per-shard / per-day sketches roll up without re-reading
    data). Output shape matches :func:`countmin_sketch`."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "cell").agg(F.sum("c").alias("c"))


def countmin_estimate(sketch: DataFrame, candidates: DataFrame,
                      key_col: str, depth: int = 4, width: int = 256,
                      salt: str = "cm") -> DataFrame:
    """Point-estimate counts for ``candidates`` (one row per key) from a
    Count-Min sketch: est(key) = min over d of sketch[d, h_d(key)].
    The sketch side is ≤ depth·width rows → broadcast hash join; the
    candidate side never shuffles. Estimates can only OVERcount."""
    ex = candidates.select(F.col(key_col).cast("string").alias("__k")) \
        .withColumn("d", F.explode(
            F.array(*[F.lit(i) for i in range(depth)])))
    cell = _h32(F.concat(F.col("d").cast("string"), F.lit("|"),
                         F.col("__k")), salt) % width
    probes = ex.withColumn("cell", cell)
    joined = probes.join(F.broadcast(sketch), ["d", "cell"])
    return (joined.groupBy("__k")
            .agg(F.min("c").cast("long").alias("est"))
            .withColumnRenamed("__k", key_col))


# ------------------------------------------------- histogram quantiles ---

def histogram_quantiles(df: DataFrame, value_col: str, bins: int = 64,
                        qs: tuple[float, ...] = (0.5, 0.9, 0.99)
                        ) -> DataFrame:
    """Approximate quantiles from a fixed-bin equi-width histogram.

    Two aggregate passes: (1) global min/max/count (3 doubles, broadcast
    back); (2) per-bin counts (≤ ``bins`` rows after map-side partials).
    The quantile is then read off the ≤``bins``-row cumulative histogram
    driver-side-free: a window over ``bins`` rows plus a literal-array
    explode of ``qs``. Versus exact percentile (a full sort / collect of
    every value), state is O(bins) and both shuffles are pre-collapsed.

    Estimate: linear interpolation within the covering bin —
    lo + width·(bin + (target − cum_prev)/bin_count), target = q·n.
    Returns (q, est_value) per requested quantile.
    """
    stats = df.agg(F.min(value_col).cast("double").alias("__lo"),
                   F.max(value_col).cast("double").alias("__hi"),
                   F.count(value_col).alias("__n"))
    b = df.select(F.col(value_col).cast("double").alias("__v")) \
        .crossJoin(F.broadcast(stats))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    # degenerate range (all values identical): width 0 would NULL the
    # bin via division; every value belongs in bin 0 and interpolation
    # collapses to lo
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1),
                F.floor((F.col("__v") - F.col("__lo")) / width))) \
        .cast("long")
    hist = (b.withColumn("bin", bin_)
            .groupBy("bin")
            .agg(F.count("*").alias("cnt"),
                 F.first("__lo").alias("__lo"),
                 F.first("__hi").alias("__hi"),
                 F.first("__n").alias("__n")))
    w = Window.orderBy("bin")
    cum = (hist.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("cum_prev", F.col("cum") - F.col("cnt")))
    qrows = cum.withColumn("q", F.explode(
        F.array(*[F.lit(float(q)) for q in qs])))
    target = F.col("q") * F.col("__n").cast("double")
    covering = qrows.where((F.col("cum").cast("double") >= target)
                           & (F.col("cum_prev").cast("double") < target))
    # a target can land exactly on a bin boundary; keep the first
    # covering bin deterministically
    wq = Window.partitionBy("q").orderBy("bin")
    first_cover = (covering.withColumn("__rn", F.row_number().over(wq))
                   .where(F.col("__rn") == 1))
    width2 = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    est = (F.col("__lo") + width2
           * (F.col("bin").cast("double")
              + (target - F.col("cum_prev").cast("double"))
              / F.col("cnt").cast("double")))
    return first_cover.select("q", F.round(est, 6).alias("est_value")) \
        .orderBy("q")


# ------------------------------------------------------- Bloom filter ---

def _bloom_probes(col: Column, m: int, k: int, salt: str) -> list[Column]:
    return [_h32(col.cast("string"), f"{salt}{i}") % m for i in range(k)]


def bloom_filter_build(dim: DataFrame, key_col: str, m: int = 4096,
                       k: int = 3, salt: str = "bf") -> DataFrame:
    """Build a Bloom filter over ``dim[key_col]`` as a ONE-row DataFrame
    holding the sorted array of set bit positions (≤ m ints — broadcast
    payload is bounded by m, not by |dim|)."""
    pos = dim.select(F.explode(F.array(
        *_bloom_probes(F.col(key_col), m, k, salt))).alias("p")).distinct()
    return pos.agg(F.array_sort(F.collect_list("p")).alias("__bloom_bits"))


def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, m: int = 4096, k: int = 3,
                    salt: str = "bf") -> DataFrame:
    """Semi-join ``fact`` to ``dim`` through a broadcast Bloom filter —
    the runtime-filter pattern: the 100 TB fact side is filtered
    MAP-SIDE (no shuffle, no join) by k array-membership probes against
    the ≤ m-entry broadcast bitmap built from the small side.

    Result = fact rows whose key MIGHT be in dim: a superset of the
    exact semi-join whose extra rows are deterministic false positives
    (fixed by m/k/salt), so downstream exact joins shrink their input
    by the true-negative mass. Use before an expensive shuffle join when
    |dim| ≪ |fact| but dim is too large to broadcast whole rows.

    Production note: at m beyond ~10^6 the set-positions array should
    become a packed LONG bitmask (m/64 words, probe = bit-test); the
    array-of-positions form keeps the operator pure-Catalyst and
    oracle-replayable, and is bounded by m either way."""
    bits = bloom_filter_build(dim, dim_key, m, k, salt)
    probes = _bloom_probes(F.col(fact_key), m, k, salt)
    cond = reduce(lambda a, b: a & b,
                  [F.array_contains(F.col("__bloom_bits"), p)
                   for p in probes])
    return (fact.crossJoin(F.broadcast(bits))
            .where(cond).drop("__bloom_bits"))


def kmv_set_estimates(a: DataFrame, b: DataFrame, key_col: str,
                      k: int = 64, salt: str = "kmv") -> DataFrame:
    """Set-operation estimates between two keyed datasets from their
    KMV partials only (the theta-sketch use case: audience overlap,
    cross-day retention, dedup-rate between corpus snapshots — computed
    from KB-sized summaries, never by joining the raw sets).

    Returns ONE row: (est_a, est_b, est_union, est_intersection,
    jaccard). |A∪B| comes from merging the two partials; |A∩B| by
    inclusion-exclusion; groups below k are exact, so small-set results
    are exact end-to-end. All arithmetic is md5-deterministic →
    oracle-replayable, including the estimation error."""
    g: list[str] = ["__g"]
    pa = kmv_partial(a.withColumn("__g", F.lit(1)), key_col, g, k, salt)
    pb = kmv_partial(b.withColumn("__g", F.lit(1)), key_col, g, k, salt)
    # the 1-row collapse goes through agg() (always yields a row), so an
    # EMPTY input set estimates 0.0 instead of vanishing the output row
    ea = kmv_estimate(pa, g, k).agg(
        F.coalesce(F.min("distinct_est"), F.lit(0.0)).alias("est_a"))
    eb = kmv_estimate(pb, g, k).agg(
        F.coalesce(F.min("distinct_est"), F.lit(0.0)).alias("est_b"))
    eu = kmv_estimate(kmv_merge([pa, pb], g, k), g, k).agg(
        F.coalesce(F.min("distinct_est"), F.lit(0.0)).alias("est_union"))
    out = ea.crossJoin(eb).crossJoin(eu)
    inter = F.greatest(
        F.lit(0.0),
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4))
    jac = F.when(F.col("est_union") > 0.0,
                 F.round(inter / F.col("est_union"), 6)).otherwise(0.0)
    return out.select(
        "est_a", "est_b", "est_union", inter.alias("est_intersection"),
        jac.alias("jaccard"))


# ------------------------------------------------- streaming maintenance ---

def countmin_apply_batch(state: DataFrame | None, batch: DataFrame,
                         key_col: str, depth: int = 4, width: int = 256,
                         salt: str = "cm") -> DataFrame:
    """Fold one micro-batch into a maintained Count-Min state (linear
    sketch: state' = state + sketch(batch)). The state is <= depth·width
    rows FOREVER — a streaming frequency dashboard whose storage does
    not grow with the stream, unlike per-key counters over an unbounded
    key space. Same-result-as-rebuild is guaranteed by linearity and
    pinned by test."""
    delta = countmin_sketch(batch, key_col, depth, width, salt)
    if state is None:
        return delta
    return countmin_merge([state.select("d", "cell", "c"), delta])


def kmv_apply_batch(state: DataFrame | None, batch: DataFrame,
                    key_col: str, group_cols: list[str], k: int = 64,
                    salt: str = "kmv") -> DataFrame:
    """Fold one micro-batch into a maintained KMV partial (k hashes per
    group forever): streaming distinct-count without distinct-key
    state. Lossless-merge property makes fold order irrelevant —
    rebuild-equivalent by construction, pinned by test."""
    part = kmv_partial(batch, key_col, group_cols, k, salt)
    if state is None:
        return part
    return kmv_merge([state.select(*group_cols, "__h"), part],
                     group_cols, k)


def countmin_join_size(sketch_a: DataFrame, sketch_b: DataFrame
                       ) -> DataFrame:
    """Estimate the equi-join OUTPUT cardinality |A ⋈ B| from the two
    sides' Count-Min sketches alone (same depth/width/salt): per depth
    row, the inner product Σ_cell a_c·b_c upper-bounds Σ_key f_A(k)·
    f_B(k) (hash collisions only ADD cross terms); min over depth rows
    tightens it. The optimizer-statistics use case: size a join's
    shuffle/broadcast decision from two KB summaries WITHOUT running
    the join — at 100 TB, knowing 'this join explodes 50×' before
    launching it is the difference between re-planning and an OOM
    post-mortem. One ≤depth·width-row join + a depth-row aggregate.
    Returns one row: (est_join_rows)."""
    j = (sketch_a.select("d", "cell", F.col("c").alias("ca"))
         .join(sketch_b.select("d", "cell", F.col("c").alias("cb")),
               ["d", "cell"]))
    per_d = j.groupBy("d").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    # no overlapping cells at all (disjoint key hash footprints, or an
    # empty side) estimates an empty join, not NULL
    return per_d.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("long")
        .alias("est_join_rows"))


def bloom_semi_join_packed(fact: DataFrame, dim: DataFrame,
                           fact_key: str, dim_key: str, m: int = 4096,
                           k: int = 3, salt: str = "bf") -> DataFrame:
    """The PACKED-bitmask form of :func:`bloom_semi_join` — the
    production path once m grows past ~10^6: the filter is a ≤ m/64-row
    (word → 64-bit mask) table built with a bit_or aggregate, each
    probe is one broadcast hash join on the word index plus a bit test,
    all in whole-stage codegen. Identical bit positions as the
    positions-array form (same md5 probes), so given the same
    (m, k, salt) the two variants return byte-identical row sets — the
    registered query reuses the array form's oracle to prove it.

    Plan: k broadcast joins (word table ≤ m/64 rows ≈ 24 MB even at
    m = 10^8) + a conjunctive bit-test filter; the fact side still
    never shuffles."""
    pos = dim.select(F.explode(F.array(
        *_bloom_probes(F.col(dim_key), m, k, salt))).alias("p")).distinct()
    words = (pos.select((F.col("p") / 64).cast("long").alias("w"),
                        F.expr("shiftleft(CAST(1 AS BIGINT), "
                               "CAST(p % 64 AS INT))").alias("mask"))
             .groupBy("w").agg(F.bit_or("mask").alias("bits")))
    out = fact
    cond = F.lit(True)
    for i in range(k):
        p_i = _h32(F.col(fact_key).cast("string"), f"{salt}{i}") % m
        out = out.withColumn(f"__p{i}", p_i)
        wt = words.select(F.col("w").alias(f"__w{i}"),
                          F.col("bits").alias(f"__b{i}"))
        out = out.join(
            F.broadcast(wt),
            (F.col(f"__p{i}") / 64).cast("long") == F.col(f"__w{i}"),
            "left")
        hit = (F.col(f"__b{i}").isNotNull()
               & (F.col(f"__b{i}").bitwiseAND(
                   F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                          f"CAST(__p{i} % 64 AS INT))")) != 0))
        cond = cond & hit
    drop = [c for i in range(k)
            for c in (f"__p{i}", f"__w{i}", f"__b{i}")]
    return out.where(cond).drop(*drop)


def grouped_histogram_quantiles(df: DataFrame, group_col: str,
                                value_col: str, bins: int = 64,
                                qs: tuple[float, ...] = (0.5, 0.9)
                                ) -> DataFrame:
    """Per-GROUP approximate quantiles from per-group equi-width
    histograms — the bounded-state replacement for exact per-group
    percentile (which shuffles and SORTS every value to its group):
    state is ``bins`` counters per group, both aggregation passes
    partial-combine map-side, and the cumulative walk runs on ≤ bins
    rows per group. Same deterministic interpolation as
    :func:`histogram_quantiles`, per group. Returns
    (group, q, est_value)."""
    g = F.col(group_col)
    stats = df.groupBy(group_col).agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
        F.count(value_col).alias("__n"))
    b = (df.select(group_col,
                   F.col(value_col).cast("double").alias("__v"))
         .join(F.broadcast(stats), group_col))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1),
                F.floor((F.col("__v") - F.col("__lo")) / width))) \
        .cast("long")
    hist = (b.withColumn("bin", bin_)
            .groupBy(group_col, "bin")
            .agg(F.count("*").alias("cnt"),
                 F.first("__lo").alias("__lo"),
                 F.first("__hi").alias("__hi"),
                 F.first("__n").alias("__n")))
    w = Window.partitionBy(group_col).orderBy("bin")
    cum = (hist.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("cum_prev", F.col("cum") - F.col("cnt")))
    qrows = cum.withColumn("q", F.explode(
        F.array(*[F.lit(float(q)) for q in qs])))
    target = F.col("q") * F.col("__n").cast("double")
    covering = qrows.where((F.col("cum").cast("double") >= target)
                           & (F.col("cum_prev").cast("double") < target))
    wq = Window.partitionBy(group_col, "q").orderBy("bin")
    first_cover = (covering.withColumn("__rn", F.row_number().over(wq))
                   .where(F.col("__rn") == 1))
    width2 = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    est = (F.col("__lo") + width2
           * (F.col("bin").cast("double")
              + (target - F.col("cum_prev").cast("double"))
              / F.col("cnt").cast("double")))
    return first_cover.select(group_col, "q",
                              F.round(est, 6).alias("est_value"))


def histogram_bins(df: DataFrame, value_col: str, lo: float, hi: float,
                   bins: int = 64) -> DataFrame:
    """Fixed-RANGE equi-width histogram counts (bin, cnt) for a known
    [lo, hi) domain — the mergeable form used for streaming
    maintenance, where the data-dependent min/max of
    :func:`histogram_quantiles` would shift bin edges between batches
    and break linearity. Out-of-range values clamp to the edge bins."""
    width = (hi - lo) / float(bins)
    bin_ = F.greatest(F.lit(0), F.least(
        F.lit(bins - 1),
        F.floor((F.col(value_col).cast("double") - F.lit(lo))
                / F.lit(width)))).cast("long")
    return (df.where(F.col(value_col).isNotNull())
            .withColumn("bin", bin_)
            .groupBy("bin").agg(F.count("*").alias("cnt")))


def histogram_apply_batch(state: DataFrame | None, batch: DataFrame,
                          value_col: str, lo: float, hi: float,
                          bins: int = 64) -> DataFrame:
    """Fold one micro-batch into maintained histogram state (linear:
    state' = state + bins(batch)); ≤ ``bins`` rows forever."""
    delta = histogram_bins(batch, value_col, lo, hi, bins)
    if state is None:
        return delta
    return (state.select("bin", "cnt").unionByName(delta)
            .groupBy("bin").agg(F.sum("cnt").alias("cnt")))


def hll_partial(df: DataFrame, key_col: str, group_cols: list[str],
                p: int = 8, salt: str = "hll") -> DataFrame:
    """The mergeable HALF of a HyperLogLog sketch (Flajolet et al.):
    per group, register rows (``*group_cols``, j, r) where j is the
    top-``p`` bits of a 32-bit md5-derived hash and r = max over keys
    of the leading-zero rank of the remaining 32-p bits. State is
    ≤ 2^p rows per group at ANY cardinality, and the groupBy(j, max)
    partial-aggregates map-side, so the shuffle moves at most
    2^p·tasks register rows — versus KMV this trades the per-key
    distinct pre-collapse for a pure max-fold (no distinct shuffle at
    all). Merge is register-wise MAX — idempotent, commutative,
    associative — so sketch-of-union == merge-of-sketches exactly.

    rho is computed without float log: for w > 0,
    rho = (32-p) + 1 - length(bin(w)) (``bin`` drops leading zeros in
    both Spark and DuckDB, making the oracle replay bit-exact); w = 0
    maps to the sentinel rank (32-p)+1."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    wbits = 32 - p
    h = _h32(F.col(key_col), salt)
    j = F.floor(h / F.lit(1 << wbits)).cast("long")
    w = h % F.lit(1 << wbits)
    rho = (F.when(w == 0, F.lit(wbits + 1))
           .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
           .cast("long"))
    return (df.select(*group_cols, j.alias("j"), rho.alias("rho"))
            .groupBy(*group_cols, "j").agg(F.max("rho").alias("r")))


def hll_merge(parts: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge HLL partials built with the same (p, salt): register-wise
    max. Output shape matches :func:`hll_partial` — merges compose,
    and merging a sketch with itself is a no-op (idempotent), which is
    what makes HLL safe under at-least-once replay where linear
    sketches (Count-Min) would double-count."""
    u = parts[0]
    for x in parts[1:]:
        u = u.unionByName(x)
    return u.groupBy(*group_cols, "j").agg(F.max("r").alias("r"))


def hll_estimate(partial: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Finalize HLL registers into (``*group_cols``, distinct_est):
    raw = alpha_m·m²/Σ 2^-M_j (absent registers contribute 2^0 = 1),
    with the standard small-range correction E = m·ln(m/V) when
    raw ≤ 2.5m and V (zero registers) > 0. All arithmetic is the same
    IEEE expression on both engines; the 4-decimal round absorbs
    summation-order ulps."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = partial.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r").cast("double"))).alias("__s"),
        F.count("*").alias("__nz"))
    denom = F.col("__s") + (F.lit(m) - F.col("__nz")).cast("double")
    raw = F.lit(alpha * m * m) / denom
    v = (F.lit(m) - F.col("__nz")).cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0.0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
        .otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("distinct_est"))


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                 p: int = 8, salt: str = "hll") -> DataFrame:
    """Distinct-count estimate per group via HyperLogLog — the
    fixed-register alternative to :func:`kmv_distinct`: no distinct
    pre-collapse (the max-fold absorbs duplicates map-side), state
    2^p registers per group, replay-idempotent merge. Returns
    (``*group_cols``, distinct_est)."""
    return hll_estimate(hll_partial(df, key_col, group_cols, p, salt),
                        group_cols, p)


def hll_apply_batch(state: DataFrame | None, batch: DataFrame,
                    key_col: str, group_cols: list[str], p: int = 8,
                    salt: str = "hll") -> DataFrame:
    """Fold one micro-batch into maintained HLL register state
    (register-wise max). Idempotent under epoch replay — re-folding
    the same batch cannot move any register — so unlike the Count-Min
    fold this one needs no replay guard in an at-least-once sink."""
    part = hll_partial(batch, key_col, group_cols, p, salt)
    if state is None:
        return part
    return hll_merge([state.select(*group_cols, "j", "r"), part],
                     group_cols)


def histogram_state_quantiles(state: DataFrame, lo: float, hi: float,
                              bins: int = 64,
                              qs: tuple[float, ...] = (0.5, 0.9)
                              ) -> DataFrame:
    """Read interpolated quantiles off maintained histogram state —
    same estimator as :func:`histogram_quantiles`, fixed-range form.
    Returns (q, est_value)."""
    width = (hi - lo) / float(bins)
    total = state.agg(F.sum("cnt").alias("__n"))
    w = Window.orderBy("bin")
    cum = (state.crossJoin(F.broadcast(total))
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("cum_prev", F.col("cum") - F.col("cnt")))
    qrows = cum.withColumn("q", F.explode(
        F.array(*[F.lit(float(q)) for q in qs])))
    target = F.col("q") * F.col("__n").cast("double")
    covering = qrows.where((F.col("cum").cast("double") >= target)
                           & (F.col("cum_prev").cast("double") < target))
    wq = Window.partitionBy("q").orderBy("bin")
    first_cover = (covering.withColumn("__rn", F.row_number().over(wq))
                   .where(F.col("__rn") == 1))
    est = (F.lit(lo) + F.lit(width)
           * (F.col("bin").cast("double")
              + (target - F.col("cum_prev").cast("double"))
              / F.col("cnt").cast("double")))
    return first_cover.select("q", F.round(est, 6).alias("est_value")) \
        .orderBy("q")
