"""Deterministic sampling / dataset-balancing operators.

How a 100 TB curation pipeline downsamples: every keep/drop decision is a
pure function of (salt, key), so runs are reproducible across engines and
retries, no RNG state exists anywhere, and the predicates are plain
Catalyst expressions:

- **hash_sample**: Bernoulli-by-hash — a FILTER with no shuffle at all; it
  pushes down next to the scan and composes with partition pruning. md5 is
  uniform, so the realized rate concentrates tightly around the target at
  any scale and never skews by key distribution.
- **domain_quota**: fixed-N-per-group (domain balancing) — one window
  (hash-ordered row_number) per group, i.e. exactly the shuffle a groupBy
  on the domain key costs. The hash ordering makes the kept subset a
  uniform random N of each domain, yet stable run-over-run.

Changing the salt draws a fresh independent sample; keeping it pins the
exact subset forever (the property training-data lineage needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from ..pinning import pin


def hash_tag(key: Column, salt: str) -> Column:
    """Deterministic per-key tag: md5 hex of salt || key (lowercase hex in
    both Spark and DuckDB — oracle-identical)."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "s") -> DataFrame:
    """Keep ~`rate` of rows, decided by md5(salt||key) — deterministic,
    stateless, shuffle-free. The comparison uses the first 4 hex chars
    (16-bit resolution: rate granularity 1/65536, plenty for curation
    rates)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = format(int(rate * 65536), "04x")
    return df.where(
        F.substring(hash_tag(F.col(key_col), salt), 1, 4) < F.lit(thr))


def cluster_split(df: DataFrame, cluster_col: str = "cluster_id",
                  rate: float = 0.8, salt: str = "cs",
                  split_col: str = "split") -> DataFrame:
    """Leakage-safe train/holdout split: the md5-cut decision is made on
    the near-dup CLUSTER id, not the document id, so every member of a
    duplicate cluster lands on the same side — splitting by doc id leaks
    near-identical text across the boundary and inflates eval scores.
    Input rows must carry ``cluster_col`` (from ``dedup.dup_clusters``;
    singleton docs are their own cluster). Map-side only."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = format(int(rate * 65536), "04x")
    tag = F.substring(hash_tag(F.col(cluster_col), salt), 1, 4)
    return df.withColumn(
        split_col,
        F.when(tag < F.lit(thr), "train").otherwise("holdout"))


def domain_quota(df: DataFrame, group_col: str, key_col: str, n: int,
                 salt: str = "q", rank_col: str = "rn") -> DataFrame:
    """Keep at most `n` rows per `group_col`, chosen by hash order — a
    uniform, reproducible per-domain subsample. Appends `rank_col`
    (1..n within the group, hash-ordered, key tie-broken)."""
    w = Window.partitionBy(group_col).orderBy(
        hash_tag(F.col(key_col), salt), F.col(key_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .where(F.col(rank_col) <= n)
    )


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   part_col: str, order_col: str,
                   bin_col: str = "bin_id") -> DataFrame:
    """Contiguous-scan sequence packing: within each `part_col` stream
    (deterministically ordered by `order_col`), assign each doc to the
    fixed-token-budget bin its preceding cumulative token count falls in:
    ``bin = floor(preceding_cumsum / budget)``.

    This is the "pack then split" shape training loaders use: bins fill to
    >= budget tokens (the straddling doc overflows and is truncated/split
    downstream), assignments are pure functions of the ordered stream —
    reproducible across runs and engines, no bin-packing state.

    Scale: ONE window per partition stream — the same shuffle a
    groupBy(part_col) costs, with streams processed independently in
    parallel. Never a global ORDER BY: a single total-order window would
    serialize 100 TB through one task; per-stream packing (by source,
    shard, or date) is the parallel formulation.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (Window.partitionBy(part_col)
         .orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        bin_col, F.floor(prev / F.lit(budget)).cast("int"))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, n: int,
                    salt: str = "w", part_col: str | None = None,
                    priority_col: str = "priority") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): keep the top-`n` rows by priority
    ``u^(1/w)`` where ``u`` is a hash-derived uniform in (0,1).

    Heavier rows win more often, every run picks the identical set (u is
    md5(salt||key), not an RNG), and the top-n is a per-group window —
    the same one shuffle as a groupBy. With `part_col`, samples n PER
    GROUP (per-language / per-source quotas); without, a single global
    sample (fine for n ≤ millions; the window degenerates to one
    partition, so for huge global n switch to a per-shard top-n + merge).

    u uses 32 hash bits scaled into (0,1) — identical arithmetic is
    expressible in ANSI SQL, so the exact selected SET is oracle-checkable
    (pow ulp differences flip a rank only at ~1e-16 relative priority
    gaps; hash-distinct u makes that astronomically unlikely).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = (F.conv(F.substring(hash_tag(F.col(key_col), salt), 1, 8), 16, 10)
         .cast("double") + 0.5) / F.lit(4294967296.0)
    prio = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    parts = [part_col] if part_col else []
    w = (Window.partitionBy(*parts)
         .orderBy(F.desc(priority_col), F.col(key_col)))
    return (df.withColumn(priority_col, prio)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .drop("__rn"))


def mixture_rates(df: DataFrame, domain_col: str, target_total: int,
                  temperature: float = 0.7) -> DataFrame:
    """Per-domain keep-rates for temperature-flattened mixture resampling
    (the multinomial temperature sampling of multilingual/multi-source
    training corpora): p_d ∝ n_d^temperature, rate_d =
    min(1, p_d·target_total / n_d).

    temperature 1.0 keeps raw proportions; → 0 flattens toward uniform,
    boosting tail domains. Returns (domain, n_docs, rate, threshold)
    where threshold is an integer 16-bit cut: keep iff the first 4 md5
    hex digits, read as an integer, are < threshold (65536 ⇒ keep all —
    an integer compare, unlike `hash_sample`'s hex-string cut, stays
    correct at rate 1.0). The domain table is ~#domains rows — compute it in
    one aggregate, broadcast it back, filter map-side.
    """
    counts = (df.groupBy(domain_col)
              .agg(F.count("*").alias("n_docs")))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"),
                    temperature)).alias("z"))
    rate = F.least(
        F.lit(1.0),
        F.pow(F.col("n_docs").cast("double"), temperature) / F.col("z")
        * target_total / F.col("n_docs").cast("double"))
    return (counts.crossJoin(F.broadcast(tot))
            .withColumn("rate", rate)
            .withColumn("threshold",
                        F.floor(F.col("rate") * 65536).cast("int"))
            .drop("z"))


def mixture_resample(df: DataFrame, domain_col: str, key_col: str,
                     target_total: int, temperature: float = 0.7,
                     salt: str = "m") -> DataFrame:
    """Apply `mixture_rates`: broadcast-join the per-domain threshold and
    keep rows whose hash tag falls under it — map-side filter, zero
    data-side shuffle; expected kept ≈ target_total with the temperature
    mixture."""
    rates = mixture_rates(df, domain_col, target_total, temperature)
    tagged = df.withColumn(
        "__tag",
        F.conv(F.substring(hash_tag(F.col(key_col), salt), 1, 4), 16, 10)
        .cast("int"))
    return (tagged
            .join(F.broadcast(rates.select(domain_col, "threshold")),
                  domain_col)
            .where(F.col("__tag") < F.col("threshold"))
            .drop("__tag", "threshold"))


def token_budget_rates(df: DataFrame, domain_col: str, token_col: str,
                       budget_tokens: int,
                       temperature: float = 0.7) -> DataFrame:
    """Per-domain keep-rates targeting a TOKEN budget instead of a row
    count — how training mixtures are actually specified (epochs of
    FineWeb + k passes of code ≈ N tokens, not N documents).

    p_d ∝ tokens_d^temperature; rate_d = min(1, p_d·budget / tokens_d).
    Same integer 16-bit threshold discipline as ``mixture_rates``; the
    domain table is one aggregate, broadcast back, applied map-side.
    Expected kept tokens ≈ budget (exact only in expectation — documents
    are kept whole, never split)."""
    counts = (df.groupBy(domain_col)
              .agg(F.sum(token_col).cast("double").alias("n_tokens"),
                   F.count("*").alias("n_docs")))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_tokens"), temperature)).alias("z"))
    rate = F.least(
        F.lit(1.0),
        F.pow(F.col("n_tokens"), temperature) / F.col("z")
        * budget_tokens / F.col("n_tokens"))
    return (counts.crossJoin(F.broadcast(tot))
            .withColumn("rate", rate)
            .withColumn("threshold",
                        F.floor(F.col("rate") * 65536).cast("int"))
            .drop("z"))


def token_budget_resample(df: DataFrame, domain_col: str, key_col: str,
                          token_col: str, budget_tokens: int,
                          temperature: float = 0.7,
                          salt: str = "t") -> DataFrame:
    """Apply `token_budget_rates` as a deterministic map-side filter."""
    rates = token_budget_rates(df, domain_col, token_col, budget_tokens,
                               temperature)
    tagged = df.withColumn(
        "__tag",
        F.conv(F.substring(hash_tag(F.col(key_col), salt), 1, 4), 16, 10)
        .cast("int"))
    return (tagged
            .join(F.broadcast(rates.select(domain_col, "threshold")),
                  domain_col)
            .where(F.col("__tag") < F.col("threshold"))
            .drop("__tag", "threshold"))


def greedy_cover_selection(df: DataFrame, set_col: str,
                           text_col: str = "text", rounds: int = 4,
                           shingle_n: int = 3) -> DataFrame:
    """Greedy maximum-coverage data-source selection (the submodular
    set-cover heuristic, with its (1 − 1/e) guarantee): repeatedly
    pick the source whose documents add the most NOT-yet-covered
    n-gram shingles — the "which corpora buy the most diversity"
    question a training-data mixture budget has to answer.

    Per round: one partial-aggregating marginal-gain groupBy, a
    bounded 1-row argmax collect (the repo's split-point convention —
    a scalar, never data), and one shingle anti-join that shrinks the
    remaining universe; `rounds` is a small constant, so the whole
    selection is K aggregate+anti-join passes, each fully parallel.
    Ties break on set key ascending, so the selection path is
    deterministic and a DuckDB oracle replays the exact same greedy
    trajectory round by round.

    Returns (round, set_key, marginal_gain, cum_covered) — one row
    per selection, cum_covered = running Σ of marginal gains
    (= |covered universe| after the round)."""
    from .dedup import word_shingles_pandas

    spark = df.sparkSession
    # Arrow-batched shingle kernel (byte-identical to the Catalyst HOF
    # twin, ~200× its throughput — the hot-path convention)
    base = (df.select(F.col(set_col).cast("string").alias("set_key"),
                      F.explode(word_shingles_pandas(shingle_n)(
                          F.col(text_col))).alias("__s"))
            .distinct())
    # each round must NOT re-execute the whole prior anti-join chain
    # (that is quadratic recompute: round r re-reads the corpus r
    # times) — localCheckpoint truncates the lineage so every round
    # costs one agg + one anti-join over the CURRENT remaining set,
    # the same discipline dup_clusters uses for its iterations
    remaining = base.transform(pin)
    out: list[tuple[int, str, int, int]] = []
    cum = 0
    for r in range(1, rounds + 1):
        top = (remaining.groupBy("set_key")
               .agg(F.count("*").alias("gain"))
               .orderBy(F.col("gain").desc(), "set_key")
               .limit(1).collect())
        if not top:
            break
        sel, gain = top[0]["set_key"], top[0]["gain"]
        cum += gain
        out.append((r, sel, gain, cum))
        sel_sh = remaining.where(F.col("set_key") == sel).select("__s")
        remaining = (remaining.where(F.col("set_key") != sel)
                     .join(sel_sh, "__s", "left_anti")
                     .transform(pin))
    return spark.createDataFrame(
        out, "round int, set_key string, marginal_gain long, "
             "cum_covered long")


def range_bucket(df: DataFrame, key: Column, n_buckets: int = 64) -> Column:
    """A bucket column MONOTONE in `key`'s ascending order, built from
    approximate percentile boundaries (one tiny 1-row aggregate, collected
    driver-side, re-emitted as literals).

    Monotone means: key(a) <= key(b) implies bucket(a) <= bucket(b) — the
    contract `distributed_rank` needs so per-bucket local ranks + bucket
    offsets reconstruct the EXACT global rank. The boundaries only control
    load balance, never correctness, so percentile_approx's approximation
    is harmless; equal keys always land in the same bucket (assignment is
    a pure function of the key value)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(F.percentile_approx(key, qs, 10000).alias("b")).first()
    return bucket_from_bounds(key, row["b"])


def bucket_from_bounds(key: Column, bounds) -> Column:
    '''The monotone bucket column for pre-computed percentile bounds,
    split out so callers that already run an aggregate over the frame
    (e.g. a COUNT they need anyway) can fetch the bounds in the same
    job instead of paying a second scan.'''
    uniq = sorted({float(v) for v in (bounds or []) if v is not None})
    expr: Column = F.lit(0)
    for v in uniq:
        expr = expr + F.when(key > F.lit(v), 1).otherwise(0)
    return expr.cast("long")


def distributed_rank(df: DataFrame, order_cols: list[Column],
                     bucket: Column, out: str = "i") -> DataFrame:
    """Exact global row_number WITHOUT the single-partition sort that
    `Window.orderBy` with no partitionBy costs (Spark warns `WindowExec:
    No Partition Defined` and moves every row to ONE task — the classic
    100 TB scale-killer).

    Two-pass partition-offset ranking instead:
      1. per-bucket counts — one partial-aggregating groupBy collapsing to
         <= n_buckets rows, collected driver-side (KB, not data);
      2. driver prefix-sums the counts into bucket offsets, broadcast back;
      3. row_number over Window.partitionBy(bucket) — fully parallel —
         plus the bucket's offset = the exact global rank.

    `bucket` must be monotone w.r.t. `order_cols` (see `range_bucket`; for
    hash/hex orderings use a leading-prefix bucket). Output dtype long."""
    spark = df.sparkSession
    b = df.withColumn("__bkt", bucket)
    counts = sorted(
        (r["__bkt"], r["c"]) for r in
        b.groupBy("__bkt").agg(F.count("*").alias("c")).collect())
    offs, acc = [], 0
    for k, c in counts:
        offs.append((int(k), acc))
        acc += int(c)
    off_df = spark.createDataFrame(offs or [(0, 0)],
                                   "__bkt long, __off long")
    wloc = Window.partitionBy("__bkt").orderBy(*order_cols)
    return (b.join(F.broadcast(off_df), "__bkt")
            .withColumn(out, (F.col("__off")
                              + F.row_number().over(wloc)).cast("long"))
            .drop("__bkt", "__off"))


def ntile_from_rank(i: Column, n: Column, k: int) -> Column:
    """Closed-form ntile(k) from a global rank: with q = floor(n/k) and
    r = n % k the first r tiles hold q+1 rows, the rest q — so the tile is
    ceil(i/(q+1)) inside the first r*(q+1) rows, else r + ceil of the
    remainder over q. Lets decile/quantile segmentation reuse
    `distributed_rank` instead of a global-sort ntile window."""
    nl = n.cast("long")
    il = i.cast("long")
    q = F.floor(nl / F.lit(k)).cast("long")
    r = (nl % F.lit(k)).cast("long")
    thr = r * (q + F.lit(1))
    first = F.ceil(il.cast("double") / (q + F.lit(1)).cast("double"))
    rest = r + F.ceil((il - thr).cast("double") / q.cast("double"))
    return F.when(il <= thr, first).otherwise(rest).cast("int")


def kcenter_coreset(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", rounds: int = 4,
                    seed_id=None) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over an
    embedding column — the classic 2-approximation for picking a
    maximally DIVERSE subset, the geometric complement of
    `greedy_cover_selection`'s shingle coverage: each round adds the
    point farthest (cosine distance) from every center chosen so far.

    Scale shape: the corpus never shuffles — each round is one
    map-only pass updating the running min-distance against the SINGLE
    newly-chosen literal center vector (KBs baked into the plan), plus
    a 1-row argmax collect (the repo's split-point convention). K
    rounds = K scans; the scan frame is localCheckpoint'ed so round r
    never replays rounds 1..r-1's lambda chain.

    Deterministic: seed = lowest id (or `seed_id`), ties break on id
    ascending, distances fold in index order — a SQL oracle replays
    the exact selection trajectory. Returns (round, center_id, radius)
    where radius = the chosen point's distance to the prior centers
    (the k-center objective value after round-1 centers)."""
    from pyspark.sql import functions as FF

    from .similarity import cosine_expr

    spark = df.sparkSession
    v = (df.select(FF.col(id_col).alias("id"),
                   FF.col(vec_col).cast("array<double>").alias("e"))
         .transform(pin))
    if seed_id is None:
        seed_id = v.agg(FF.min("id")).first()[0]
    seed_vec = v.where(FF.col("id") == seed_id).first()["e"]

    def lit_vec(vals):
        return FF.array(*[FF.lit(float(x)) for x in vals])

    cur = v.withColumn(
        "d", 1.0 - cosine_expr(lit_vec(seed_vec), FF.col("e")))
    out = []
    chosen = [seed_id]
    for r in range(1, rounds + 1):
        top = (cur.where(~FF.col("id").isin(*chosen))
               .orderBy(FF.col("d").desc(), FF.col("id").asc())
               .limit(1).collect()[0])
        chosen.append(int(top["id"]))
        out.append((r, int(top["id"]), float(round(top["d"], 6))))
        cur = (cur.withColumn(
            "d", FF.least(FF.col("d"), 1.0 - cosine_expr(
                lit_vec(top["e"]), FF.col("e"))))
            .transform(pin))
    return spark.createDataFrame(
        out, "round int, center_id long, radius double")


def deterministic_shuffle(df: DataFrame, id_col: str,
                          salt: str = "shuf") -> DataFrame:
    """Seeded, deterministic corpus shuffle — the training-order
    assignment every epoch of a data loader needs at 100 TB: each row
    gets a contiguous global position 0..N-1 in md5(salt || id) order,
    so the 'random' order is reproducible from the salt alone (change
    the salt per epoch for a fresh permutation) and any shard
    [k·B, (k+1)·B) can be read back by a range predicate on the
    position.

    Plan: the hash's leading byte is a monotone 256-ary bucket for
    :func:`distributed_rank`, so positions come from per-bucket
    row_numbers plus broadcast prefix-sum offsets — fully parallel,
    never the single-partition sort a global ORDER BY row_number
    would plan. One groupBy collapse + one bucketed window.
    Returns (``id_col``, shuffle_pos)."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    b = df.select(F.col(id_col), h.alias("__h"))
    bkt = F.conv(F.substring("__h", 1, 2), 16, 10).cast("long")
    ranked = distributed_rank(
        b, [F.col("__h").asc(), F.col(id_col).asc()], bkt, out="__i")
    return ranked.select(
        id_col, (F.col("__i") - 1).cast("long").alias("shuffle_pos"))
