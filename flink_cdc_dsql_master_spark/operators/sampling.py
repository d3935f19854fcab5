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
