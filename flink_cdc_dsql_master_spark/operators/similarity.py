"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB engine needs both:

- **brute-force top-k** (`cosine_topk`): exact; cost O(Q·N) dot products but
  fully distributed — the query set is broadcast (it's small), the corpus
  never moves, and the per-row work is a Catalyst `aggregate` over the
  zipped arrays inside whole-stage codegen. The global top-k per query is a
  window over (query, similarity) — one shuffle of (query_id, doc_id, sim)
  triples, never the vectors themselves.
- **IVF-style bucketed ANN** (`ivf_topk`): coarse-quantize the corpus to
  `n_cells` seeded random centroids (driver-side constants — no kmeans fit
  needed for a deterministic, trainable-later skeleton); probe only the
  `n_probe` nearest cells per query. Shuffle drops from O(Q·N) to
  O(Q·N·n_probe/n_cells). Same final window.
- **random-hyperplane LSH** bucket util shared with dedup.

Everything is Catalyst built-ins (`zip_with`, `aggregate`, `sqrt`) — the
dot product compiles to a tight JVM loop; no Python in the row path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "vec_id",
                query_vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine), k per query.

    The query side is broadcast — Catalyst turns the cross join into a
    BroadcastNestedLoopJoin where each corpus partition scans the in-memory
    query block; the corpus (the 100 TB side) never shuffles. Self-matches
    (same id) are excluded.
    """
    c = corpus.select(F.col(id_col).alias("nbr_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).cast("array<double>").alias("qv"))
    joined = c.crossJoin(F.broadcast(q)).where(
        F.col("nbr_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "nbr_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def _seeded_unit_vectors(n: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / nrm for x in v])
    return out


def random_hyperplane_bucket(v: Column, bits: int, seed: int = 42,
                             dim: int = 64) -> Column:
    """Sign-bit LSH bucket id from `bits` seeded random hyperplanes."""
    planes = _seeded_unit_vectors(bits, dim, seed)
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot_expr(v, plane) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0))
        acc = acc.bitwiseOR(bit)
    return acc


def assign_ivf_cell(v: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest (max-dot) centroid — a flat Catalyst argmax:
    array_max over (dot, idx) structs (NOT a nested when-chain, which grows
    exponentially). Centroids are seeded constants or precomputed offline."""
    arr = F.array(*[
        F.struct(
            dot_expr(v, F.array(*[F.lit(float(x)) for x in c])).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ])
    return F.array_max(arr)["i"]


def refine_centroids(corpus: DataFrame, centroids: list[list[float]],
                     vec_col: str = "embedding",
                     iters: int = 1) -> list[list[float]]:
    """Lloyd iterations: assign → mean per cell → new centroids.

    The per-cell mean is a distributed aggregate (posexplode + groupBy);
    only the n_cells × dim centroid table (a few KB) ever reaches the
    driver, so this is cluster-safe at any corpus size.
    """
    import math

    dim = len(centroids[0])
    v = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        assigned = v.withColumn("cell", assign_ivf_cell(F.col("v"), centroids))
        sums = (
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i").agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in sums:
            new[r["cell"]][r["i"]] = r["m"]
        # re-normalize so dot product stays a cosine-ordering proxy
        centroids = []
        for c in new:
            n = math.sqrt(sum(x * x for x in c)) or 1.0
            centroids.append([x / n for x in c])
    return centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 7, refine_iters: int = 0) -> DataFrame:
    """IVF-bucketed approximate top-k. Corpus rows are assigned to their
    nearest centroid cell once; each query probes its n_probe nearest cells,
    so the join degenerates to a hash-join on cell id over ~n_probe/n_cells
    of the corpus. Returns (query_id, nbr_id, cosine).

    `refine_iters` > 0 runs that many Lloyd iterations to fit the seeded
    centroids to the data (better cell balance → better recall at the same
    n_probe)."""
    cents = _seeded_unit_vectors(n_cells, dim, seed)
    if refine_iters:
        cents = refine_centroids(corpus, cents, vec_col, refine_iters)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cell", assign_ivf_cell(F.col("cv"), cents))

    # per-query probe cells: top n_probe centroid dots (driver-free, per row)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    dots = F.array(*[
        F.struct(dot_expr(F.col("qv"),
                          F.array(*[F.lit(float(x)) for x in cent])).alias("d"),
                 F.lit(i).alias("i"))
        for i, cent in enumerate(cents)
    ])
    probe = F.slice(F.reverse(F.array_sort(dots)), 1, n_probe)
    q = q.withColumn("cell", F.explode(F.transform(probe, lambda s: s["i"])))

    joined = c.join(F.broadcast(q), on="cell", how="inner").where(
        F.col("nbr_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "nbr_id",
        cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.dropDuplicates(["query_id", "nbr_id"])
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
