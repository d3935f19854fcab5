"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB engine needs both:

- **brute-force top-k** (`cosine_topk`): exact; cost O(Q·N) dot products but
  fully distributed — the query set is broadcast (it's small), the corpus
  never moves. Two kernels:
  - ``kernel="hof"``: Catalyst `zip_with`/`aggregate`. NOTE: higher-order
    functions are *interpreted* expressions (a lambda-invocation per
    element, ~µs each), NOT whole-stage codegen — fine for small Q·N·dim,
    wrong past the crossover.
  - ``kernel="numpy"``: Arrow-batched `mapInPandas` over the corpus with
    the normalized query matrix broadcast; each batch is one BLAS matmul
    (B×dim @ dim×Q) and emits only its per-batch top-k candidates, so the
    shuffle is Q·k rows per batch, never Q·N. This is the 100 TB path for
    large Q — measured on local[32], N=2k, dim=64: Q=5 parity (~3s both,
    fixed overhead), Q=100 HOF 4.3s vs numpy 0.75s, Q=1000 numpy 1.6s
    (HOF extrapolates to ~40s). Crossover is Q≈10 (SCALE.md).
  The global top-k per query is a window over (query, similarity) — one
  shuffle of (query_id, nbr_id, sim) triples, never the vectors.
- **IVF-style bucketed ANN** (`ivf_topk`): coarse-quantize the corpus to
  `n_cells` seeded random centroids (driver-side constants — no kmeans fit
  needed for a deterministic, trainable-later skeleton); probe only the
  `n_probe` nearest cells per query. Shuffle drops from O(Q·N) to
  O(Q·N·n_probe/n_cells). Same final window.
- **random-hyperplane LSH** bucket util shared with dedup.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T
from ..pinning import pin


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
                query_vec_col: str = "embedding",
                kernel: str = "hof") -> DataFrame:
    """Exact cosine top-k: (query_id, nbr_id, cosine), k per query.

    The query side is broadcast (small); the corpus (the 100 TB side)
    never shuffles. ``kernel="hof"`` scores with interpreted Catalyst
    higher-order functions (no Python, but NOT codegen — see module doc);
    ``kernel="numpy"`` scores each Arrow batch with one BLAS matmul and
    pre-selects per-batch top-k, the right kernel once Q·N·dim is large.
    Both kernels return the same rows (cosines agree to float64 rounding;
    ranking ties are broken by nbr_id in both). Self-matches excluded.
    """
    if kernel == "numpy":
        return _cosine_topk_numpy(corpus, queries, k, id_col, vec_col,
                                  query_id_col, query_vec_col)
    if kernel != "hof":
        raise ValueError(f"unknown kernel {kernel!r}")
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


def _cosine_topk_numpy(corpus: DataFrame, queries: DataFrame, k: int,
                       id_col: str, vec_col: str,
                       query_id_col: str, query_vec_col: str) -> DataFrame:
    """Arrow/BLAS kernel: queries collected to the driver (Q·dim floats — a
    broadcast-sized table by definition of 'query block'), corpus streamed
    through mapInPandas. Each batch emits ≤ Q·k candidate rows, so the
    final window shuffles Q·k·n_batches rows — independent of corpus width.
    """
    import numpy as np

    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv")).collect()
    if not qrows:
        empty = [
            T.StructField("query_id",
                          queries.schema[query_id_col].dataType),
            T.StructField("nbr_id", corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
        return corpus.sparkSession.createDataFrame([], T.StructType(empty))
    qids = [r["query_id"] for r in qrows]
    qmat = np.array([r["qv"] for r in qrows], dtype="float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0.0] = 1.0
    qmat = qmat / qnorm[:, None]
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[query_id_col].dataType),
        T.StructField("nbr_id", corpus.schema[id_col].dataType),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        import pandas as pd

        ids, qm = bc.value
        nq = len(ids)
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.array(pdf["cv"].tolist(), dtype="float64")
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0.0] = 1.0
            sims = (cmat / cnorm[:, None]) @ qm.T  # B×Q
            nbrs = pdf["nbr_id"].to_numpy()
            res_q, res_n, res_s = [], [], []
            for j in range(nq):
                col = sims[:, j]
                mask = nbrs != ids[j]  # self-match exclusion
                cand = np.flatnonzero(mask)
                if len(cand) > k:
                    part = cand[np.argpartition(-col[cand], k - 1)[:k]]
                else:
                    part = cand
                res_q.extend([ids[j]] * len(part))
                res_n.extend(nbrs[part].tolist())
                res_s.extend(col[part].tolist())
            yield pd.DataFrame(
                {"query_id": res_q, "nbr_id": res_n, "cosine": res_s})

    c = corpus.select(F.col(id_col).alias("nbr_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = c.mapInPandas(score, out_schema)
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


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 quantization — the 4× storage/bandwidth
    compression step of an embedding index (scale = max|x| / 127,
    q = floor(x/scale + 0.5)).

    Every arithmetic step is expressed in double with a fixed evaluation
    order (cast → scale → round-half-up via floor) so the DuckDB oracle
    reproduces the integers exactly. Appends: qvec array<int> in
    [-127, 127], scale, and reconstruction diagnostics (max_abs_err,
    cos_recon — cosine between the original and dequantized vector).

    Map-only pass, no shuffle. At scale the quantized index is what ships
    to the ANN serving tier; the interpreted-HOF cost here is fine for a
    write-path operator, and the numpy Arrow kernel pattern
    (_cosine_topk_numpy) is the drop-in if it ever sits on a read path.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(vd, F.abs))
    scale = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs / 127)
    base = (df.select(id_col, F.col(vec_col))
            .withColumn("__vd", vd)
            .withColumn("scale", scale))
    q = F.transform(F.col("__vd"),
                    lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"))
    out = base.withColumn("qvec", q)
    dq = F.transform(F.col("qvec"), lambda x: x * F.col("scale"))
    err = F.array_max(
        F.zip_with(F.col("__vd"), dq, lambda a, b: F.abs(a - b)))
    cos = (dot_expr(F.col("__vd"), dq)
           / (norm_expr(F.col("__vd")) * norm_expr(dq)))
    return (out.withColumn("max_abs_err", err)
            .withColumn("cos_recon", cos)
            .drop("__vd", vec_col))


def mean_pool_embeddings(df: DataFrame, group_col: str,
                         vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean of each group's vectors — chunk→document pooling
    (documents are embedded per chunk; retrieval wants one doc vector).

    Output: (group_col, pooled array<double>).

    Plan: posexplode to (group, pos, value) — whole-stage codegen — then
    ONE (group, pos)-keyed partial-aggregated avg, then reassembly of the
    KB-sized per-group result via sorted collect_list. The (group, pos)
    shuffle is dim× the row count in *rows* but identical bytes to
    shuffling the vectors themselves, and partial aggregation collapses
    it map-side; no interpreted per-element fold ever touches the full
    corpus. For dims ≥ ~1k an Arrow `applyInPandas` kernel (numpy
    column-mean per group) becomes the better trade — same single
    shuffle, vectorized reassembly.
    """
    pos = df.select(F.col(group_col).alias("g"),
                    F.posexplode(F.col(vec_col)).alias("pos", "v"))
    agg = pos.groupBy("g", "pos").agg(F.avg("v").alias("m"))
    return (agg.groupBy("g")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("pooled"))
            .withColumnRenamed("g", group_col))


def _quantized_rerank_fused(corpus: DataFrame, queries: DataFrame,
                            k: int, n_candidates: int,
                            id_col: str, vec_col: str) -> DataFrame:
    """Single-pass kernel for :func:`quantized_rerank_topk`: quantize,
    coarse-score and exact-rerank inside ONE Arrow batch visit — the
    full-precision vectors are already in hand during the scan, so no
    candidate→corpus rejoin exists at all. Emits ≤ Q·n_candidates rows
    per batch carrying BOTH scores; two same-key windows (one exchange)
    pick the global candidate set by coarse score, then top-k by exact.

    Bit-exactness contract with the SQL oracle: quantization
    (max/127 scale, floor(x/scale+0.5)) is single-IEEE-op identical;
    coarse scores select candidates only (value order matches to float64
    rounding, ties broken by nbr_id in the global window); the exact
    cosine is folded SEQUENTIALLY in float64 — same term order as the
    SQL list_sum fold — so output values hash-match, not just
    approximate.
    """
    import math

    import numpy as np

    spark = corpus.sparkSession
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("query_id", id_type),
        T.StructField("nbr_id", id_type),
        T.StructField("coarse", T.DoubleType()),
        T.StructField("cosine", T.DoubleType()),
    ])
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv")).collect()
    if not qrows:
        return spark.createDataFrame([], out_schema).drop("coarse")
    qids = [r["query_id"] for r in qrows]
    qvecs = [list(r["qv"]) for r in qrows]
    qmat = np.asarray(qvecs, dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    qunit = qmat / qn[:, None]

    def _seq_norm(v):
        s = 0.0
        for a in v:
            s += a * a
        return math.sqrt(s)

    qnorms = [_seq_norm(v) for v in qvecs]
    bc = spark.sparkContext.broadcast((qids, qunit, qvecs, qnorms))

    def kern(batches):
        import pandas as pd

        ids, qu, qvs, qns = bc.value
        nq = len(ids)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
            nbrs = pdf["__id"].to_numpy()
            m = np.abs(x).max(axis=1)
            scale = np.where(m == 0.0, 1.0, m / 127)
            codes = np.floor(x / scale[:, None] + 0.5)
            cn = np.linalg.norm(codes, axis=1)
            cn[cn == 0.0] = 1.0
            sims = (codes / cn[:, None]) @ qu.T  # B×Q coarse scores
            rq, rn, rc, re = [], [], [], []
            for j in range(nq):
                col = sims[:, j]
                cand = np.flatnonzero(nbrs != ids[j])
                if len(cand) > n_candidates:
                    cand = cand[np.argpartition(
                        -col[cand], n_candidates - 1)[:n_candidates]]
                qv, qnm = qvs[j], qns[j]
                for i in cand:
                    xi = x[i]
                    dot, ss = 0.0, 0.0
                    for a, b in zip(xi, qv):
                        dot += a * b
                    for a in xi:
                        ss += a * a
                    rq.append(ids[j])
                    rn.append(nbrs[i])
                    rc.append(float(col[i]))
                    re.append(dot / (math.sqrt(ss) * qnm))
            yield pd.DataFrame({"query_id": rq, "nbr_id": rn,
                                "coarse": rc, "cosine": re})

    prepared = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"))
    scored = prepared.mapInPandas(kern, out_schema)
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("coarse").desc(), F.col("nbr_id").asc())
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc())
    return (scored.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= n_candidates)
            .withColumn("__r2", F.row_number().over(w2))
            .where(F.col("__r2") <= k)
            .drop("__r1", "__r2", "coarse"))


def quantized_rerank_topk(corpus: DataFrame, queries: DataFrame,
                          k: int = 10, n_candidates: int = 50,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          kernel: str = "fused") -> DataFrame:
    """Two-stage retrieval: int8-quantized coarse scan → exact rerank.

    Stage 1 scores the full corpus on its int8 codes (cosine is
    scale-invariant, so the per-vector quantization scale cancels and the
    coarse pass reads 4× less than full-precision floats — at 100 TB the
    quantized index is what streams off storage) and keeps
    ``n_candidates`` per query. Stage 2 rejoins ONLY the candidates to
    their full-precision vectors by id and reranks with exact cosine.

    Every step is deterministic (round-half-up quantization, id
    tie-breaks), so unlike PQ/IVF the whole two-stage pipeline is
    oracle-checkable — and with n_candidates ≫ k the output matches the
    exact brute force whenever the quantization error doesn't reorder
    past the candidate margin.

    ``kernel`` picks the implementation: "fused" (default) does
    quantize + coarse score + exact rerank in ONE corpus pass — no
    candidate→corpus rejoin, one exchange for both windows (see
    :func:`_quantized_rerank_fused`); "numpy" composes the two stages
    with the Arrow/BLAS coarse scan; "hof" keeps the interpreted
    Catalyst fold (no Python dependency at all).
    """
    if n_candidates < k:
        raise ValueError(f"n_candidates {n_candidates} < k {k}")
    if kernel == "fused":
        return _quantized_rerank_fused(corpus, queries, k, n_candidates,
                                       id_col, vec_col)
    # Lean quantization: same scale/round-half-up arithmetic as
    # quantize_int8 but WITHOUT its reconstruction diagnostics (several
    # extra interpreted array folds the coarse scan never reads).
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(vd, F.abs))
    scale = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs / 127)
    coarse_corpus = corpus.select(
        F.col(id_col),
        F.transform(vd, lambda x: F.floor(x / scale + 0.5).cast("int"))
        .alias(vec_col))  # int codes; both kernels cast natively
    cands = cosine_topk(coarse_corpus, queries, k=n_candidates,
                        id_col=id_col, vec_col=vec_col, kernel=kernel)
    full = corpus.select(F.col(id_col).alias("nbr_id"),
                         F.col(vec_col).cast("array<double>").alias("__cv"))
    qside = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("__qv"))
    # Candidates are Q·n_candidates rows — broadcast them so the
    # full-precision corpus streams through a broadcast hash join
    # (never shuffles), at sf0.1 and at 100 TB alike.
    exact = (full.join(F.broadcast(cands.select("query_id", "nbr_id")),
                       "nbr_id")
             .join(F.broadcast(qside), "query_id")
             .select("query_id", "nbr_id",
                     cosine_expr(F.col("__qv"), F.col("__cv"))
                     .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc())
    return (exact.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k).drop("__rk"))


def train_pq_codebooks(corpus: DataFrame, m: int = 8, k: int = 16,
                       sample_n: int = 256, iters: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> list:
    """Train product-quantization codebooks: split dims into ``m``
    subspaces, k-means (``iters`` Lloyd steps) per subspace over a
    deterministic sample (lowest ``sample_n`` ids, init = first ``k``
    sample subvectors). Returns [m][k][dim/m] float lists.

    Only the KB-sized sample is collected; training is driver-side numpy
    in a fixed order, so codebooks are bit-stable run over run. At 100 TB
    the sample is still KBs — PQ training cost does not scale with the
    corpus.
    """
    import numpy as np

    # Sample the sample_n lowest ids by ORDER BY ... LIMIT, not an
    # id-value predicate: sparse or offset id spaces would make
    # `id < sample_n` select almost nothing (ADVICE r4).
    rows = (corpus.select(id_col, vec_col)
            .orderBy(id_col).limit(sample_n).collect())
    if len(rows) < k:
        raise ValueError(
            f"PQ training needs >= k={k} sample vectors, got {len(rows)}")
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m {m}")
    sub = d // m
    books = []
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cents = xs[:k].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_encode(corpus: DataFrame, codebooks: list,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode vectors to (id, codes array<int>): per subspace, the index
    of the nearest codebook centroid. Arrow mapInPandas with one numpy
    distance matrix per (batch, subspace) — the 64-dim float vector
    compresses to m bytes (here 8), a 32× index shrink.
    """
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    cents = [np.asarray(b, dtype=np.float64) for b in codebooks]

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([list(v) for v in pdf[vec_col]],
                           dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub:(j + 1) * sub]
                d2 = ((xs[:, None, :] - cents[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"nbr_id": pdf[id_col].values,
                                "codes": list(codes.tolist())})

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, "nbr_id long, codes array<int>")


def pq_topk(encoded: DataFrame, codebooks: list, query_vec: list,
            k: int = 10) -> DataFrame:
    """ADC top-k over PQ codes: the query's per-subspace distance lookup
    tables (m×k floats, computed driver-side) are embedded as literal
    arrays; each row's approximate squared L2 is
    ``sum_j lut[j][code_j]`` — pure codegen arithmetic over an m-byte
    code, no vector data touched. Output (nbr_id, approx_d2) ascending.
    """
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    q = np.asarray(query_vec, dtype=np.float64)
    score = None
    for j in range(m):
        qs = q[j * sub:(j + 1) * sub]
        lut = [float(((np.asarray(c) - qs) ** 2).sum())
               for c in codebooks[j]]
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut]),
            F.col("codes").getItem(j) + 1)
        score = term if score is None else score + term
    return (encoded.select("nbr_id", score.alias("approx_d2"))
            .orderBy(F.col("approx_d2").asc(), F.col("nbr_id").asc())
            .limit(k))


def fixed_pq_codebooks(m: int, k: int, sub: int, seed: int = 11) -> list:
    """Deterministic literal PQ codebooks (seeded Gaussian, no training)
    — the oracle-checkable twin of :func:`train_pq_codebooks`. The same
    Python float objects are embedded as literals in both the Catalyst
    plan and the DuckDB replay SQL, so the encode argmin and the ADC sum
    are replayable bit-for-bit. Trained codebooks remain the quality
    path (recall pytest)."""
    rng = random.Random(seed)
    return [[[rng.gauss(0.0, 1.0) for _ in range(sub)]
             for _ in range(k)] for _ in range(m)]


def pq_encode_literal(corpus: DataFrame, codebooks: list,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Pure-Catalyst PQ encode for literal codebooks: per subspace an
    argmin over k literal-centroid squared-L2 distances, each distance a
    LEFT-ASSOCIATED ``+`` chain of ``diff*diff`` terms so the float op
    order matches the SQL replica exactly — argmin (and therefore the
    emitted code) is bit-identical across engines, not just close.
    Ties take the lowest centroid index via a (d, i) struct-min,
    mirroring numpy's and DuckDB list_position's first-min semantics.

    No Python anywhere in the encode path: at 100 TB this is the scale
    winner over the Arrow-kernel :func:`pq_encode` — the whole encode
    runs inside whole-stage codegen, nothing leaves the JVM."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        dists = []
        for cent in book:
            term = None
            for i, c in enumerate(cent):
                diff = F.col(vec_col).getItem(j * sub + i) - F.lit(float(c))
                t = diff * diff
                term = t if term is None else term + t
            dists.append(term)
        arr = F.array(*[F.struct(d.alias("d"), F.lit(i).alias("i"))
                        for i, d in enumerate(dists)])
        codes.append(F.array_min(arr).getField("i"))
    return corpus.select(F.col(id_col).alias("nbr_id"),
                         F.array(*codes).alias("codes"))


def bucket_membership_delta(changelog: DataFrame, bits: int = 8,
                            seed: int = 42, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            seq_col: str = "__seq",
                            op_col: str = "__op") -> DataFrame:
    """One embedding-changelog batch's ANN-bucket deltas:
    (bucket, vec_id, seq, sign) — +1 for entering images, -1 for leaving
    ones; the bucket is the seeded hyperplane LSH cell of the image's
    vector, so an update whose vector moved emits a retraction from the
    old cell and an insertion into the new one."""
    sign = (F.when(F.col(op_col).isin("+I", "+U"), 1)
            .when(F.col(op_col).isin("-D", "-U"), -1).otherwise(0))
    return changelog.select(
        random_hyperplane_bucket(F.col(vec_col), bits, seed).alias("bucket"),
        F.col(id_col).alias("vec_id"),
        F.col(seq_col).cast("long").alias("seq"),
        sign.alias("sign"))


def bucket_membership_view(state: DataFrame) -> DataFrame:
    """Maintained state → per-bucket (n_vectors, members ascending) —
    identical to bucketing the net vector set from scratch (the
    maintenance invariant; hash-checked against the SQL rebuild)."""
    return state.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.sort_array(F.collect_list("vec_id")).alias("members"))


def random_projection(df: DataFrame, out_dim: int, seed: int = 7,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      in_dim: int = 64) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project onto
    ``out_dim`` seeded random unit vectors (× sqrt(in/out) to make
    distances unbiased). The planes are pure constants, so the whole
    projection is Catalyst dot-product arithmetic — oracle-checkable,
    shuffle-free, and the same constants reproduce on any engine.
    Output: (id, projected array<double>).
    """
    import math

    planes = _seeded_unit_vectors(out_dim, in_dim, seed)
    # unit-norm planes: E[(v·p)^2] = |v|^2 / in_dim, so sqrt(in/out)
    # makes the projected squared norm unbiased for |v|^2
    scale = math.sqrt(in_dim / out_dim)
    comps = [
        (dot_expr(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p]))
         * F.lit(scale)).alias(f"__p{i}")
        for i, p in enumerate(planes)
    ]
    return df.select(F.col(id_col), *comps).select(
        id_col,
        F.array(*[F.col(f"__p{i}") for i in range(out_dim)])
        .alias("projected"))


def rrf_fuse(ranked: list, id_col: str = "id", k: int = 60,
             top: int = 15):
    """Reciprocal-rank fusion of N rankers (the standard hybrid-search
    combiner: score(d) = Σ_r 1/(k + rank_r(d)) — rank-based, so
    incomparable scores like BM25 vs cosine fuse without calibration).

    Inputs are (id, rank) frames — each ranker's top-k only, so every
    side of the fusion is candidate-sized (≤ k rows), the full outer
    joins are trivially broadcast, and the 100 TB corpus is touched
    only inside each ranker. Ties break on id ascending — the fused
    top-``top`` is deterministic. Returns (id, rank_0..rank_{N-1},
    rrf_score)."""
    from functools import reduce

    from pyspark.sql import Window

    outs = []
    for i, df in enumerate(ranked):
        outs.append(df.select(F.col(id_col),
                              F.col("rank").alias(f"rank_{i}")))
    fused = reduce(lambda a, b: a.join(b, id_col, "full"), outs)
    score = reduce(
        lambda a, b: a + b,
        [F.coalesce(F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i}")),
                    F.lit(0.0))
         for i in range(len(ranked))])
    w = Window.orderBy(F.col("__rrf").desc(), F.col(id_col).asc())
    return (fused.withColumn("__rrf", score)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= top)
            .select(id_col, *[f"rank_{i}" for i in range(len(ranked))],
                    F.round("__rrf", 6).alias("rrf_score")))


def ann_recall(exact: DataFrame, approx: DataFrame,
               query_col: str = "query_id", nbr_col: str = "nbr_id",
               k: int = 10) -> DataFrame:
    """Retrieval-quality evaluation of an ANN index against its exact
    twin: per query, recall@k (|approx ∩ exact| / k) and MRR (the
    reciprocal rank of the FIRST approx result that is exact-relevant)
    — the metric pair an index rollout gates on ('is n_probe=4 good
    enough?') computed from two candidate lists, never the corpus.

    Both inputs are (query, nbr, cosine) top-k frames, so every join
    and window here runs on Q·k rows — evaluation cost is independent
    of corpus size. Ranks tie-break (cosine DESC, nbr ASC) so the
    metrics are deterministic. Queries with zero overlap drop out
    (inner join) — at recall 0 there is no rank to report."""
    w = Window.partitionBy(query_col).orderBy(
        F.col("cosine").desc(), F.col(nbr_col).asc())
    ar = approx.withColumn("__ar", F.row_number().over(w)) \
        .select(query_col, nbr_col, "__ar")
    ex = exact.select(query_col, nbr_col)
    hits = ar.join(ex, [query_col, nbr_col])
    return hits.groupBy(query_col).agg(
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.count("*") / F.lit(float(k)), 6).alias(f"recall_at_{k}"),
        F.round(F.lit(1.0) / F.min("__ar"), 6).alias("mrr"))


def kmeans(corpus: DataFrame, k: int = 8, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           round_scale: int = 12, dist_scale: int = 9
           ) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd k-means over an embedding column. Returns
    (assignment DataFrame (id, cluster, dist), final centroids) — the
    topic-clustering primitive corpus curation uses for diversity
    sampling and per-cluster quality cuts.

    Determinism contract (what makes an iterative float algorithm
    hash-checkable across engines, same discipline as graph.pagerank):
    - init centroids = the embeddings of the ``k`` smallest ids
      (exactly replayable in SQL; no RNG);
    - per-row assignment = argmin over squared L2 distance computed as
      a LEFT FOLD in index order, ROUNDED to ``dist_scale`` decimals,
      ties broken by centroid id;
    - per-iteration centroid update = per-dimension mean ROUNDED to
      ``round_scale`` decimals (sum-order 1-ulp wobble cannot
      compound across iterations); empty clusters keep their previous
      centroid.

    Scale shape: assignment is pure codegen against LITERAL centroids
    (k x dim doubles baked into the plan — no join, no shuffle); the
    update is ONE posexplode + groupBy(cluster, dim) partial-agg
    shuffle per iteration; only the k x dim centroid table (KB) ever
    reaches the driver, identical to :func:`refine_centroids`."""
    # persisted: the frame is scanned iters+2 times (init, per-iteration
    # update, final assignment) — cache instead of re-reading parquet
    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v")) \
        .transform(pin)
    init = v.orderBy("id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"kmeans needs >= {k} rows, got {len(init)}")
    cents = [[float(x) for x in r["v"]] for r in init]

    def _assign(cents_):
        # ONE lambda applied over a literal array-of-centroids: the
        # distance fold is compiled once, not k times — same semantics,
        # ~k-fold smaller codegen (the k-copies variant spent ~1s per
        # job just compiling at k=8, dim=64)
        return _kmeans_argmin(cents_, dist_scale)

    for _ in range(iters):
        assigned = v.withColumn("cluster", _assign(cents)["i"])
        means = (assigned.select("cluster",
                                 F.posexplode("v").alias("i", "x"))
                 .groupBy("cluster", "i")
                 .agg(F.round(F.avg("x"), round_scale).alias("m"))
                 .collect())
        new = [list(c) for c in cents]
        for r in means:
            new[r["cluster"]][r["i"]] = r["m"]
        cents = new

    best = _assign(cents)
    out = v.select(
        F.col("id"),
        best["i"].alias("cluster"),
        F.round(best["d"], 6).alias("dist"))
    return out, cents


def kmeans_state_from_batch(batch: DataFrame, cents: list[list[float]],
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dist_scale: int = 9,
                            sum_scale: int = 9) -> DataFrame:
    """Assign one batch against FIXED centroids and collapse it to the
    linear-mergeable k-means sufficient statistics: (cluster, i, n, s)
    rows — per-cluster member count and per-dimension coordinate sum.
    One posexplode partial-agg shuffle; output is k x dim rows."""
    v = batch.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    assigned = v.withColumn("cluster", _kmeans_argmin(cents, dist_scale)["i"])
    return (assigned.select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("x"), sum_scale).alias("s")))


def kmeans_merge_state(state: DataFrame, delta: DataFrame,
                       sum_scale: int = 9) -> DataFrame:
    """Fold a batch's sufficient statistics into the running state —
    pure linear merge (n+n, s+s), the same mergeable-summary shape as
    the sketch folds, so at-least-once replay is handled by the caller
    exactly like make_sketch_sink_writer handles it. k x dim rows."""
    u = state.unionByName(delta)
    return (u.groupBy("cluster", "i")
            .agg(F.sum("n").cast("long").alias("n"),
                 F.round(F.sum("s"), sum_scale).alias("s")))


def kmeans_centroids_of(state_rows, prev: list[list[float]],
                        round_scale: int = 12) -> list[list[float]]:
    """State rows -> centroid table (sum/count per dimension, rounded);
    clusters with no members keep their previous centroid."""
    new = [list(c) for c in prev]
    for r in state_rows:
        if r["n"]:
            new[r["cluster"]][r["i"]] = round(r["s"] / r["n"],
                                              round_scale)
    return new


def _kmeans_argmin(cents_: list[list[float]], dist_scale: int):
    carr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents_])
    return F.array_min(F.transform(
        carr,
        lambda c, i: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), c,
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x),
                dist_scale).alias("d"),
            i.cast("int").alias("i"))))


def embedding_covariance(corpus: DataFrame, vec_col: str = "embedding",
                         dim: int = 64) -> DataFrame:
    """Distributed covariance matrix of the embedding corpus — the
    one-pass gram-partial shape (the preprocessing behind PCA
    whitening, OOD scoring, and drift detection on embedding spaces):
    each Arrow batch computes its LOCAL (count, coordinate-sum, X'X
    gram) with one BLAS matmul; partials are LINEARLY mergeable, so the
    shuffle carries d(d+1)/2 + d + 1 numbers per batch — independent of
    corpus size — and cov(i,j) = E[x_i x_j] - E[x_i]E[x_j] assembles
    from the merged sums. Returns the upper triangle (i, j, cov),
    population normalization, rounded at 6."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["v"].tolist(), dtype="float64")
            g = X.T @ X
            s = X.sum(axis=0)
            i_ = np.concatenate([iu[0], np.arange(dim), [-1]])
            j_ = np.concatenate([iu[1], np.full(dim, -1), [-1]])
            val = np.concatenate([g[iu], s, [float(len(X))]])
            yield pd.DataFrame({"i": i_.astype("int32"),
                                "j": j_.astype("int32"), "s": val})

    v = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    # persisted: n / means / gram all branch off this KB-sized frame —
    # without the cache every branch re-runs the corpus scan + kernel
    merged = (v.mapInPandas(partials, "i int, j int, s double")
              .groupBy("i", "j").agg(F.sum("s").alias("s"))
              .transform(pin))
    n = merged.where((F.col("i") == -1) & (F.col("j") == -1)) \
        .select(F.col("s").alias("n"))
    means = merged.where((F.col("i") >= 0) & (F.col("j") == -1)) \
        .select(F.col("i").alias("mi"), F.col("s").alias("ms"))
    gram = merged.where(F.col("j") >= 0)
    mi = means.select(F.col("mi").alias("i"), F.col("ms").alias("si"))
    mj = means.select(F.col("mi").alias("j"), F.col("ms").alias("sj"))
    return (gram.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
            .crossJoin(F.broadcast(n))
            .select("i", "j",
                    F.round(F.col("s") / F.col("n")
                            - (F.col("si") / F.col("n"))
                            * (F.col("sj") / F.col("n")), 6)
                    .alias("cov")))


def top_pc_projection(corpus: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", dim: int = 64,
                      iters: int = 3) -> DataFrame:
    """Projection of every vector onto the corpus's TOP PRINCIPAL
    COMPONENT — the strongest drift/OOD axis and the first step of
    whitening. Pipeline: distributed covariance (gram partials, see
    :func:`embedding_covariance`) -> power iteration on the KB-sized
    64x64 matrix (driver arithmetic, same bounded-collect class as
    centroid tables) -> DISTRIBUTED projection of the corpus onto the
    literal eigenvector (codegen fold, no shuffle).

    Determinism contract (pagerank discipline): matvec components and
    normalized components round at 12 per iteration from the
    6-rounded covariance entries, init = uniform 1/sqrt(dim); an SQL
    replica replays every iteration exactly."""
    import math

    cov_rows = embedding_covariance(corpus, vec_col, dim).collect()
    C = [[0.0] * dim for _ in range(dim)]
    for r in cov_rows:
        C[r["i"]][r["j"]] = r["cov"]
        C[r["j"]][r["i"]] = r["cov"]
    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(iters):
        w = [round(sum(C[i][j] * v[j] for j in range(dim)), 12)
             for i in range(dim)]
        n = math.sqrt(sum(x * x for x in w)) or 1.0
        v = [round(x / n, 12) for x in w]
    pc = F.array(*[F.lit(x) for x in v])
    vv = corpus.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
    proj = F.aggregate(F.zip_with(F.col("v"), pc, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)
    return vv.select("vec_id", F.round(proj, 6).alias("pc_score"))


def maxsim_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                doc_col: str = "doc_id", vec_col: str = "embedding",
                query_vec_col: str = "embedding",
                kernel: str = "numpy") -> DataFrame:
    """ColBERT-style late-interaction retrieval: every document is a BAG
    of token vectors, the query is a bag of token vectors, and the score
    is MaxSim — Σ over query tokens of the best cosine against any of
    the document's tokens. The multi-vector ranking function behind
    modern retrieval stacks, as a pure DataFrame plan.

    Scale shape: the query bag broadcasts (Q·dim floats — KBs); the
    corpus token table NEVER shuffles at token grain — the per-(doc,
    query-token) max and the per-doc sum are both partial-aggregating
    groupBys, so the only exchanged rows are doc-grain partials, and the
    final top-k is a TakeOrderedAndProject over doc-grain scores. Linear
    in |corpus tokens| × |query tokens| — the canonical MaxSim scan.

    Determinism contract: cosines fold in index order (`cosine_expr`),
    per-pair maxes round at 6 and accumulate as DECIMAL(18,6), so the
    per-doc sum is exact and order-independent — a SQL oracle replays
    the whole ranking hash-exactly. Returns (doc, score, n_q_tokens)
    top-k by (score desc, doc asc)."""
    c = corpus.select(F.col(doc_col).alias("doc"),
                      F.col(vec_col).cast("array<double>").alias("dv"))
    # the query bag is collected (it is broadcast-sized by definition)
    # and re-emitted with deterministic token ids — a
    # monotonically_increasing_id would be partition-dependent
    qrows = [r["qv"] for r in queries.select(
        F.col(query_vec_col).cast("array<double>").alias("qv")).collect()]
    spark = corpus.sparkSession
    if kernel == "numpy":
        # Arrow/BLAS hot path: one (B x dim) @ (dim x Q) matmul per
        # batch + a per-(doc-in-batch, qt) max, emitting <= |docs in
        # batch| x Q partial rows — the global max then collapses the
        # batch partials (max is associative, rounding happens after
        # the FINAL max, so the result matches the HOF fold to float64
        # rounding like _cosine_topk_numpy does)
        import numpy as np

        qmat = np.array(qrows, dtype="float64")
        qn = np.linalg.norm(qmat, axis=1)
        qn[qn == 0.0] = 1.0
        qmat = qmat / qn[:, None]
        bc = spark.sparkContext.broadcast(qmat)

        def partials(batches):
            import pandas as pd

            qm = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                cmat = np.array(pdf["dv"].tolist(), dtype="float64")
                cn = np.linalg.norm(cmat, axis=1)
                cn[cn == 0.0] = 1.0
                sims = pd.DataFrame((cmat / cn[:, None]) @ qm.T)
                sims["doc"] = pdf["doc"].to_numpy()
                g = sims.groupby("doc", sort=False).max()
                m = g.reset_index().melt(
                    id_vars="doc", var_name="qt", value_name="cos")
                yield pd.DataFrame({
                    "doc": m["doc"], "qt": m["qt"].astype("int64"),
                    "cos": m["cos"].astype("float64")})

        scored = c.mapInPandas(partials, "doc long, qt long, cos double")
    elif kernel == "hof":
        q = spark.createDataFrame(
            [(i, v) for i, v in enumerate(qrows)],
            "qt long, qv array<double>")
        scored = (c.crossJoin(F.broadcast(q))
                  .select("doc", "qt",
                          cosine_expr(F.col("qv"), F.col("dv"))
                          .alias("cos")))
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    per_qt = (scored.groupBy("doc", "qt")
              .agg(F.round(F.max("cos"), 6).cast("decimal(18,6)")
                   .alias("best")))
    per_doc = (per_qt.groupBy("doc")
               .agg(F.sum("best").alias("score"),
                    F.count("*").cast("long").alias("n_q_tokens")))
    return (per_doc.orderBy(F.col("score").desc(), F.col("doc").asc())
            .limit(k))


KNN_JOIN_TARGET_BUCKET = 8  # expected vectors per LSH bucket (auto bits)


def knn_join_auto_bits(n: int, target_bucket: int = KNN_JOIN_TARGET_BUCKET
                       ) -> int:
    """Bucket-width rule for a corpus of ``n`` vectors: enough
    hyperplane bits that the EXPECTED bucket occupancy stays at
    ``target_bucket``, so per-table self-join work is
    O(T · N · target_bucket) — linear in N — instead of the
    O(T · N²/2^bits) quadratic a FIXED bits value degrades to as the
    corpus grows. Floor of 4 bits keeps tiny corpora from collapsing
    into one bucket."""
    import math

    return max(4, math.ceil(math.log2(max(n, 2) / target_bucket)))


def lsh_candidate_pairs(corpus: DataFrame, bits: int | None = 6,
                        seeds: tuple = (42, 137, 271),
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Shared candidate generator for the LSH self-join family
    (:func:`knn_join`, :func:`range_search`): distinct directed pairs
    (src, nbr, cosine) that collide in ANY of ``len(seeds)`` independent
    sign-bucket hyperplane tables, each verified by one exact cosine.

    Each table is an equi-join on (bucket) — candidate generation is
    always bucket-local, never all-pairs; expected candidates per vector
    ~ T·N/2^bits. Deterministic end-to-end: seeded planes are literals
    both engines share, and the dot is a linear fold over unit-normalized
    vectors so an oracle replaying the same fold agrees bit-for-bit.

    ``bits=None`` derives the bucket width from the corpus size
    (knn_join_auto_bits: constant expected occupancy, so candidate
    work stays LINEAR in N — the setting to use at scale; conformance
    queries pin bits so their static oracles replay the same planes).

    Identical-vector clusters are the input auto-bits cannot defend
    against (identical vectors collide at ANY bit width): they are
    collapsed to one representative per distinct vector BEFORE the
    bucketed self-joins — the collapse is a skew-immune map-side-combine
    groupBy on the vector value — and re-expanded into the directed pair
    output afterwards, intra-cluster pairs carrying the representative's
    self-cosine (the bit-exact value the naive pair fold yields for two
    equal unit vectors). Candidate + verify work is linear in cluster
    size; output semantics are exactly the naive ones."""
    v0 = corpus.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("e"))
    # duplicate-mass gate (same rule as dedup._collapse_identical_docs):
    # the collapse is a pure perf defense — identical vectors collide in
    # every table and verify at their exact self-cosine natively, so the
    # direct pipeline is output-identical. Engage only when the extra
    # candidate rows duplicates would inject (Σ m·(m−1) over cluster
    # sizes, computed over 64-bit vector hashes — collisions can only
    # OVERSTATE the mass, erring toward engaging) exceed the
    # corpus-linear term. The probe runs on the raw projection (one
    # partial-aggregated scan, only hashes shuffle); nothing is pinned
    # unless the collapse engages — on the common duplicate-free corpus
    # the only extra cost is that one probe scan, and the normalize/
    # bucket pipeline is pinned downstream anyway.
    stats = (v0.groupBy(F.xxhash64("e").alias("__h"))
             .agg(F.count(F.lit(1)).alias("m"))
             .agg(F.sum("m").alias("n"),
                  F.sum(F.col("m") * (F.col("m") - 1)).alias("dup_mass"))
             .first())
    if not stats["n"] or stats["dup_mass"] <= stats["n"]:
        # (empty corpus: the sums are NULL — take the direct path)
        members = None
        v = v0
        n_reps = stats["n"] or 0
    else:
        # identical-vector collapse (VERDICT r7 #1): one rep per distinct
        # vector value (exact grouping on the array — no hash truncation).
        # v0 pinned here: the groupBy and the membership join both read
        # it (the r8 double-scan), and on this path the pin is amortized.
        v0 = v0.transform(pin)
        reps = (v0.groupBy("e").agg(F.min("id").alias("id"))
                .select("id", "e").transform(pin))
        members = (v0.join(reps.select(F.col("e"),
                                       F.col("id").alias("__rep")), "e")
                   .select("id", "__rep")
                   .transform(pin))
        v = reps
        n_reps = reps.count()
    if bits is None:
        bits = knn_join_auto_bits(n_reps)
    for i, s in enumerate(seeds):
        v = v.withColumn(f"__b{i}",
                         random_hyperplane_bucket(F.col("e"), bits,
                                                  seed=s))
    # unit-normalize ONCE per vector (O(N·dim)) so each candidate pair
    # costs a single dot fold instead of dot + two norms — the per-pair
    # HOF work is the dominant term (|candidates| ≫ N), measured 3x
    nrm = norm_expr(F.col("e"))
    v = v.withColumn("u", F.transform(F.col("e"),
                                      lambda x: x / nrm)).drop("e")
    # checkpointed: each of the T self-joins reads both sides of this
    # frame; blocks are GC-reclaimed with the result (cache-scope rule)
    v = v.transform(pin)
    pairs = None
    for i in range(len(seeds)):
        a = v.alias("a")
        b = v.alias("b")
        p = (a.join(b.hint("SHUFFLE_HASH"),
                    (F.col(f"a.__b{i}") == F.col(f"b.__b{i}"))
                    & (F.col("a.id") != F.col("b.id")))
             .select(F.col("a.id").alias("src"),
                     F.col("b.id").alias("nbr"),
                     dot_expr(F.col("a.u"), F.col("b.u"))
                     .alias("cosine")))
        pairs = p if pairs is None else pairs.unionByName(p)
    rep_pairs = pairs.distinct()
    if members is None:
        # no identical vectors existed: rep pairs ARE the member pairs
        return rep_pairs
    # re-expansion: cross-cluster pairs inherit the rep pair's cosine
    # (members equal their rep, so the naive fold gives the same bits);
    # intra-cluster DIRECTED pairs carry the rep's self-cosine — the
    # identical dot_expr(u, u) linear fold, NOT a literal 1.0 (float
    # rounding makes ||u||² ≈ 1, and the oracle replays the same fold).
    # Rows are unique by construction (clusters disjoint, rep_pairs
    # distinct), so no distinct runs over the expanded set.
    selfc = v.select(F.col("id").alias("__r"),
                     dot_expr(F.col("u"), F.col("u")).alias("cosine"))
    ms = members.select(F.col("__rep").alias("src"),
                        F.col("id").alias("__ms"))
    mn = members.select(F.col("__rep").alias("nbr"),
                        F.col("id").alias("__mn"))
    cross = (rep_pairs.join(ms, "src").join(mn, "nbr")
             .select(F.col("__ms").alias("src"),
                     F.col("__mn").alias("nbr"), "cosine"))
    x, y = members.alias("x"), members.alias("y")
    intra = (x.join(y, (F.col("x.__rep") == F.col("y.__rep"))
                    & (F.col("x.id") != F.col("y.id")))
             .join(selfc, F.col("x.__rep") == F.col("__r"))
             .select(F.col("x.id").alias("src"),
                     F.col("y.id").alias("nbr"), "cosine"))
    return cross.unionByName(intra)


def knn_join(corpus: DataFrame, k: int = 5, bits: int | None = 6,
             seeds: tuple = (42, 137, 271), id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate kNN SELF-join: every vector's top-k neighbors among
    LSH-bucket collisions — the all-corpus companion of `cosine_topk`
    (which serves a small query set) and the similarity-graph builder
    (kNN graphs for clustering, dedup families, link prediction).

    Candidates come from :func:`lsh_candidate_pairs` (bucket-local,
    never all-pairs), then a per-src window keeps top-k, ties breaking
    on nbr id. Returns (src, nbr, cosine, rank), rank 1..k per src. A
    vector with no collisions appears with no rows (the honest ANN
    semantics — raise `bits` tables, not fake neighbors)."""
    cand = lsh_candidate_pairs(corpus, bits=bits, seeds=seeds,
                               id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(),
                                          F.col("nbr").asc())
    return (cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k))


def range_search(corpus: DataFrame, threshold: float = 0.8,
                 bits: int | None = 6, seeds: tuple = (42, 137, 271),
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate RADIUS self-search: every directed pair with
    cosine >= ``threshold`` among LSH-bucket collisions — the
    fixed-threshold retrieval companion of :func:`knn_join` (top-k
    fixes the COUNT per vector; range search fixes the SIMILARITY bar,
    the semantics near-dup review queues and recall-bounded linking
    want).

    Same candidate generator, so the same scale story: bucket-local
    equi-joins, one exact cosine per distinct directed pair, and the
    threshold filter runs BEFORE any further shuffle — the output is
    match-proportional, not candidate-proportional. No window at all:
    unlike top-k there is no per-src ordering step, so the plan is
    join → filter, nothing else. Returns (src, nbr, cosine)."""
    cand = lsh_candidate_pairs(corpus, bits=bits, seeds=seeds,
                               id_col=id_col, vec_col=vec_col)
    return cand.where(F.col("cosine") >= F.lit(float(threshold)))
