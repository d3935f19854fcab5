"""HOF vs numpy cosine-topk kernels must agree row-for-row."""

from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators import similarity


def test_kernels_agree(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    hof = similarity.cosine_topk(emb, q, k=7, kernel="hof").collect()
    npk = similarity.cosine_topk(emb, q, k=7, kernel="numpy").collect()
    a = {(r["query_id"], r["nbr_id"]): r["cosine"] for r in hof}
    b = {(r["query_id"], r["nbr_id"]): r["cosine"] for r in npk}
    assert a.keys() == b.keys()
    for key, v in a.items():
        assert abs(v - b[key]) < 1e-9, (key, v, b[key])


def test_numpy_kernel_empty_queries(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 0)
    out = similarity.cosine_topk(emb, q, k=5, kernel="numpy")
    assert out.count() == 0
    assert out.columns == ["query_id", "nbr_id", "cosine"]


def test_numpy_kernel_excludes_self(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    out = similarity.cosine_topk(emb, q, k=5, kernel="numpy").collect()
    assert all(r["query_id"] != r["nbr_id"] for r in out)
    import pytest

    with pytest.raises(ValueError, match="kernel"):
        similarity.cosine_topk(emb, q, kernel="gpu")


def test_quantized_rerank_matches_exact_bruteforce(spark, sf_dir):
    """With a generous candidate margin the two-stage quantized pipeline
    must return exactly the exact brute-force top-k (int8 error cannot
    reorder past 5× margin on these vectors)."""
    from pyspark.sql import functions as F
    from flink_cdc_dsql_master_spark.operators.similarity import (
        cosine_topk, quantized_rerank_topk)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["nbr_id"]) for r in
             cosine_topk(emb, q, k=10).collect()}
    two_stage = {(r["query_id"], r["nbr_id"]) for r in
                 quantized_rerank_topk(emb, q, k=10,
                                       n_candidates=50).collect()}
    assert two_stage == exact


def test_pq_recall_against_exact_l2(spark, sf_dir):
    """PQ(m=8, k=16) ADC top-10 must recover most of the exact L2 top-10
    (recall >= 0.5 on random vectors — PQ with 5 Lloyd steps is far above
    that in practice) and must beat the random baseline (10/N) by an
    order of magnitude."""
    import numpy as np
    from pyspark.sql import functions as F
    from flink_cdc_dsql_master_spark.operators.similarity import (
        pq_encode, pq_topk, train_pq_codebooks)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=16, k=64, sample_n=256)
    enc = pq_encode(emb, books).persist()
    recs, rerank_recs = [], []
    rows = emb.where(F.col("vec_id") < 3).collect()
    all_v = {r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
             for r in emb.collect()}
    for qr in rows:
        qv = list(qr["embedding"])
        q = np.asarray(qv, dtype=np.float64)
        exact = sorted(all_v, key=lambda i: ((all_v[i] - q) ** 2).sum())
        exact10 = set(exact[:10]) - {qr["vec_id"]}
        got = {r["nbr_id"] for r in pq_topk(enc, books, qv, k=10).collect()}
        recs.append(len(got & exact10) / len(exact10))
        # ADC shortlist (50) + exact rerank — the standard PQ deployment
        cand = [r["nbr_id"] for r in
                pq_topk(enc, books, qv, k=50).collect()]
        rr = sorted(cand, key=lambda i: ((all_v[i] - q) ** 2).sum())[:10]
        rerank_recs.append(len(set(rr) & exact10) / len(exact10))
    enc.unpersist()
    assert sum(recs) / len(recs) >= 0.4          # raw ADC
    assert sum(rerank_recs) / len(rerank_recs) >= 0.75  # shortlist+rerank


def test_pq_codebooks_deterministic(spark, sf_dir):
    from flink_cdc_dsql_master_spark.operators.similarity import (
        train_pq_codebooks)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = train_pq_codebooks(emb, m=4, k=8, sample_n=64, iters=3)
    b2 = train_pq_codebooks(emb, m=4, k=8, sample_n=64, iters=3)
    assert b1 == b2


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: pairwise squared distances in the 16-dim projection
    approximate the 64-dim originals (median relative distortion well
    under 50% at this dim ratio)."""
    import numpy as np
    from pyspark.sql import functions as F
    from flink_cdc_dsql_master_spark.operators.similarity import (
        random_projection)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .where(F.col("vec_id") < 40)
    orig = {r["vec_id"]: np.asarray(list(r["embedding"]), dtype=np.float64)
            for r in emb.collect()}
    proj = {r["vec_id"]: np.asarray(list(r["projected"]), dtype=np.float64)
            for r in random_projection(emb, out_dim=16).collect()}
    dist = []
    ids = sorted(orig)
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = ((orig[a] - orig[b]) ** 2).sum()
        d1 = ((proj[a] - proj[b]) ** 2).sum()
        dist.append(abs(d1 - d0) / d0)
    assert np.median(dist) < 0.5


def test_rrf_fuse_semantics(spark):
    """A doc ranked well by BOTH rankers must outscore a doc ranked
    #1 by only one (the hybrid-search property RRF exists for);
    one-sided docs still appear with a single-term score."""
    from flink_cdc_dsql_master_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "id long, rank int")
    b = spark.createDataFrame(
        [(20, 1), (40, 2), (30, 3)], "id long, rank int")
    out = {r["id"]: r for r in rrf_fuse([a, b], "id", k=60, top=10)
           .collect()}
    # 20 is (2,1); 10 is (1,None): two-sided beats one-sided #1
    assert out[20]["rrf_score"] > out[10]["rrf_score"]
    assert out[30]["rrf_score"] > out[10]["rrf_score"]  # (3,3) too
    assert out[10]["rank_1"] is None and out[40]["rank_0"] is None
    assert abs(out[20]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-6


def test_ann_recall_metrics(spark):
    from flink_cdc_dsql_master_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
        "query_id long, nbr_id long, cosine double")
    # approx got 2 of 3; its best hit sits at rank 2
    approx = spark.createDataFrame(
        [(1, 99, 0.95), (1, 10, 0.9), (1, 12, 0.7)],
        "query_id long, nbr_id long, cosine double")
    r = ann_recall(exact, approx, k=3).collect()[0]
    assert r["n_hits"] == 2
    assert abs(r["recall_at_3"] - 2 / 3) < 1e-6
    assert abs(r["mrr"] - 0.5) < 1e-6


def test_maxsim_kernels_agree(spark, sf_dir):
    """The BLAS partial-max kernel and the HOF fold return identical
    MaxSim rankings (rounding happens after the final max in both)."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.operators.similarity import maxsim_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select((F.col("vec_id") / 40).cast("long").alias("doc"),
                        "embedding")
    queries = emb.where(F.col("vec_id") < 40)
    a = maxsim_topk(corpus, queries, k=10, doc_col="doc",
                    kernel="numpy").collect()
    b = maxsim_topk(corpus, queries, k=10, doc_col="doc",
                    kernel="hof").collect()
    assert [(r["doc"], r["score"], r["n_q_tokens"]) for r in a] \
        == [(r["doc"], r["score"], r["n_q_tokens"]) for r in b]
