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
