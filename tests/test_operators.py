"""LLM-pipeline operator tests: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),    # near dup
        (4, "completely different content about spark engines"),
        (5, "  The   quick brown fox jumps over the lazy dog "),  # norm dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(docs):
    out = dedup.exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4]  # 2 and 5 collapse into 1


def test_minhash_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32,
                                    bands=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got  # exact dups always collide
    assert all(r["jaccard"] >= 0.5 for r in pairs.collect())


def test_ngram_jaccard_exact_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0 and got[(1, 5)] == 1.0
    # one word differs out of 9 → 3 of 7 shingles change → J = 4/10
    assert got[(1, 3)] == pytest.approx(0.4)
    assert (1, 4) not in got


def test_simhash_hamming(docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0 and got[(1, 5)] == 0


def test_minhash_agrees_with_exact_jaccard(docs):
    """MinHash estimate within tolerance of exact Jaccard on candidates."""
    mh = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in dedup.minhash_lsh_pairs(docs, threshold=0.1,
                                           num_hashes=64, bands=32).collect()}
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    for pair, j in mh.items():
        if pair in exact:
            assert j == pytest.approx(exact[pair], abs=0.01)
            # verification step IS exact jaccard, so equality expected


@pytest.fixture()
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(vectors):
    q = vectors.where(F.col("vec_id") == 1)
    out = similarity.cosine_topk(vectors, q, k=3)
    rows = out.orderBy(F.desc("cosine")).collect()
    assert [r["nbr_id"] for r in rows] == [2, 3, 4]
    assert rows[0]["cosine"] == pytest.approx(0.995, abs=1e-3)


def test_embedding_dup_pairs(vectors):
    pairs = dedup.embedding_cosine_dup_pairs(
        vectors, threshold=0.95, bucket_bits=4, seed=1)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # 1 and 2 are near-identical; hyperplane bucket should group them
    assert got == {(1, 2)} or (1, 2) in got


def test_ivf_recalls_exact_neighbor(spark):
    import random

    rng = random.Random(0)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(100)]
    # plant a near-duplicate of vector 0
    rows.append((100, [x + 0.01 for x in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 100)
    out = similarity.ivf_topk(df, q, k=1, n_cells=8, n_probe=4)
    assert out.collect()[0]["nbr_id"] == 0


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    out = df.select("doc_id", text.token_count(F.col("text")).alias("n"))
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    assert got == {1: 3, 2: 0, 3: 0}


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house is in the garden"),
         (2, "der hund und die katze ist das tier")],
        "doc_id long, text string")
    out = text.text_stats(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert 0.0 <= rows[1]["quality_score"] <= 1.0
    assert rows[1]["stopword_ratio"] > 0.3


def test_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "goodbye world")],
        "doc_id long, text string")
    out = df.select("doc_id",
                    text.rolling_fingerprint(F.col("text")).alias("fp"))
    got = {r["doc_id"]: r["fp"] for r in out.collect()}
    assert got[1] == got[2] != got[3]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0abc"), 2500),
         (2, bytearray(b"\x89PNG\r\n"), 900),
         (3, None, 1500)],
        "media_id long, payload binary, duration_ms int")
    meta = multimodal.attach_media_metadata(df)
    mimes = {r["media_id"]: r["mime_sniffed"] for r in meta.collect()}
    assert mimes[1] == "image/jpeg" and mimes[2] == "image/png"

    feats = multimodal.extract_features(df, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[1]["decode_ok"] and len(rows[1]["feature"]) == 8
    assert not rows[3]["decode_ok"]

    frames = multimodal.sample_frames(df.where(F.col("payload").isNotNull()))
    n = {r["media_id"] for r in frames.collect()}
    assert n == {1, 2}
    assert frames.where(F.col("media_id") == 1).count() == 2  # 2500ms/1000

    with pytest.raises(ValueError):
        multimodal.decode_jpeg(b"zz")  # junk fails fast, never fakes


def test_get_embedding_deterministic(spark):
    from flink_cdc_dsql_master_spark.functions import get_embedding_udf

    df = spark.createDataFrame([(1, "hello"), (2, "hello"), (3, "bye")],
                               "id long, t string")
    emb = get_embedding_udf(dim=8)
    out = df.select("id", emb(F.col("t")).alias("e")).collect()
    vals = {r["id"]: tuple(r["e"]) for r in out}
    assert vals[1] == vals[2] != vals[3]
    assert len(vals[1]) == 8


def test_minhash_pandas_kernel_matches_catalyst(spark):
    """The vectorized numpy minhash must equal the pure-Catalyst
    `_minhash_col` bit-for-bit (same params, same shingle_hash base)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words entirely here now")],
        "doc_id long, text string")
    jvm = df.withColumn(
        "mh", dedup._minhash_col(
            dedup.word_shingles(F.col("text"), 3), 16, seed=42))
    h = F.transform(dedup.word_shingles(F.col("text"), 3),
                    dedup.shingle_hash)
    pnd = (df.withColumn("__h", h)
           .withColumn("mh", dedup._minhash_pandas(16, 42)(F.col("__h"))))
    a = {r["doc_id"]: r["mh"] for r in jvm.collect()}
    b = {r["doc_id"]: r["mh"] for r in pnd.collect()}
    assert a == b


def test_shingles_pandas_matches_catalyst(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "  The   quick BROWN fox  "), (2, "one"), (3, "a b")],
        "doc_id long, text string")
    cat = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("s")).collect()}
    pnd = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", dedup.word_shingles_pandas(3)(F.col("text")).alias("s")
    ).collect()}
    assert cat == pnd


def test_salting_helpers(spark):
    from flink_cdc_dsql_master_spark.partitioning import (
        explode_salts,
        salt_keys,
    )

    big = spark.createDataFrame([(1, i) for i in range(100)], "k int, v int")
    small = spark.createDataFrame([(1, "meta")], "k int, m string")
    salted = salt_keys(big, "k", 4)
    assert salted.select("__salt").distinct().count() <= 4
    joined = salted.join(explode_salts(small, 4), on=["k", "__salt"])
    assert joined.count() == 100  # every big row finds its small match


def test_ivf_refined_centroids_recall(spark):
    import random

    rng = random.Random(1)
    # two tight clusters far apart + a planted near-dup
    rows = []
    for i in range(50):
        base = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [base + rng.gauss(0, 0.05) for _ in range(8)]))
    rows.append((100, [x + 0.001 for x in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 100)
    out = similarity.ivf_topk(df, q, k=1, n_cells=4, n_probe=1, dim=8,
                              refine_iters=1)
    assert out.collect()[0]["nbr_id"] == 0


def test_dup_clusters_transitive(spark):
    """A~B, B~C ⇒ {A,B,C} one cluster even without an A~C pair; untouched
    nodes are singletons; canonical = min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup.dup_clusters(pairs, nodes).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False),
                   4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True)}


def test_dup_clusters_chain_converges(spark):
    """A long path graph needs several HashMin rounds — the driver loop
    must iterate to fixpoint, not stop after one round."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)],
                                  "doc_id long")
    out = dedup.dup_clusters(pairs, nodes).collect()
    assert all(r["cluster_id"] == 1 for r in out)
    assert sum(r["is_canonical"] for r in out) == 1


def test_embedding_exact_pairs_brute_force(spark):
    import itertools
    import math

    import random
    rng = random.Random(0)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dedup.embedding_exact_pairs(df, threshold=0.3).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))

    want = {(a, b): cos(va, vb)
            for (a, va), (b, vb) in itertools.combinations(rows, 2)
            if cos(va, vb) >= 0.3}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"),            # 3-grams: aba bab aba bab → dup 0.5
         (2, "one two three four"),     # 2 distinct 3-grams, no repeats
         (3, "word")],                  # <n words → 1 shingle (whole text)
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    assert (out[1]["n_ngrams"], out[1]["n_distinct_ngrams"],
            out[1]["dup_ngram_ratio"]) == (4, 2, 0.5)
    assert out[2]["dup_ngram_ratio"] == 0.0
    assert (out[3]["n_ngrams"], out[3]["dup_ngram_ratio"]) == (1, 0.0)


def test_hash_sample_deterministic_and_rate(spark):
    from flink_cdc_dsql_master_spark.operators import sampling

    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in
               sampling.hash_sample(df, "k", 0.25, salt="x").collect())
    b = sorted(r["k"] for r in
               sampling.hash_sample(df, "k", 0.25, salt="x").collect())
    assert a == b                       # reproducible
    assert 0.20 < len(a) / 4000 < 0.30  # concentrates near the rate
    c = sorted(r["k"] for r in
               sampling.hash_sample(df, "k", 0.25, salt="y").collect())
    assert a != c                       # new salt → fresh sample
    with pytest.raises(ValueError):
        sampling.hash_sample(df, "k", 1.5)


def test_domain_quota_exact_n_per_group(spark):
    from flink_cdc_dsql_master_spark.operators import sampling

    rows = [(i, "g%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = sampling.domain_quota(df, "g", "k", 10).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["rn"])
    assert all(sorted(v) == list(range(1, 11)) for v in by_g.values())
    again = sampling.domain_quota(df, "g", "k", 10).collect()
    assert sorted((r["g"], r["k"]) for r in out) == \
        sorted((r["g"], r["k"]) for r in again)


def test_asof_join_backward_forward_tolerance(spark):
    from flink_cdc_dsql_master_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 50), (5, 30, 10)],
        "eid long, k long, t long")
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 200, "b"), (10, 250, "c"), (20, 60, "d")],
        "rk long, rt long, v string")

    back = {r["eid"]: r["v"] for r in asof.asof_join(
        left, right, left_on="t", right_on="rt",
        left_by="k", right_by="rk").collect()}
    # eid1: rt=100 matches at equal ts (inclusive); eid4: no rt <= 50;
    # eid5: key has no right rows at all
    assert back == {1: "a", 2: "b", 3: "c", 4: None, 5: None}

    fwd = {r["eid"]: r["v"] for r in asof.asof_join(
        left, right, left_on="t", right_on="rt", left_by="k",
        right_by="rk", direction="forward").collect()}
    assert fwd == {1: "a", 2: "c", 3: None, 4: "d", 5: None}

    tol = {r["eid"]: r["v"] for r in asof.asof_join(
        left, right, left_on="t", right_on="rt", left_by="k",
        right_by="rk", tolerance=F.lit(20)).collect()}
    # eid2: t=205, match rt=200 within 20; eid3: t=300, rt=250 gap 50 -> null
    assert tol == {1: "a", 2: "b", 3: None, 4: None, 5: None}


def test_asof_dedupe_right_lww(spark):
    from flink_cdc_dsql_master_spark.operators import asof

    r = spark.createDataFrame(
        [(10, 100, 1, "old"), (10, 100, 2, "new"), (10, 200, 3, "x")],
        "k long, t long, seq long, v string")
    got = {(row["k"], row["t"]): row["v"] for row in
           asof.dedupe_right(r, by="k", on="t", tie_break="seq").collect()}
    assert got == {(10, 100): "new", (10, 200): "x"}


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org or carol@y.co.uk, ip 10.0.0.1, tel +1 555 0100"),
         (2, "nothing sensitive here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    assert out[1]["email_found"] == 2
    assert out[1]["ipv4_found"] == 1
    assert out[1]["phone_found"] == 1
    assert "<EMAIL>" in out[1]["redacted"]
    assert "bob@x.org" not in out[1]["redacted"]
    assert out[2]["redacted"] == "nothing sensitive here"
    assert (out[2]["email_found"], out[2]["ipv4_found"],
            out[2]["phone_found"]) == (0, 0, 0)


def test_bigram_surprisal_ranks_gibberish_higher(spark):
    rows = [(i, "the cat sat on the mat and the cat sat again")
            for i in range(5)]
    rows.append((99, "zxq vrb plm qwt zxq nfk rtb mns"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["surprisal"]
           for r in text.bigram_surprisal(df).collect()}
    # repeated fluent text shares bigram mass; gibberish is all-singletons
    assert got[99] > got[0]
    # single-word / empty docs produce no bigrams -> absent, not crash
    df2 = spark.createDataFrame([(1, "hello"), (2, "")],
                                "doc_id long, text string")
    assert text.bigram_surprisal(df2).count() == 0


def test_salted_join_matches_plain_join(spark):
    from flink_cdc_dsql_master_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, lv string")
    right = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (9, "Z")], "rk long, rv string")

    plain = left.join(right, left.k == right.rk, "inner")
    salted = salted_join(left, right, on=[("k", "rk")], n_salts=4)
    assert (sorted(map(tuple, plain.collect()))
            == sorted(map(tuple, salted.collect())))

    plain_l = left.join(right, left.k == right.rk, "left")
    salted_l = salted_join(left, right, on=[("k", "rk")], n_salts=4,
                           how="left")
    assert (sorted(map(tuple, plain_l.collect()), key=str)
            == sorted(map(tuple, salted_l.collect()), key=str))

    import pytest as _pt
    with _pt.raises(ValueError):
        salted_join(left, right, on=[("k", "rk")], how="right")


def test_chunk_documents_windows_and_overlap(spark):
    words120 = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, words120), (2, "short doc"), (3, "   ")],
        "doc_id long, text string")
    out = text.chunk_documents(df, chunk_tokens=64, overlap=16)
    rows = sorted([(r["doc_id"], r["chunk_idx"], r["n_tokens"],
                    r["chunk_text"]) for r in out.collect()])
    # doc1: 120 tokens -> chunks at 0/48/96: 64, 64, 24 tokens
    d1 = [r for r in rows if r[0] == 1]
    assert [(r[1], r[2]) for r in d1] == [(0, 64), (1, 64), (2, 24)]
    assert d1[0][3].startswith("w0 ") and d1[1][3].startswith("w48 ")
    # consecutive chunks overlap by 16 tokens
    assert d1[0][3].split(" ")[48:] == d1[1][3].split(" ")[:16]
    # doc2 fits one chunk; blank doc3 dropped
    assert [(r[1], r[2]) for r in rows if r[0] == 2] == [(0, 2)]
    assert not [r for r in rows if r[0] == 3]
    with pytest.raises(ValueError):
        text.chunk_documents(df, chunk_tokens=16, overlap=16)


def test_quantize_int8_bounds_and_reconstruction(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           similarity.quantize_int8(df).collect()}
    # round-half-up toward +inf: -63.5 -> -63
    assert out[1]["qvec"] == [127, -63, 32, 0]
    assert out[1]["scale"] == pytest.approx(1.0 / 127)
    assert out[1]["cos_recon"] > 0.999
    assert out[1]["max_abs_err"] <= out[1]["scale"] / 2 + 1e-12
    # all-zero vector: guard scale, qvec all zeros, no NaN/div-by-zero
    assert out[2]["qvec"] == [0, 0, 0, 0] and out[2]["scale"] == 1.0


def test_content_defined_chunks_resync_after_edit(spark):
    """An edit at the head shifts every byte offset, yet all boundaries
    downstream of the first content-defined cut are identical — the
    chunk sets share their tails (the property fixed-size blocking
    lacks)."""
    from flink_cdc_dsql_master_spark.operators.dedup import (
        chunk_dedup_stats, content_defined_chunks)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight while "
            "seventeen owls watch silently from the old oak branches "
            "above the mossy stones near the winding river path") * 3
    df = spark.createDataFrame(
        [(0, base), (1, "PREFIX EDIT " + base)], "cid long, text string")
    chunks = content_defined_chunks(df, "cid", "text",
                                    window=8, divisor=32)
    rows = chunks.collect()
    # reassembly is lossless per document
    joined = {}
    for r in sorted(rows, key=lambda r: (r["cid"], r["chunk_idx"])):
        joined[r["cid"]] = joined.get(r["cid"], "") + r["chunk"]
    assert joined[0] == base and joined[1] == "PREFIX EDIT " + base
    # the two docs share most chunks despite the offset shift
    a = {r["chunk"] for r in rows if r["cid"] == 0}
    b = {r["chunk"] for r in rows if r["cid"] == 1}
    assert len(a & b) >= max(1, len(a) - 2)
    stats = chunk_dedup_stats(chunks).collect()[0]
    assert stats["shared_pct"] > 0.4


def test_content_defined_chunks_short_doc_single_chunk(spark):
    from flink_cdc_dsql_master_spark.operators.dedup import (
        content_defined_chunks)

    df = spark.createDataFrame([(0, "tiny")], "cid long, text string")
    rows = content_defined_chunks(df, "cid", "text").collect()
    assert len(rows) == 1 and rows[0]["chunk"] == "tiny"


def test_pareto_frontier_matches_bruteforce(spark):
    from flink_cdc_dsql_master_spark.operators.features import (
        pareto_frontier)

    # deterministic pseudo-random cloud
    pts = [(float((i * 7919) % 997), float((i * 6271) % 991))
           for i in range(400)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {(r["x"], r["y"])
           for r in pareto_frontier(df, "x", "y", buckets=8).collect()}
    distinct = set(pts)
    brute = {p for p in distinct
             if not any(q != p and q[0] <= p[0] and q[1] <= p[1]
                        for q in distinct)}
    # collapse same-x to min-y as the operator defines
    assert got == {p for p in brute
                   if p[1] == min(y for x, y in distinct if x == p[0])}


def test_ols_fit_recovers_planted_coefficients(spark):
    from flink_cdc_dsql_master_spark.operators.features import ols_fit

    # exact linear data: y = 3 + 2·x1 − 5·x2, fit must be exact (R²=1)
    rows = [(float(i % 13), float((i * 3) % 7),
             3.0 + 2.0 * (i % 13) - 5.0 * ((i * 3) % 7))
            for i in range(500)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = ols_fit(df, "y", "x1", "x2").collect()[0]
    assert r["n"] == 500
    assert abs(r["b0"] - 3.0) < 1e-6 and abs(r["b1"] - 2.0) < 1e-6
    assert abs(r["b2"] + 5.0) < 1e-6 and abs(r["r2"] - 1.0) < 1e-6


def test_column_entropy_bounds(spark):
    import math
    from flink_cdc_dsql_master_spark.operators.profile import (
        column_entropy)

    df = spark.createDataFrame(
        [("const", i % 8, i) for i in range(64)],
        "c string, u long, k long")
    rows = {r["col"]: r for r in
            column_entropy(df, ["c", "u", "k"]).collect()}
    assert rows["c"]["entropy"] == 0.0          # constant → 0 nats
    assert abs(rows["u"]["entropy"] - math.log(8)) < 1e-6   # uniform
    assert abs(rows["k"]["entropy"] - math.log(64)) < 1e-6  # key-like
    assert rows["k"]["n_distinct"] == 64


def test_psi_zero_on_identical_and_large_on_shift(spark):
    from flink_cdc_dsql_master_spark.operators.profile import (
        psi_categorical, psi_numeric)

    a = spark.createDataFrame(
        [(float(i % 100),) for i in range(2000)], "v double")
    # identical distribution → psi ~ 0
    same = psi_numeric(a, a, "v", bins=16).collect()[0]
    assert abs(same["psi"]) < 1e-9
    # shifted distribution → psi well above the 0.25 drift bar
    b = spark.createDataFrame(
        [(float(i % 100) + 60.0,) for i in range(2000)], "v double")
    drift = psi_numeric(a, b, "v", bins=16).collect()[0]
    assert drift["psi"] > 0.25
    ca = spark.createDataFrame([("x",)] * 90 + [("y",)] * 10, "k string")
    cb = spark.createDataFrame([("x",)] * 10 + [("y",)] * 90, "k string")
    assert psi_categorical(ca, cb, "k").collect()[0]["psi"] > 0.25


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    from flink_cdc_dsql_master_spark.operators.profile import (
        dp_noisy_counts)

    df = spark.createDataFrame(
        [(f"g{i % 5}",) for i in range(1000)], "g string")
    r1 = {r["grp"]: r["noisy_count"]
          for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    r2 = {r["grp"]: r["noisy_count"]
          for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    assert r1 == r2                       # seeded noise: reproducible
    # Laplace(1) tail: |noise| < 10 w.p. 1 − e^−10; all five groups
    for g, v in r1.items():
        assert abs(v - 200.0) < 10.0
    # higher ε → less noise
    tight = {r["grp"]: r["noisy_count"]
             for r in dp_noisy_counts(df, "g", epsilon=100.0).collect()}
    assert sum(abs(v - 200.0) for v in tight.values()) \
        < sum(abs(v - 200.0) for v in r1.values())


def test_greedy_cover_selection_trajectory(spark):
    from flink_cdc_dsql_master_spark.operators.sampling import (
        greedy_cover_selection)

    # A covers shingles of a 12-word text, B overlaps half of A plus
    # new words, C is a strict subset of A → greedy must pick A, then
    # B (marginal only), and C's marginal gain is 0
    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tb = "eta theta iota kappa lambda mu nu xi"
    tc = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [("A", ta), ("B", tb), ("C", tc)], "src string, text string")
    out = greedy_cover_selection(df, "src", "text", rounds=3).collect()
    # C is fully covered after A, so selection STOPS at 2 rounds —
    # zero-marginal sources are never padded into the result
    assert [r["set_key"] for r in out] == ["A", "B"]
    assert out[0]["marginal_gain"] == 8   # A: 8 distinct 3-shingles
    assert out[1]["marginal_gain"] == 4   # B: 6 shingles, 2 shared
    assert out[1]["cum_covered"] == 12


def test_table_checksum_order_independent_and_sensitive(spark):
    from flink_cdc_dsql_master_spark.operators.profile import (
        table_checksum)

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string")
    base = table_checksum(df, ["k", "v"]).collect()[0]
    shuffled = table_checksum(df.repartition(13), ["k", "v"]).collect()[0]
    assert (base["xor_sig"], base["sum_sig"]) \
        == (shuffled["xor_sig"], shuffled["sum_sig"])
    mut = df.withColumn(
        "v", F.when(F.col("k") == 50, "CHANGED").otherwise(F.col("v")))
    m = table_checksum(mut, ["k", "v"]).collect()[0]
    assert m["xor_sig"] != base["xor_sig"]
    assert m["sum_sig"] != base["sum_sig"]
    # null vs string-"None" sentinel distinction
    a = spark.createDataFrame([(1, None)], "k long, v string")
    b = spark.createDataFrame([(1, "\x00N")], "k long, v string")
    # same digest is EXPECTED here (sentinel collision is documented);
    # the important property is null != empty-string
    c = spark.createDataFrame([(1, "")], "k long, v string")
    assert table_checksum(a, ["k", "v"]).collect()[0]["xor_sig"] \
        != table_checksum(c, ["k", "v"]).collect()[0]["xor_sig"]


def test_key_skew_profile_gini(spark):
    from flink_cdc_dsql_master_spark.operators.profile import (
        key_skew_profile)

    even = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], "k long")
    g_even = key_skew_profile(even, "k").collect()[0]
    assert abs(g_even["gini"]) < 1e-9 and g_even["n_keys"] == 10
    skewed = spark.createDataFrame(
        [(0,)] * 910 + [(i,) for i in range(1, 10)] * 10, "k long")
    g_skew = key_skew_profile(skewed, "k").collect()[0]
    assert g_skew["gini"] > 0.7 and g_skew["top_share"] > 0.9


def test_content_chunks_arrow_matches_hof(spark):
    """The Arrow boundary kernel must produce byte-identical chunks to
    the Catalyst HOF twin (same md5 rule, same positions)."""
    from flink_cdc_dsql_master_spark.operators.dedup import (
        content_defined_chunks, content_defined_chunks_arrow)

    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 8),
        (1, "short"),
        (2, "PREFIX " + "the quick brown fox jumps over the lazy dog "
         * 8),
        (3, "unicode λ text ünïcode " * 20),
    ]
    df = spark.createDataFrame(texts, "cid long, text string")
    a = sorted(map(tuple, content_defined_chunks(
        df, "cid", "text").collect()))
    b = sorted(map(tuple, content_defined_chunks_arrow(
        df, "cid", "text").collect()))
    assert a == b
