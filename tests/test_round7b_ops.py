"""Edge-case units for the round-7 continuation operators: unicode
normalization, the Goertzel audio bank, and logistic GD."""

import math

from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators.features import logistic_fit_gd
from flink_cdc_dsql_master_spark.operators.multimodal import (
    audio_dominant_freq, synth_wav_bytes)
from flink_cdc_dsql_master_spark.operators.text import normalize_unicode


def test_normalize_unicode_nulls_empty_and_marks(spark):
    df = spark.createDataFrame(
        [(1, "Café"), (2, None), (3, "   "), (4, "a\x00b\tc"),
         (5, "Café")],
        "id long, text string")
    out = {r["id"]: r["clean_text"]
           for r in normalize_unicode(df).collect()}
    assert out[1] == "Café"          # NFC composes the mark
    assert out[1] == out[5]               # decomposed == precomposed
    assert out[2] is None                 # null passes through
    assert out[3] == ""                   # whitespace-only trims away
    assert out[4] == "a b c"              # control char -> space

def test_normalize_unicode_idempotent(spark):
    df = spark.createDataFrame(
        [(1, " x́   y \x1f z ")], "id long, text string")
    once = normalize_unicode(df).select(
        F.col("clean_text").alias("text"))
    twice = normalize_unicode(once).collect()[0]["clean_text"]
    assert twice == once.collect()[0]["text"]


def test_audio_dominant_freq_stereo_and_low_amp(spark):
    clips = [
        (1, synth_wav_bytes(250, 150)),
        (2, synth_wav_bytes(299, 120, channels=2)),   # stereo downmix
        (3, synth_wav_bytes(201, 100, amplitude=0.05)),  # quiet
    ]
    df = spark.createDataFrame(clips, "media_id long, payload binary")
    got = {r["media_id"]: r["dom_freq_hz"]
           for r in audio_dominant_freq(df).collect()}
    assert got == {1: 250, 2: 299, 3: 201}


def test_logistic_gd_separable_direction_and_loss(spark):
    # y = 1 iff x1 > 0: after 3 steps w1 must be positive and loss
    # strictly below ln(2) (the w=0 starting loss)
    rows = [(1.0 if i % 7 > 3 else 0.0,) for i in range(200)]
    df = spark.createDataFrame(
        [(y, (1.0 if y else -1.0), 0.0) for (y,) in rows],
        "y double, x1 double, x2 double")
    out = logistic_fit_gd(df, "y", "x1", "x2", steps=3, lr=0.5) \
        .collect()[0]
    assert out["n"] == 200
    assert out["w1"] > 0
    assert out["log_loss"] < math.log(2.0)


def test_knn_join_auto_bits_rule_and_equivalence(spark):
    from flink_cdc_dsql_master_spark.operators.similarity import (
        knn_join, knn_join_auto_bits)

    # occupancy-8 rule: doubles roughly every corpus doubling, floored
    assert knn_join_auto_bits(10) == 4
    assert knn_join_auto_bits(500) == 6
    assert knn_join_auto_bits(2000) == 8
    assert knn_join_auto_bits(20000) == 12

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    auto = knn_join(emb, k=3, bits=None)
    pinned = knn_join(emb, k=3, bits=knn_join_auto_bits(emb.count()))
    assert sorted(map(tuple, auto.collect())) \
        == sorted(map(tuple, pinned.collect()))


def test_materialize_forces_projection_and_handles_maps(spark):
    from bench import materialize

    # a pruned-away projection would never touch the accumulator
    hits = spark.sparkContext.accumulator(0)

    def bump(x):
        hits.add(1)
        return x

    f = F.udf(bump, "long")
    df = spark.range(7).select(f("id").alias("y"))
    df.count()
    assert hits.value == 0      # count() alone prunes the UDF...
    assert materialize(df) == 7
    assert hits.value == 7      # ...materialize evaluates every row

    mdf = spark.range(3).select(
        F.create_map(F.lit("k"), F.col("id")).alias("m"))
    assert materialize(mdf) == 3  # to_json fallback path


def test_connected_components_known_graph(spark):
    from flink_cdc_dsql_master_spark.operators.graph import (
        connected_components)

    # two components {1,2,3,4} (chain + cross edge) and {10,11};
    # edge direction must not matter, parallel edges must not matter
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (3, 4), (4, 1), (4, 1), (11, 10)],
        "src long, dst long")
    out = {r["node"]: (r["component"], r["is_root"])
           for r in connected_components(edges).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False),
                   4: (1, False), 10: (10, True), 11: (10, False)}


def test_range_search_matches_bruteforce_on_collisions(spark):
    from flink_cdc_dsql_master_spark.operators.similarity import (
        knn_join, range_search)

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(100))
    # range_search == knn_join's candidate set filtered by threshold:
    # every returned pair clears the bar, and every knn pair clearing
    # the bar is returned (same planes -> same candidate universe)
    tau = 0.25
    got = {(r["src"], r["nbr"]) for r in
           range_search(emb, threshold=tau, bits=4).collect()}
    ref = {(r["src"], r["nbr"]) for r in
           knn_join(emb, k=10**9, bits=4).where(
               F.col("cosine") >= tau).collect()}
    assert got == ref and all(
        r["cosine"] >= tau for r in
        range_search(emb, threshold=tau, bits=4).collect())


def test_connected_components_long_chain_converges_fast(spark):
    """A 200-node path graph has diameter 199: plain HashMin would need
    ~200 rounds and FAIL under max_iters=12; the pointer-jumping
    shortcut must converge it in O(log n) rounds to the single
    component labeled by the minimum id."""
    from flink_cdc_dsql_master_spark.operators.graph import (
        connected_components)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long")
    out = connected_components(edges, max_iters=12).collect()
    assert len(out) == 201
    assert all(r["component"] == 0 for r in out)
    assert sum(r["is_root"] for r in out) == 1


def test_image_ahash_ignores_offgrid_noise(spark):
    """Two payloads differing ONLY at odd-parity pixels must produce
    the same aHash (the hash samples even coordinates), and byte-wise
    distinct payloads must stay distinct."""
    import numpy as np

    from flink_cdc_dsql_master_spark.operators.multimodal import (
        image_ahash)

    def ppm(noise_val):
        x = np.arange(16)
        y = np.arange(16)[:, None]
        arr = np.stack([np.broadcast_to((x * 37) % 256, (16, 16)),
                        np.broadcast_to((y * 53) % 256, (16, 16)),
                        (x * 7 + y * 11) % 256], axis=-1)
        odd = ((x + y) % 2 == 1)
        arr = (arr + (odd * noise_val)[..., None] * 1) % 256
        return b"P6\n16 16\n255\n" + arr.astype("u1").tobytes()

    p1, p2 = ppm(np.int64(9)), ppm(np.int64(111))
    assert p1 != p2
    df = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2))],
        "media_id long, payload binary")
    out = image_ahash(df).collect()
    hashes = {r["media_id"]: r["ahash"] for r in out}
    assert hashes[1] == hashes[2]
    assert set(hashes[1]) <= {"0", "1"} and len(hashes[1]) == 64


def test_ahash_near_pairs_radius_boundary(spark):
    """Pairs at Hamming 3 are found (pigeonhole banding is complete at
    the radius), pairs at Hamming 4 are rejected even when a band
    still matches (the exact check filters candidates)."""
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        ahash_near_pairs)

    base = "0" * 64
    flip3 = "111" + "0" * 61          # dist 3, bands 2-4 identical
    flip4 = "1111" + "0" * 60         # dist 4, bands 2-4 identical
    df = spark.createDataFrame(
        [(1, base), (2, flip3), (3, flip4)], "media_id long, ahash string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in ahash_near_pairs(df, max_hamming=3).collect()}
    assert got[(1, 2)] == 3
    assert (1, 3) not in got
    assert got[(2, 3)] == 1
