"""Property tests for operators/sketches.py: the guarantees each sketch
family advertises (not just point conformance, which the oracle rows
cover) — KMV error concentration, Count-Min one-sided error, Bloom
no-false-negatives, histogram-quantile rank error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators.sketches import (
    bloom_semi_join,
    countmin_estimate,
    countmin_sketch,
    histogram_quantiles,
    kmv_distinct,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 5000 rows, 800 distinct keys, skewed: key = i % 800, extra mass on
    # key 7 (heavy hitter)
    rows = [(i % 800,) for i in range(5000)] + [(7,)] * 500
    return spark.createDataFrame(rows, "k long").withColumn(
        "g", F.lit("all"))


def test_kmv_estimate_within_error_bound(keyed):
    # k=256 → relative standard error ~ 1/sqrt(254) ≈ 6.3%; assert 3σ
    out = kmv_distinct(keyed, "k", ["g"], k=256).collect()[0]
    assert out["n_kept"] == 256
    assert abs(out["distinct_est"] - 800) / 800 < 0.19


def test_kmv_exact_below_k(keyed):
    small = keyed.where(F.col("k") < 40)
    out = kmv_distinct(small, "k", ["g"], k=64).collect()[0]
    assert out["n_kept"] == 40
    assert out["distinct_est"] == 40.0


def test_countmin_never_undercounts_and_finds_heavy_hitter(keyed):
    sk = countmin_sketch(keyed, "k", depth=4, width=512)
    # sketch is bounded by depth*width rows regardless of input
    assert sk.count() <= 4 * 512
    cands = keyed.select("k").distinct()
    est = countmin_estimate(sk, cands, "k", depth=4, width=512)
    exact = keyed.groupBy("k").agg(F.count("*").alias("c"))
    j = est.join(exact, "k").select("k", "est", "c").collect()
    assert all(r["est"] >= r["c"] for r in j)  # one-sided error
    top = max(j, key=lambda r: r["est"])
    assert int(top["k"]) == 7  # the planted heavy hitter wins
    # (estimate keys travel as strings — the sketch hashes the string
    # form; callers cast back as the registered query does)


def test_bloom_no_false_negatives(spark):
    dim = spark.createDataFrame([(i * 3,) for i in range(50)], "dk long")
    fact = spark.createDataFrame([(i,) for i in range(300)], "fk long")
    kept = bloom_semi_join(fact, dim, "fk", "dk", m=256, k=3)
    kept_keys = {r["fk"] for r in kept.collect()}
    true_keys = {i * 3 for i in range(50)} & set(range(300))
    assert true_keys <= kept_keys  # every true member survives
    # and the filter actually pruned something
    assert len(kept_keys) < 300


def test_histogram_quantiles_rank_error(spark):
    df = spark.range(10000).select(
        (F.col("id").cast("double")).alias("v"))
    out = {r["q"]: r["est_value"]
           for r in histogram_quantiles(df, "v", bins=100,
                                        qs=(0.1, 0.5, 0.9)).collect()}
    # uniform data: est should land within one bin width (~100) of q*N
    for q in (0.1, 0.5, 0.9):
        assert abs(out[q] - q * 9999) <= 101


def test_histogram_quantiles_handles_outlier_bins(spark):
    # one extreme outlier stretches the range; quantiles of the bulk
    # must still resolve (all bulk mass lands in bin 0)
    rows = [(float(i),) for i in range(1000)] + [(1e9,)]
    df = spark.createDataFrame(rows, "v double")
    out = histogram_quantiles(df, "v", bins=64, qs=(0.5,)).collect()
    assert len(out) == 1 and out[0]["est_value"] is not None


def test_bpe_greedy_overlap_semantics(spark):
    from flink_cdc_dsql_master_spark.operators.text import train_bpe_merges

    # corpus: "aaa" x3, "ab" x2. Round 1 pairs: (a,a) freq 2*3=6 from
    # aaa (positions 1-2, 2-3), (a,b) freq 2. Best = (a,a) freq 6.
    # Greedy application to "aaa": merge 1-2 only -> symbols [aa, a].
    # Round 2 pairs: (aa,a) freq 3, (a,b) freq 2 -> best (aa,a) freq 3.
    rows = [("aaa aaa aaa ab ab",)]
    df = spark.createDataFrame(rows, "text string")
    merges = {r["round"]: (r["left_sym"], r["right_sym"], r["pair_freq"])
              for r in train_bpe_merges(df, rounds=2).collect()}
    assert merges[1] == ("a", "a", 6)
    assert merges[2] == ("aa", "a", 3)


def test_streaming_folds_equal_rebuild(spark, keyed):
    """Incremental maintenance == from-scratch rebuild for both
    streaming sketch folds (CM by linearity, KMV by lossless merge)."""
    from flink_cdc_dsql_master_spark.operators.sketches import (
        countmin_apply_batch, countmin_sketch, kmv_apply_batch,
        kmv_distinct, kmv_estimate)

    b1 = keyed.where(F.col("k") % 3 != 0)
    b2 = keyed.where(F.col("k") % 3 == 0)

    st = countmin_apply_batch(None, b1, "k", 4, 128)
    st = countmin_apply_batch(st, b2, "k", 4, 128)
    scratch = countmin_sketch(keyed, "k", 4, 128)
    a = {(r["d"], r["cell"]): r["c"] for r in st.collect()}
    b = {(r["d"], r["cell"]): r["c"] for r in scratch.collect()}
    assert a == b

    kst = kmv_apply_batch(None, b1, "k", ["g"], k=128)
    kst = kmv_apply_batch(kst, b2, "k", ["g"], k=128)
    inc = kmv_estimate(kst, ["g"], k=128).collect()[0]
    full = kmv_distinct(keyed, "k", ["g"], k=128).collect()[0]
    assert (inc["n_kept"], inc["distinct_est"]) \
        == (full["n_kept"], full["distinct_est"])


def test_changelog_stream_to_sketches(spark, tmp_path):
    """Streaming pipeline into the sketch writer across two
    checkpointed runs: final CM and KMV states equal a from-scratch
    sketch of everything the stream carried."""
    import json

    from flink_cdc_dsql_master_spark.compose import (
        compose_changelog_stream, make_sketch_sink_writer)
    from flink_cdc_dsql_master_spark.operators.sketches import (
        countmin_sketch, kmv_estimate, kmv_partial)
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef,
                                                     SinkDef, SourceDef)

    src = str(tmp_path / "topic_sk")
    ckpt = str(tmp_path / "ckpt_sk")
    out = str(tmp_path / "sk")
    (tmp_path / "topic_sk").mkdir()

    def env(rid, uid):
        return json.dumps({"before": None,
                           "after": {"id": rid, "uid": uid}, "op": "c"})

    def write(fn, rows):
        with open(f"{src}/{fn}", "w") as f:
            for off, v in rows:
                f.write(json.dumps({"value": v, "offset": off}) + "\n")

    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src, "schema": "id int, uid int",
            "table": "db.s.ev", "primary-keys": ["id"]}),
        sink=SinkDef("custom"),
    )
    writer = make_sketch_sink_writer(out, "uid", depth=4, width=64, k=32)

    write("b1.jsonl", [(i, env(i, i % 17)) for i in range(40)])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)
    write("b2.jsonl", [(100 + i, env(100 + i, i % 29)) for i in range(40)])
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    all_rows = spark.createDataFrame(
        [(i, i % 17) for i in range(40)]
        + [(100 + i, i % 29) for i in range(40)], "id int, uid int") \
        .withColumn("__g", F.lit(1))
    cm_live = {(r["d"], r["cell"]): r["c"] for r in
               spark.read.parquet(f"{out}/ev__cm").collect()}
    cm_scratch = {(r["d"], r["cell"]): r["c"] for r in
                  countmin_sketch(all_rows, "uid", 4, 64).collect()}
    assert cm_live == cm_scratch
    kmv_live = kmv_estimate(
        spark.read.parquet(f"{out}/ev__kmv"), ["__g"], k=32).collect()[0]
    kmv_scratch = kmv_estimate(
        kmv_partial(all_rows, "uid", ["__g"], k=32), ["__g"],
        k=32).collect()[0]
    assert (kmv_live["n_kept"], kmv_live["distinct_est"]) \
        == (kmv_scratch["n_kept"], kmv_scratch["distinct_est"])
    from flink_cdc_dsql_master_spark.operators.sketches import (
        hll_estimate, hll_partial)
    hll_live = hll_estimate(
        spark.read.parquet(f"{out}/ev__hll"), ["__g"]).collect()[0]
    hll_scratch = hll_estimate(
        hll_partial(all_rows, "uid", ["__g"]), ["__g"]).collect()[0]
    assert hll_live["distinct_est"] == hll_scratch["distinct_est"]


def test_empty_set_edges(spark):
    """Empty inputs estimate zero instead of vanishing rows / NULLs."""
    from flink_cdc_dsql_master_spark.operators.sketches import (
        countmin_join_size, countmin_sketch, kmv_set_estimates)

    empty = spark.createDataFrame([], "k long")
    full = spark.createDataFrame([(i,) for i in range(50)], "k long")
    row = kmv_set_estimates(empty, full, "k", k=64).collect()[0]
    assert row["est_a"] == 0.0 and row["est_b"] == 50.0
    assert row["est_intersection"] == 0.0 and row["jaccard"] == 0.0

    # disjoint hash footprints -> zero estimated join rows, not NULL
    a = countmin_sketch(full, "k", depth=2, width=64)
    b = countmin_sketch(empty, "k", depth=2, width=64)
    est = countmin_join_size(a, b).collect()[0]
    assert est["est_join_rows"] == 0


def test_histogram_fold_equals_rebuild_and_quantiles(spark):
    """Streaming histogram maintenance: fold == rebuild (linearity),
    and quantiles read off maintained state track the exact values on
    uniform data — the last sketch family gains its streaming fold."""
    from flink_cdc_dsql_master_spark.operators.sketches import (
        histogram_apply_batch, histogram_bins,
        histogram_state_quantiles)

    full = spark.range(10000).select(F.col("id").cast("double")
                                     .alias("v"))
    b1 = full.where(F.col("v") < 4000)
    b2 = full.where(F.col("v") >= 4000)
    st = histogram_apply_batch(None, b1, "v", 0.0, 10000.0, bins=100)
    st = histogram_apply_batch(st, b2, "v", 0.0, 10000.0, bins=100)
    scratch = histogram_bins(full, "v", 0.0, 10000.0, bins=100)
    a = {(r["bin"], r["cnt"]) for r in st.collect()}
    assert a == {(r["bin"], r["cnt"]) for r in scratch.collect()}
    out = {r["q"]: r["est_value"] for r in histogram_state_quantiles(
        st, 0.0, 10000.0, 100, (0.1, 0.5, 0.9)).collect()}
    for q in (0.1, 0.5, 0.9):
        assert abs(out[q] - q * 10000) <= 101


def test_repeated_span_removal_semantics(spark):
    """A planted 10-token passage shared by two docs is excised at a
    DIFFERENT alignment in each, and unrelated text survives intact."""
    from flink_cdc_dsql_master_spark.operators.text import (
        remove_duplicated_spans)

    passage = " ".join(f"p{i}" for i in range(10))
    d1 = f"alpha beta {passage} gamma delta"
    d2 = f"x1 x2 x3 x4 x5 x6 x7 {passage}"
    d3 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, span_words=8).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "x1 x2 x3 x4 x5 x6 x7"
    assert out[2]["n_removed"] == 10
    assert out[3]["clean_text"] == d3  # untouched
    assert out[3]["n_removed"] == 0


def test_histogram_quantiles_degenerate_range(spark):
    """All-identical values: width 0 must not NULL the bins — every
    quantile is the single value."""
    from flink_cdc_dsql_master_spark.operators.sketches import (
        grouped_histogram_quantiles)

    df = spark.createDataFrame([("a", 5.0)] * 100 + [("b", float(i),)
                               for i in range(100)],
                               "g string, v double")
    out = {(r["g"], r["q"]): r["est_value"]
           for r in grouped_histogram_quantiles(
               df, "g", "v", bins=16, qs=(0.5,)).collect()}
    assert out[("a", 0.5)] == 5.0
    assert 40 <= out[("b", 0.5)] <= 60

    single = histogram_quantiles(
        spark.createDataFrame([(7.0,)] * 50, "v double"),
        "v", bins=8, qs=(0.5, 0.9))
    vals = {r["q"]: r["est_value"] for r in single.collect()}
    assert vals == {0.5: 7.0, 0.9: 7.0}


def test_hll_estimate_within_error_bound(keyed):
    from flink_cdc_dsql_master_spark.operators.sketches import hll_distinct

    # p=8 → m=256 registers, RSE ~ 1.04/sqrt(256) ≈ 6.5%; assert 3σ
    out = hll_distinct(keyed, "k", ["g"], p=8).collect()[0]
    assert abs(out["distinct_est"] - 800) / 800 < 0.20


def test_hll_merge_idempotent_and_lossless(keyed):
    from flink_cdc_dsql_master_spark.operators.sketches import (
        hll_estimate, hll_merge, hll_partial)

    whole = hll_partial(keyed, "k", ["g"], p=8)
    a = hll_partial(keyed.where(F.col("k") % 2 == 0), "k", ["g"], p=8)
    b = hll_partial(keyed.where(F.col("k") % 2 == 1), "k", ["g"], p=8)
    # sketch(A ∪ B) == merge(sketch A, sketch B), and re-merging a
    # shard (replay) moves nothing
    merged = hll_merge([a, b, a, b], ["g"])
    w = {(r["j"]): r["r"] for r in whole.collect()}
    m = {(r["j"]): r["r"] for r in merged.collect()}
    assert w == m
    est_w = hll_estimate(whole, ["g"], p=8).collect()[0]["distinct_est"]
    est_m = hll_estimate(merged, ["g"], p=8).collect()[0]["distinct_est"]
    assert est_w == est_m


def test_hll_small_range_exactish(spark):
    from flink_cdc_dsql_master_spark.operators.sketches import hll_distinct

    # 30 distinct keys ≪ m: linear-counting correction keeps the
    # estimate within ~10%
    df = spark.createDataFrame([(i % 30,) for i in range(200)], "k long") \
        .withColumn("g", F.lit("all"))
    out = hll_distinct(df, "k", ["g"], p=8).collect()[0]
    assert abs(out["distinct_est"] - 30) / 30 < 0.12


def test_streaming_kmeans_state_fold_matches_batch(spark, tmp_path):
    """Two checkpointed micro-batches through make_kmeans_sink_writer:
    the maintained state must equal the hand-run two-batch mini-batch
    fold (same assignment-against-current-centroids semantics)."""
    import json

    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.compose import (
        compose_changelog_stream, make_kmeans_sink_writer)
    from flink_cdc_dsql_master_spark.operators.similarity import (
        kmeans_centroids_of, kmeans_merge_state, kmeans_state_from_batch)
    from flink_cdc_dsql_master_spark.pipeline import (PipelineDef,
                                                      SinkDef, SourceDef)

    src = str(tmp_path / "topic_km")
    ckpt = str(tmp_path / "ckpt_km")
    out = str(tmp_path / "km")
    (tmp_path / "topic_km").mkdir()

    def vec(i):
        return [float((i * 7) % 10), float((i * 3) % 10)]

    def env(i):
        return json.dumps({"before": None,
                           "after": {"vec_id": i, "embedding": vec(i)},
                           "op": "c"})

    def write(fn, ids):
        with open(f"{src}/{fn}", "w") as f:
            for off, i in enumerate(ids):
                f.write(json.dumps({"value": env(i),
                                    "offset": off + i * 100}) + "\n")

    cents = [[0.0, 0.0], [9.0, 9.0]]
    pipe = PipelineDef(
        source=SourceDef("file-debezium", {
            "path": src,
            "schema": "vec_id long, embedding array<double>",
            "table": "db.s.emb", "primary-keys": ["vec_id"]}),
        sink=SinkDef("custom"),
    )
    writer = make_kmeans_sink_writer(out, cents)

    b1, b2 = list(range(20)), list(range(20, 40))
    write("b1.jsonl", b1)
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)
    write("b2.jsonl", b2)
    q = compose_changelog_stream(spark, pipe, ckpt, writer)
    q.awaitTermination(120)

    live = {(r["cluster"], r["i"]): (r["n"], r["s"]) for r in
            spark.read.parquet(f"{out}/emb__kmstate").collect()}

    mk = lambda ids: spark.createDataFrame(
        [(i, vec(i)) for i in ids],
        "vec_id long, embedding array<double>")
    s1 = kmeans_state_from_batch(mk(b1), cents)
    c1 = kmeans_centroids_of(s1.collect(), cents)
    s2 = kmeans_merge_state(s1, kmeans_state_from_batch(mk(b2), c1))
    scratch = {(r["cluster"], r["i"]): (r["n"], r["s"])
               for r in s2.collect()}
    assert live == scratch
    # centroids moved off the seeds
    final = kmeans_centroids_of(s2.collect(), c1)
    assert final != cents
