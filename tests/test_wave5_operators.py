"""Unit tests for the wave-5 operators: k-core, BFS hops, k-means,
FS record linkage, RAKE keywords."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators.graph import bfs_hops, kcore
from flink_cdc_dsql_master_spark.operators.joins import record_linkage
from flink_cdc_dsql_master_spark.operators.similarity import kmeans
from flink_cdc_dsql_master_spark.operators.text import rake_keywords


# ---------------------------------------------------------------- k-core


def test_kcore_peels_tail_keeps_clique(spark):
    # K4 clique (deg 3) with a pendant chain hanging off node 1
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    edges = spark.createDataFrame(k4 + chain, "src long, dst long")
    got = {r["node"]: r["deg"] for r in kcore(edges, k=3, rounds=4).collect()}
    # the chain (deg 1-2) peels; the clique survives at deg 3
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_reciprocal_edges_not_double_counted(spark):
    # both directions of the same edge must count once: a 3-cycle has
    # undirected degree 2 everywhere, so no node reaches a 3-core even
    # when every edge appears in both orientations
    both = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    edges = spark.createDataFrame(both, "src long, dst long")
    assert kcore(edges, k=3, rounds=3).count() == 0
    got = {r["node"]: r["deg"] for r in kcore(edges, k=2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


# -------------------------------------------------------------- BFS hops


def test_bfs_hops_chain_and_unreachable(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 10)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in
           bfs_hops(edges, seeds, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 9, 10 unreachable


def test_bfs_hops_min_over_multiple_seeds_and_bound(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r["node"]: r["hops"] for r in
           bfs_hops(edges, seeds, max_hops=2).collect()}
    # 4 is reachable at hop 3 from seed 1 but hop 1 from seed 9
    assert got[4] == 1 and got[5] == 2
    assert got == {1: 0, 9: 0, 2: 1, 4: 1, 3: 2, 5: 2}


# --------------------------------------------------------------- k-means


def test_kmeans_separates_obvious_clusters(spark):
    rows = [(i, [10.0, 0.0]) for i in range(5)] + \
           [(i + 5, [0.0, 10.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = kmeans(df, k=2, iters=3)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    a = {got[i] for i in range(5)}
    b = {got[i + 5] for i in range(5)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # converged members sit exactly on their centroid
    assert all(r["dist"] == 0.0 for r in out.collect())
    assert sorted(cents) == [[0.0, 10.0], [10.0, 0.0]]


def test_kmeans_requires_k_rows(spark):
    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="needs >= 3"):
        kmeans(df, k=3, iters=1)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # init = two smallest ids (both at the origin-ish cluster); after
    # the first assignment one centroid may own everything — the other
    # must keep its previous position instead of going NaN
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.2, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = kmeans(df, k=2, iters=2)
    assert out.count() == 3
    assert all(all(x == x for x in c) for c in cents)  # no NaN


# ------------------------------------------------------ record linkage


def test_record_linkage_blocks_and_classifies(spark):
    left = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "NY"), (3, "carol", "LA")],
        "lid long, lname string, lstate string")
    right = spark.createDataFrame(
        [(11, "alicia", "NY"), (12, "zed", "NY"), (13, "carol", "SF")],
        "rid long, rname string, rstate string")
    out = record_linkage(
        left, right, block=[("lstate", "rstate")],
        comparisons=[("name", F.levenshtein("lname", "rname") <= 2)],
        weights={"name": (0.9, 0.05)}, upper=3.0, lower=0.0)
    got = {(r["lid"], r["rid"]): r["decision"] for r in out.collect()}
    # carol/SF-vs-LA never becomes a candidate: blocking prunes it
    assert (3, 13) not in got
    assert got[(1, 11)] == "match"       # lev(alice, alicia) = 2
    assert got[(1, 12)] == "nonmatch"
    assert got[(2, 12)] == "nonmatch"


def test_record_linkage_score_is_sum_of_log_odds(spark):
    import math

    left = spark.createDataFrame([(1, "x")], "lid long, lk string")
    right = spark.createDataFrame([(2, "x")], "rid long, rk string")
    out = record_linkage(
        left, right, block=[("lk", "rk")],
        comparisons=[("always", F.lit(True)), ("never", F.lit(False))],
        weights={"always": (0.8, 0.1), "never": (0.8, 0.1)},
        upper=10.0, lower=-10.0)
    [r] = out.collect()
    want = math.log2(0.8 / 0.1) + math.log2(0.2 / 0.9)
    assert r["fs_score"] == pytest.approx(want, abs=1e-6)
    assert r["decision"] == "possible"


# ------------------------------------------------------------------ RAKE


def test_rake_scores_degree_over_frequency(spark):
    docs = spark.createDataFrame(
        [(1, "deep learning of deep learning systems and deep nets")],
        "doc_id long, text string")
    out = {r["phrase"]: (r["n"], r["score"])
           for r in rake_keywords(docs, top=10, min_words=2,
                                  max_words=4).collect()}
    # phrases: "deep learning" (x2 via 'of'/start split), "deep learning
    # systems"? no — split only at stopwords 'of'/'and': candidates are
    # "deep learning", "deep learning systems", "deep nets"
    assert set(out) == {"deep learning", "deep learning systems",
                        "deep nets"}
    assert out["deep learning"][0] == 1
    assert out["deep learning systems"][0] == 1
    # deep: freq 3, degree 2+3+2=7; learning: freq 2, degree 5;
    # systems: 1/3; nets: 1/2
    d, le, sy, ne = 7 / 3, 5 / 2, 3 / 1, 2 / 1
    assert out["deep learning"][1] == pytest.approx(d + le, abs=1e-6)
    assert out["deep learning systems"][1] == pytest.approx(
        d + le + sy, abs=1e-6)
    assert out["deep nets"][1] == pytest.approx(d + ne, abs=1e-6)


def test_rake_filters_word_count_band(spark):
    docs = spark.createDataFrame(
        [(1, "one and two three and a b c d e f")],
        "doc_id long, text string")
    out = [r["phrase"] for r in
           rake_keywords(docs, top=10, min_words=2, max_words=4).collect()]
    # "one" (1 word) and "b c d e f" (5 words) fall outside the band
    assert out == ["two three"]


# ---------------------------------------------------------- PMI / Zipf


def test_pmi_known_value(spark):
    import math

    from flink_cdc_dsql_master_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string")
    out = {(r["w1"], r["w2"]): (r["c12"], r["pmi"])
           for r in pmi_collocations(docs, min_count=1, top=10).collect()}
    # tokens: 6 (a x3, b x3); pairs: 5 ((a,b) x3, (b,a) x2)
    assert out[("a", "b")][0] == 3
    assert out[("a", "b")][1] == pytest.approx(
        math.log(3 * 36 / (9 * 5)), abs=1e-6)
    assert out[("b", "a")][1] == pytest.approx(
        math.log(2 * 36 / (9 * 5)), abs=1e-6)


def test_zipf_slope_matches_numpy_fit(spark):
    import math

    import numpy as np

    from flink_cdc_dsql_master_spark.operators.text import zipf_slope

    # freqs 8/4/2/1 at ranks 1..4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [r] = zipf_slope(docs, top_ranks=10).collect()
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope, intercept = np.polyfit(x, y, 1)
    assert r["n"] == 4
    assert r["slope"] == pytest.approx(slope, abs=1e-5)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-5)
    assert 0.9 < r["r2"] <= 1.0


def test_kmeans_state_fold_is_linear(spark):
    """Sufficient statistics against FIXED centroids must merge
    linearly: state(b1 ∪ b2) == merge(state(b1), state(b2)) — the
    property that makes centroids maintainable under streaming folds
    and at-least-once replay dedup."""
    from flink_cdc_dsql_master_spark.operators.similarity import (
        kmeans_merge_state, kmeans_state_from_batch,
    )

    cents = [[0.0, 0.0], [10.0, 10.0]]
    rows1 = [(i, [float(i), 1.0]) for i in range(4)]
    rows2 = [(i + 4, [float(i + 8), 2.0]) for i in range(4)]
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    whole = kmeans_state_from_batch(mk(rows1 + rows2), cents)
    folded = kmeans_merge_state(kmeans_state_from_batch(mk(rows1), cents),
                                kmeans_state_from_batch(mk(rows2), cents))
    a = {(r["cluster"], r["i"]): (r["n"], r["s"])
         for r in whole.collect()}
    b = {(r["cluster"], r["i"]): (r["n"], r["s"])
         for r in folded.collect()}
    assert a == b
    # and a cluster with NO members keeps its previous centroid
    from flink_cdc_dsql_master_spark.operators.similarity import (
        kmeans_centroids_of,
    )
    near0 = kmeans_state_from_batch(
        mk([(0, [1.0, 0.0]), (1, [0.0, 1.0])]), cents)
    c = kmeans_centroids_of(near0.collect(), cents)
    assert c[0] == [0.5, 0.5]
    assert c[1] == [10.0, 10.0]       # untouched


# ------------------------------------------------------- nearest as-of


def test_asof_nearest_ties_prefer_backward_and_tolerance(spark):
    import datetime as dt

    from flink_cdc_dsql_master_spark.operators.asof import (
        asof_join_nearest,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, "k", ts(100)), (2, "k", ts(500)), (3, "x", ts(100))],
        "lid long, lk string, lts timestamp")
    right = spark.createDataFrame(
        [(10, "k", ts(90)), (11, "k", ts(110)),     # equidistant from 100
         (12, "k", ts(130))],
        "rid long, rk string, rts timestamp")
    out = asof_join_nearest(
        left, right, on=[("lk", "rk")], left_on="lts", right_on="rts",
        tolerance_s=60.0, left_id="lid", right_id="rid")
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got[1] == 10         # |10s| tie: backward wins over forward
    assert got[2] is None       # nearest right is 370s away: > tolerance
    assert got[3] is None       # key never matches
    assert set(got) == {1, 2, 3}   # left-outer: every left row survives
