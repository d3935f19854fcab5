"""Unit tests for the graph / web / classifier / cluster-split operators."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators import sampling, text, web
from flink_cdc_dsql_master_spark.operators.graph import pagerank


def test_pagerank_mass_conserved_and_dangling(spark):
    # 1 -> 2 -> 3, 3 dangling (no out-edges)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long")
    r = {row["node"]: row["rank"]
         for row in pagerank(edges, iterations=5).collect()}
    assert set(r) == {1, 2, 3}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    # the chain accumulates rank downstream
    assert r[3] > r[2] > 0 and r[2] > r[1]


def test_pagerank_symmetric_cycle_uniform(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")
    r = [row["rank"] for row in pagerank(edges, iterations=10).collect()]
    for v in r:
        assert v == pytest.approx(1 / 3, abs=1e-9)


def test_canonicalize_url_rules(spark):
    cases = [
        ("https://WWW.Ex.COM/a/?utm_source=x&z=1&a=2#f",
         "https://ex.com/a?a=2&z=1"),
        ("http://ex.com/", "http://ex.com/"),       # root slash kept
        ("https://ex.com/p/3?gclid=abc", "https://ex.com/p/3"),
        ("https://sub.ex.com/x?b=2&a=1", "https://sub.ex.com/x?a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in
           df.select(web.canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_lowest_id_wins(spark):
    df = spark.createDataFrame(
        [(5, "https://ex.com/x?utm_source=a"),
         (2, "https://WWW.EX.com/x/"),
         (9, "https://ex.com/y")],
        "doc_id long, url string")
    got = {r["canonical_url"]: r["doc_id"]
           for r in web.url_dedup(df).collect()}
    assert got == {"https://ex.com/x": 2, "https://ex.com/y": 9}


def test_quality_classifier_orders_quality(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs on"),
         (2, "@@@@ #### 1234 5678 !!!! %%%% 9999 0000 ???? ****")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["lr_score"], r["keep"])
           for r in text.quality_classifier(df).collect()}
    assert got[1][0] > got[2][0]
    assert got[1][1] is True and got[2][1] is False


def test_cluster_split_never_splits_a_cluster(spark):
    rows = [(i, i % 7) for i in range(200)]  # 7 clusters
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = sampling.cluster_split(df, rate=0.5, salt="t")
    sides = (out.groupBy("cluster_id")
             .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in sides)  # no cluster straddles
    splits = {r["split"] for r in out.collect()}
    assert splits == {"train", "holdout"}  # both sides populated


def test_phrase_search_positions_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"),      # "a b c" twice
         (2, "a b"),              # prefix only
         (3, "c b a"),            # reversed — no match
         (4, "x a b c y")],       # once, mid-doc
        "doc_id long, text string")
    got = {r["id"]: r["n_matches"]
           for r in text.phrase_search(df, ["a", "b", "c"]).collect()}
    assert got == {1: 2, 4: 1}
    # two-term phrase with overlapping repeats: "a a a" has two "a a"
    df2 = spark.createDataFrame([(9, "a a a")], "doc_id long, text string")
    got2 = {r["id"]: r["n_matches"]
            for r in text.phrase_search(df2, ["a", "a"]).collect()}
    assert got2 == {9: 2}


def test_trustrank_unreachable_nodes_get_zero(spark):
    """Trust flows only FROM seeds: a node with no path from the seed
    set ends at rank 0, and seeds retain the base teleport mass."""
    from flink_cdc_dsql_master_spark.operators.graph import trustrank

    # two components: {0 -> 1 -> 2} seeded at 0; {10 -> 11} unseeded
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    r = {row["node"]: row["rank"]
         for row in trustrank(edges, seeds, iterations=4).collect()}
    assert r[10] == 0.0 and r[11] == 0.0   # unreachable from seeds
    assert r[0] > 0 and r[1] > 0 and r[2] > 0
    assert r[0] > r[2]  # trust decays with distance from the seed


def test_transitive_ancestors_cycle_guard(spark):
    from flink_cdc_dsql_master_spark.operators.graph import (
        transitive_ancestors)

    # 1 -> 2 -> 3 -> 1 cycle must raise, not loop or truncate silently
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "child long, parent long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_depth"):
        transitive_ancestors(cyc, max_depth=8).count()

    # clean chain: full closure with correct depths
    chain = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], "child long, parent long")
    rows = {(r["node"], r["ancestor"]): r["depth"]
            for r in transitive_ancestors(chain).collect()}
    assert rows[(4, 3)] == 1 and rows[(4, 2)] == 2 and rows[(4, 1)] == 3
    assert rows[(2, 1)] == 1 and len(rows) == 6


def test_blocklist_filter_subdomain_boundary(spark):
    """'evil.test' blocks itself and true subdomains, but NOT
    'notevil.test' (the dot-boundary rule) and NOT 'evil.test.com'
    (suffix is domain-anchored)."""
    from flink_cdc_dsql_master_spark.operators.web import blocklist_filter

    rows = [(1, "https://evil.test/a"),
            (2, "https://ads.evil.test/b"),
            (3, "https://notevil.test/c"),
            (4, "https://evil.test.com/d"),
            (5, "https://WWW.ok.example/e")]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = sorted(r["id"] for r in
                  blocklist_filter(df, "url", ["evil.test"]).collect())
    assert kept == [3, 4, 5]


def test_pretokenize_counts_semantics(spark):
    from flink_cdc_dsql_master_spark.operators.text import (
        pretokenize_counts)

    df = spark.createDataFrame(
        [(1, "It's 42 cats, it's fun!!")], "id long, text string")
    got = {r["token"]: r["n"]
           for r in pretokenize_counts(df, "text", top=20).collect()}
    # contraction split off; space-prefixed vs bare word are DISTINCT
    # types (the GPT-2 convention), numbers/punct space-prefixed
    assert got["'s"] == 2
    assert got["it"] == 1 and got[" it"] == 1
    assert got[" 42"] == 1 and got[","] == 1 and got["!!"] == 1
    # no whitespace-only tokens in the table
    assert all(t.strip() for t in got)
