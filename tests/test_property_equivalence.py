"""Property-based equivalence: the scalable formulations (bucketed
interval join, bucketed prefix containment, windowed packing) must match
brute-force Python oracles on arbitrary hypothesis-generated inputs.

Each property runs few examples (Spark jobs are ~0.5 s each) but every
example is adversarial: hypothesis shrinks any failure to a minimal
counterexample, which is exactly how boundary bugs in bucket arithmetic
(inclusive bounds, negative intervals, bucket straddling) surface.
"""

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_dsql_master_spark.operators import dedup, sampling
from flink_cdc_dsql_master_spark.operators.joins import interval_join

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(seconds_micros):
    sec, micro = seconds_micros
    return _BASE + dt.timedelta(seconds=sec, microseconds=micro)


_EVENT = st.tuples(st.integers(0, 3),                     # key
                   st.tuples(st.integers(0, 7200),        # seconds
                             st.integers(0, 999999)))     # micros


@settings(**_SETTINGS)
@given(left=st.lists(_EVENT, min_size=0, max_size=12),
       right=st.lists(_EVENT, min_size=0, max_size=12),
       lower=st.integers(-3600, 3600), span=st.integers(0, 3600))
def test_interval_join_equals_bruteforce(spark, left, right, lower, span):
    upper = lower + span
    ldf = spark.createDataFrame(
        [(i, k, _t(ts)) for i, (k, ts) in enumerate(left)] or [],
        "l_id long, l_key long, l_ts timestamp")
    rdf = spark.createDataFrame(
        [(i, k, _t(ts)) for i, (k, ts) in enumerate(right)] or [],
        "r_id long, r_key long, r_ts timestamp")
    out = interval_join(ldf, rdf, [("l_key", "r_key")], "l_ts", "r_ts",
                        float(lower), float(upper))
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())

    expected = sorted(
        (li, ri)
        for li, (lk, lts) in enumerate(left)
        for ri, (rk, rts) in enumerate(right)
        if lk == rk and lower * 1_000_000
        <= ((_t(rts) - _t(lts)) / dt.timedelta(microseconds=1))
        <= upper * 1_000_000)
    assert got == expected


_WORD = st.text(alphabet="ab", min_size=1, max_size=3)


@settings(**_SETTINGS)
@given(texts=st.lists(st.lists(_WORD, min_size=8, max_size=14)
                      .map(" ".join), min_size=0, max_size=8))
def test_prefix_duplicates_equals_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)) or [], "doc_id long, text string")
    got = sorted((r["id_a"], r["id_b"])
                 for r in dedup.prefix_duplicates(df, min_len=4).collect())

    norm = [re.sub(r"\s+", " ", t.lower()).strip() for t in texts]
    expected = sorted(
        (a, b)
        for a in range(len(texts)) for b in range(len(texts))
        if a != b and len(norm[a]) >= 4 and norm[b].startswith(norm[a])
        and (len(norm[b]) > len(norm[a])
             or (len(norm[b]) == len(norm[a]) and a < b)))
    assert got == expected


@settings(**_SETTINGS)
@given(docs=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 600)),
                     min_size=0, max_size=16),
       budget=st.integers(1, 1000))
def test_pack_sequences_equals_bruteforce(spark, docs, budget):
    df = spark.createDataFrame(
        [(i, str(g), n) for i, (g, n) in enumerate(docs)] or [],
        "doc_id long, source string, n long")
    out = sampling.pack_sequences(df, "n", budget, "source", "doc_id")
    got = {r["doc_id"]: r["bin_id"] for r in out.collect()}

    expected = {}
    for g in {g for g, _ in docs}:
        cum = 0
        for i, (gg, n) in enumerate(docs):
            if gg == g:
                expected[i] = cum // budget
                cum += n
    assert got == expected


_EDGES = st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                  min_size=0, max_size=25)


@settings(**_SETTINGS)
@given(edges=_EDGES, k=st.integers(2, 4))
def test_kcore_equals_bruteforce_peel(spark, edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    # python fixed-point peel (the operator runs 6 rounds — enough to
    # converge on <= 10 nodes, which the brute force confirms)
    cur = set(und)
    while True:
        deg: dict = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in alive and v in alive}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for u, v in cur:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    expected = {n: d for n, d in deg.items() if d >= k}

    from flink_cdc_dsql_master_spark.operators.graph import kcore

    df = spark.createDataFrame(list(und), "src long, dst long")
    got = {r["node"]: r["deg"] for r in kcore(df, k=k, rounds=6).collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(edges=_EDGES,
       seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
       max_hops=st.integers(1, 4))
def test_bfs_hops_equals_bruteforce(spark, edges, seeds, max_hops):
    adj: dict = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {d for n in frontier for d in adj.get(n, ())
               if d not in dist}
        for d in nxt:
            dist[d] = h
        frontier = nxt

    from flink_cdc_dsql_master_spark.operators.graph import bfs_hops

    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(0, 0)],
        "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["hops"]
           for r in bfs_hops(df, sdf, max_hops=max_hops).collect()}
    assert got == dist
