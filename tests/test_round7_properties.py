"""Hypothesis property tests for the round-7 algorithmic cores: the
distributed two-pass rank (exactness for ANY data + monotone bucket) and
the baseline JPEG codec (DC-exact roundtrip for ANY block-constant
image)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from flink_cdc_dsql_master_spark.operators import sampling


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=9))
def test_distributed_rank_exact_on_random_multisets(spark, vals, width):
    """For random multisets (heavy ties included) and a random-width
    monotone bucket, the two-pass rank equals the global row_number."""
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, tie long")
    w = Window.orderBy(F.col("v").asc(), F.col("tie").asc())
    want = sorted((r["v"], r["tie"], r["i"]) for r in
                  df.withColumn("i", F.row_number().over(w)).collect())
    bkt = F.floor(F.col("v") / width).cast("long")
    got = sorted((r["v"], r["tie"], int(r["i"])) for r in
                 sampling.distributed_rank(
                     df, [F.col("v").asc(), F.col("tie").asc()], bkt,
                     out="i").collect())
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40))
def test_jpeg_roundtrip_exact_any_dims(w, h):
    """Every (w, h) — multiple-of-8 or not — decodes bit-exactly to the
    synthesis block-value formula through the full huffman+IDCT path."""
    from flink_cdc_dsql_master_spark.operators.multimodal import (
        decode_jpeg, synth_jpeg_bytes)

    arr = decode_jpeg(synth_jpeg_bytes(w, h))
    assert arr.shape == (h, w, 3)
    exp = np.array([[((x // 8) * 29 + (y // 8) * 37) % 256
                     for x in range(w)] for y in range(h)])
    assert (arr[:, :, 0].astype(np.int64) == exp).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=2000),
       st.integers(min_value=1, max_value=16))
def test_ntile_inverse_matches_definition(n, k):
    """ntile_from_rank reproduces the SQL ntile tile-size law (first
    n%k tiles get one extra row) for every rank — checked driver-side
    against the combinatorial definition."""
    q, r = divmod(n, k)
    # tile sizes per the SQL standard
    sizes = [q + 1 if t < r else q for t in range(k)]
    tiles = []
    for t, sz in enumerate(sizes, start=1):
        tiles += [t] * sz
    # closed form, evaluated in plain python (same arithmetic as the
    # Column expression)
    import math

    def closed(i):
        thr = r * (q + 1)
        if i <= thr:
            return math.ceil(i / (q + 1))
        return r + math.ceil((i - thr) / q)

    assert [closed(i) for i in range(1, n + 1)] == tiles


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=60))
def test_connected_components_equals_union_find(spark, raw_edges):
    """For ANY random edge list (self-loops, parallel edges, arbitrary
    direction), the pointer-jumping HashMin loop computes exactly the
    components a sequential union-find does, labeled by min id."""
    from flink_cdc_dsql_master_spark.operators.graph import (
        connected_components)

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw_edges:
        parent[find(a)] = find(b)
    nodes = {n for e in raw_edges for n in e}
    want = {}
    for n in sorted(nodes):
        root = find(n)
        want.setdefault(root, []).append(n)
    expect = {n: min(members) for members in want.values()
              for n in members}

    edges = spark.createDataFrame(raw_edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == expect
