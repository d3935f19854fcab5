"""Round-4 operators: decontamination, prefix containment, interval join,
sequence packing."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.operators import dedup, sampling
from flink_cdc_dsql_master_spark.operators.joins import interval_join


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


class TestDecontaminate:
    @pytest.fixture()
    def corpus(self, spark):
        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta"),
             (2, "totally unrelated words here"),
             (3, "beta gamma delta epsilon")],
            "doc_id long, text string")
        ev = spark.createDataFrame(
            [(100, "x y alpha beta gamma z")], "doc_id long, text string")
        return train, ev

    def test_hits_flag_overlapping_docs(self, corpus):
        train, ev = corpus
        hits = {r["doc_id"]: r["n_hits"]
                for r in dedup.decontaminate_hits(train, ev).collect()}
        # doc 1 shares the 3-gram "alpha beta gamma"; docs 2 and 3 share none
        assert hits == {1: 1}

    def test_decontaminate_drops_hits_only(self, corpus):
        train, ev = corpus
        kept = sorted(r["doc_id"]
                      for r in dedup.decontaminate(train, ev).collect())
        assert kept == [2, 3]

    def test_clean_eval_set_removes_nothing(self, spark, corpus):
        train, _ = corpus
        ev = spark.createDataFrame([(9, "nothing in common at all")],
                                   "doc_id long, text string")
        assert dedup.decontaminate(train, ev).count() == train.count()


class TestPrefixDuplicates:
    def test_prefix_equal_and_short_docs(self, spark):
        base = "a" * 16 + " " + "b" * 15  # 32 normalized chars
        df = spark.createDataFrame(
            [(1, base),                       # prefix of 2
             (2, base + " " + "c" * 10),
             (3, base),                       # equal text to 1 -> one pair
             (4, "short text"),               # under min_len: skipped
             (5, "completely different " + "z" * 20)],
            "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["prefix_len"]
               for r in dedup.prefix_duplicates(df).collect()}
        assert set(got) == {(1, 2), (3, 2), (1, 3)}
        assert got[(1, 2)] == 32

    def test_normalization_applies(self, spark):
        df = spark.createDataFrame(
            [(1, "  The   QUICK brown fox jumps over all"),
             (2, "the quick brown fox jumps over all the lazy dogs")],
            "doc_id long, text string")
        got = {(r["id_a"], r["id_b"])
               for r in dedup.prefix_duplicates(df).collect()}
        assert got == {(1, 2)}


class TestIntervalJoin:
    @pytest.fixture()
    def sides(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(30)), (2, 10, _ts(50)), (3, 20, _ts(30))],
            "l_id long, l_key long, l_ts timestamp")
        right = spark.createDataFrame(
            [(101, 10, _ts(10)),              # 20 min before l1
             (102, 10, _ts(29, 59)),          # 1 s before l1
             (103, 10, _ts(30)),              # exactly at l1 (inclusive)
             (104, 10, _ts(31)),              # after l1, inside l2 window
             (105, 20, _ts(25)),              # matches l3 (other key)
             (106, 99, _ts(29))],             # no such key
            "r_id long, r_key long, r_ts timestamp")
        return left, right

    def test_lookback_window(self, sides):
        left, right = sides
        out = interval_join(left, right, [("l_key", "r_key")],
                            "l_ts", "r_ts", lower_s=-1800.0, upper_s=0.0)
        got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
        # l2 @50: its [20, 50] window also catches 102/103/104
        assert got == [(1, 101), (1, 102), (1, 103), (2, 102), (2, 103),
                       (2, 104), (3, 105)]

    def test_symmetric_window_and_exact_bounds(self, sides):
        left, right = sides
        out = interval_join(left, right, [("l_key", "r_key")],
                            "l_ts", "r_ts", lower_s=-60.0, upper_s=60.0)
        got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
        # l1 @30: r102 (29:59), r103 (30:00), r104 (31:00 == +60 inclusive)
        assert got == [(1, 102), (1, 103), (1, 104)]

    def test_bucket_width_independence(self, sides):
        left, right = sides
        a = interval_join(left, right, [("l_key", "r_key")],
                          "l_ts", "r_ts", -1800.0, 0.0)
        b = interval_join(left, right, [("l_key", "r_key")],
                          "l_ts", "r_ts", -1800.0, 0.0,
                          bucket_width_s=137.0)
        ka = sorted((r["l_id"], r["r_id"]) for r in a.collect())
        kb = sorted((r["l_id"], r["r_id"]) for r in b.collect())
        assert ka == kb

    def test_rejects_overlapping_columns(self, spark, sides):
        left, _ = sides
        with pytest.raises(ValueError, match="ambiguous"):
            interval_join(left, left, [("l_key", "l_key")],
                          "l_ts", "l_ts", -1.0, 1.0)

    def test_rejects_inverted_bounds(self, sides):
        left, right = sides
        with pytest.raises(ValueError, match="upper_s"):
            interval_join(left, right, [("l_key", "r_key")],
                          "l_ts", "r_ts", 10.0, -10.0)


class TestPackSequences:
    def test_bins_fill_to_budget(self, spark):
        df = spark.createDataFrame(
            [(i, "s", 100) for i in range(10)],
            "doc_id long, source string, n long")
        out = sampling.pack_sequences(df, "n", 250, "source", "doc_id")
        bins = {r["doc_id"]: r["bin_id"] for r in out.collect()}
        # preceding cumsum: 0,100,...,900 -> floor(/250): 0,0,0,1,1,2,2,2,3,3
        assert [bins[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]

    def test_streams_pack_independently(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 600), (2, "a", 600), (3, "b", 100), (4, "b", 100)],
            "doc_id long, source string, n long")
        out = sampling.pack_sequences(df, "n", 512, "source", "doc_id")
        bins = {r["doc_id"]: r["bin_id"] for r in out.collect()}
        assert bins == {1: 0, 2: 1, 3: 0, 4: 0}

    def test_rejects_bad_budget(self, spark):
        df = spark.createDataFrame([(1, "a", 5)],
                                   "doc_id long, source string, n long")
        with pytest.raises(ValueError, match="budget"):
            sampling.pack_sequences(df, "n", 0, "source", "doc_id")


class TestWeightedSample:
    def test_heavier_keys_win(self, spark):
        # one huge weight among tiny ones: the huge one's priority
        # u^(1/w) -> ~1 and must be selected
        rows = [(i, "g", 1) for i in range(50)] + [(99, "g", 10_000_000)]
        df = spark.createDataFrame(rows, "k long, g string, w long")
        out = sampling.weighted_sample(df, "k", "w", 5, part_col="g")
        assert 99 in {r["k"] for r in out.collect()}

    def test_deterministic_and_sized(self, spark):
        df = spark.createDataFrame([(i, "g", i + 1) for i in range(40)],
                                   "k long, g string, w long")
        a = {r["k"] for r in
             sampling.weighted_sample(df, "k", "w", 10).collect()}
        b = {r["k"] for r in
             sampling.weighted_sample(df, "k", "w", 10).collect()}
        assert a == b and len(a) == 10

    def test_salt_changes_sample(self, spark):
        df = spark.createDataFrame([(i, i + 1) for i in range(200)],
                                   "k long, w long")
        a = {r["k"] for r in
             sampling.weighted_sample(df, "k", "w", 20, salt="x").collect()}
        b = {r["k"] for r in
             sampling.weighted_sample(df, "k", "w", 20, salt="y").collect()}
        assert a != b

    def test_rejects_bad_n(self, spark):
        df = spark.createDataFrame([(1, 1)], "k long, w long")
        with pytest.raises(ValueError, match="n must"):
            sampling.weighted_sample(df, "k", "w", 0)


class TestMixtureResample:
    @pytest.fixture()
    def skewed(self, spark):
        rows = ([(i, "big") for i in range(900)]
                + [(1000 + i, "small") for i in range(100)])
        return spark.createDataFrame(rows, "k long, d string")

    def test_temperature_flattens(self, skewed):
        rates = {r["d"]: r["rate"] for r in
                 sampling.mixture_rates(skewed, "d", 500,
                                        temperature=0.5).collect()}
        # τ=0.5 boosts the tail: small keeps a larger fraction than big
        assert rates["small"] > rates["big"]
        assert 0 < rates["big"] < 1

    def test_rate_capped_at_one(self, skewed):
        rates = {r["d"]: (r["rate"], r["threshold"]) for r in
                 sampling.mixture_rates(skewed, "d", 100_000,
                                        temperature=0.5).collect()}
        assert all(r == 1.0 and thr == 65536
                   for r, thr in rates.values())
        # at rate 1.0 the integer threshold keeps EVERY row
        kept = sampling.mixture_resample(skewed, "d", "k", 100_000,
                                         temperature=0.5)
        assert kept.count() == skewed.count()

    def test_resample_near_target(self, skewed):
        kept = sampling.mixture_resample(skewed, "d", "k", 500,
                                         temperature=0.5).count()
        assert 380 <= kept <= 620  # ~target with 16-bit hash noise


class TestBM25:
    def test_ranking_and_exact_score(self, spark):
        import math
        from flink_cdc_dsql_master_spark.operators.text import bm25_topk
        docs = spark.createDataFrame(
            [(1, "data data data pad"),      # tf=3, dl=4
             (2, "data pad pad pad"),        # tf=1, dl=4
             (3, "pad pad pad pad"),         # no match
             (4, "rare pad pad pad")],       # matches only 'rare'
            "doc_id int, text string")
        got = {r["id"]: r["score"]
               for r in bm25_topk(docs, ["data", "rare"], k=10).collect()}
        assert 3 not in got and set(got) == {1, 2, 4}
        # doc1 outranks doc2 (higher tf, same dl); 'rare' (df=1) has the
        # highest idf so doc4 outranks doc2
        assert got[1] > got[2] and got[4] > got[2]
        # closed-form check for doc2: idf(data: df=2, N=4), tf=1, dl=avgdl
        idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
        want = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 1.0))
        assert abs(got[2] - want) < 1e-9

    def test_k_truncates(self, spark):
        from flink_cdc_dsql_master_spark.operators.text import bm25_topk
        docs = spark.createDataFrame(
            [(i, "data pad") for i in range(20)], "doc_id int, text string")
        assert bm25_topk(docs, ["data"], k=5).count() == 5


class TestBPEPairs:
    def test_weighted_counts_and_single_char_words(self, spark):
        from flink_cdc_dsql_master_spark.operators.text import bpe_pair_counts
        docs = spark.createDataFrame(
            [(1, "ab ab a"), (2, "ab abc")], "doc_id int, text string")
        got = {r["pair"]: r["freq"]
               for r in bpe_pair_counts(docs, top_n=10).collect()}
        # 'ab' appears in: word 'ab' (freq 3) + word 'abc' (freq 1) = 4;
        # the 1-char word 'a' must produce NO pair (Spark sequence(1,0)
        # is descending, not empty — regression guard)
        assert got == {"ab": 4, "bc": 1}


class TestSCD2:
    def test_delete_then_reinsert_versions(self, spark):
        from flink_cdc_dsql_master_spark.partitioning import scd2_history
        cl = spark.createDataFrame(
            [(1, "v1", 10, "+I"),
             (1, "v1b", 11, "-U"),   # before-image: ignored
             (1, "v2", 12, "+U"),
             (1, None, 13, "-D"),    # closes v2, opens nothing
             (1, "v3", 14, "+I"),    # re-insert opens a fresh version
             (2, "w1", 20, "+I")],
            "k int, val string, __seq long, __op string")
        got = sorted(
            (r["k"], r["val"], r["valid_from_seq"], r["valid_to_seq"],
             r["is_current"])
            for r in scd2_history(cl, ["k"]).collect())
        assert got == [
            (1, "v1", 10, 12, False),
            (1, "v2", 12, 13, False),
            (1, "v3", 14, None, True),
            (2, "w1", 20, None, True),
        ]


class TestApproxDistinct:
    def test_hll_within_tolerance_of_exact(self, spark):
        """approx_count_distinct (HyperLogLog++) is the 100 TB path for
        distinct-user counting (mergeable sketches, no distinct-expand
        shuffle); assert the default-rsd estimate lands within 5% of the
        exact answer on real data."""
        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        row = ev.agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx")).collect()[0]
        assert row["exact"] > 0
        assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


class TestInvertedIndex:
    def test_df_cuts_and_postings_order(self, spark):
        from flink_cdc_dsql_master_spark.operators.text import inverted_index
        docs = spark.createDataFrame(
            [(3, "a b"), (1, "a b c"), (2, "a b b")],  # b distinct per doc
            "doc_id int, text string")
        full = {r["term"]: (r["df_t"], list(r["postings"]))
                for r in inverted_index(docs).collect()}
        assert full == {"a": (3, [1, 2, 3]), "b": (3, [1, 2, 3]),
                        "c": (1, [1])}
        # min_df cuts the hapax; max_df_ratio cuts the stopword grade
        assert {r["term"] for r in
                inverted_index(docs, min_df=2).collect()} == {"a", "b"}
        assert {r["term"] for r in
                inverted_index(docs, min_df=2,
                               max_df_ratio=0.9).collect()} == set()


class TestMinimalChangelog:
    def test_net_noop_and_op_rewrite(self, spark):
        from flink_cdc_dsql_master_spark.partitioning import minimal_changelog
        cl = spark.createDataFrame(
            [(1, "a", 1, "+I"),   # absent key: insert+delete = net no-op
             (1, None, 2, "-D"),
             (2, "b", 3, "+I"),   # present key: +I must become +U
             (3, "c", 4, "+U"),   # absent key: +U must become +I
             (4, None, 5, "-D")], # present key: delete kept
            "k int, v string, __seq long, __op string")
        existing = spark.createDataFrame([(2,), (4,)], "k int")
        got = sorted((r["k"], r["__op"]) for r in
                     minimal_changelog(cl, existing, ["k"]).collect())
        assert got == [(2, "+U"), (3, "+I"), (4, "-D")]


class TestSubstringContainment:
    def test_mid_document_and_word_boundary(self, spark):
        from flink_cdc_dsql_master_spark.operators.dedup import (
            substring_containment_pairs)
        long = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau")
        mid = "zeta eta theta iota kappa lambda mu"   # mid-doc excerpt
        # same chars but crossing a word boundary -> must NOT match
        part = "ta eta theta iota kappa lambda mu nu"
        docs = spark.createDataFrame(
            [(1, long), (2, mid), (3, part)], "doc_id int, text string")
        got = sorted((r["id_a"], r["id_b"]) for r in
                     substring_containment_pairs(
                         docs, min_len=20).collect())
        assert got == [(2, 1)]


class TestIVM:
    def test_group_vanishes_on_net_zero(self, spark):
        from flink_cdc_dsql_master_spark.operators import ivm
        b1 = spark.createDataFrame(
            [("h1", 5.0, "+I"), ("h2", 7.0, "+I")],
            "g string, value double, __op string")
        b2 = spark.createDataFrame(
            [("h1", 5.0, "-D"),                      # h1 nets to zero
             ("h2", 7.0, "-U"), ("h2", 9.0, "+U")],  # h2 value updated
            "g string, value double, __op string")
        st = ivm.merge_rollup(None, ivm.rollup_delta(b1, ["g"], "value"),
                              ["g"])
        st = ivm.merge_rollup(st, ivm.rollup_delta(b2, ["g"], "value"),
                              ["g"])
        rows = {r["g"]: (r["n"], r["total"]) for r in
                ivm.rollup_view(st).collect()}
        assert rows == {"h2": (1, 9.0)}


class TestSCD2Incremental:
    def test_two_batch_equals_one_shot(self, spark):
        from flink_cdc_dsql_master_spark.partitioning import (
            scd2_apply_increment, scd2_history)
        rows = [(1, "v1", 10, "+I"), (1, "v2", 12, "+U"),
                (2, "w1", 11, "+I"), (1, None, 14, "-D"),
                (1, "v3", 16, "+I"), (2, "w2", 15, "+U"),
                (3, "x1", 17, "+I")]
        schema = "k int, val string, __seq long, __op string"
        full = spark.createDataFrame(rows, schema)
        b1 = spark.createDataFrame(rows[:3], schema)
        b2 = spark.createDataFrame(rows[3:], schema)
        one_shot = scd2_history(full, ["k"])
        inc = scd2_apply_increment(None, b1, ["k"])
        inc = scd2_apply_increment(inc, b2, ["k"])
        key = lambda df: sorted(
            (r["k"], r["val"], r["valid_from_seq"], r["valid_to_seq"],
             r["is_current"]) for r in df.collect())
        assert key(inc) == key(one_shot)


class TestIncrementalInvertedIndex:
    def test_two_batch_equals_rebuild(self, spark):
        from flink_cdc_dsql_master_spark.operators.text import (
            inverted_index, inverted_index_delta, merge_posting_state,
            posting_state_view)
        schema = "doc_id int, text string, __seq long, __op string"
        b1 = spark.createDataFrame(
            [(1, "apple banana", 10, "+I"),
             (2, "banana cherry", 11, "+I")], schema)
        # update doc 1 (old terms retract, new add) and delete doc 2
        b2 = spark.createDataFrame(
            [(1, "apple banana", 12, "-U"),
             (1, "apple date", 12, "+U"),
             (2, "banana cherry", 13, "-D"),
             (3, "banana", 14, "+I")], schema)
        st = merge_posting_state(None, inverted_index_delta(b1))
        st = merge_posting_state(st, inverted_index_delta(b2))
        got = {r["term"]: (r["df_t"], list(r["postings"])) for r in
               posting_state_view(st).collect()}
        # net docs: 1 -> "apple date", 3 -> "banana"
        net = spark.createDataFrame(
            [(1, "apple date"), (3, "banana")], "doc_id int, text string")
        want = {r["term"]: (r["df_t"], list(r["postings"])) for r in
                inverted_index(net).collect()}
        assert got == want
        assert got == {"apple": (1, [1]), "date": (1, [1]),
                       "banana": (1, [3])}


class TestForgetUserCascade:
    def test_purge_user_retracts_rollups(self, spark):
        """Right-to-be-forgotten: purging one user emits delete events
        for every fact row, and the signed-partial rollup retracts
        exactly that user's contribution — equal to re-aggregating the
        surviving facts (no history rescan in the maintained path)."""
        from flink_cdc_dsql_master_spark.operators import ivm
        facts = spark.createDataFrame(
            [(1, "h1", 2.0), (1, "h2", 3.0), (2, "h1", 5.0),
             (3, "h2", 7.0)], "user int, g string, value double")
        b1 = facts.withColumn("__op", F.lit("+I"))
        st = ivm.merge_rollup(None, ivm.rollup_delta(b1, ["g"], "value"),
                              ["g"])
        # purge user 1: the deletion changelog is the user's fact rows
        purge = (facts.where(F.col("user") == 1)
                 .withColumn("__op", F.lit("-D")))
        st = ivm.merge_rollup(st, ivm.rollup_delta(purge, ["g"], "value"),
                              ["g"])
        got = {r["g"]: (r["n"], r["total"]) for r in
               ivm.rollup_view(st).collect()}
        assert got == {"h1": (1, 5.0), "h2": (1, 7.0)}


class TestFuzzyTrigramJoin:
    def test_prefix_filter_complete_with_frequent_grams(self, spark):
        """Every row shares the frequent 'aaaa' block; the matching pair
        differs only in a rare tail. The prefix filter must still find
        the qualifying pair (completeness) and exclude dissimilar ones."""
        from flink_cdc_dsql_master_spark.operators.joins import (
            fuzzy_trigram_join)
        left = spark.createDataFrame(
            [(1, "aaaaaa corp xyz"), (2, "aaaaaa totally other")],
            "id int, name string")
        right = spark.createDataFrame(
            [(10, "aaaaaa corp xyw"), (11, "aaaaaa different ltd")],
            "id int, name string")
        got = {(r["id_a"], r["id_b"]): r["similarity"] for r in
               fuzzy_trigram_join(left, right, "id", "id",
                                  "name", "name", 0.5).collect()}
        assert (1, 10) in got and got[(1, 10)] >= 0.5
        assert all(k == (1, 10) or v >= 0.5 for k, v in got.items())
        assert (2, 11) not in got


class TestZOrder:
    def test_interleave_known_values(self, spark):
        from flink_cdc_dsql_master_spark.partitioning import zorder_key
        df = spark.createDataFrame(
            [(0b101, 0b011)], "a int, b int")
        got = df.select(zorder_key(["a", "b"], bits=3).alias("z")) \
            .collect()[0]["z"]
        # a bits at even positions, b bits at odd:
        # a=101, b=011 -> z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
        assert got == 0b011011

    def test_locality_beats_concatenation(self, spark):
        """The z-curve keeps 2-D neighbors closer in key space than
        simple concatenation: points equal in one dim and adjacent in
        the other differ by a small amount in z, while concatenated keys
        jump by 2^bits when the high dim moves."""
        from flink_cdc_dsql_master_spark.partitioning import zorder_key
        df = spark.createDataFrame([(5, 5), (6, 5)], "a int, b int")
        zs = [r["z"] for r in
              df.select(zorder_key(["a", "b"], bits=8).alias("z"))
              .collect()]
        assert abs(zs[1] - zs[0]) < (1 << 8)  # concat key would differ by 256 exactly in high part


class TestSnapshotDiff:
    def test_round_trip_reproduces_new(self, spark):
        """apply_changelog(old as inserts + diff) == new, including a
        NULL-value update and an all-NULL row (presence from side tags,
        not data nullability)."""
        from flink_cdc_dsql_master_spark.partitioning import apply_changelog
        from flink_cdc_dsql_master_spark.sources import snapshot_diff
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "k int, v string")
        new = spark.createDataFrame(
            [(1, "a"), (2, None), (4, "d")], "k int, v string")
        d = snapshot_diff(old, new, ["k"])
        ops = sorted((r["k"], r["__op"]) for r in d.collect())
        assert ops == [(2, "+U"), (2, "-U"), (3, "-D"), (4, "+I")]
        base = (old.withColumn("__op", F.lit("+I"))
                .withColumn("__seq", F.lit(0).cast("long")))
        replay = d.withColumn("__seq", F.lit(1).cast("long"))
        final = apply_changelog(base.unionByName(replay), ["k"])
        got = sorted((r["k"], r["v"]) for r in final.collect())
        assert got == [(1, "a"), (2, None), (4, "d")]


class TestApproxPercentile:
    def test_tdigest_within_tolerance_of_exact(self, spark):
        """approx_percentile (mergeable t-digest partials) is the 100 TB
        swap for the exact percentile queries; assert p50/p95 land
        within 2% relative error on real data."""
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        row = li.agg(
            F.percentile("l_extendedprice", 0.5).alias("e50"),
            F.percentile("l_extendedprice", 0.95).alias("e95"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("a50"),
            F.expr("approx_percentile(l_extendedprice, 0.95)").alias("a95"),
        ).collect()[0]
        assert abs(row["a50"] - row["e50"]) / row["e50"] < 0.02
        assert abs(row["a95"] - row["e95"]) / row["e95"] < 0.02


def test_ivm_multiset_distinct_min_max(spark):
    """Two-level multiset state: COUNT(DISTINCT)/MIN/MAX stay exact
    under partial deletes of duplicated values and full retraction."""
    from flink_cdc_dsql_master_spark.events import OP_COLUMN
    from flink_cdc_dsql_master_spark.operators import ivm
    from pyspark.sql import functions as F

    g, v = ["g"], "v"
    b1 = spark.createDataFrame(
        [("a", 1, "+I"), ("a", 1, "+I"), ("a", 2, "+I"), ("b", 9, "+I")],
        f"g string, v long, {OP_COLUMN} string")
    state = ivm.merge_multiset(None, ivm.multiset_delta(b1, g, v), g, v)
    got = {r["g"]: (r["n_distinct"], r["min_value"], r["max_value"])
           for r in ivm.multiset_view(state, g, v).collect()}
    assert got == {"a": (2, 1, 2), "b": (1, 9, 9)}

    # delete ONE of the duplicated (a,1) rows: still present; delete
    # (a,2) entirely: min/max/distinct must re-derive without a rescan
    b2 = spark.createDataFrame(
        [("a", 1, "-D"), ("a", 2, "-D"), ("b", 9, "-D")],
        f"g string, v long, {OP_COLUMN} string")
    state = ivm.merge_multiset(state, ivm.multiset_delta(b2, g, v), g, v)
    got = {r["g"]: (r["n_distinct"], r["min_value"], r["max_value"])
           for r in ivm.multiset_view(state, g, v).collect()}
    assert got == {"a": (1, 1, 1)}  # b vanished entirely
    # state carries no zero-multiplicity residue
    assert state.where(F.col("d_mult") == 0).count() == 0
