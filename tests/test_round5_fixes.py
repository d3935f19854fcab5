"""Regression tests for the round-4 ADVICE items: crash-safe state
reading, scd2 incremental -U seq handling, PQ sampling over sparse id
spaces, and the BM25 empty-corpus guard."""
import os

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import (
    OP_COLUMN, OP_INSERT, OP_UPDATE_AFTER, OP_UPDATE_BEFORE, SEQ_COLUMN)

from conftest import SF_DIR


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, f"k int, v string, {OP_COLUMN} string, {SEQ_COLUMN} long")


class TestReadParquetState:
    def test_missing_path_returns_none(self, spark, tmp_path):
        from flink_cdc_dsql_master_spark.sinks import read_parquet_state

        assert read_parquet_state(spark, str(tmp_path / "nope")) is None

    def test_normal_read(self, spark, tmp_path):
        from flink_cdc_dsql_master_spark.sinks import (
            read_parquet_state, swap_parquet_dir)

        path = str(tmp_path / "state")
        swap_parquet_dir(spark.range(5), path)
        got = read_parquet_state(spark, path)
        assert got is not None and got.count() == 5

    def test_recovers_interrupted_swap(self, spark, tmp_path):
        """Simulate a crash between swap_parquet_dir's two renames:
        path absent, data only in `.__swap_old__`. The reader must
        recover the old directory, not report empty state."""
        from flink_cdc_dsql_master_spark.sinks import (
            read_parquet_state, swap_parquet_dir)

        path = str(tmp_path / "state")
        swap_parquet_dir(spark.range(7), path)
        os.rename(path, path + ".__swap_old__")  # the crash window
        got = read_parquet_state(spark, path)
        assert got is not None and got.count() == 7
        assert os.path.exists(path)  # recovered in place

    def test_corrupt_state_raises(self, spark, tmp_path):
        """A present-but-unreadable state dir must raise, never be
        silently treated as no-prior-state (permanent data loss)."""
        from flink_cdc_dsql_master_spark.sinks import read_parquet_state

        path = tmp_path / "state"
        path.mkdir()
        (path / "part-00000.parquet").write_bytes(b"not a parquet file")
        with pytest.raises(Exception):
            df = read_parquet_state(spark, str(path))
            # Spark may defer footer reads to the action:
            if df is not None:
                df.collect()


class TestScd2BeforeImageSeq:
    def test_minus_u_lower_seq_matches_rebuild(self, spark):
        """A -U before-image carrying a LOWER seq than its +U pair must
        not shift where the prior open version closes: the incremental
        fold must equal the one-shot scd2_history rebuild."""
        from flink_cdc_dsql_master_spark.partitioning import (
            scd2_apply_increment, scd2_history)

        b1 = _chg(spark, [(1, "a", OP_INSERT, 10)])
        # -U at seq 15, +U at seq 20: the open version from seq 10 must
        # close at 20 (the eventful image), not 15.
        b2 = _chg(spark, [(1, "a", OP_UPDATE_BEFORE, 15),
                          (1, "b", OP_UPDATE_AFTER, 20)])
        inc = scd2_apply_increment(
            scd2_apply_increment(None, b1, ["k"]), b2, ["k"])
        full = scd2_history(b1.unionByName(b2), ["k"])
        key = ["k", "valid_from_seq"]
        assert sorted(map(tuple, inc.select(
            "k", "v", "valid_from_seq", "valid_to_seq",
            "is_current").collect())) == \
            sorted(map(tuple, full.select(
                "k", "v", "valid_from_seq", "valid_to_seq",
                "is_current").collect()))
        closed = {tuple(r) for r in inc.where(~F.col("is_current"))
                  .select("valid_from_seq", "valid_to_seq").collect()}
        assert closed == {(10, 20)}


class TestPqSparseIds:
    def test_sparse_offset_ids_sample(self, spark):
        """Ids starting at 10_000 must still yield a full sample (the
        old `id < sample_n` predicate selected nothing)."""
        from flink_cdc_dsql_master_spark.operators.similarity import (
            train_pq_codebooks)

        df = (spark.range(10_000, 10_064)
              .select(F.col("id").alias("vec_id"),
                      F.array(*[(F.col("id") % (i + 3)).cast("float")
                                for i in range(8)]).alias("embedding")))
        books = train_pq_codebooks(df, m=4, k=4, sample_n=32, iters=2)
        assert len(books) == 4 and all(len(b) == 4 for b in books)

    def test_too_few_vectors_raises(self, spark):
        from flink_cdc_dsql_master_spark.operators.similarity import (
            train_pq_codebooks)

        df = (spark.range(3)
              .select(F.col("id").alias("vec_id"),
                      F.array(*[F.col("id").cast("float")] * 8)
                      .alias("embedding")))
        with pytest.raises(ValueError, match="sample vectors"):
            train_pq_codebooks(df, m=4, k=16, sample_n=64)


class TestPqLiteralEncode:
    def test_matches_arrow_kernel_encode(self, spark, sf_dir):
        """The pure-Catalyst literal encode and the Arrow/numpy kernel
        must emit identical codes for identical codebooks."""
        from flink_cdc_dsql_master_spark.operators.similarity import (
            fixed_pq_codebooks, pq_encode, pq_encode_literal)

        books = fixed_pq_codebooks(m=4, k=8, sub=16, seed=11)
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        lit = {r["nbr_id"]: list(r["codes"])
               for r in pq_encode_literal(emb, books).collect()}
        arrow = {r["nbr_id"]: list(r["codes"])
                 for r in pq_encode(emb, books).collect()}
        assert lit == arrow and len(lit) > 0


class TestQuantizedRerankKernels:
    def test_fused_matches_composed_kernels(self, spark):
        """All three quantized_rerank_topk kernels must return the same
        (query_id, nbr_id) sets with cosines equal to 1e-9."""
        from flink_cdc_dsql_master_spark.operators.similarity import (
            quantized_rerank_topk)

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 3)
        outs = {}
        for kern in ("fused", "numpy", "hof"):
            rows = quantized_rerank_topk(
                emb, q, k=5, n_candidates=20, kernel=kern).collect()
            outs[kern] = sorted(
                (r["query_id"], r["nbr_id"], round(r["cosine"], 9))
                for r in rows)
        assert outs["fused"] == outs["numpy"] == outs["hof"]
        assert len(outs["fused"]) == 15  # 3 queries × k


class TestBigDecimalPolicy:
    def test_ddl_dialects(self):
        """dsql dialect emits DECIMAL(65,1) verbatim (Postgres NUMERIC
        accepts it); duckdb dialect stores the canonical string."""
        from flink_cdc_dsql_master_spark.schema import Schema
        from flink_cdc_dsql_master_spark.sinks import create_table_sql

        schema = Schema.of([("k", "BIGINT NOT NULL"),
                            ("big", "DECIMAL(65,1)")], primary_keys=["k"])
        assert '"big" DECIMAL(65,1)' in create_table_sql("t", schema)
        assert '"big" VARCHAR' in create_table_sql("t", schema, "duckdb")

    def test_spark_type_is_tagged_string(self):
        from pyspark.sql import types as T

        from flink_cdc_dsql_master_spark.types import (
            CDC_META_KEY, TAG_BIG_DECIMAL, parse_type, to_spark_type)

        dt, meta = to_spark_type(parse_type("DECIMAL(65,1)"))
        assert isinstance(dt, T.StringType)
        assert meta["logical"] == TAG_BIG_DECIMAL
        assert (meta["precision"], meta["scale"]) == (65, 1)
        _ = CDC_META_KEY

    def test_exact_sum_matches_python_bigint(self, spark):
        """Limb-decomposed SUM equals Python arbitrary-precision
        arithmetic on adversarial values (max-width 65-digit values,
        carry-heavy all-nines, zero)."""
        from flink_cdc_dsql_master_spark.operators.bigdecimal import (
            exact_sum)

        vals = (["9" * 64 + ".9"] * 7          # 65-digit all-nines
                + ["0.0", "1.5", "12345678901234567890123456789.5"]
                + [str(i) * 12 + ".3" for i in range(1, 10)])
        df = spark.createDataFrame([(v,) for v in vals], "big string")
        row = exact_sum(df, "big").collect()[0]
        tot = sum(int(v.replace(".", "")) for v in vals)
        expect = f"{str(tot)[:-1]}.{str(tot)[-1]}"
        assert row["cnt"] == len(vals)
        assert row["total"] == expect


class TestBm25EmptyCorpus:
    def test_empty_corpus_returns_empty(self, spark):
        from flink_cdc_dsql_master_spark.operators.text import bm25_topk

        df = spark.createDataFrame([], "doc_id long, text string")
        out = bm25_topk(df, ["hello"], k=5)
        assert out.columns == ["id", "score"]
        assert out.count() == 0


def test_temporal_join_consistent_with_scd2_as_of(spark):
    """Internal consistency of the two event-time faces: joining facts
    pinned at sequence S against the SCD2 intervals must equal
    enriching from the scd2_as_of(S) snapshot."""
    from pyspark.sql import functions as F

    from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
    from flink_cdc_dsql_master_spark.partitioning import (scd2_as_of,
                                                          scd2_history)

    rows = [(k, float(k * 10)) for k in range(20)]
    dim = spark.createDataFrame(rows, "k long, v double")
    cl = (dim.withColumn(OP_COLUMN, F.lit("+I"))
          .withColumn(SEQ_COLUMN, F.lit(0).cast("long"))
          .unionByName(
              dim.where(F.col("k") % 2 == 0)
              .withColumn("v", F.col("v") + 1.0)
              .withColumn(OP_COLUMN, F.lit("+U"))
              .withColumn(SEQ_COLUMN, F.lit(5).cast("long"))))
    hist = scd2_history(cl, ["k"])
    facts = spark.createDataFrame(
        [(i, i % 20) for i in range(40)], "fseq long, k long") \
        .withColumn("fseq", F.lit(7).cast("long"))
    via_interval = {(r["k"], r["v"]) for r in facts.join(
        hist, (facts["k"] == hist["k"])
        & (facts["fseq"] >= hist["valid_from_seq"])
        & (hist["valid_to_seq"].isNull()
           | (facts["fseq"] < hist["valid_to_seq"])))
        .select(facts["k"], "v").collect()}
    snap = scd2_as_of(hist, 7)
    via_snapshot = {(r["k"], r["v"]) for r in facts.join(
        snap, "k").select(facts["k"], "v").collect()}
    assert via_interval == via_snapshot
    assert (0, 1.0) in via_interval  # updated version visible at seq 7
