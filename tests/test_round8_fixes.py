"""Regression tests for the round-8 ADVICE fixes.

1. __op_ts must not leak into sink wire payloads or merged tables
   (shared INTERNAL_COLUMNS exclusion, events.py).
2. Persisted blooms carry a format version; unknown/older formats never
   prune (lakehouse.BLOOM_FORMAT_VERSION).
3. decode_jpeg rejects multi-scan baseline files and single-component
   scans with sampling factors > 1 instead of returning wrong pixels.
4. logistic_fit_gd's BCE uses the stable softplus form — finite loss for
   large |z| (unscaled features).
5. pin() centralizes the persist/localCheckpoint/checkpoint choice.
"""

import math
import struct

import pytest

from flink_cdc_dsql_master_spark.events import (
    INTERNAL_COLUMNS, OP_COLUMN, OP_TS_COLUMN, SEQ_COLUMN)
from flink_cdc_dsql_master_spark.schema import TableId


@pytest.fixture()
def ts_changelog(spark):
    rows = [
        (1, "alice", 10.0, "+I", 1, 1700000001000),
        (2, "bob", 20.0, "+I", 2, 1700000002000),
        (2, "bob", 20.0, "-D", 3, 1700000003000),
    ]
    return spark.createDataFrame(
        rows, f"id int, name string, balance double, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long, {OP_TS_COLUMN} long")


def test_internal_columns_tuple_is_complete():
    assert OP_TS_COLUMN in INTERNAL_COLUMNS
    assert set(INTERNAL_COLUMNS) == {"__op", "__table_id", "__seq",
                                     "__op_ts"}


def test_op_ts_not_leaked_by_json_encoders(ts_changelog):
    from flink_cdc_dsql_master_spark.sinks import (
        canal_json, debezium_json, elasticsearch_bulk, maxwell_json)

    tid = TableId.parse("db.s.t")
    for enc in (debezium_json, canal_json, maxwell_json):
        payloads = [r["value"] for r in enc(ts_changelog, tid).collect()]
        assert payloads, enc.__name__
        for p in payloads:
            assert "__op_ts" not in p, enc.__name__
    bulk = [r["source"] for r in
            elasticsearch_bulk(ts_changelog, tid, ["id"]).collect()
            if r["source"] is not None]
    assert bulk and all("__op_ts" not in p for p in bulk)


def test_op_ts_not_persisted_by_merge(tmp_path, ts_changelog):
    from flink_cdc_dsql_master_spark.schema import Schema
    from flink_cdc_dsql_master_spark.sinks import merge_into_parquet

    schema = Schema.of([("id", "INT NOT NULL"), ("name", "STRING"),
                        ("balance", "DOUBLE")], primary_keys=["id"])
    path = str(tmp_path / "t")
    merge_into_parquet(path, ts_changelog, schema)
    out = ts_changelog.sparkSession.read.parquet(path)
    assert "__op_ts" not in out.columns
    assert sorted(r["id"] for r in out.collect()) == [1]  # 2 was deleted


def test_bloom_version_gates_pruning():
    from flink_cdc_dsql_master_spark.lakehouse import (
        BLOOM_FORMAT_VERSION, _bloom_may_contain, _build_bloom)

    b = _build_bloom([1, 2, 3])
    assert b["fmt"] == BLOOM_FORMAT_VERSION
    assert _bloom_may_contain(b, 1)
    assert not _bloom_may_contain(b, 999)  # current format may prune
    legacy = {k: v for k, v in b.items() if k != "fmt"}  # pre-versioning
    assert _bloom_may_contain(legacy, 999)  # unknown format: never prune
    older = dict(b, fmt=BLOOM_FORMAT_VERSION - 1)
    assert _bloom_may_contain(older, 999)


def _sof(nc: int, comps: bytes) -> bytes:
    return (struct.pack(">HH", 0xFFC0, 8 + 3 * nc)
            + struct.pack(">BHHB", 8, 8, 8, nc) + comps)


def test_jpeg_rejects_multiscan_and_subsampled_single_scan():
    from flink_cdc_dsql_master_spark.operators import multimodal as mm

    # 3-component SOF, SOS covering only 1 component (multi-scan file)
    multi = (b"\xFF\xD8"
             + _sof(3, bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
             + struct.pack(">HH", 0xFFDA, 8)
             + bytes([1, 1, 0x00, 0, 63, 0]))
    with pytest.raises(ValueError, match="multi-scan"):
        mm.decode_jpeg(multi)

    # single-component scan whose component has sampling factors 2x2
    sub = (b"\xFF\xD8"
           + _sof(1, bytes([1, 0x22, 0]))
           + struct.pack(">HH", 0xFFDA, 8)
           + bytes([1, 1, 0x00, 0, 63, 0]))
    with pytest.raises(ValueError, match="sampling factors"):
        mm.decode_jpeg(sub)

    # interleaved single-scan still decodes
    arr = mm.decode_jpeg(mm.synth_jpeg_bytes(16, 8))
    assert arr.shape[:2] == (8, 16)


def test_logistic_loss_finite_for_unscaled_features(spark):
    from flink_cdc_dsql_master_spark.operators.features import (
        logistic_fit_gd)

    # perfectly separable, huge feature magnitudes: after a few steps
    # z ~ w1*1e3 is far past exp overflow in the naive log(1+exp(z)) form
    rows = [(1.0, 1000.0, 0.0), (1.0, 900.0, 1.0),
            (0.0, -1000.0, 0.0), (0.0, -950.0, 1.0)] * 5
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = logistic_fit_gd(df, "y", "x1", "x2", steps=5, lr=2.0).first()
    assert math.isfinite(out["log_loss"])
    assert out["log_loss"] >= 0.0


def test_pin_modes(spark):
    from flink_cdc_dsql_master_spark.pinning import PIN_MODE_CONF, pin

    df = spark.range(10)
    try:
        spark.conf.set(PIN_MODE_CONF, "persist")
        p = pin(df)
        assert p.storageLevel.useMemory  # persisted, lineage kept
        p.unpersist()
        spark.conf.set(PIN_MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="pinMode"):
            pin(df)
    finally:
        spark.conf.unset(PIN_MODE_CONF)
    assert pin(df).count() == 10  # default localCheckpoint path
