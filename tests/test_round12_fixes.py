"""Round-12 fixes: executor-side binlog parse memoization (VERDICT r11
"what's wrong" #1 — DDL-dense micro-batches re-parsed the blob per
epoch) and its correctness pin: a K=12 multi-epoch decode still lands
every row in the right schema epoch."""

from pyspark.sql import functions as F, types as T

from flink_cdc_dsql_master_spark.binlog import (
    MAGIC,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VARCHAR,
    _parse_binlog_cached,
    decode_binlog,
    encode_fde,
    encode_query,
    encode_table_map,
    encode_write_rows,
    extract_binlog_ddl,
)


def _dense_blob(n_ddl=12, rows_per_epoch=5):
    cols2 = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 10)]
    cols3 = cols2 + [(MYSQL_TYPE_DOUBLE, None)]
    blob = MAGIC + encode_fde(120)
    ts = 1000
    k = 0
    for i in range(n_ddl + 1):
        wide = i % 2 == 1
        cols = cols3 if wide else cols2
        blob += encode_table_map(7, "tpch", "orders", cols, ts)
        rows = []
        for _ in range(rows_per_epoch):
            k += 1
            rows.append([k, f"e{i}", float(k)] if wide else [k, f"e{i}"])
        blob += encode_write_rows(7, cols, rows, ts + 100)
        ts += 1000
        if i < n_ddl:
            stmt = ("ALTER TABLE orders ADD COLUMN price DOUBLE"
                    if not wide else
                    "ALTER TABLE orders DROP COLUMN price")
            blob += encode_query("tpch", stmt, ts)
            ts += 1000
    return blob


def test_parse_cache_memoizes_pure_parse(monkeypatch):
    """The memo parses identical bytes once (pure function) and keeps
    results keyed by CONTENT — different bytes never collide."""
    import flink_cdc_dsql_master_spark.binlog as bl

    calls = []
    real = bl.parse_binlog

    def counting(data):
        calls.append(len(data))
        return real(data)

    monkeypatch.setattr(bl, "parse_binlog", counting)
    bl._PARSE_CACHE.clear()
    blob = _dense_blob(n_ddl=2)
    e1 = _parse_binlog_cached(blob)
    for _ in range(12):  # the K+1 epoch decodes of one micro-batch
        assert _parse_binlog_cached(blob) is e1
    assert len(calls) == 1

    other = _dense_blob(n_ddl=2, rows_per_epoch=3)
    e2 = _parse_binlog_cached(other)
    assert e2 is not e1 and len(calls) == 2
    bl._PARSE_CACHE.clear()


def test_parse_cache_interleaved_blobs_stay_hot(monkeypatch):
    """The multitable fan-in decodes the same DataFrame once per member
    table, so a partition holding two binlog files ALTERNATES blobs A/B
    per pass — both must stay resident (ADVICE r13: a single-slot memo
    missed every one of these accesses)."""
    import flink_cdc_dsql_master_spark.binlog as bl

    calls = []
    real = bl.parse_binlog

    def counting(data):
        calls.append(len(data))
        return real(data)

    monkeypatch.setattr(bl, "parse_binlog", counting)
    bl._PARSE_CACHE.clear()
    a = _dense_blob(n_ddl=1)
    b = _dense_blob(n_ddl=1, rows_per_epoch=3)
    for _ in range(6):  # per-member-table passes alternating blobs
        _parse_binlog_cached(a)
        _parse_binlog_cached(b)
    assert len(calls) == 2  # each blob parsed exactly once
    bl._PARSE_CACHE.clear()


def test_parse_cache_is_byte_bounded(monkeypatch):
    """The memo is bounded by TOTAL cached source bytes: inserting past
    the ceiling evicts least-recently-used entries, and a blob larger
    than the whole budget is never retained — no multi-GB per-worker
    residue from rotated 1 GB segments."""
    import flink_cdc_dsql_master_spark.binlog as bl

    bl._PARSE_CACHE.clear()
    a = _dense_blob(n_ddl=1)
    b = _dense_blob(n_ddl=1, rows_per_epoch=3)
    # budget fits exactly one of the two: inserting b evicts a (LRU)
    monkeypatch.setattr(bl, "_PARSE_CACHE_MAX_BYTES",
                        max(len(a), len(b)))
    _parse_binlog_cached(a)
    ev_b = _parse_binlog_cached(b)
    assert len(bl._PARSE_CACHE) == 1
    assert _parse_binlog_cached(b) is ev_b

    # an over-ceiling blob parses fine but is NOT retained
    monkeypatch.setattr(bl, "_PARSE_CACHE_MAX_BYTES", len(a) - 1)
    bl._PARSE_CACHE.clear()
    out = _parse_binlog_cached(a)
    assert out and len(bl._PARSE_CACHE) == 0
    bl._PARSE_CACHE.clear()


def test_ddl_dense_multi_epoch_decode_exact(spark):
    """13 schema epochs from one blob: every row decodes under the
    schema current AT its position (strict pos_range bounds), none are
    lost, duplicated, or width-mangled."""
    blob = _dense_blob(n_ddl=12, rows_per_epoch=4)
    raw = spark.createDataFrame([(bytearray(blob),)], "value binary")

    positions = sorted({r["pos"]
                        for r in extract_binlog_ddl(raw).collect()})
    assert len(positions) == 12
    p2 = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("status", T.StringType())])
    p3 = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("status", T.StringType()),
                       T.StructField("price", T.DoubleType())])
    bounds = [None] + positions + [None]
    got = []
    for i in range(len(bounds) - 1):
        struct = p3 if i % 2 == 1 else p2
        ep = decode_binlog(raw, struct,
                           pos_range=(bounds[i], bounds[i + 1]))
        for r in ep.collect():
            got.append((r["k"], r["status"],
                        r["price"] if i % 2 == 1 else None))
    got.sort()
    expect = []
    k = 0
    for i in range(13):
        for _ in range(4):
            k += 1
            expect.append((k, f"e{i}", float(k) if i % 2 == 1 else None))
    assert got == sorted(expect)
