"""MySQL binlog v4 parser: spec-pinned golden bytes + round-trips."""

from __future__ import annotations

import pytest

from flink_cdc_dsql_master_spark.binlog import (MYSQL_TYPE_DOUBLE,
                                                MYSQL_TYPE_LONG,
                                                MYSQL_TYPE_LONGLONG,
                                                MYSQL_TYPE_VARCHAR,
                                                encode_delete_rows,
                                                encode_fde,
                                                encode_table_map,
                                                encode_update_rows,
                                                encode_write_rows,
                                                encode_xid, parse_binlog)

COLS = [(MYSQL_TYPE_LONG, None), (MYSQL_TYPE_VARCHAR, 10)]


def test_table_map_golden_bytes():
    """Hand-assembled per the MySQL internals docs (Table_map_event):
    19-byte little-endian header, u48 table id, u16 flags, length-
    prefixed + NUL schema/table names, lenenc column count, type bytes,
    lenenc metadata block (u16 max-length for VARCHAR), null bitmap."""
    golden = bytes.fromhex(
        "00000000"      # timestamp 0
        "13"            # type 19 = TABLE_MAP
        "01000000"      # server_id 1
        "29000000"      # event_size 41 = 19 + 22
        "78000000"      # log_pos 120
        "0000"          # flags
        "050000000000"  # table_id 5 (u48)
        "0100"          # table-map flags 1
        "02" "6462" "00"  # schema "db" + NUL
        "01" "74" "00"    # table "t" + NUL
        "02"            # 2 columns (lenenc)
        "030f"          # types: LONG, VARCHAR
        "02" "0a00"     # metadata len 2: VARCHAR max_len 10 (u16le)
        "00")           # nullability bitmap
    assert encode_table_map(5, "db", "t", COLS, 120) == golden
    (ev,) = parse_binlog(golden)
    assert ev["kind"] == "table_map" and ev["table_id"] == 5
    assert ev["schema"] == "db" and ev["table"] == "t"
    assert ev["column_types"] == [MYSQL_TYPE_LONG, MYSQL_TYPE_VARCHAR]


def test_write_rows_golden_bytes():
    """Write_rows_event v2: u48 table id, u16 flags, u16 extra-data len
    (self-inclusive), lenenc width, present-columns bitmap, then per row
    a null bitmap over present columns + encoded values (i32le LONG,
    1-byte-length VARCHAR when max ≤ 255)."""
    golden_rows = bytes.fromhex(
        "00000000" "1e" "01000000" "27000000" "9f000000" "0000"
        "050000000000"  # table_id 5
        "0000"          # flags
        "0200"          # extra_data_len 2 (nothing follows)
        "02"            # width 2
        "ff"            # present bitmap: all columns
        "00"            # row null bitmap: none null
        "01000000"      # k = 1 (i32le)
        "02" "6162")    # "ab" (len 2)
    assert encode_write_rows(5, COLS, [[1, "ab"]], 0x9F) == golden_rows
    blob = encode_table_map(5, "db", "t", COLS, 120) + golden_rows
    evs = parse_binlog(blob)
    assert evs[1]["kind"] == "write_rows"
    assert evs[1]["rows"] == [[1, "ab"]]
    assert evs[1]["log_pos"] == 0x9F


def test_full_file_roundtrip_all_event_kinds():
    from flink_cdc_dsql_master_spark.binlog import MAGIC

    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_DOUBLE, None),
            (MYSQL_TYPE_VARCHAR, 300)]  # wide varchar -> u16 lengths
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(9, "tpch", "orders", cols, 200)
            + encode_write_rows(9, cols, [[1, 1.5, "x" * 300],
                                          [2, None, "y"]], 300)
            + encode_update_rows(9, cols,
                                 [([1, 1.5, "x" * 300],
                                   [1, 2.5, "x" * 300])], 400)
            + encode_delete_rows(9, cols, [[2, None, "y"]], 500)
            + encode_xid(77, 600))
    evs = parse_binlog(blob)
    kinds = [e["kind"] for e in evs]
    assert kinds == ["format_description", "table_map", "write_rows",
                     "update_rows", "delete_rows", "xid"]
    assert evs[0]["binlog_version"] == 4
    assert evs[2]["rows"] == [[1, 1.5, "x" * 300], [2, None, "y"]]
    assert evs[3]["rows"] == [([1, 1.5, "x" * 300], [1, 2.5, "x" * 300])]
    assert evs[4]["rows"] == [[2, None, "y"]]
    assert evs[5]["xid"] == 77


def test_gtid_events_and_set_folding():
    """Gtid_log_event parse (u8 flags + 16-byte SID + u64le GNO) and the
    gtid_executed-style interval folding used as the specific-offset
    resume token."""
    from flink_cdc_dsql_master_spark.binlog import (encode_gtid,
                                                    gtid_set_from_events)

    sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    sid2 = "11111111-2222-3333-4444-555555555555"
    blob = (encode_gtid(sid, 1, 100) + encode_gtid(sid, 2, 200)
            + encode_gtid(sid, 3, 300) + encode_gtid(sid, 7, 400)
            + encode_gtid(sid2, 5, 500))
    evs = parse_binlog(blob)
    assert [e["kind"] for e in evs] == ["gtid"] * 5
    assert evs[0]["sid"] == sid and evs[0]["gno"] == 1
    assert gtid_set_from_events(evs) == (
        f"{sid2}:5,{sid}:1-3:7")


def test_newdecimal_golden_bytes():
    """Hand-computed per the docs' packed-decimal layout: DECIMAL(4,2)
    12.34 → int part '12' in 1 byte (0x0C), frac '34' in 1 byte (0x22),
    first byte XOR 0x80 → 8C 22; negative = one's complement → 73 DD."""
    from decimal import Decimal

    from flink_cdc_dsql_master_spark.binlog import (_decode_newdecimal,
                                                    _encode_newdecimal)

    assert _encode_newdecimal("12.34", 4, 2) == bytes.fromhex("8c22")
    assert _decode_newdecimal(bytes.fromhex("8c22"), 4, 2) == \
        Decimal("12.34")
    assert _encode_newdecimal("-12.34", 4, 2) == bytes.fromhex("73dd")
    assert _decode_newdecimal(bytes.fromhex("73dd"), 4, 2) == \
        Decimal("-12.34")


def test_newdecimal_property_roundtrip():
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_cdc_dsql_master_spark.binlog import (_decode_newdecimal,
                                                    _encode_newdecimal)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=30), st.integers(0, 30),
           st.integers(min_value=-(10 ** 29), max_value=10 ** 29))
    def check(precision, scale, unscaled):
        scale = min(scale, precision)
        unscaled %= 10 ** precision
        # exact construction (scaleb/div would round through the
        # default 28-digit context)
        d = Decimal(f"{unscaled}E-{scale}")
        raw = _encode_newdecimal(d, precision, scale)
        assert _decode_newdecimal(raw, precision, scale) == d

    check()


def test_datetime2_roundtrip_and_rows():
    import datetime as dt

    from flink_cdc_dsql_master_spark.binlog import (MYSQL_TYPE_DATETIME2,
                                                    MYSQL_TYPE_NEWDECIMAL,
                                                    _decode_datetime2,
                                                    _encode_datetime2)

    t = dt.datetime(2024, 3, 15, 10, 20, 30, 123456)
    raw = _encode_datetime2(t, 6)
    assert _decode_datetime2(raw[:5], raw[5:], 6) == \
        "2024-03-15 10:20:30.123456"
    raw0 = _encode_datetime2(t, 0)
    assert len(raw0) == 5
    assert _decode_datetime2(raw0, b"", 0) == "2024-03-15 10:20:30"

    # through a full rows event
    from decimal import Decimal
    cols = [(MYSQL_TYPE_NEWDECIMAL, (12, 4)), (MYSQL_TYPE_DATETIME2, 3)]
    blob = (encode_table_map(5, "d", "t", cols, 100)
            + encode_write_rows(
                5, cols, [[Decimal("-12345678.9876"),
                           dt.datetime(1999, 12, 31, 23, 59, 58,
                                       789000)]], 200))
    evs = parse_binlog(blob)
    assert evs[1]["rows"] == [[Decimal("-12345678.9876"),
                               "1999-12-31 23:59:58.789000"]]


def test_unsupported_column_type_raises():
    with pytest.raises(ValueError, match="unsupported column type"):
        parse_binlog(encode_table_map(1, "d", "t",
                                      [(255, None)], 100))  # GEOMETRY


def test_decode_binlog_distributed(spark):
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.binlog import MAGIC, decode_binlog

    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_VARCHAR, 10)]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(9, "db", "t", cols, 200)
            + encode_write_rows(9, cols, [[1, "a"], [2, None]], 300)
            + encode_update_rows(9, cols, [([1, "a"], [1, "b"])], 400)
            + encode_delete_rows(9, cols, [[2, None]], 500))
    df = spark.createDataFrame([(bytearray(blob),)], "value binary")
    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.StringType())])
    out = decode_binlog(df, payload).orderBy("__seq").collect()
    got = [(r["k"], r["v"], r["__op"], r["__seq"]) for r in out]
    assert got == [
        (1, "a", "+I", 601), (2, None, "+I", 601),
        (1, "a", "-U", 800), (1, "b", "+U", 801),
        (2, None, "-D", 1001),
    ]


def test_fuzz_parse_binlog_never_hangs_or_leaks_raw_errors():
    """Property: arbitrary bytes either parse or raise ValueError
    (WireFormatError) — never a bare struct.error/IndexError/KeyError,
    and never an infinite loop (a zero event_size is rejected)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_cdc_dsql_master_spark.binlog import MAGIC

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def check(data):
        for blob in (data, MAGIC + data):
            try:
                parse_binlog(blob)
            except ValueError:
                pass

    check()


def test_fuzz_mutated_valid_events():
    """Property: bit-flipped REAL events parse or raise ValueError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = (encode_table_map(5, "db", "t", COLS, 120)
            + encode_write_rows(5, COLS, [[1, "ab"], [2, None]], 200))

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, len(base) - 1), st.integers(1, 255))
    def check(i, x):
        mutated = bytearray(base)
        mutated[i] ^= x
        try:
            parse_binlog(bytes(mutated))
        except ValueError:
            pass

    check()
