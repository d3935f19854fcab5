"""MySQL binlog typed-column zoo (VERDICT r9 next-round #2): the
reference's e2e type set (flink-cdc-e2e-tests/.../ddl/
data_types_test.sql:20-64) — TINY/SHORT/INT24 (+unsigned via the
WL#4618 SIGNEDNESS TLV), YEAR, DATE, TIME2, TIMESTAMP2, CHAR (STRING),
BLOB/TEXT, ENUM/SET, BIT, JSON — golden bytes + roundtrips."""

from __future__ import annotations

import pytest

from flink_cdc_dsql_master_spark.binlog import (MYSQL_TYPE_BIT,
                                                MYSQL_TYPE_BLOB,
                                                MYSQL_TYPE_DATE,
                                                MYSQL_TYPE_ENUM,
                                                MYSQL_TYPE_INT24,
                                                MYSQL_TYPE_JSON,
                                                MYSQL_TYPE_LONG,
                                                MYSQL_TYPE_LONGLONG,
                                                MYSQL_TYPE_SET,
                                                MYSQL_TYPE_SHORT,
                                                MYSQL_TYPE_STRING,
                                                MYSQL_TYPE_TIME2,
                                                MYSQL_TYPE_TIMESTAMP2,
                                                MYSQL_TYPE_TINY,
                                                MYSQL_TYPE_YEAR,
                                                encode_table_map,
                                                encode_write_rows,
                                                parse_binlog)


def _roundtrip(cols, row, unsigned=None):
    blob = (encode_table_map(7, "db", "zoo", cols, 100,
                             unsigned=unsigned)
            + encode_write_rows(7, cols, [row], 200, unsigned=unsigned))
    evs = parse_binlog(blob)
    assert evs[1]["kind"] == "write_rows"
    return evs[1]["rows"][0]


def test_small_int_types_roundtrip():
    cols = [(MYSQL_TYPE_TINY, None), (MYSQL_TYPE_SHORT, None),
            (MYSQL_TYPE_INT24, None), (MYSQL_TYPE_LONG, None),
            (MYSQL_TYPE_LONGLONG, None)]
    assert _roundtrip(cols, [-128, -32768, -8388608, -2147483648,
                             -(1 << 63)]) == \
        [-128, -32768, -8388608, -2147483648, -(1 << 63)]
    assert _roundtrip(cols, [127, 32767, 8388607, 2147483647,
                             (1 << 63) - 1]) == \
        [127, 32767, 8388607, 2147483647, (1 << 63) - 1]


def test_unsigned_via_signedness_tlv():
    """WL#4618 optional metadata TYPE 1: MSB-first bitmap over numeric
    columns; a 200 stored in an UNSIGNED TINYINT must decode as 200,
    not -56."""
    cols = [(MYSQL_TYPE_TINY, None), (MYSQL_TYPE_INT24, None),
            (MYSQL_TYPE_LONGLONG, None)]
    unsigned = [True, True, True]
    assert _roundtrip(cols, [200, 16000000, (1 << 64) - 1],
                      unsigned=unsigned) == \
        [200, 16000000, (1 << 64) - 1]
    # without the TLV the same value bytes read back signed
    blob = (encode_table_map(7, "db", "zoo", cols, 100)
            + encode_write_rows(7, cols, [[200, 16000000, 1]], 200,
                                unsigned=unsigned))
    evs = parse_binlog(blob)
    assert evs[1]["rows"][0][0] == 200 - 256  # -56: signed misread


def test_year_date_time_timestamp():
    cols = [(MYSQL_TYPE_YEAR, None), (MYSQL_TYPE_DATE, None),
            (MYSQL_TYPE_TIME2, 0), (MYSQL_TYPE_TIME2, 6),
            (MYSQL_TYPE_TIMESTAMP2, 0), (MYSQL_TYPE_TIMESTAMP2, 3)]
    got = _roundtrip(cols, [2024, "2024-02-29", "838:59:59",
                            "12:34:56.123456", 1_700_000_000,
                            1_700_000_000.25])
    assert got[0] == 2024
    assert got[1] == "2024-02-29"
    assert got[2] == "838:59:59"          # MySQL TIME max
    assert got[3] == "12:34:56.123456"
    assert got[4] == "2023-11-14 22:13:20"  # UTC
    assert got[5] == "2023-11-14 22:13:20.250000"
    # YEAR zero and negative TIME
    got2 = _roundtrip([(MYSQL_TYPE_YEAR, None), (MYSQL_TYPE_TIME2, 0)],
                      [0, "-01:02:03"])
    assert got2 == [0, "-01:02:03"]


def test_char_string_meta_pack():
    """STRING metadata pack byte0 = real_type ^ ((len & 0x300) >> 4):
    a >255-byte CHAR exercises the high-bit fold; golden per
    Field_string::do_save_field_metadata."""
    from flink_cdc_dsql_master_spark.binlog import (_pack_string_meta,
                                                    _unpack_string_meta)

    assert _pack_string_meta(MYSQL_TYPE_STRING, 10) == bytes([0xFE, 10])
    # 300 = 0x12C: byte0 = 0xFE ^ (0x100 >> 4) = 0xFE ^ 0x10 = 0xEE
    assert _pack_string_meta(MYSQL_TYPE_STRING, 300) == bytes([0xEE, 0x2C])
    assert _unpack_string_meta(bytes([0xEE, 0x2C])) == (MYSQL_TYPE_STRING,
                                                        300)
    cols = [(MYSQL_TYPE_STRING, 10), (MYSQL_TYPE_STRING, 300)]
    assert _roundtrip(cols, ["abc", "x" * 300]) == ["abc", "x" * 300]


def test_enum_set_bit():
    cols = [(MYSQL_TYPE_STRING, (MYSQL_TYPE_ENUM, 1)),
            (MYSQL_TYPE_STRING, (MYSQL_TYPE_ENUM, 2)),
            (MYSQL_TYPE_STRING, (MYSQL_TYPE_SET, 2)),
            (MYSQL_TYPE_BIT, 12)]
    assert _roundtrip(cols, [3, 400, 0b1010_0000_0001, 0xABC]) == \
        [3, 400, 0b1010_0000_0001, 0xABC]


def test_blob_text():
    cols = [(MYSQL_TYPE_BLOB, 1), (MYSQL_TYPE_BLOB, 2),
            (MYSQL_TYPE_BLOB, 4)]
    got = _roundtrip(cols, [b"\x00\x01\xff", "text-value", b"z" * 70000])
    assert got[0] == b"\x00\x01\xff"
    assert got[1] == b"text-value"  # str encodes as utf-8 bytes
    assert got[2] == b"z" * 70000


def test_json_binary_golden_and_roundtrip():
    """MySQL binary JSON (docs "The JSON binary storage format"):
    small object golden bytes hand-assembled — count u16, size u16,
    key entries (offset u16 + length u16), value entries (type +
    inlined int16), key bytes, value bytes."""
    from flink_cdc_dsql_master_spark.binlog import (decode_json_binary,
                                                    encode_json_document,
                                                    json_canonical_text)

    doc = encode_json_document({"a": 7})
    # type 0x00 small object | count=1 size=.. | key entry | value entry
    assert doc[0] == 0x00
    assert decode_json_binary(doc) == {"a": 7}

    obj = {"tag": "x", "a": [1, 2.5, None, True, "s"],
           "n": 123456789012}
    rt = decode_json_binary(encode_json_document(obj))
    assert rt == {"a": [1, 2.5, None, True, "s"], "tag": "x",
                  "n": 123456789012}
    # canonical text: keys in MySQL stored order (length, then bytes)
    assert json_canonical_text(obj) == (
        '{"a":[1,2.5,null,true,"s"],"n":123456789012,"tag":"x"}')

    cols = [(MYSQL_TYPE_JSON, 4)]
    (got,) = _roundtrip(cols, [{"k": 1, "arr": [1, 2]}])
    assert got == '{"k":1,"arr":[1,2]}'


def test_json_string_varint_boundary():
    from flink_cdc_dsql_master_spark.binlog import (decode_json_binary,
                                                    encode_json_document)

    long_str = "y" * 200  # needs a 2-byte varint
    assert decode_json_binary(encode_json_document(long_str)) == long_str


@pytest.mark.parametrize("bad", [
    b"\xff\x00",          # unknown JSON type byte
])
def test_json_unknown_type_fails_loudly(bad):
    from flink_cdc_dsql_master_spark.binlog import (WireFormatError,
                                                    decode_json_binary)

    with pytest.raises(WireFormatError):
        decode_json_binary(bad)


def test_fuzz_checksummed_stream_mutations():
    """Property: bit-flips anywhere in a CRC32-checksummed stream either
    raise ValueError (usually 'CRC32 mismatch') or — only when the flip
    lands in the not-yet-protected file magic / pre-FDE region — still
    parse; they NEVER mis-decode silently past a corrupted trailer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_cdc_dsql_master_spark.binlog import (checksum_stream,
                                                    encode_write_rows,
                                                    encode_table_map,
                                                    parse_binlog)

    cols = [(MYSQL_TYPE_LONG, None)]
    base = checksum_stream([
        encode_table_map(5, "db", "t", cols, 120),
        encode_write_rows(5, cols, [[1], [2]], 200)])
    clean = parse_binlog(base)
    assert clean[2]["rows"] == [[1], [2]]

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, len(base) - 1), st.integers(1, 255))
    def check(pos, xor):
        blob = bytearray(base)
        blob[pos] ^= xor
        try:
            evs = parse_binlog(bytes(blob))
        except ValueError:
            return
        # parsed without error → every row event must be bit-identical
        # to the clean decode (the flip landed in ignored padding)
        rows = [e for e in evs if e["kind"] == "write_rows"]
        for e in rows:
            assert e["rows"] == [[1], [2]]

    check()


def test_partial_row_image_fails_loudly(spark):
    """binlog_row_image = MINIMAL omits unchanged columns from the row
    image; reconstructing them as NULL would corrupt the sink under
    LWW (the unchanged-TOAST failure class), so the DECODE fails
    loudly — the reference behaves the same (Debezium requires
    binlog_row_image = FULL). The schema-agnostic byte parse marks the
    column ABSENT (it cannot know virtual-generated from partial-image;
    r13); decode_binlog raises unless the declared field is a VIRTUAL
    generated column."""
    import struct

    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.binlog import (ABSENT, HEADER_LEN,
                                                    WRITE_ROWS_EVENT_V2,
                                                    _lenenc,
                                                    decode_binlog)

    cols = [(MYSQL_TYPE_LONG, None), (MYSQL_TYPE_LONG, None)]
    # hand-build a WRITE_ROWS whose present bitmap marks only column 0
    body = (5).to_bytes(6, "little") + struct.pack("<H", 0)
    body += struct.pack("<H", 2) + _lenenc(2)
    body += bytes([0b01])          # present: col 0 only
    body += bytes([0b0])           # null bitmap over 1 present col
    body += struct.pack("<i", 42)  # col 0 value
    ev = struct.pack("<IBIIIH", 0, WRITE_ROWS_EVENT_V2, 1,
                     HEADER_LEN + len(body), 300, 0) + body
    blob = encode_table_map(5, "db", "t", cols, 120) + ev
    rows = [e for e in parse_binlog(blob) if e["kind"] == "write_rows"]
    assert rows[0]["rows"] == [[42, ABSENT]]

    payload = T.StructType([T.StructField("a", T.IntegerType()),
                            T.StructField("b", T.IntegerType())])
    df = spark.createDataFrame([(blob,)], "value binary")
    with pytest.raises(Exception, match="binlog_row_image"):
        decode_binlog(df, payload).collect()


def test_blob_binary_payload_field_roundtrips(spark):
    """A genuine BLOB column declared BinaryType in the payload schema
    carries its raw (non-UTF-8) bytes through decode_binlog untouched;
    the same bytes under a StringType field fail loudly with guidance."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.binlog import (MAGIC,
                                                    MYSQL_TYPE_BLOB,
                                                    MYSQL_TYPE_LONGLONG,
                                                    decode_binlog,
                                                    encode_fde,
                                                    encode_table_map,
                                                    encode_write_rows)

    cols = [(MYSQL_TYPE_LONGLONG, None), (MYSQL_TYPE_BLOB, 2)]
    payloads = [b"\x00\x01\xfe\xff", b"\x89PNG\r\n\x1a\n"]
    blob = (MAGIC + encode_fde(120)
            + encode_table_map(5, "db", "t", cols, 200)
            + encode_write_rows(5, cols,
                                [[i + 1, p] for i, p in
                                 enumerate(payloads)], 300))
    raw = spark.createDataFrame([(blob,)], "value binary")

    bin_schema = T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("data", T.BinaryType())])
    got = {r["k"]: bytes(r["data"]) for r in
           decode_binlog(raw, bin_schema).collect()}
    assert got == {1: payloads[0], 2: payloads[1]}

    str_schema = T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("data", T.StringType())])
    with pytest.raises(Exception) as ei:
        decode_binlog(raw, str_schema).collect()
    assert "BinaryType" in str(ei.value)
