"""pgoutput wire-format decoder: spec-pinned golden bytes + round-trips."""

from __future__ import annotations

import pytest

from flink_cdc_dsql_master_spark.pgoutput import (encode_begin,
                                                  encode_commit,
                                                  encode_delete,
                                                  encode_insert,
                                                  encode_relation,
                                                  encode_update,
                                                  parse_message)


def test_insert_golden_bytes():
    """Hand-assembled per the PostgreSQL docs (pgoutput Insert +
    TupleData): 'I', Int32 OID, 'N', Int16 ncols, then per column
    'n' or 't' + Int32 length + bytes. Pins the layout so the encoder
    and decoder cannot drift together unnoticed."""
    golden = bytes.fromhex(
        "49"          # 'I'
        "01020304"    # relation OID 0x01020304
        "4e"          # 'N' new tuple follows
        "0003"        # 3 columns
        "74" "00000001" "31"      # 't', len 1, "1"
        "6e"                      # 'n' null
        "74" "00000002" "6162")   # 't', len 2, "ab"
    assert encode_insert(0x01020304, ["1", None, "ab"]) == golden
    m = parse_message(golden)
    assert m == {"kind": "insert", "oid": 0x01020304,
                 "new": ["1", None, "ab"]}


def test_relation_golden_bytes():
    """'R', Int32 OID, cstr namespace, cstr name, Int8 identity,
    Int16 ncols, per column Int8 flags + cstr name + Int32 type OID +
    Int32 atttypmod."""
    golden = bytes.fromhex(
        "52"                    # 'R'
        "00000001"              # OID 1
        "7075626c696300"        # "public\0"
        "7400"                  # "t\0"
        "64"                    # identity 'd'
        "0001"                  # 1 column
        "01" "6b00"             # flags=1 (key), "k\0"
        "00000014" "ffffffff")  # type OID 20 (int8), typmod -1
    assert encode_relation(1, "public", "t", [("k", True, 20)]) == golden
    m = parse_message(golden)
    assert m["kind"] == "relation" and m["oid"] == 1
    assert m["namespace"] == "public" and m["name"] == "t"
    assert m["identity"] == "d"
    assert m["columns"] == [{"name": "k", "key": True, "type_oid": 20,
                             "typmod": -1}]


def test_update_delete_begin_commit_roundtrip():
    u = encode_update(7, ["2", "x"], old_vals=["1", "x"], old_kind="O")
    m = parse_message(u)
    assert m == {"kind": "update", "oid": 7, "old": ["1", "x"],
                 "new": ["2", "x"]}
    # update without old image (REPLICA IDENTITY NOTHING changed cols)
    m2 = parse_message(encode_update(7, ["2", "x"]))
    assert m2["old"] is None and m2["new"] == ["2", "x"]
    d = parse_message(encode_delete(7, ["1", "x"], old_kind="K"))
    assert d == {"kind": "delete", "oid": 7, "old": ["1", "x"]}
    b = parse_message(encode_begin(123456789, 987654321, 42))
    assert b == {"kind": "begin", "final_lsn": 123456789,
                 "ts_us": 987654321, "xid": 42}
    c = parse_message(encode_commit(111, 222, 333))
    assert c == {"kind": "commit", "commit_lsn": 111, "end_lsn": 222,
                 "ts_us": 333}


def test_bad_messages_raise():
    with pytest.raises(ValueError, match="unknown pgoutput"):
        parse_message(b"Zjunk")
    with pytest.raises(ValueError, match="expected 'N'"):
        parse_message(b"I" + (0).to_bytes(4, "big") + b"X")


def test_pgoutput_file_stream(spark, tmp_path):
    """Framed-segment files → binaryFile stream → byte decode: the
    hermetic twin of a live START_REPLICATION slot."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.pgoutput import (decode_frames,
                                                      encode_frames,
                                                      pgoutput_file_stream)

    msgs = [(2, encode_insert(5, ["1", "a"])),
            (3, encode_insert(5, ["2", "b"])),
            (4, encode_update(5, ["1", "c"], old_vals=["1", "a"]))]
    blob = encode_frames(msgs)
    assert decode_frames(blob) == [(lsn, m) for lsn, m in msgs]
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "seg1.pgout").write_bytes(blob)

    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.StringType())])
    stream = pgoutput_file_stream(spark, str(seg_dir), payload)
    q = (stream.writeStream.format("memory").queryName("pgout_mem")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["k"], r["v"], r["__op"], r["__seq"])
                 for r in spark.sql("SELECT * FROM pgout_mem").collect())
    assert got == [(1, "a", "+I", 5), (1, "a", "-U", 8), (1, "c", "+U", 9),
                   (2, "b", "+I", 7)]


def test_decode_pgoutput_distributed(spark):
    """The Arrow-batched decode: mixed message stream (relation/begin/
    inserts/update-with-old/delete/commit) → typed changelog with
    LSN-derived sequence; non-row messages emit nothing."""
    from pyspark.sql import types as T

    from flink_cdc_dsql_master_spark.pgoutput import decode_pgoutput

    msgs = [
        (1, encode_begin(100, 0, 9)),
        (1, encode_relation(5, "public", "t",
                            [("k", True, 20), ("v", False, 25)])),
        (2, encode_insert(5, ["1", "a"])),
        (3, encode_insert(5, ["2", None])),
        (4, encode_update(5, ["1", "b"], old_vals=["1", "a"])),
        (5, encode_delete(5, ["2", None], old_kind="K")),
        (6, encode_commit(100, 101, 0)),
    ]
    df = spark.createDataFrame(
        [(lsn, bytearray(m)) for lsn, m in msgs], "lsn long, value binary")
    payload = T.StructType([T.StructField("k", T.LongType()),
                            T.StructField("v", T.StringType())])
    out = decode_pgoutput(df, payload).orderBy("__seq").collect()
    got = [(r["k"], r["v"], r["__op"], r["__seq"]) for r in out]
    assert got == [
        (1, "a", "+I", 5),    # lsn 2 -> 2*2+1
        (2, None, "+I", 7),
        (1, "a", "-U", 8),    # old image: lsn 4 -> 4*2+0
        (1, "b", "+U", 9),
        (2, None, "-D", 11),
    ]


def test_fuzz_parse_message_never_leaks_raw_errors():
    """Property: arbitrary bytes either parse or raise ValueError
    (WireFormatError) — never a bare struct.error/UnicodeDecodeError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(st.binary(min_size=1, max_size=120))
    def check(data):
        try:
            parse_message(data)
        except ValueError:
            pass

    check()
