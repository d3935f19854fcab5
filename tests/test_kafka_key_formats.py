"""Kafka record-KEY serialization parity (KeyFormat.java json/csv via
KeySerializationFactory.java): the key is {TableId, pk columns...}, the
DELETE's before image — pinned byte-for-byte to the reference's own
test vectors (JsonSerializationSchemaTest.java:82-84,
CsvSerializationSchemaTest.java:81-83)."""

import json

from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.schema import TableId
from flink_cdc_dsql_master_spark.sinks import (PARTITION_HASH_BY_KEY,
                                               kafka_records)

TID = TableId.parse("default_namespace.default_schema.table1")


def _changelog(spark):
    rows = [("1", "1", "+I", 1), ("2", "2", "+I", 2),
            ("2", "2", "-D", 3), ("1", "x", "+U", 4)]
    return spark.createDataFrame(
        rows, f"col1 string, col2 string, {OP_COLUMN} string, "
              f"{SEQ_COLUMN} long")


def test_json_key_matches_reference_vectors(spark):
    recs = kafka_records(_changelog(spark), TID,
                         primary_keys=["col1"], key_format="json")
    keys = [r["key"] for r in recs.orderBy("value").collect()]
    # JsonSerializationSchemaTest: {"TableId":"...","col1":"<pk>"} for
    # insert, delete (before image) and update (after image) alike
    for k in keys:
        d = json.loads(k)
        assert list(d) == ["TableId", "col1"]
        assert d["TableId"] == "default_namespace.default_schema.table1"
    got = {json.loads(r["key"])["col1"]
           for r in recs.collect()}
    assert got == {"1", "2"}


def test_csv_key_matches_reference_vectors(spark):
    recs = kafka_records(_changelog(spark), TID,
                         primary_keys=["col1"], key_format="csv")
    keys = {r["key"] for r in recs.collect()}
    # CsvSerializationSchemaTest.java:81/93/105/122 exact bytes
    assert keys == {'"default_namespace.default_schema.table1",1',
                    '"default_namespace.default_schema.table1",2'}


def test_csv_key_escapes_specials(spark):
    df = spark.createDataFrame(
        [('a,"b', "v", "+I", 1)],
        f"col1 string, col2 string, {OP_COLUMN} string, "
        f"{SEQ_COLUMN} long")
    recs = kafka_records(df, TID, primary_keys=["col1"],
                         key_format="csv")
    [r] = recs.collect()
    assert r["key"] == \
        '"default_namespace.default_schema.table1","a,""b"'


def test_hash_by_key_partitions_on_pk_key(spark):
    """HASH_BY_KEY over the pk-shaped key: all ops of one PK land in
    one partition even when non-key columns differ."""
    recs = kafka_records(_changelog(spark), TID,
                         partition_strategy=PARTITION_HASH_BY_KEY,
                         num_partitions=8, primary_keys=["col1"],
                         key_format="json")
    parts = (recs.groupBy(F.get_json_object("key", "$.col1")
                          .alias("pk"))
             .agg(F.countDistinct("partition").alias("n")).collect())
    assert all(r["n"] == 1 for r in parts)


def test_legacy_key_unchanged_without_primary_keys(spark):
    recs = kafka_records(_changelog(spark), TID)
    [k] = [r["key"] for r in recs.where(F.col("value")
                                        .contains('"op":"d"')).collect()]
    assert json.loads(k) == {"col1": "2", "col2": "2"}


def test_topic_inference_and_headers(spark):
    """inferTopicName precedence (unified > selector mapping > table
    id) and the namespace/schemaName/tableName + custom record headers
    (PipelineKafkaRecordSerializationSchema.java:69-73,117-138)."""
    from flink_cdc_dsql_master_spark.sinks import kafka_records, kafka_topic

    assert kafka_topic(TID, topic="all") == "all"
    assert kafka_topic(TID, topic_mapping=[
        (r"default_namespace.default_schema.\.*", "routed"),
        (r".*", "fallback")]) == "routed"
    assert kafka_topic(TID) == \
        "default_namespace.default_schema.table1"

    recs = kafka_records(_changelog(spark), TID,
                         add_tableid_headers=True,
                         custom_headers="env: prod; team:cdc")
    [r] = recs.limit(1).collect()
    assert r["topic"] == "default_namespace.default_schema.table1"
    hs = {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
    assert hs == {"namespace": "default_namespace",
                  "schemaName": "default_schema",
                  "tableName": "table1",
                  "env": "prod", "team": "cdc"}


def test_no_headers_column_when_unconfigured(spark):
    from flink_cdc_dsql_master_spark.sinks import kafka_records

    recs = kafka_records(_changelog(spark), TID)
    assert "headers" not in recs.columns
    assert set(recs.columns) == {"key", "value", "partition", "topic"}


def test_csv_key_null_pk_keeps_empty_slot(spark):
    """ADVICE r11: concat_ws drops null arguments, so a null pk used to
    lose the field AND its comma — (null,'x') and ('x',null) collided.
    A null pk now serializes as an empty field (Jackson CSV parity),
    keeping distinct keys distinct under HASH_BY_KEY / log compaction."""
    df = spark.createDataFrame(
        [(None, "x", "+I", 1), ("x", None, "+I", 2)],
        f"col1 string, col2 string, {OP_COLUMN} string, "
        f"{SEQ_COLUMN} long")
    recs = kafka_records(df, TID, primary_keys=["col1", "col2"],
                         key_format="csv")
    keys = {r["key"] for r in recs.collect()}
    assert keys == {'"default_namespace.default_schema.table1",,x',
                    '"default_namespace.default_schema.table1",x,'}
