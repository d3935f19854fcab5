"""Catalog: named refs, time travel grammar, views, persistence."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_cdc_dsql_master_spark.catalog import TableCatalog
from flink_cdc_dsql_master_spark.events import OP_COLUMN, SEQ_COLUMN
from flink_cdc_dsql_master_spark.lakehouse import (
    merge_into_versioned_parquet,
    with_bucket_partition,
)
from flink_cdc_dsql_master_spark.schema import Schema


@pytest.fixture()
def cat_table(spark):
    b1 = (spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double")
        .withColumn(OP_COLUMN, F.lit("+I"))
        .withColumn(SEQ_COLUMN, F.lit(1).cast("long")))
    schema = Schema.of(b1.drop("__op", "__seq").schema,
                       primary_keys=["k"])
    path = os.path.join(tempfile.mkdtemp(prefix="cat_"), "orders")
    merge_into_versioned_parquet(
        path, with_bucket_partition(b1, "k", 4), schema)
    b2 = (spark.createDataFrame(
        [(i, float(i * 100)) for i in range(5)], "k long, v double")
        .withColumn(OP_COLUMN, F.lit("+U"))
        .withColumn(SEQ_COLUMN, F.lit(2).cast("long")))
    merge_into_versioned_parquet(
        path, with_bucket_partition(b2, "k", 4), schema)
    cat = TableCatalog()
    cat.register("orders", path, "versioned")
    return cat


def test_latest_and_version_refs(spark, cat_table):
    latest = {r["k"]: r["v"]
              for r in cat_table.load(spark, "orders").collect()}
    assert latest[0] == 0.0 * 100 and latest[3] == 300.0
    v1 = {r["k"]: r["v"]
          for r in cat_table.load(spark, "orders@v1").collect()}
    assert v1[3] == 3.0


def test_sql_over_pinned_views(spark, cat_table):
    out = cat_table.sql(
        spark,
        """SELECT l.k, l.v AS now, o.v AS before
           FROM orders l JOIN orders_v1 o ON o.k = l.k
           WHERE l.v <> o.v ORDER BY l.k""",
        refs=["orders", "orders@v1"])
    rows = out.collect()
    assert [r["k"] for r in rows] == [1, 2, 3, 4]
    assert all(r["now"] == r["before"] * 100 for r in rows)


def test_bad_refs_and_formats(spark, cat_table):
    with pytest.raises(KeyError, match="unknown table"):
        cat_table.load(spark, "nope")
    with pytest.raises(ValueError, match="bad table ref"):
        cat_table.load(spark, "orders@@")
    cat_table.register("flat", "/tmp/x", "parquet")
    with pytest.raises(ValueError, match="time travel"):
        cat_table.load(spark, "flat@v1")
    with pytest.raises(ValueError, match="format"):
        cat_table.register("y", "/tmp/y", "iceberg")


def test_catalog_persistence_roundtrip(spark, cat_table, tmp_path):
    p = str(tmp_path / "catalog.json")
    cat_table.save(p)
    back = TableCatalog.load_from(p)
    assert back.names() == ["orders"]
    assert back.load(spark, "orders@v1").count() == 10


def test_tags_resolve_and_protect_from_vacuum(spark, cat_table):
    from flink_cdc_dsql_master_spark.lakehouse import (
        delete_tag, list_tags, list_versions, tag_version,
        vacuum_versioned,
    )

    path = cat_table.entry("orders")["path"]
    tag_version(path, "launch", 1)
    assert list_tags(path) == {"launch": 1}
    # catalog ref grammar resolves the tag
    v1 = {r["k"]: r["v"]
          for r in cat_table.load(spark, "orders@launch").collect()}
    assert v1[3] == 3.0
    # immutable: re-tagging raises
    import pytest as _pt
    with _pt.raises(ValueError, match="already exists"):
        tag_version(path, "launch", 2)
    # vacuum keeps the tagged snapshot readable
    vacuum_versioned(path, keep_last=1)
    assert 1 in list_versions(path)
    assert cat_table.load(spark, "orders@launch").count() == 10
    # delete tag -> next vacuum expires it
    delete_tag(path, "launch")
    vacuum_versioned(path, keep_last=1)
    assert list_versions(path) == [2]
