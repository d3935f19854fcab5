"""Unit tests for types/schema/merging — pure driver-side, no Spark jobs."""

from pyspark.sql import types as T

from flink_cdc_dsql_master_spark.merging import (
    coerce_dataframe,
    is_type_compatible,
    merge_fields,
    merge_schemas,
)
from flink_cdc_dsql_master_spark.schema import (
    Schema,
    SchemaManager,
    Selector,
    Selectors,
    TableId,
)
from flink_cdc_dsql_master_spark.types import (
    TAG_TIME,
    TAG_TIMESTAMP_TZ,
    parse_type,
    to_spark_type,
    to_sql_ddl,
    to_struct_field,
)


def f(name, dt, nullable=True, md=None):
    return T.StructField(name, dt, nullable, md)


class TestTypes:
    def test_parse_simple(self):
        t = parse_type("INT NOT NULL")
        assert t.name == "INT" and not t.nullable

    def test_parse_decimal(self):
        t = parse_type("DECIMAL(10,2)")
        assert (t.precision, t.scale) == (10, 2)

    def test_parse_nested(self):
        t = parse_type("ARRAY<MAP<STRING, BIGINT>>")
        assert t.name == "ARRAY" and t.element.name == "MAP"
        assert t.element.value.name == "BIGINT"

    def test_spark_mapping(self):
        assert to_spark_type(parse_type("BIGINT"))[0] == T.LongType()
        assert to_spark_type(parse_type("TIMESTAMP(6)"))[0] == T.TimestampNTZType()
        assert to_spark_type(parse_type("TIMESTAMP_LTZ(3)"))[0] == T.TimestampType()
        dt, meta = to_spark_type(parse_type("TIME(3)"))
        assert dt == T.IntegerType() and meta["logical"] == TAG_TIME
        dt, meta = to_spark_type(parse_type("TIMESTAMP_TZ(6)"))
        assert dt == T.StringType() and meta["logical"] == TAG_TIMESTAMP_TZ

    def test_big_decimal_decays_to_string(self):
        dt, meta = to_spark_type(parse_type("DECIMAL(65,1)"))
        assert dt == T.StringType() and meta["precision"] == 65

    def test_ddl_roundtrip(self):
        sf = to_struct_field("v", parse_type("VARCHAR(17)"))
        assert to_sql_ddl(sf) == "VARCHAR(17)"
        sf = to_struct_field("d", parse_type("DECIMAL(65,1)"))
        assert to_sql_ddl(sf) == "DECIMAL(65,1)"
        sf = to_struct_field("t", parse_type("TIMESTAMP_LTZ"))
        assert to_sql_ddl(sf) == "TIMESTAMPTZ"


class TestTableIdSelectors:
    def test_parse_identifier(self):
        tid = TableId.parse("ns.db.t1")
        assert (tid.namespace, tid.schema_name, tid.table) == ("ns", "db", "t1")
        assert TableId.parse("db.t1").identifier() == "db.t1"
        assert TableId.parse("t1").identifier() == "t1"

    def test_selector_two_part_requires_empty_namespace(self):
        s = Selector(r"db.\w+")
        assert s.matches(TableId("", "db", "orders"))
        assert not s.matches(TableId("ns", "db", "orders"))
        assert not s.matches(TableId("", "other", "orders"))

    def test_selector_escaped_dot_is_single_part(self):
        # reference semantics: ``mydb\.*`` is ONE part matching regex mydb.*
        s = Selector(r"mydb\.*")
        assert s.matches(TableId("", "", "mydbx"))
        assert not s.matches(TableId("", "sch", "mydbx"))

    def test_selector_regex_part(self):
        s = Selector(r"db.tbl[0-9]+")
        assert s.matches(TableId.parse("db.tbl42"))
        assert not s.matches(TableId.parse("db.tblx"))

    def test_selector_case_insensitive(self):
        assert Selector(r"DB.ORDERS").matches(TableId.parse("db.orders"))

    def test_selectors_list(self):
        s = Selectors(r"db.a\w*, other.b\w*")
        assert s.matches(TableId("", "db", "abc"))
        assert s.matches(TableId("", "other", "bcd"))
        assert not s.matches(TableId("", "x", "zzz"))


class TestSchemaManager:
    def test_versioning_and_json(self):
        mgr = SchemaManager()
        tid = TableId.parse("db.t")
        s1 = Schema.of([("id", "INT NOT NULL"), ("name", "STRING")], ["id"])
        s2 = Schema.of(
            [("id", "INT NOT NULL"), ("name", "STRING"), ("age", "INT")], ["id"])
        assert mgr.register_original(tid, s1) == 0
        assert mgr.register_original(tid, s1) == 0  # no-op dedup
        assert mgr.register_original(tid, s2) == 1
        assert mgr.latest_original(tid) == s2
        rt = SchemaManager.from_json(mgr.to_json())
        assert rt.latest_original(tid) == s2


class TestMerging:
    def test_identity(self):
        a = f("x", T.IntegerType(), False)
        assert merge_fields(a, f("x", T.IntegerType(), True)).nullable

    def test_int_widening(self):
        assert merge_fields(
            f("x", T.IntegerType()), f("x", T.LongType())).dataType == T.LongType()
        assert merge_fields(
            f("x", T.ByteType()), f("x", T.ShortType())).dataType == T.ShortType()

    def test_smallint_float(self):
        assert merge_fields(
            f("x", T.ShortType()), f("x", T.FloatType())).dataType == T.FloatType()

    def test_int_float_goes_double(self):
        # INT's tree has no FLOAT: first common kind is DOUBLE
        assert merge_fields(
            f("x", T.IntegerType()), f("x", T.FloatType())).dataType == T.DoubleType()

    def test_bigint_double(self):
        assert merge_fields(
            f("x", T.LongType()), f("x", T.DoubleType())).dataType == T.DoubleType()

    def test_anything_string(self):
        assert merge_fields(
            f("x", T.BooleanType()), f("x", T.LongType())).dataType == T.StringType()

    def test_decimal_decimal(self):
        got = merge_fields(
            f("x", T.DecimalType(10, 2)), f("x", T.DecimalType(12, 4)))
        assert got.dataType == T.DecimalType(12, 4)  # int digits 8, scale 4

    def test_decimal_int(self):
        got = merge_fields(f("x", T.DecimalType(10, 2)), f("x", T.IntegerType()))
        assert got.dataType == T.DecimalType(12, 2)  # scale 2 + precision 10

    def test_decimal_overflow_decays_to_string(self):
        got = merge_fields(
            f("x", T.DecimalType(38, 0)), f("x", T.DecimalType(20, 20)))
        assert got.dataType == T.StringType()

    def test_decimal_double_string(self):
        got = merge_fields(f("x", T.DecimalType(10, 2)), f("x", T.DoubleType()))
        assert got.dataType == T.StringType()

    def test_date_timestamp(self):
        assert merge_fields(
            f("x", T.DateType()), f("x", T.TimestampNTZType())
        ).dataType == T.TimestampNTZType()
        assert merge_fields(
            f("x", T.TimestampNTZType()), f("x", T.TimestampType())
        ).dataType == T.TimestampType()

    def test_compatibility(self):
        assert is_type_compatible(f("x", T.LongType()), f("x", T.IntegerType()))
        assert not is_type_compatible(f("x", T.IntegerType()), f("x", T.LongType()))
        assert not is_type_compatible(None, f("x", T.IntegerType()))

    def test_merge_schemas_fan_in(self):
        a = Schema.of([("id", "INT NOT NULL"), ("v", "VARCHAR(17)"),
                       ("age", "INT")], ["id"])
        b = Schema.of([("id", "BIGINT NOT NULL"), ("v", "STRING"),
                       ("name", "STRING")], ["id"])
        m = merge_schemas(a, b)
        assert m.column_names == ["id", "v", "age", "name"]
        assert m.field("id").dataType == T.LongType()
        assert m.field("age").nullable and m.field("name").nullable
        assert m.primary_keys == ("id",)


class TestCoerce:
    def test_coerce_dataframe(self, spark):
        df = spark.createDataFrame([(1, "a")], "id int, v string")
        target = Schema.of(
            [("id", "BIGINT"), ("v", "STRING"), ("extra", "DOUBLE")])
        out = coerce_dataframe(df, target)
        assert [x.name for x in out.schema.fields] == ["id", "v", "extra"]
        assert out.schema["id"].dataType == T.LongType()
        row = out.collect()[0]
        assert row.id == 1 and row.extra is None
