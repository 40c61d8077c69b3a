"""Unit matrices mirroring the reference's schema tests (SURVEY §5):
type mapping (`internal/iceberg/schema/types.go` matrix), LSN parsing,
schema inference + additive evolution (`schema_test.go:103-172`), and
compat casts back to the reference's degraded representation.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from philotes_spark.operators.schema_infer import (
    infer_payload_schema,
    merge_schemas,
    project_typed,
)
from philotes_spark.types import compat_cast, map_pg_type, parse_lsn

# --- A13 type map (types.go:11-91 matrix; FIXTURES.md F4) -----------------

NATIVE_CASES = [
    ("smallint", T.IntegerType()),
    ("integer", T.IntegerType()),
    ("serial", T.IntegerType()),
    ("bigint", T.LongType()),
    ("bigserial", T.LongType()),
    ("oid", T.LongType()),
    ("real", T.FloatType()),
    ("double precision", T.DoubleType()),
    ("numeric(12,2)", T.DecimalType(12, 2)),
    ("boolean", T.BooleanType()),
    ("text", T.StringType()),
    ("varchar(255)", T.StringType()),
    ("char(8)", T.StringType()),
    ("name", T.StringType()),
    ("date", T.DateType()),
    ("time", T.StringType()),
    ("time with time zone", T.StringType()),
    ("timestamp", T.TimestampType()),
    ("timestamptz", T.TimestampType()),
    ("bytea", T.BinaryType()),
    ("uuid", T.StringType()),
    ("jsonb", T.StringType()),
    ("inet", T.StringType()),
    ("some_custom_enum", T.StringType()),  # unknown → string fallback
    ("integer[]", T.ArrayType(T.IntegerType())),
    ("text[]", T.ArrayType(T.StringType())),
]


@pytest.mark.parametrize("pg,expected", NATIVE_CASES, ids=[c[0] for c in NATIVE_CASES])
def test_map_pg_type_native(pg, expected):
    assert map_pg_type(pg) == expected


COMPAT_CASES = [
    ("numeric(12,2)", T.DoubleType()),  # reference degrades (types.go:28-29)
    ("decimal", T.DoubleType()),
    ("integer[]", T.StringType()),  # arrays → JSON string (types.go:75-77)
    ("uuid", T.StringType()),
    ("time", T.StringType()),
]


@pytest.mark.parametrize("pg,expected", COMPAT_CASES, ids=[c[0] for c in COMPAT_CASES])
def test_map_pg_type_compat(pg, expected):
    assert map_pg_type(pg, compat=True) == expected


def test_case_and_whitespace_insensitive():
    assert map_pg_type("  VARCHAR(10) ") == T.StringType()
    assert map_pg_type("BIGINT") == T.LongType()


# --- LSN parsing (SURVEY §7.4 risk 4) -------------------------------------


def test_parse_lsn_orders_correctly(spark):
    # lexicographic order of these strings is WRONG ('A/0' < 'F/0' but
    # '10/0' sorts before '2/0'); parsed int64 order must be correct
    lsns = ["0/1", "0/FF", "2/0", "A/0", "10/0", "FFFFFFFF/FFFFFFFF"]
    df = spark.createDataFrame([(s,) for s in lsns], ["lsn"])
    vals = {r.lsn: r.v for r in df.select("lsn", parse_lsn(F.col("lsn")).alias("v")).collect()}
    assert vals["0/1"] == 1
    assert vals["0/FF"] == 0xFF
    assert vals["2/0"] == 2 << 32
    assert vals["A/0"] == 0xA << 32
    assert vals["10/0"] == 0x10 << 32
    assert vals["FFFFFFFF/FFFFFFFF"] == -1  # full 64-bit pattern wraps; still monotone below max
    ordered = [vals[s] for s in ["0/1", "0/FF", "2/0", "A/0", "10/0"]]
    assert ordered == sorted(ordered)


# --- A11 schema inference (schema_test.go:103-156) ------------------------


def test_infer_payload_schema_basic(spark):
    rows = [
        ('{"id": 1, "name": "alice", "email": "a@x.io"}',),
        ('{"id": 2, "name": "bob", "email": "b@x.io"}',),
    ]
    df = spark.createDataFrame(rows, ["after"])
    schema = infer_payload_schema(spark, df, "after")
    assert [f.name for f in schema.fields] == ["email", "id", "name"]  # sorted
    assert dict((f.name, f.dataType) for f in schema.fields)["id"] == T.LongType()


def test_infer_payload_schema_evolution_field(spark):
    # second event adds `age` — the reference's canonical evolution fixture
    rows = [
        ('{"id": 1, "name": "alice"}',),
        ('{"id": 2, "name": "bob", "age": 30}',),
    ]
    df = spark.createDataFrame(rows, ["after"])
    schema = infer_payload_schema(spark, df, "after")
    assert [f.name for f in schema.fields] == ["age", "id", "name"]


def test_infer_payload_schema_empty(spark):
    df = spark.createDataFrame([], T.StructType([T.StructField("after", T.StringType())]))
    assert infer_payload_schema(spark, df, "after") == T.StructType([])


# --- A12 schema evolution merge (schema.go:147-174) -----------------------


def test_merge_schemas_additive():
    old = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("age", T.LongType()),
        ]
    )
    merged = merge_schemas(old, new)
    assert [f.name for f in merged.fields] == ["id", "name", "age"]


def test_merge_schemas_conflict_degrades_to_string():
    old = T.StructType([T.StructField("v", T.LongType())])
    new = T.StructType([T.StructField("v", T.DoubleType())])
    merged = merge_schemas(old, new)
    assert merged.fields[0].dataType == T.StringType()  # schema.go:36-40 rule


def test_project_typed_roundtrip(spark):
    df = spark.createDataFrame(
        [("e1", '{"id": 7, "name": "x"}')], ["event_id", "after"]
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    out = project_typed(df, "after", schema)
    row = out.collect()[0]
    assert (row.event_id, row.id, row.name) == ("e1", 7, "x")


# --- compat casts (SURVEY §4 item 2) --------------------------------------


def test_compat_cast_decimal_and_array(spark):
    df = spark.createDataFrame(
        [(1,)], T.StructType([T.StructField("k", T.IntegerType())])
    ).select(
        F.lit("9.50").cast(T.DecimalType(12, 2)).alias("d"),
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.lit("keep").alias("s"),
    )
    out = df.select(
        compat_cast(F.col("d"), T.DecimalType(12, 2)).alias("d"),
        compat_cast(F.col("arr"), T.ArrayType(T.IntegerType())).alias("arr"),
        compat_cast(F.col("s"), T.StringType()).alias("s"),
    )
    row = out.collect()[0]
    assert out.schema["d"].dataType == T.DoubleType() and row.d == 9.5
    assert row.arr == "[1,2]"  # JSON string, reference's array encoding
    assert row.s == "keep"
