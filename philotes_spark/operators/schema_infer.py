"""Schema inference + evolution for schemaless CDC payloads
(SURVEY §2A A11/A12; ``internal/iceberg/schema/schema.go:23-102,147-174``).

The reference folds over event payload maps, infers per-column types,
degrades conflicting columns to string, sorts column names, and appends
CDC system columns. In Spark the same semantics come from the JSON-schema
machinery; this module wraps them with the reference's exact conflict and
merge rules so behavior is testable against the Go test matrices
(``schema_test.go:103-172``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _void_to_string(dt: T.DataType) -> T.DataType:
    """All-null fields infer as VOID; type them string like the JSON
    reader (and the reference) so downstream casts are total."""
    if isinstance(dt, T.NullType):
        return T.StringType()
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _void_to_string(f.dataType), f.nullable)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_void_to_string(dt.elementType), dt.containsNull)
    return dt


def infer_payload_schema(spark: SparkSession, json_df: DataFrame, col: str) -> T.StructType:
    """A11: infer a typed StructType from a column of JSON payload strings.

    Implemented on Spark 4's VARIANT machinery: ``parse_json`` +
    ``schema_of_variant_agg`` merge per-row schemas in a single JVM-side
    aggregation — fully distributed, no RDD round-trip through Python
    (the pre-r04 path shipped every payload string to Python once). The
    merged schema arrives as an ``OBJECT<...>`` DDL string; OBJECT is the
    variant spelling of STRUCT, and all-null VOID fields degrade to
    string, matching the JSON reader's and the reference's behavior.
    Fields come back sorted by name (schema.go:66-70)."""
    non_null = json_df.select(F.col(col).alias("j")).filter(F.col("j").isNotNull())
    row = non_null.select(
        F.schema_of_variant_agg(F.parse_json(F.col("j"))).alias("s")
    ).collect()
    ddl = row[0].s if row else None
    if not ddl or not ddl.startswith("OBJECT<"):
        return T.StructType([])  # empty input ('VOID') or non-object payloads
    schema = T._parse_datatype_string(ddl.replace("OBJECT<", "STRUCT<"))
    fields = sorted(
        (
            T.StructField(f.name, _void_to_string(f.dataType), f.nullable)
            for f in schema.fields
            if not f.name.startswith("_corrupt")
        ),
        key=lambda f: f.name,
    )
    return T.StructType(list(fields))


def merge_schemas(existing: T.StructType, new: T.StructType) -> T.StructType:
    """A12: additive union — existing fields keep their type (conflict →
    degrade to string, schema.go:36-40); brand-new fields are appended.
    Column order: existing order, then new fields sorted by name
    (schema.go:66-70,147-174)."""
    by_name = {f.name: f for f in existing.fields}
    out = list(existing.fields)
    for f in sorted(new.fields, key=lambda f: f.name):
        cur = by_name.get(f.name)
        if cur is None:
            out.append(f)
        elif cur.dataType != f.dataType:
            out[out.index(cur)] = T.StructField(f.name, T.StringType(), True)
    return T.StructType(out)


def project_typed(df: DataFrame, json_col: str, schema: T.StructType) -> DataFrame:
    """Typed projection of the JSON payload next to the original columns —
    the in-flight JSON-string + typed-at-rest design that makes mid-stream
    schema evolution possible (SURVEY §7.4 risk 2)."""
    return df.withColumn("__payload", F.from_json(F.col(json_col), schema)).select(
        "*", "__payload.*"
    ).drop("__payload")
