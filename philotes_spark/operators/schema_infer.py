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


def infer_payload_schema(spark: SparkSession, json_df: DataFrame, col: str) -> T.StructType:
    """A11: infer a typed StructType from a column of JSON payload strings.

    Spark's JSON inference implements the reference's rules natively:
    per-field type from values, conflicting types degrade toward string,
    fields sorted by name. Runs distributed (it is a Spark job over the
    payload column), so inference on a 100 TB backlog parallelizes."""
    non_null = json_df.select(F.col(col).alias("j")).filter(F.col("j").isNotNull())
    schema = (
        spark.read.json(non_null.rdd.map(lambda r: r.j))
        if non_null.take(1)
        else T.StructType([])
    )
    if isinstance(schema, DataFrame):
        schema = schema.schema
    fields = sorted(
        (f for f in schema.fields if not f.name.startswith("_corrupt")),
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
