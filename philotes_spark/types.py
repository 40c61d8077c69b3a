"""Type system: PostgreSQL → Spark mapping and reference-compat casts.

Reference parity (SURVEY §1.3):
- ``internal/iceberg/schema/types.go:11-91`` maps PG type names to Iceberg
  primitives; we map the same names to Spark types, upgrading where Spark
  is strictly more capable (numeric→Decimal, arrays→ArrayType) and keeping
  a ``compat`` mode that reproduces the reference's degradations
  (numeric→double, array→JSON string, uuid/time→string).
- ``varchar(n)`` / ``char(n)`` parameter stripping: ``types.go:75-82``.
- unknown types fall back to string: ``types.go:89-90``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- PG name → Spark type (native, improved) and compat type name --------

_PG_TO_SPARK: dict[str, T.DataType] = {
    "smallint": T.IntegerType(),
    "int2": T.IntegerType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "serial": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "bigserial": T.LongType(),
    "oid": T.LongType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "text": T.StringType(),
    "character varying": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "character": T.StringType(),
    "name": T.StringType(),
    "date": T.DateType(),
    # no TimeType in Spark — documented deviation (SURVEY §1.3)
    "time": T.StringType(),
    "time without time zone": T.StringType(),
    "time with time zone": T.StringType(),
    "timestamp": T.TimestampType(),
    "timestamp without time zone": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "bytea": T.BinaryType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
}

_PARAM_RE = re.compile(r"^([a-z ]+?)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$")


def map_pg_type(pg_type: str, compat: bool = False) -> T.DataType:
    """PG type name → Spark DataType (A13, ``types.go:69-91``).

    ``compat=True`` reproduces the reference's lossy choices so outputs can
    be compared bit-for-bit with the Go engine's lake layout.
    """
    name = pg_type.strip().lower()

    # arrays: `T[]` — native ArrayType (compat: JSON string, types.go:75-77)
    if name.endswith("[]"):
        if compat:
            return T.StringType()
        return T.ArrayType(map_pg_type(name[:-2], compat=compat))

    # parameterized: varchar(255), numeric(12,2), char(8) ...
    m = _PARAM_RE.match(name)
    if m:
        base, p, s = m.group(1), m.group(2), m.group(3)
        if base in ("numeric", "decimal"):
            if compat:  # reference degrades to double (types.go:28-29)
                return T.DoubleType()
            return T.DecimalType(int(p), int(s or 0))
        name = base

    if name in ("numeric", "decimal"):  # un-parameterized
        return T.DoubleType() if compat else T.DecimalType(38, 18)

    # unknown types → string (types.go:89-90)
    return _PG_TO_SPARK.get(name, T.StringType())


def compat_cast(col: Column, spark_type: T.DataType) -> Column:
    """Project a natively-typed column down to the reference's degraded
    representation (SURVEY §4 'compat casts'): decimals→double,
    arrays/structs/maps→JSON string, date/ts keep, everything exotic→string.
    """
    if isinstance(spark_type, T.DecimalType):
        return col.cast(T.DoubleType())
    if isinstance(spark_type, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(col)
    return col


# --- CDC event schema (SURVEY §1.1, internal/cdc/types.go:8-56) ----------

CDC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("lsn", T.StringType(), True),
        T.StructField("transaction_id", T.LongType(), True),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("schema_name", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("operation", T.StringType(), False),
        T.StructField("before", T.StringType(), True),  # JSON object
        T.StructField("after", T.StringType(), True),  # JSON object
        T.StructField("key_columns", T.ArrayType(T.StringType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

OPERATIONS = ("INSERT", "UPDATE", "DELETE", "TRUNCATE")

# CDC system columns appended to every lake table
# (internal/iceberg/types.go:178-201).
CDC_SYSTEM_COLUMNS = ("_cdc_operation", "_cdc_timestamp", "_cdc_lsn")


def parse_lsn(col: Column) -> Column:
    """PG LSN ``X/Y`` (hex) → 64-bit integer: ``(X << 32) | Y``.

    The reference sidesteps LSN ordering by sorting on ``created_at``
    (``internal/cdc/buffer/postgres.go:134``); parsing to int64 is strictly
    better (SURVEY §7.4 risk 4). Pure JVM-side expression — no UDF.
    """
    hi = F.conv(F.split_part(col, F.lit("/"), F.lit(1)), 16, 10).cast("long")
    lo = F.conv(F.split_part(col, F.lit("/"), F.lit(2)), 16, 10).cast("long")
    return (F.shiftleft(hi, 32) + lo).alias("lsn_int")
