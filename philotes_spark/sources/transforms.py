"""Iceberg partition transforms for the snapshot layer (B19/A16).

The reference's DEFAULT table layout is a transform spec — ``day(_cdc_timestamp)``
named ``_cdc_date`` (`internal/iceberg/schema/schema.go:104-135`; transform
strings in `internal/iceberg/types.go:136-140`) — so serving identity
transforms only means a published table loses transform-based pruning in
external engines. This module adds the two transforms the reference's spec
surface uses at scale:

- ``days(col)`` — UTC days since epoch of a timestamp/date column
  (Iceberg ``day`` transform, result type ``int``). JVM-side derivation:
  ``floor(unix_micros(col) / 86_400_000_000)`` — timezone-independent.
- ``bucket(N, col)`` — Iceberg's bucket transform:
  ``(murmur3_x86_32(iceberg_bytes(v), seed=0) & Int32.MAX) % N``.
  Spark's builtin ``hash()`` is murmur3 with seed **42**, so it cannot
  serve published metadata an external Iceberg reader prunes against;
  the seed-0 hash is computed in an Arrow-batched pandas UDF — a
  vectorized numpy pass for the fixed-width long forms (int/long/
  timestamp-micros/date-days, all hashed as 8-byte little-endian longs
  per the spec), a per-row scalar fall-back only for UTF-8 strings.

Spec fields are plain strings everywhere the engine stores a layout
(``partition_by`` / ``partition_specs[].fields``): ``"col"`` (identity,
byte-compatible with every pre-transform manifest), ``"days(col)"``,
``"bucket(N,col)"``. Hive path segments use the *derived field name*
(Iceberg's default naming: ``col_day``, ``col_bucket``) with the integer
transform value — the same value the published manifest's partition
record carries, so ``_partition_value`` stays a straight path parse.

Correctness pins: murmur3 matches the Iceberg spec's Appendix-B test
vectors (``tests/test_transforms.py``); bucket/day values are shared with
the DuckDB oracle in the ``snapshot_partition_transforms_read`` query.
"""

from __future__ import annotations

from typing import NamedTuple

import re

from pyspark.sql import Column, DataFrame, functions as F

_DAY_RE = re.compile(r"^days?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_BUCKET_RE = re.compile(
    r"^bucket\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
)
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_MICROS_PER_DAY = 86_400_000_000


class PartField(NamedTuple):
    raw: str  # canonical spec string ("cat", "days(ts)", "bucket(16,id)")
    transform: str  # identity | day | bucket
    source: str  # source column name
    n: int | None  # bucket count (bucket only)
    name: str  # hive/path field name (identity: the column itself)


def parse_part_field(s: str) -> PartField:
    """Parse one partition-field spec string; raises ValueError on
    anything that is neither a column name nor a supported transform."""
    s = s.strip()
    m = _DAY_RE.match(s)
    if m:
        col = m.group(1)
        return PartField(f"days({col})", "day", col, None, f"{col}_day")
    m = _BUCKET_RE.match(s)
    if m:
        n, col = int(m.group(1)), m.group(2)
        if n <= 0:
            raise ValueError(f"bucket count must be positive in {s!r}")
        return PartField(
            f"bucket({n},{col})", "bucket", col, n, f"{col}_bucket"
        )
    if _IDENT_RE.match(s):
        return PartField(s, "identity", s, None, s)
    raise ValueError(
        f"unsupported partition field {s!r}; supported: a column name, "
        "days(col), bucket(N, col)"
    )


def parse_spec(fields: list[str]) -> list[PartField]:
    return [parse_part_field(s) for s in fields]


def path_field_names(fields: list[str]) -> list[str]:
    """The hive path column names a spec writes (identity: the column)."""
    return [pf.name for pf in parse_spec(fields)]


def derived_field_names(fields: list[str]) -> list[str]:
    """Path columns that are NOT table columns (transform results)."""
    return [pf.name for pf in parse_spec(fields) if pf.transform != "identity"]


# --- murmur3_x86_32, seed 0 (Iceberg Appendix B) ---------------------------

_C1, _C2 = 0xCC9E2D51, 0x1B873593


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 returning a SIGNED int32 — the exact hash
    Iceberg's bucket transform specifies (seed 0). Used for variable-width
    inputs (UTF-8 strings) and as the reference the vectorized long path
    is pinned against."""
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[4 * nblocks :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def murmur3_long_vec(v):
    """Vectorized murmur3_x86_32(seed=0) of int64 values in their Iceberg
    byte form (8-byte little-endian long; ints, dates-as-days and
    timestamp-micros all hash through this per the spec's "int and long
    hash identically" rule). Returns signed int32 ndarray."""
    import numpy as np

    u = np.asarray(v, dtype=np.int64).astype(np.uint64)
    h = np.zeros(len(u), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for block in (u & np.uint64(0xFFFFFFFF), u >> np.uint64(32)):
            k = block.astype(np.uint32)
            k *= np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k *= np.uint32(_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # len(8-byte long)
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def bucket_value(v, n: int) -> int | None:
    """Driver-side scalar bucket: (hash & Int32.MAX) % n, Iceberg byte
    forms per type (int/long → 8-byte LE; str → UTF-8; date → days as
    long; naive/aware datetime → epoch micros as long)."""
    import datetime as _dt
    import struct

    if v is None:
        return None
    if isinstance(v, bool):
        raise TypeError("bucket transform on boolean is not in the spec")
    if isinstance(v, int):
        h = murmur3_32(struct.pack("<q", v))
    elif isinstance(v, str):
        h = murmur3_32(v.encode("utf-8"))
    elif isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        micros = round(v.timestamp() * 1_000_000)
        h = murmur3_32(struct.pack("<q", micros))
    elif isinstance(v, _dt.date):
        h = murmur3_32(struct.pack("<q", (v - _dt.date(1970, 1, 1)).days))
    else:
        raise TypeError(f"bucket transform unsupported for {type(v).__name__}")
    return (h & 0x7FFFFFFF) % n


def day_value(v) -> int | None:
    """Driver-side scalar day transform: UTC days since epoch."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        micros = round(v.timestamp() * 1_000_000)
        return micros // _MICROS_PER_DAY
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    raise TypeError(f"day transform unsupported for {type(v).__name__}")


def transform_column(df: DataFrame, pf: PartField) -> Column:
    """The derived partition column for one transform field, computed on
    ``df``'s column types. JVM expressions for day; an Arrow-batched
    pandas UDF only for bucket (no JVM murmur3-seed-0 exists)."""
    dt = dict(df.dtypes).get(pf.source)
    if dt is None:
        raise ValueError(f"partition source column {pf.source!r} not found")
    col = F.col(pf.source)
    if pf.transform == "identity":
        return col
    if pf.transform == "day":
        if dt == "date":
            return F.datediff(col, F.lit("1970-01-01")).cast("int")
        if dt.startswith("timestamp"):
            return F.floor(F.unix_micros(col) / _MICROS_PER_DAY).cast("int")
        raise ValueError(
            f"days({pf.source}) needs a date/timestamp column, got {dt}"
        )
    # bucket: normalize to the spec's long byte-form JVM-side, hash in a
    # vectorized Arrow batch; strings keep their bytes and take the
    # scalar loop inside the same batch
    n = pf.n
    if dt in ("tinyint", "smallint", "int", "bigint"):
        longs = col.cast("long")
    elif dt.startswith("timestamp"):
        longs = F.unix_micros(col)
    elif dt == "date":
        longs = F.datediff(col, F.lit("1970-01-01")).cast("long")
    elif dt == "string":
        return _bucket_str_udf(n)(col)
    else:
        raise ValueError(
            f"bucket({n},{pf.source}) unsupported for column type {dt}"
        )
    return _bucket_long_udf(n)(longs)


def _bucket_long_udf(n: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket(s):
        import numpy as np
        import pandas as pd

        mask = s.notna()
        out = pd.Series([None] * len(s), dtype="Int64")
        if mask.any():
            h = murmur3_long_vec(s[mask].to_numpy(np.int64))
            out[mask] = (h.astype(np.int64) & 0x7FFFFFFF) % n
        return out.astype("Int32")

    return _bucket


def _bucket_str_udf(n: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _bucket(s):
        return s.map(
            lambda v: None
            if v is None
            else (murmur3_32(str(v).encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("Int32")

    return _bucket


def with_partition_cols(
    df: DataFrame, fields: list[str]
) -> tuple[DataFrame, list[str]]:
    """Attach the derived columns a transform spec partitions by and
    return (df', hive path column names). Identity specs return the df
    unchanged — the pre-transform write path byte-for-byte."""
    spec = parse_spec(fields)
    names = [pf.name for pf in spec]
    for pf in spec:
        if pf.transform != "identity":
            df = df.withColumn(pf.name, transform_column(df, pf))
    return df, names


def rest_transform(pf: PartField) -> str:
    """Iceberg REST/metadata transform string."""
    if pf.transform == "identity":
        return "identity"
    if pf.transform == "day":
        return "day"
    return f"bucket[{pf.n}]"
