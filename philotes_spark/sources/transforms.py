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

# whitespace before the paren is legal everywhere the SQL grammar
# (sql_frontend._PFIELD) matches it — the parser must accept every
# spelling the statement surface deliberately lets through
_DAY_RE = re.compile(r"^days?\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_HOUR_RE = re.compile(r"^hours?\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_MONTH_RE = re.compile(r"^months?\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_YEAR_RE = re.compile(r"^years?\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_BUCKET_RE = re.compile(
    r"^bucket\s*\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
)
_TRUNCATE_RE = re.compile(
    r"^truncate\s*\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
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
    m = _HOUR_RE.match(s)
    if m:
        col = m.group(1)
        return PartField(f"hours({col})", "hour", col, None, f"{col}_hour")
    m = _MONTH_RE.match(s)
    if m:
        col = m.group(1)
        return PartField(f"months({col})", "month", col, None, f"{col}_month")
    m = _YEAR_RE.match(s)
    if m:
        col = m.group(1)
        return PartField(f"years({col})", "year", col, None, f"{col}_year")
    m = _BUCKET_RE.match(s)
    if m:
        n, col = int(m.group(1)), m.group(2)
        if n <= 0:
            raise ValueError(f"bucket count must be positive in {s!r}")
        return PartField(
            f"bucket({n},{col})", "bucket", col, n, f"{col}_bucket"
        )
    m = _TRUNCATE_RE.match(s)
    if m:
        n, col = int(m.group(1)), m.group(2)
        if n <= 0:
            raise ValueError(f"truncate width must be positive in {s!r}")
        return PartField(
            f"truncate({n},{col})", "truncate", col, n, f"{col}_trunc"
        )
    if _IDENT_RE.match(s):
        return PartField(s, "identity", s, None, s)
    raise ValueError(
        f"unsupported partition field {s!r}; supported: a column name, "
        "hours(col), days(col), months(col), years(col), bucket(N, col), "
        "truncate(W, col)"
    )


def parse_spec(fields: list[str]) -> list[PartField]:
    return [parse_part_field(s) for s in fields]


def path_field_names(fields: list[str]) -> list[str]:
    """The hive path column names a spec writes (identity: the column)."""
    return [pf.name for pf in parse_spec(fields)]


def derived_field_names(fields: list[str]) -> list[str]:
    """Path columns that are NOT table columns (transform results)."""
    return [pf.name for pf in parse_spec(fields) if pf.transform != "identity"]


# --- sort-order fields (Iceberg sort-order spec) ---------------------------
#
# A write order's entries carry direction and null placement — Iceberg
# sort orders are (transform, source, direction asc|desc, null-order
# nulls-first|nulls-last) tuples. The manifest stores each field in the
# compact SQL spelling ("k", "k DESC", "k ASC NULLS LAST"), canonical
# with Iceberg's defaults elided: ASC defaults to NULLS FIRST, DESC to
# NULLS LAST (the spec's own defaulting rule, so the published order and
# the stored string never disagree about an omitted null-order).
# File-range PRUNING is direction-agnostic (a [min,max] hull bounds the
# file either way) — direction matters to the clustered WRITE
# (repartitionByRange + sortWithinPartitions expressions) and to the
# PUBLISHED metadata external writers follow.

_SORT_FIELD_RE = re.compile(
    r"^\s*((?:\w+\s*\(\s*[\w\s,]+?\s*\))|[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+(ASC|DESC))?"
    r"(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
    re.IGNORECASE,
)


class SortField(NamedTuple):
    name: str  # canonical field spec: a column or a transform ("days(ts)")
    asc: bool  # direction
    nulls_first: bool  # null placement


def parse_sort_field(s: str) -> SortField:
    """Parse one sort-field string; bare names default to ASC, and the
    null placement defaults by direction (Iceberg: asc ⇒ nulls-first,
    desc ⇒ nulls-last). The field may be a TRANSFORM (r14 — Iceberg
    sort-order fields carry a transform): ``days(ts) DESC`` sorts by
    the derived day value; the spec string is canonicalized through
    :func:`parse_part_field` so the manifest and the published order
    never disagree about spelling."""
    m = _SORT_FIELD_RE.match(s)
    if not m:
        raise ValueError(
            f"unsupported sort field {s!r}; use <column|transform(col)> "
            "[ASC|DESC] [NULLS FIRST|NULLS LAST]"
        )
    head, direction, nulls = m.groups()
    # canonicalize + validate the field through the partition-field
    # grammar (same transform set; identity for a bare column)
    head = parse_part_field(head).raw
    asc = direction is None or direction.upper() == "ASC"
    nulls_first = asc if nulls is None else nulls.upper() == "FIRST"
    return SortField(head, asc, nulls_first)


def parse_sort_spec(fields: list[str]) -> list[SortField]:
    return [parse_sort_field(s) for s in fields]


def sort_field_names(fields: list[str]) -> list[str]:
    """The SOURCE column names of a sort order (for stats unions,
    schema validation, and guard checks — direction- and transform-
    independent: ``days(ts)`` guards and records stats on ``ts``, whose
    footer ranges a day-clustered file keeps narrow)."""
    return [
        parse_part_field(sf.name).source for sf in parse_sort_spec(fields)
    ]


def format_sort_field(sf: SortField) -> str:
    """Canonical compact spelling: defaults elided, keywords upper."""
    out = sf.name
    if not sf.asc:
        out += " DESC"
    if sf.nulls_first != sf.asc:  # non-default null placement
        out += " NULLS FIRST" if sf.nulls_first else " NULLS LAST"
    return out


def sort_exprs(fields: list[str], df: DataFrame | None = None):
    """The Spark sort expressions of an order — what the clustered
    write's repartitionByRange/sortWithinPartitions apply, directions
    and null placement included. Transform fields (``days(ts)``) sort
    by the derived value and need ``df`` for source-type dispatch;
    identity fields work without it."""
    from pyspark.sql import functions as F

    out = []
    for sf in parse_sort_spec(fields):
        pf = parse_part_field(sf.name)
        if pf.transform == "identity":
            c = F.col(pf.source)
        else:
            if df is None:
                raise ValueError(
                    f"sort field {sf.name!r} is a transform — pass the "
                    "DataFrame being written for source-type dispatch"
                )
            c = transform_column(df, pf)
        if sf.asc:
            out.append(
                c.asc_nulls_first() if sf.nulls_first else c.asc_nulls_last()
            )
        else:
            out.append(
                c.desc_nulls_first() if sf.nulls_first else c.desc_nulls_last()
            )
    return out


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


def hour_value(v) -> int | None:
    """UTC hours since epoch (Iceberg hour transform — timestamps only)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return round(v.timestamp() * 1_000_000) // 3_600_000_000
    raise TypeError(f"hour transform unsupported for {type(v).__name__}")


def month_value(v) -> int | None:
    """UTC months from 1970-01 (Iceberg month transform, result int)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return (v.year - 1970) * 12 + v.month - 1
    raise TypeError(f"month transform unsupported for {type(v).__name__}")


def year_value(v) -> int | None:
    """UTC years from 1970 (Iceberg year transform, result int)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.year - 1970
    raise TypeError(f"year transform unsupported for {type(v).__name__}")


def truncate_value(v, w: int):
    """Iceberg truncate transform: numerics floor to the width
    (``v - (((v % W) + W) % W)`` — python ``%`` already floors), strings
    keep the first W codepoints. Order-preserving on both domains."""
    if v is None:
        return None
    if isinstance(v, bool):
        raise TypeError("truncate transform on boolean is not in the spec")
    if isinstance(v, int):
        return v - (v % w)
    if isinstance(v, str):
        return v[:w]
    raise TypeError(f"truncate transform unsupported for {type(v).__name__}")


#: transforms whose value function is monotonic non-decreasing on the
#: source domain — a range probe [lo, hi] prunes any file whose path
#: value falls outside [T(lo), T(hi)]; bucket scatters order and prunes
#: equality probes only
ORDER_PRESERVING = ("identity", "hour", "day", "month", "year", "truncate")


def transform_value(pf: PartField, v):
    """Apply one spec field's transform to a driver-side literal —
    the scalar the pruning paths compare path values against."""
    if pf.transform == "identity":
        return v
    if pf.transform == "hour":
        return hour_value(v)
    if pf.transform == "day":
        return day_value(v)
    if pf.transform == "month":
        return month_value(v)
    if pf.transform == "year":
        return year_value(v)
    if pf.transform == "bucket":
        return bucket_value(v, pf.n)
    return truncate_value(v, pf.n)


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
    if pf.transform == "hour":
        if dt.startswith("timestamp"):
            return F.floor(F.unix_micros(col) / 3_600_000_000).cast("int")
        raise ValueError(
            f"hours({pf.source}) needs a timestamp column, got {dt}"
        )
    if pf.transform in ("month", "year"):
        # session timezone is pinned UTC (session.py), so year()/month()
        # on a LTZ timestamp are the spec's UTC calendar fields
        if not (dt == "date" or dt.startswith("timestamp")):
            raise ValueError(
                f"{pf.transform}s({pf.source}) needs a date/timestamp "
                f"column, got {dt}"
            )
        years = (F.year(col) - F.lit(1970)).cast("int")
        if pf.transform == "year":
            return years
        return (years * F.lit(12) + F.month(col) - F.lit(1)).cast("int")
    if pf.transform == "truncate":
        if dt in ("tinyint", "smallint", "int", "bigint"):
            longs = col.cast("long")
            return longs - F.pmod(longs, F.lit(pf.n))
        if dt == "string":
            return F.substring(col, 1, pf.n)
        raise ValueError(
            f"truncate({pf.n},{pf.source}) unsupported for column type {dt}"
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
    unchanged — the pre-transform write path byte-for-byte.

    Refuses when a derived field name shadows a REAL column of ``df``:
    ``withColumn`` would silently REPLACE it and ``partitionBy`` would
    move the replacement into the path, destroying the original values
    (evolve_partition_spec has the same guard, but a direct
    ``commit(partition_by=[...])`` — or a column added after the
    evolution — must refuse at write time too)."""
    spec = parse_spec(fields)
    names = [pf.name for pf in spec]
    cols = set(df.columns)
    shadowed = [
        pf.name for pf in spec if pf.transform != "identity" and pf.name in cols
    ]
    if shadowed:
        raise ValueError(
            f"transform partition field name(s) {shadowed} collide with "
            "existing columns; rename the column or pick an identity spec"
        )
    for pf in spec:
        if pf.transform != "identity":
            df = df.withColumn(pf.name, transform_column(df, pf))
    return df, names


def rest_transform(pf: PartField) -> str:
    """Iceberg REST/metadata transform string."""
    if pf.transform in ("identity", "hour", "day", "month", "year"):
        return pf.transform
    if pf.transform == "bucket":
        return f"bucket[{pf.n}]"
    return f"truncate[{pf.n}]"
