"""Skew-mitigation operators: salted join and two-phase salted aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most sort-merge skew at runtime, but two shapes still
need explicit salting at 100 TB:

- a shuffle join where one side has a handful of pathological hot keys
  (a null-ish default id, a bot user) that AQE can split on the probe side
  but which still funnel the build side's matching rows through few tasks;
- a high-cardinality aggregation whose key distribution is Zipfian enough
  that single partitions exceed executor memory before map-side combine
  helps.

Both operators are pure DataFrame compositions — no shuffle is added
beyond the ones the un-salted plan already had; salting only changes the
shuffle *key* so rows spread over `salt_buckets × keys` partitions.

The reference has no joins at all in Go (SURVEY §2A: all relational work
is delegated), so these are scale enablers for the Spark engine's own
query surface, not parity items.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted against hot keys
    in `large`.

    The large side gets a deterministic per-row salt (hash of all columns,
    so the same key's rows spread across buckets); the small side is
    replicated `salt_buckets`× via explode. Join key becomes (on, salt) —
    a hot key's rows now land in `salt_buckets` different partitions.

    Cost model: small side is materialized salt_buckets× in the shuffle
    (or broadcast) — use for genuinely small/medium build sides. Only
    inner/left joins of this shape are semantically transparent.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_buckets)
    ).cast("int")
    big = large.withColumn(_SALT, salt)
    rep = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big.join(rep, [on, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (keys + salt) first — hot keys split across `salt_buckets` partial
    groups — then re-aggregate on keys alone.

    Supported aggregate functions (decomposable): sum, count, min, max.
    `aggs` maps column → fn; output columns are named `{fn}_{col}`.
    avg is deliberately absent — express it as sum/count at the call site
    so both phases stay decomposable.
    """
    supported = {"sum", "count", "min", "max"}
    bad = {fn for fn in aggs.values()} - supported
    if bad:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(bad)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(
            *[
                getattr(F, fn)(col).alias(f"{fn}_{col}")
                for col, fn in aggs.items()
            ]
        )
    )
    # re-combine: sum of partial sums/counts, min of mins, max of maxes
    refn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, refn[fn])(f"{fn}_{col}").alias(f"{fn}_{col}")
            for col, fn in aggs.items()
        ]
    )
