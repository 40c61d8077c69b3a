"""Declarative data-quality constraints (the Deequ/dbt-tests shape):
declare NOT NULL / UNIQUE / ACCEPTED VALUES / RANGE / FOREIGN KEY checks
against tables, get back one violations report — the validation layer a
CDC pipeline runs after each batch lands (the reference's onboarding
"data verification" step, web/src/components/onboarding/
step-data-verification.tsx, is a row-count check; this is the engine-
native generalization).

Every check compiles to ONE aggregate (or one anti-join + aggregate for
FK) over its table; checks against the same table could share a scan via
a combined agg, but independent plans keep the report incremental — a
failing check re-runs alone. Scale shape per check:
- not_null / accepted_values / range: single scan, partial-agg count;
- unique: one key-shuffle (count - count distinct);
- foreign_key: left-anti join, broadcast when the parent's key side fits
  (dims), shuffle otherwise — exactly the join Catalyst/AQE plans.

Reports are DataFrames, so the control plane can serve, store, or alert
on them (observability.AlertRule composes on the violations column).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint; ``kind`` ∈ {not_null, unique,
    accepted_values, in_range, foreign_key}."""

    kind: str
    table: str
    column: str
    # kind-specific parameters
    values: tuple | None = None  # accepted_values
    lo: float | None = None  # in_range
    hi: float | None = None
    ref_table: str | None = None  # foreign_key
    ref_column: str | None = None

    @property
    def name(self) -> str:
        extra = ""
        if self.kind == "foreign_key":
            extra = f"->{self.ref_table}.{self.ref_column}"
        return f"{self.kind}({self.table}.{self.column}{extra})"


def not_null(table: str, column: str) -> Check:
    return Check("not_null", table, column)


def unique(table: str, column: str) -> Check:
    return Check("unique", table, column)


def accepted_values(table: str, column: str, values) -> Check:
    return Check("accepted_values", table, column, values=tuple(values))


def in_range(table: str, column: str, lo: float, hi: float) -> Check:
    return Check("in_range", table, column, lo=lo, hi=hi)


def foreign_key(table: str, column: str, ref_table: str, ref_column: str) -> Check:
    return Check(
        "foreign_key", table, column, ref_table=ref_table, ref_column=ref_column
    )


def _violations(check: Check, tables: dict[str, DataFrame]) -> DataFrame:
    df = tables[check.table]
    c = F.col(check.column)
    if check.kind == "not_null":
        agg = df.agg(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("violations"))
    elif check.kind == "unique":
        # duplicates = total non-null rows minus distinct keys (null keys
        # are not uniqueness violations — SQL UNIQUE semantics)
        agg = df.agg(
            (F.count(c) - F.countDistinct(c)).alias("violations")
        )
    elif check.kind == "accepted_values":
        agg = df.agg(
            F.sum(
                F.when(c.isNotNull() & ~c.isin(*check.values), 1).otherwise(0)
            ).alias("violations")
        )
    elif check.kind == "in_range":
        agg = df.agg(
            F.sum(
                F.when(
                    c.isNotNull() & ((c < check.lo) | (c > check.hi)), 1
                ).otherwise(0)
            ).alias("violations")
        )
    elif check.kind == "foreign_key":
        parent = tables[check.ref_table].select(
            F.col(check.ref_column).alias(check.column)
        )
        orphans = df.filter(c.isNotNull()).join(parent, check.column, "left_anti")
        agg = orphans.agg(F.count(F.lit(1)).alias("violations"))
    else:  # pragma: no cover
        raise ValueError(f"unknown check kind {check.kind!r}")
    return agg.select(
        F.lit(check.name).alias("check_name"),
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
    )


def run_checks(checks: list[Check], tables: dict[str, DataFrame]) -> DataFrame:
    """Evaluate every check and union the per-constraint rows:
    (check_name, violations, status). Deterministic order by name
    (`constraint` is reserved in ANSI/DuckDB — hence check_name)."""
    if not checks:
        raise ValueError("run_checks requires at least one Check")
    out = None
    for ch in checks:
        part = _violations(ch, tables)
        out = part if out is None else out.unionByName(part)
    return out.select(
        "check_name",
        "violations",
        F.when(F.col("violations") == 0, "pass").otherwise("fail").alias("status"),
        # one row per configured check (bounded): single-partition sort (r16)
    ).coalesce(1).orderBy("check_name")
