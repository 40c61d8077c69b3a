"""Local replica of the driver's correctness harness: run a registered
Spark query and its DuckDB oracle on the same parquet fixtures, compare
row count, column names, and an order-insensitive value representation.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style tolerant float repr
        return f"{v:.6g}"
    if isinstance(v, Decimal):
        return f"{float(v):.6g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows — the
    order-insensitive comparison form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def run_spark(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    return [f.lower() for f in df.columns], [tuple(r) for r in df.collect()]


def run_duck(duck, sql: str):
    res = duck.sql(sql)
    return [c.lower() for c in res.columns], [tuple(r) for r in res.fetchall()]


def compare(
    spark, duck, fn, sql: str, sf_dir: str, allow_empty: bool = False
) -> tuple[bool, str]:
    s_cols, s_rows = run_spark(spark, fn, sf_dir)
    d_cols, d_rows = run_duck(duck, sql)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    if not s_rows and not allow_empty:
        # VERDICT r14 #1: an empty result set hash-matches trivially — a
        # predicate that misses the fixture at this SF would "pass" while
        # verifying nothing. Refuse the vacuous pass: queries must use
        # SF-relative predicates (bounds derived from the data on BOTH
        # sides) so every compare carries row content.
        return False, (
            "vacuous pass refused: both sides returned 0 rows — "
            "re-predicate the query SF-relatively (or pass "
            "allow_empty=True with a documented reason)"
        )
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [
            f"  spark={a}\n  duck ={b}" for a, b in zip(sc, dc) if a != b
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
