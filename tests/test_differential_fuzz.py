"""Differential SQL fuzzing: the SAME randomly generated SQL text runs
on Spark SQL and on DuckDB over the same parquet fixture, and canonical
results must match exactly.

The 127 hand-written oracles pin the registered operators; this fuzzer
sweeps the *composition space around them* — random projections,
predicate combinations, group-bys and HAVING clauses in the shared
ANSI dialect — so a semantics divergence between the engines (null
handling, type coercion, aggregate edge cases) surfaces even where no
hand-written query happens to exercise it. Seeds are fixed: failures
reproduce by seed number.

Dialect constraints (both engines must parse AND agree):
- every output column is explicitly aliased (auto-generated aggregate
  names differ between engines);
- floats only ever reach the comparison through ROUND(, 3) or the
  comparator's %.6g normalization;
- no ORDER BY — canonical_rows sorts rows and columns.
"""

from __future__ import annotations

import random

import pytest

from philotes_spark.sources.catalog import register_views
from tests.oracle import canonical_rows

# (expression, weight) pools — identical text for both engines
DIMS = [
    "event_type",
    "user_id % 7",
    "CAST(date_trunc('day', ts) AS DATE)",
    "CAST(floor(value / 50) AS INT)",
    "user_id % 2",
]
AGGS = [
    "COUNT(*)",
    "COUNT(value)",
    "COUNT(DISTINCT user_id)",
    "ROUND(MIN(value), 3)",
    "ROUND(MAX(value), 3)",
    "SUM(user_id)",
    "ROUND(SUM(value), 3)",
    "ROUND(AVG(value), 3)",
    "MAX(event_id)",
]
PREDS = [
    "value > 50",
    "value <= 250",
    "user_id % 3 = 1",
    "event_type IN ('click', 'purchase')",
    "event_type <> 'error'",
    "ts >= TIMESTAMP '2024-01-10 00:00:00'",
    "ts < TIMESTAMP '2024-01-25 12:00:00'",
    "value BETWEEN 20 AND 300",
    "event_id % 5 <> 2",
]


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    dims = rng.sample(DIMS, rng.randint(1, 3))
    aggs = rng.sample(AGGS, rng.randint(1, 3))
    sel = [f"{d} AS d{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM events"
    n_preds = rng.randint(0, 3)
    if n_preds:
        preds = rng.sample(PREDS, n_preds)
        if len(preds) >= 2 and rng.random() < 0.5:
            preds = [f"({preds[0]} OR {preds[1]})"] + preds[2:]
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY " + ", ".join(dims)
    if rng.random() < 0.4:
        sql += f" HAVING COUNT(*) > {rng.randint(1, 5)}"
    return sql


@pytest.fixture(scope="module")
def fuzz_env(spark, duck, sf_dir):
    # same registration the SQL surface uses (B1/B2 family), so the
    # fuzzer sees exactly the engine's own view of the fixture
    register_views(spark, sf_dir)
    return spark, duck


@pytest.mark.parametrize("seed", range(40))
def test_same_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    sql = gen_query(seed)
    sdf = spark.sql(sql)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(sql)
    d_cols = [c.lower() for c in res.columns]
    d_rows = [tuple(r) for r in res.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), sql
    assert len(s_rows) == len(d_rows), f"{sql}\nspark={len(s_rows)} duck={len(d_rows)}"
    assert canonical_rows(s_cols, s_rows) == canonical_rows(d_cols, d_rows), sql
