"""Differential SQL fuzzing: the SAME randomly generated SQL text runs
on Spark SQL and on DuckDB over the same parquet fixture, and canonical
results must match exactly.

The 150 hand-written oracles pin the registered operators; this fuzzer
sweeps the *composition space around them* — random projections,
predicate combinations, group-bys and HAVING clauses in the shared
ANSI dialect — so a semantics divergence between the engines (null
handling, type coercion, aggregate edge cases) surfaces even where no
hand-written query happens to exercise it. Seeds are fixed: failures
reproduce by seed number.

Dialect constraints (both engines must parse AND agree):
- every output column is explicitly aliased (auto-generated aggregate
  names differ between engines);
- float aggregates reach the comparison UNROUNDED and are compared with
  relative tolerance: in-SQL ROUND is engine-divergent on exact decimal
  halves (Spark rounds the shortest-decimal repr HALF_UP, DuckDB rounds
  the raw binary double — avg-of-2 of 2-decimal inputs lands exactly on
  .xx5 and the engines disagree), and ANY fixed-precision decimal
  formatting inherits the same knife edge because the fixture's
  2-decimal values make sums land exactly on representational
  boundaries. Rows are aligned on their exact-typed cells (group keys /
  unique ids — unique per row by construction of every family), then
  float cells compare via math.isclose;
- no ORDER BY — the comparator sorts rows and columns.
"""

from __future__ import annotations

import math
import random
from datetime import date, datetime

import pytest

from philotes_spark.sources.catalog import register_views

# the fuzz families are ~35% of full-suite wall time (649 s of 1833 s,
# r17 durations profile) — slow-tail layer, excluded from the default
# driver-gate profile (pytest.ini), run explicitly with -m slow
pytestmark = pytest.mark.slow


def _assert_same(sql: str, spark, duck) -> None:
    """Run the identical SQL text on both engines and compare: exact
    cells exactly, float cells within relative tolerance, rows aligned
    by sorting on the exact-typed cells (unique by construction)."""
    sdf = spark.sql(sql)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(sql)
    d_cols = [c.lower() for c in res.columns]
    d_rows = [tuple(r) for r in res.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), sql
    assert len(s_rows) == len(d_rows), (
        f"{sql}\nspark={len(s_rows)} duck={len(d_rows)}"
    )

    def _exact(v):
        if isinstance(v, float):
            return None
        if isinstance(v, datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, date):
            return v.isoformat()
        return repr(v)

    def _canon(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = [tuple(r[i] for i in order) for r in rows]
        return sorted(out, key=lambda r: tuple(_exact(v) or "" for v in r))

    sc, dc = _canon(s_cols, s_rows), _canon(d_cols, d_rows)
    for a, b in zip(sc, dc):
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                assert x is not None and y is not None, f"{sql}\n{a}\n{b}"
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{sql}\n{a}\n{b}"
                )
            else:
                assert _exact(x) == _exact(y), f"{sql}\n{a}\n{b}"

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
    "MIN(value)",
    "MAX(value)",
    "SUM(user_id)",
    "SUM(value)",
    "AVG(value)",
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
    _assert_same(sql, spark, duck)


# --- family 2: equi-joins (orders ⋈ customer) --------------------------------

JOIN_DIMS = [
    "c.c_mktsegment",
    "o.o_orderpriority",
    "CAST(date_trunc('month', CAST(o.o_orderdate AS TIMESTAMP)) AS DATE)",
    "c.c_nationkey % 5",
]
JOIN_AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT c.c_custkey)",
    "SUM(o.o_totalprice)",
    "AVG(c.c_acctbal)",
    "MAX(o.o_orderkey)",
]
JOIN_PREDS = [
    "o.o_totalprice > 100000",
    "c.c_acctbal >= 0",
    "o.o_orderstatus = 'F'",
    "c.c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "o.o_orderdate < DATE '1996-01-01'",
]


def gen_join_query(seed: int) -> str:
    rng = random.Random(seed)
    dims = rng.sample(JOIN_DIMS, rng.randint(1, 2))
    aggs = rng.sample(JOIN_AGGS, rng.randint(1, 3))
    sel = [f"{d} AS d{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = (
        f"SELECT {', '.join(sel)} FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    preds = rng.sample(JOIN_PREDS, rng.randint(0, 2))
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY " + ", ".join(dims)
    return sql


@pytest.mark.parametrize("seed", range(100, 120))
def test_same_join_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    sql = gen_join_query(seed)
    _assert_same(sql, spark, duck)


# --- family 3: window functions over events ----------------------------------
# every ORDER BY ends in the unique event_id so ties cannot make
# rank/lag results engine-dependent

WIN_PARTS = ["event_type", "user_id % 4"]
WIN_FUNCS = [
    "ROW_NUMBER() OVER (PARTITION BY {p} ORDER BY ts, event_id)",
    "RANK() OVER (PARTITION BY {p} ORDER BY CAST(floor(value) AS INT))",
    "LAG(event_id, 1, -1) OVER (PARTITION BY {p} ORDER BY ts, event_id)",
    "SUM(value) OVER (PARTITION BY {p} ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    "COUNT(*) OVER (PARTITION BY {p})",
    "AVG(value) OVER (PARTITION BY {p} ORDER BY ts, event_id "
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
]


def gen_window_query(seed: int) -> str:
    rng = random.Random(seed)
    p = rng.choice(WIN_PARTS)
    funcs = rng.sample(WIN_FUNCS, rng.randint(1, 3))
    sel = ["event_id AS eid"] + [
        f"{f.format(p=p)} AS w{i}" for i, f in enumerate(funcs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM events"
    if rng.random() < 0.5:
        sql += f" WHERE {rng.choice(PREDS)}"
    return sql


@pytest.mark.parametrize("seed", range(200, 220))
def test_same_window_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    sql = gen_window_query(seed)
    _assert_same(sql, spark, duck)


# --- family 4: string functions / CASE over documents ------------------------

DOC_DIMS = [
    "source",
    "lang",
    "CASE WHEN n_chars < 120 THEN 'short' WHEN n_chars < 180 THEN 'mid' "
    "ELSE 'long' END",
    "length(text) % 5",
    "substring(text, 1, 1)",
]
DOC_AGGS = [
    "COUNT(*)",
    "SUM(n_chars)",
    "MIN(length(text))",
    "MAX(length(text))",
    "COUNT(DISTINCT lang)",
    "MIN(upper(substring(text, 1, 4)))",
    "MAX(doc_id)",
]
DOC_PREDS = [
    "n_chars BETWEEN 80 AND 220",
    "lang IN ('en', 'es')",
    "text LIKE '%value%'",
    "text NOT LIKE 'key%'",
    "length(text) > 120",
    "doc_id % 4 <> 1",
    "source <> 'src0'",
]


def gen_doc_query(seed: int) -> str:
    rng = random.Random(seed)
    dims = rng.sample(DOC_DIMS, rng.randint(1, 2))
    aggs = rng.sample(DOC_AGGS, rng.randint(1, 3))
    sel = [f"{d} AS d{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM documents"
    preds = rng.sample(DOC_PREDS, rng.randint(0, 3))
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY " + ", ".join(dims)
    return sql


@pytest.mark.parametrize("seed", range(300, 320))
def test_same_doc_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    sql = gen_doc_query(seed)
    _assert_same(sql, spark, duck)


# --- family 5: outer joins + set operations ----------------------------------
# outer-join null semantics (COUNT(col) vs COUNT(*), aggregates over
# all-null groups) and the distinct-set semantics of UNION/INTERSECT/EXCEPT

OUTER_AGGS = [
    "COUNT(*)",
    "COUNT(o.o_orderkey)",
    "COUNT(DISTINCT o.o_orderstatus)",
    "MIN(o.o_orderdate)",
    "SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)",
]
OUTER_PREDS = [
    "c.c_acctbal < 0",
    "c.c_mktsegment = 'BUILDING'",
    "c.c_nationkey % 2 = 0",
]


def gen_outer_join_query(seed: int) -> str:
    rng = random.Random(seed)
    aggs = rng.sample(OUTER_AGGS, rng.randint(2, 3))
    sel = ["c.c_nationkey % 5 AS d0"] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = (
        f"SELECT {', '.join(sel)} FROM customer c "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey"
    )
    # join-side extra condition sometimes, to create all-null groups
    if rng.random() < 0.5:
        sql += " AND o.o_totalprice > 200000"
    preds = rng.sample(OUTER_PREDS, rng.randint(0, 2))
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY c.c_nationkey % 5"
    return sql


SETOP_SIDES = [
    "SELECT event_type AS x FROM events WHERE value > 250",
    "SELECT event_type AS x FROM events WHERE user_id % 3 = 0",
    "SELECT event_type AS x FROM events WHERE ts < TIMESTAMP '2024-01-05 00:00:00'",
    "SELECT event_type AS x FROM events WHERE event_id % 2 = 0",
]


def gen_setop_query(seed: int) -> str:
    rng = random.Random(seed)
    a, b = rng.sample(SETOP_SIDES, 2)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return (
        f"SELECT x, COUNT(*) AS n FROM ({a} {op} {b}) s GROUP BY x"
    )


@pytest.mark.parametrize("seed", range(400, 412))
def test_same_outer_join_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    _assert_same(gen_outer_join_query(seed), spark, duck)


@pytest.mark.parametrize("seed", range(500, 512))
def test_same_setop_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    _assert_same(gen_setop_query(seed), spark, duck)


# --- family 6: date/time expressions -----------------------------------------
# the portable temporal dialect: EXTRACT fields, date_trunc grains,
# interval arithmetic (dow/epoch/strftime excluded — numbering and
# formatting are engine-specific)

TIME_DIMS = [
    "EXTRACT(HOUR FROM ts)",
    "EXTRACT(DAY FROM ts)",
    "EXTRACT(MONTH FROM ts)",
    "CAST(date_trunc('week', ts) AS DATE)",
    "CAST(ts AS DATE)",
]
TIME_AGGS = [
    "COUNT(*)",
    "MIN(ts)",
    "MAX(ts)",
    "COUNT(DISTINCT CAST(ts AS DATE))",
    "COUNT(DISTINCT EXTRACT(HOUR FROM ts))",
]
TIME_PREDS = [
    "ts + INTERVAL 2 HOUR < TIMESTAMP '2024-01-20 00:00:00'",
    "ts - INTERVAL 1 DAY >= TIMESTAMP '2024-01-03 00:00:00'",
    "EXTRACT(HOUR FROM ts) BETWEEN 9 AND 17",
    "CAST(ts AS DATE) = DATE '2024-01-10'",
    "EXTRACT(MINUTE FROM ts) < 30",
]


def gen_time_query(seed: int) -> str:
    rng = random.Random(seed)
    dims = rng.sample(TIME_DIMS, rng.randint(1, 2))
    aggs = rng.sample(TIME_AGGS, rng.randint(1, 3))
    sel = [f"{d} AS d{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = f"SELECT {', '.join(sel)} FROM events"
    preds = rng.sample(TIME_PREDS, rng.randint(0, 2))
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    sql += " GROUP BY " + ", ".join(dims)
    return sql


@pytest.mark.parametrize("seed", range(600, 616))
def test_same_time_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    _assert_same(gen_time_query(seed), spark, duck)


# --- family 7: correlated EXISTS / IN subqueries ------------------------------

SUBQ_SHAPES = [
    # correlated EXISTS: users who ever did <type>
    "SELECT event_type AS d0, COUNT(*) AS a0 FROM events e WHERE {neg}EXISTS "
    "(SELECT 1 FROM events x WHERE x.user_id = e.user_id "
    "AND x.event_type = '{t}') GROUP BY event_type",
    # uncorrelated IN over a filtered key set
    "SELECT event_type AS d0, COUNT(DISTINCT user_id) AS a0 FROM events "
    "WHERE user_id {neg}IN (SELECT user_id FROM events WHERE "
    "event_type = '{t}' AND value > 200) GROUP BY event_type",
    # correlated scalar subquery compare: events above their user's average
    "SELECT event_type AS d0, COUNT(*) AS a0 FROM events e WHERE value > "
    "(SELECT AVG(value) FROM events x WHERE x.user_id = e.user_id) "
    "GROUP BY event_type",
]


def gen_subquery_query(seed: int) -> str:
    rng = random.Random(seed)
    shape = rng.choice(SUBQ_SHAPES)
    t = rng.choice(["click", "purchase", "error", "signup"])
    neg = rng.choice(["", "NOT "])
    if "{neg}" not in shape:
        return shape.format(t=t)
    return shape.format(t=t, neg=neg)


@pytest.mark.parametrize("seed", range(700, 716))
def test_same_subquery_sql_same_answer(fuzz_env, seed):
    spark, duck = fuzz_env
    _assert_same(gen_subquery_query(seed), spark, duck)


# --- family 8: DML statement sequences (snapshot engine vs DuckDB) -----------
# The same randomly generated INSERT/UPDATE/DELETE/MERGE sequence runs
# against a SnapshotTable through the SQL front-end AND against a real
# DuckDB table seeded from the same fixture rows; the final table
# contents must match. DuckDB v1.0 has no MERGE INTO, so each generated
# MERGE is mirrored as the standard DELETE USING / UPDATE FROM / INSERT
# NOT-IN-original-keys triple evaluated against the pre-merge key set
# (exactly MERGE's matched/not-matched semantics for unique keys).

_DML_UPDATE_EXPRS = ["v + 1.5", "v * 2", "0.0 - v", "v + k"]
_DML_CONDS = [
    "k % 5 = 2",
    "v > 1000",
    "s = 'BUILDING'",
    "k % 7 = 3 AND v < 5000",
]
_MERGE_MATCH_CONDS = ["src.v < 0", "src.v > 5000", "t.v > src.v"]
_MERGE_SET_EXPRS = ["t.v + src.v", "src.v", "t.v - 1.0"]


def _gen_dml_statements(seed: int) -> list[tuple[str, str | list[str]]]:
    """[(spark_stmt, duck_stmt_or_stmts), ...] — identical text for
    UPDATE/DELETE/INSERT; MERGE carries its DuckDB mirror script."""
    rng = random.Random(seed)
    out = []
    n_inserts = 0
    kinds = [
        rng.choice(["update", "delete", "insert", "merge", "overwrite"])
        for _ in range(2)
    ]
    kinds.append("merge")  # every seed exercises the general MERGE path
    rng.shuffle(kinds)
    for kind in kinds:
        if kind == "update":
            stmt = (
                f"UPDATE dml_t SET v = {rng.choice(_DML_UPDATE_EXPRS)}"
                f" WHERE {rng.choice(_DML_CONDS)}"
            )
            out.append((stmt, stmt))
        elif kind == "delete":
            stmt = f"DELETE FROM dml_t WHERE {rng.choice(_DML_CONDS)}"
            out.append((stmt, stmt))
        elif kind == "overwrite":
            # full overwrite on the unpartitioned table (r08 statement);
            # DuckDB mirror: clear + insert the same body
            body = (
                "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s "
                f"FROM customer WHERE c_custkey % 5 = {rng.randint(0, 4)}"
            )
            out.append((
                f"INSERT OVERWRITE dml_t {body}",
                ["DELETE FROM dml_t", f"INSERT INTO dml_t {body}"],
            ))
        elif kind == "insert":
            off = 1_000_000 + n_inserts * 100_000
            n_inserts += 1
            stmt = (
                f"INSERT INTO dml_t SELECT c_custkey + {off} AS k, "
                "c_acctbal AS v, c_mktsegment AS s FROM customer "
                f"WHERE c_custkey % 11 = {rng.randint(0, 10)}"
            )
            out.append((stmt, stmt))
        else:
            r = rng.randint(0, 6)
            mc = rng.choice(_MERGE_MATCH_CONDS)
            mex = rng.choice(_MERGE_SET_EXPRS)
            src_sql = (
                "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s "
                f"FROM customer WHERE c_custkey % 7 = {r}"
            )
            spark_stmt = (
                f"MERGE INTO dml_t AS t USING ({src_sql}) AS src "
                "ON t.k = src.k "
                f"WHEN MATCHED AND {mc} THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET v = {mex} "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            mc_d = mc.replace("src.", "_src.").replace("t.", "dml_t.")
            mex_d = mex.replace("src.", "_src.").replace("t.", "dml_t.")
            duck_script = [
                f"CREATE OR REPLACE TEMP VIEW _src AS {src_sql}",
                "CREATE OR REPLACE TEMP TABLE _orig AS SELECT k FROM dml_t",
                "DELETE FROM dml_t USING _src "
                f"WHERE dml_t.k = _src.k AND coalesce({mc_d}, false)",
                f"UPDATE dml_t SET v = {mex_d} FROM _src "
                f"WHERE dml_t.k = _src.k AND NOT coalesce({mc_d}, false)",
                "INSERT INTO dml_t SELECT _src.k, _src.v, _src.s FROM _src "
                "WHERE _src.k NOT IN (SELECT k FROM _orig)",
            ]
            out.append((spark_stmt, duck_script))
    return out


@pytest.mark.parametrize("seed", range(800, 812))
def test_same_dml_same_final_state(fuzz_env, sf_dir, tmp_path, seed):
    import duckdb

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env
    init_sql = (
        "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s "
        "FROM customer WHERE c_custkey % 3 = 0"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "dml_t"))
    tbl.commit(spark.sql(init_sql), stats_cols=["k"])
    # merge-on-read twin: identical statements, every op lands as a
    # delta (write.<op>.mode properties via the ALTER statement) — the
    # stacked-delta read path must agree with copy-on-write exactly
    mor = SnapshotTable(spark, str(tmp_path / "dml_t_mor"))
    mor.commit(spark.sql(init_sql), stats_cols=["k"])
    sql_frontend.sql(
        spark,
        "ALTER TABLE dml_t SET TBLPROPERTIES "
        "('write.delete.mode' = 'merge-on-read', "
        "'write.update.mode' = 'merge-on-read', "
        "'write.merge.mode' = 'merge-on-read')",
        snapshot_tables={"dml_t": mor},
    ).collect()
    own_duck = duckdb.connect()
    own_duck.sql(
        "CREATE VIEW customer AS "
        f"SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    own_duck.sql(f"CREATE TABLE dml_t AS {init_sql}")
    for spark_stmt, duck_side in _gen_dml_statements(seed):
        sql_frontend.sql(
            spark, spark_stmt,
            snapshot_tables={"dml_t": tbl}, dml_keys={"dml_t": ["k"]},
        ).collect()
        sql_frontend.sql(
            spark, spark_stmt,
            snapshot_tables={"dml_t": mor}, dml_keys={"dml_t": ["k"]},
        ).collect()
        for d in [duck_side] if isinstance(duck_side, str) else duck_side:
            own_duck.sql(d)
    assert all(
        m2.get("deltas")
        or m2["operation"] in ("append", "set-properties", "overwrite")
        for m2 in [mor._resolve()]
    ), "MoR twin rewrote base files"
    s_rows = {r.k: (r.v, r.s) for r in tbl.read().collect()}
    mor_rows = {r.k: (r.v, r.s) for r in mor.read().collect()}
    assert s_rows == mor_rows, f"seed={seed}: MoR twin diverged from CoW"
    d_rows = {k: (v, s) for k, v, s in own_duck.sql(
        "SELECT k, v, s FROM dml_t"
    ).fetchall()}
    assert sorted(s_rows) == sorted(d_rows), f"seed={seed} key sets differ"
    for k in s_rows:
        sv, ss = s_rows[k]
        dv, ds = d_rows[k]
        assert ss == ds, f"seed={seed} k={k}: {ss!r} != {ds!r}"
        assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9), (
            f"seed={seed} k={k}: {sv} != {dv}"
        )


# --- family 9: ALTER COLUMN + DML sequences (r08) ------------------------------
# Identical ALTER TABLE ADD/RENAME/DROP COLUMN + DML statement text runs
# against the snapshot engine (metadata-only schema-op journal) and a
# real DuckDB table (physical ALTER); final contents must match — the
# differential proof that read-time op application equals a rewrite.

_ALTER_UPD_EXPRS = ["v * 2", "v + k", "0.0 - v"]
_ALTER_CONDS = ["k % 3 = 0", "v > 2000", "k % 5 = 1"]


def _gen_alter_statements(seed: int) -> list[str]:
    rng = random.Random(seed)
    stmts = ["ALTER TABLE alter_t ADD COLUMN w DOUBLE"]
    off = 2_000_000
    stmts.append(
        f"INSERT INTO alter_t SELECT c_custkey + {off} AS k, "
        "c_acctbal AS v, c_mktsegment AS s, "
        "CAST(c_nationkey AS INT) AS n, c_acctbal * 0.5 AS w "
        f"FROM customer WHERE c_custkey % 9 = {rng.randint(0, 8)}"
    )
    stmts.append(
        f"UPDATE alter_t SET w = {rng.choice(_ALTER_UPD_EXPRS)} "
        f"WHERE {rng.choice(_ALTER_CONDS)}"
    )
    stmts.append("ALTER TABLE alter_t RENAME COLUMN w TO weight")
    # r09: type widening mid-sequence — post-widen inserts carry values
    # only the widened type holds, and later DML reads mixed widths
    spelling = rng.choice(
        ["ALTER COLUMN n TYPE BIGINT", "ALTER COLUMN n SET DATA TYPE BIGINT"]
    )
    stmts.append(f"ALTER TABLE alter_t {spelling}")
    stmts.append(
        f"INSERT INTO alter_t SELECT c_custkey + {2 * off} AS k, "
        "c_acctbal AS v, c_mktsegment AS s, "
        "c_nationkey + 3000000000 AS n, c_acctbal AS weight "
        f"FROM customer WHERE c_custkey % 11 = {rng.randint(0, 10)}"
    )
    stmts.append(
        f"DELETE FROM alter_t WHERE {rng.choice(_ALTER_CONDS)}"
    )
    # r10: rename→widen→(re-)add sequence — after the rename and the
    # widen above, a FRESH column arrives and DML touches it, so later
    # reads mix files that never saw it, journal-NULL rows, and updated
    # rows (the engine may not reuse the renamed-away name `w` while old
    # files still carry it — _reserved_names — so the re-add uses a new
    # name; both engines accept it, keeping the differential valid)
    stmts.append("ALTER TABLE alter_t ADD COLUMN w2 DOUBLE")
    stmts.append(
        f"UPDATE alter_t SET w2 = {rng.choice(_ALTER_UPD_EXPRS)} "
        f"WHERE {rng.choice(_ALTER_CONDS)}"
    )
    if rng.random() < 0.5:
        stmts.append("ALTER TABLE alter_t RENAME COLUMN w2 TO w3")
    if rng.random() < 0.5:
        stmts.append("ALTER TABLE alter_t DROP COLUMN s")
    return stmts


def test_alter_refusal_paths_widen_after_delta_and_readd(fuzz_env, tmp_path):
    """The journal's guard rails around the family-9 surface (engine-only
    — DuckDB's physical ALTER has no such states): ALTER COLUMN while a
    MoR delta is pending refuses (delta key/upsert files were written
    under the old schema, snapshots.py _alter_guard), and re-adding a
    renamed-away name refuses while old files still carry it physically
    (_reserved_names). Both unblock exactly as the messages say."""
    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env
    tbl = SnapshotTable(spark, str(tmp_path / "guard_t"))
    tbl.commit(
        spark.createDataFrame(
            [(1, 10.0, 7), (2, 20.0, 8)], "k long, v double, n int"
        )
    )
    tbl.merge(  # pending equality delta
        spark.createDataFrame([(1, True)], "k long, _del boolean"),
        key_cols=["k"],
        delete_col="_del",
        mode="mor",
    )
    with pytest.raises(ValueError, match="pending merge-on-read deltas"):
        tbl.alter_widen_column("n", "bigint")
    with pytest.raises(ValueError, match="pending merge-on-read deltas"):
        tbl.alter_rename_column("v", "val")
    assert tbl.compact_deltas() is not None
    tbl.alter_widen_column("n", "bigint")  # unblocked
    tbl.alter_rename_column("v", "val")
    # the renamed-away name may not come back while old files carry it
    with pytest.raises(ValueError, match="renamed away or dropped"):
        tbl.alter_add_columns([("v", "double")])
    assert tbl.materialize_schema() is not None  # journal reset frees it
    tbl.alter_add_columns([("v", "double")])
    assert sorted(tbl.read().columns) == ["k", "n", "v", "val"]
    assert tbl.read().schema["n"].dataType.simpleString() == "bigint"


@pytest.mark.parametrize("seed", range(900, 910))
def test_same_alter_dml_same_final_state(fuzz_env, sf_dir, tmp_path, seed):
    import duckdb

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env
    init_sql = (
        "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s, "
        "CAST(c_nationkey AS INT) AS n "
        "FROM customer WHERE c_custkey % 4 = 0"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "alter_t"))
    tbl.commit(spark.sql(init_sql), stats_cols=["k"])
    own_duck = duckdb.connect()
    own_duck.sql(
        "CREATE VIEW customer AS "
        f"SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    own_duck.sql(f"CREATE TABLE alter_t AS {init_sql}")
    stmts = _gen_alter_statements(seed)
    for stmt in stmts:
        sql_frontend.sql(
            spark, stmt,
            snapshot_tables={"alter_t": tbl}, dml_keys={"alter_t": ["k"]},
        ).collect()
        own_duck.sql(stmt)
    cols = sorted(tbl.read().columns)
    d_cols = sorted(
        r[0] for r in own_duck.sql(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = 'alter_t'"
        ).fetchall()
    )
    assert cols == d_cols, f"seed={seed}: schemas differ {cols} vs {d_cols}"
    sel = ", ".join(cols)
    s_rows = {r["k"]: tuple(r[c] for c in cols) for r in
              (row.asDict() for row in tbl.read().select(*cols).collect())}
    d_rows = {row[cols.index("k")]: tuple(row) for row in
              own_duck.sql(f"SELECT {sel} FROM alter_t").fetchall()}
    assert sorted(s_rows) == sorted(d_rows), f"seed={seed}: key sets differ"
    for k in s_rows:
        for a, b in zip(s_rows[k], d_rows[k]):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"seed={seed} k={k}: {a} != {b}"
                )
            else:
                assert a == b, f"seed={seed} k={k}: {a!r} != {b!r}"


# --- family 10: MoR lifecycle sequences (r10) ---------------------------------
# Random sequences of merge-on-read upsert / equality delete / positional
# delete / append / compact_deltas / rewrite_late_appends run against the
# snapshot engine; a DuckDB table mirrors each op's LOGICAL effect
# (compaction and the late-append rewrite are physical no-ops). The final
# contents must match three ways: engine read == DuckDB, and the
# published Avro chain + name mapping read back externally must equal
# both. Fresh appends use key ranges disjoint from every pending delta's
# keys; an `append_overlap` op deliberately re-appends PENDING-DELETED
# keys — the engine's pending delta suppresses them (appends cannot
# resurrect), mirrored in DuckDB by filtering the insert against the
# tracked pending-key set, and the final publish exercises the
# refusal → rewrite_late_appends() → publish path on that state.


def _gen_mor_lifecycle(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    ops: list[tuple] = []
    has_pending_upserts = False
    has_pending_deletes = False
    n_appends = 0
    for _ in range(rng.randint(4, 8)):
        kinds = ["mor_delete", "mor_upsert", "append", "compact",
                 "rewrite_late", "rewrite_manifests"]
        if not has_pending_upserts:
            kinds.append("pos_delete")
        if has_pending_deletes:
            kinds.append("append_overlap")
        kind = rng.choice(kinds)
        if kind == "mor_delete":
            has_pending_deletes = True
        elif kind == "append_overlap":
            ops.append(("append_overlap",))
            continue
        elif kind == "compact":
            has_pending_deletes = False
        if kind == "mor_delete":
            ops.append(("mor_delete", rng.choice([5, 7, 9]), rng.randint(0, 4)))
        elif kind == "mor_upsert":
            ops.append(("mor_upsert", rng.choice([4, 6, 8]),
                        rng.randint(0, 3), rng.choice([1.5, -2.0, 100.0])))
            has_pending_upserts = True
        elif kind == "pos_delete":
            ops.append(("pos_delete", rng.choice(
                ["v < 500", "k % 13 = 4", "v > 9000"]
            )))
        elif kind == "append":
            ops.append(("append", 2_000_000 + n_appends * 100_000,
                        rng.randint(0, 10)))
            n_appends += 1
        elif kind == "compact":
            ops.append(("compact",))
            has_pending_upserts = False
        elif kind == "rewrite_manifests":
            # metadata-only provenance fold (r16): logical no-op — the
            # engine must keep pending deltas' TRUE sequence numbers
            # through the fold, so interleaving it anywhere in the
            # lifecycle must not change the final state or the publish
            ops.append(("rewrite_manifests",))
        else:
            ops.append(("rewrite_late",))
    return ops


@pytest.mark.parametrize("seed", range(1000, 1015))
def test_same_mor_lifecycle_same_final_state(fuzz_env, sf_dir, tmp_path, seed):
    import os
    import sys
    import threading

    import duckdb
    from pyspark.sql import functions as F

    from philotes_spark.sources.snapshots import SnapshotTable

    sys.path.insert(0, os.path.dirname(__file__))
    from test_catalog_rest import MockCatalog, _readback_equal

    spark, _ = fuzz_env
    init_sql = (
        "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s "
        "FROM customer WHERE c_custkey % 2 = 0"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "mor_life"))
    tbl.commit(spark.sql(init_sql), stats_cols=["k"])
    own_duck = duckdb.connect()
    own_duck.sql(
        "CREATE VIEW customer AS "
        f"SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    own_duck.sql(f"CREATE TABLE mor_life AS {init_sql}")
    # the engine's pending-delta key set, mirrored: appends cannot
    # resurrect a key a pending equality delta deletes
    own_duck.sql("CREATE TEMP TABLE pend (k BIGINT)")
    pending_deleted: list[int] = []

    for op in _gen_mor_lifecycle(seed):
        if op[0] == "mor_delete":
            _, m, r = op
            pending_deleted.extend(
                row.k
                for row in tbl.read().filter(f"k % {m} = {r}")
                .select("k").collect()
            )
            changes = (
                tbl.read()
                .filter(f"k % {m} = {r}")
                .withColumn("_del", F.lit(True))
            )
            tbl.merge(changes, key_cols=["k"], delete_col="_del", mode="mor")
            own_duck.sql(
                f"INSERT INTO pend SELECT k FROM mor_life WHERE k % {m} = {r}"
            )
            own_duck.sql(f"DELETE FROM mor_life WHERE k % {m} = {r}")
        elif op[0] == "mor_upsert":
            _, m, r, dv = op
            changes = (
                tbl.read()
                .filter(f"k % {m} = {r}")
                .withColumn("v", F.col("v") + dv)
            )
            tbl.merge(changes, key_cols=["k"], mode="mor")
            own_duck.sql(
                f"INSERT INTO pend SELECT k FROM mor_life WHERE k % {m} = {r}"
            )
            own_duck.sql(
                f"UPDATE mor_life SET v = v + {dv} WHERE k % {m} = {r}"
            )
        elif op[0] == "pos_delete":
            _, cond = op
            tbl.delete_where_positional(cond)
            own_duck.sql(f"DELETE FROM mor_life WHERE {cond}")
        elif op[0] == "append":
            _, off, r = op
            body = (
                f"SELECT c_custkey + {off} AS k, c_acctbal AS v, "
                "c_mktsegment AS s FROM customer "
                f"WHERE c_custkey % 11 = {r}"
            )
            tbl.commit(spark.sql(body))
            own_duck.sql(
                f"INSERT INTO mor_life {body} "
                "AND c_custkey + "
                f"{off} NOT IN (SELECT k FROM pend)"
            )
        elif op[0] == "append_overlap":
            # deliberately re-append pending-DELETED keys: the engine's
            # pending delta suppresses them; the mirror filters on pend
            sample = sorted(set(pending_deleted))[:15]
            if not sample:
                continue
            rows = [(k, 0.0, "X") for k in sample]
            tbl.commit(
                spark.createDataFrame(rows, "k long, v double, s string")
            )
            vals = ", ".join(f"({k}, 0.0, 'X')" for k in sample)
            own_duck.sql(
                f"INSERT INTO mor_life SELECT * FROM (VALUES {vals}) "
                "t(k, v, s) WHERE k NOT IN (SELECT k FROM pend)"
            )
        elif op[0] == "compact":
            tbl.compact_deltas()
            own_duck.sql("DELETE FROM pend")
            pending_deleted.clear()
        elif op[0] == "rewrite_manifests":
            tbl.rewrite_manifests()  # metadata-only: no mirror effect
        else:  # rewrite_late — physical only
            tbl.rewrite_late_appends()

    s_rows = {r.k: (r.v, r.s) for r in tbl.read().collect()}
    d_rows = {k: (v, s) for k, v, s in own_duck.sql(
        "SELECT k, v, s FROM mor_life"
    ).fetchall()}
    own_duck.close()
    assert sorted(s_rows) == sorted(d_rows), f"seed={seed}: key sets differ"
    for k in s_rows:
        assert s_rows[k][1] == d_rows[k][1], f"seed={seed} k={k}"
        assert math.isclose(
            s_rows[k][0], d_rows[k][0], rel_tol=1e-9, abs_tol=1e-9
        ), f"seed={seed} k={k}: {s_rows[k][0]} != {d_rows[k][0]}"

    # third leg: the random final state publishes (whatever mix of
    # pending deltas/rewrites it carries) and reads back externally
    # equal. A state with overlapping late appends refuses first and
    # resolves via the targeted rewrite — the exact production flow.
    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from philotes_spark.sources.catalog_rest import RestCatalog

        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        try:
            cat.publish_snapshot("fz", f"t{seed}", tbl)
        except ValueError as e:
            assert "rewrite_late_appends" in str(e)
            assert tbl.rewrite_late_appends() is not None
            assert tbl.read().count() == len(s_rows)  # rewrite preserved rows
            cat.publish_snapshot("fz", f"t{seed}", tbl)
        cat.verify_publish("fz", f"t{seed}", tbl)
        assert _readback_equal(spark, tbl, "fz", f"t{seed}", cat) == len(s_rows)
    finally:
        srv.shutdown()
        srv.server_close()


# --- family 11: schema evolution × MoR lifecycle (r11) -------------------------
# Random interleavings of ALTER ADD/RENAME/DROP/WIDEN with MoR equality/
# positional deltas, appends (incl. deliberate pending-key overlap),
# compaction, targeted rewrite and INTERMEDIATE catalog publishes — the
# surfaces that interact through align_field_ids + name mapping + delete
# manifests (equality_ids key on field ids across evolution,
# catalog_rest.py:132-230). A DuckDB table mirrors each op's LOGICAL
# effect (physical ALTER; compaction/rewrite are physical no-ops). The
# final state must match four ways: engine read == DuckDB, and the
# published chain read back by read_table_via_manifests AND by the
# independent pandas planner must equal both. The engine refuses ALTER
# while deltas are pending (_alter_guard), so the generator tracks delta
# state and evolves only in delta-free windows — exactly the sequences a
# real user can produce. Intermediate publishes run with
# auto_rewrite=True, so the refusal → rewrite_late_appends() → publish
# path is exercised mid-sequence, not only at the end.


def _gen_evolution_mor(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    ops: list[tuple] = []
    has_deltas = False
    has_upserts = False
    has_pending_deletes = False
    widened = False
    n_added = 0
    n_appends = 0
    # renameable: current name of the two mutable payload columns
    vcol, scol = "v", "s"
    s_dropped = False
    for _ in range(rng.randint(6, 10)):
        # "expire" = STATEMENT-surface snapshot expiry (VACUUM), which on
        # a published table prunes the catalog in the same statement
        # (VERDICT r11 #2) — interleaved with the MoR/evolution lifecycle
        kinds = ["mor_delete", "mor_upsert", "append", "compact", "publish",
                 "publish_backfill", "expire"]
        if not has_deltas:
            kinds += ["alter_rename_v", "alter_add"]
            if not widened:
                kinds.append("alter_widen")
            if not s_dropped:
                kinds += ["alter_rename_s", "alter_drop_s"]
        if not has_upserts:
            kinds.append("pos_delete")
        if has_pending_deletes:
            kinds += ["append_overlap", "rewrite_late"]
        kind = rng.choice(kinds)
        if kind == "mor_delete":
            ops.append(("mor_delete", rng.choice([5, 7, 9]), rng.randint(0, 4)))
            has_deltas = has_pending_deletes = True
        elif kind == "mor_upsert":
            ops.append(("mor_upsert", rng.choice([4, 6, 8]),
                        rng.randint(0, 3), rng.choice([1.5, -2.0, 100.0])))
            has_deltas = has_upserts = True
        elif kind == "pos_delete":
            ops.append(("pos_delete", rng.choice(
                ["k % 13 = 4", "k % 17 = 2", "k < 400"]
            )))
            has_deltas = True  # a pos delta blocks ALTER too
        elif kind == "append":
            ops.append(("append", 2_000_000 + n_appends * 100_000,
                        3 + rng.randint(0, 7)))
            n_appends += 1
        elif kind == "append_overlap":
            ops.append(("append_overlap",))
        elif kind == "compact":
            ops.append(("compact",))
            has_deltas = has_upserts = has_pending_deletes = False
        elif kind == "rewrite_late":
            ops.append(("rewrite_late",))
        elif kind == "publish":
            ops.append(("publish",))
        elif kind == "publish_backfill":
            ops.append(("publish_backfill", rng.random()))
        elif kind == "expire":
            ops.append(("expire",))
        elif kind == "alter_rename_v":
            new = f"{vcol}x"
            ops.append(("alter_rename", vcol, new))
            vcol = new
        elif kind == "alter_rename_s":
            new = f"{scol}g"
            ops.append(("alter_rename", scol, new))
            scol = new
        elif kind == "alter_drop_s":
            ops.append(("alter_drop", scol))
            s_dropped = True
        elif kind == "alter_widen":
            ops.append(("alter_widen",))
            widened = True
        else:  # alter_add
            n_added += 1
            ops.append(("alter_add", f"w{n_added}"))
    ops.append(("publish",))  # every sequence ends published + read back
    return ops


def _evo_append_rows(schema, off: int, count: int):
    """Deterministic rows for the CURRENT schema — same literals feed
    the engine and the DuckDB mirror, so appends stay differential
    across any evolution state."""
    import datetime as _dt

    rows = []
    for i in range(count):
        row = []
        for f in schema.fields:
            t = f.dataType.simpleString()
            if f.name == "k":
                row.append(off + i)
            elif t == "bigint":
                row.append((off + i) * 3)
            elif t == "int":
                row.append((i % 7) + 1)
            elif t == "double":
                row.append(float(i) + 0.5)
            elif t == "date":
                row.append(_dt.date(2024, 1, 1) + _dt.timedelta(days=i % 40))
            else:
                row.append(f"s{i % 3}")
        rows.append(tuple(row))
    return rows


@pytest.mark.parametrize("seed", range(1100, 1115))
def test_same_evolution_mor_same_final_state(fuzz_env, sf_dir, tmp_path, seed):
    import os
    import sys
    import threading

    import duckdb
    from pyspark.sql import functions as F

    from philotes_spark.sources.snapshots import SnapshotTable

    sys.path.insert(0, os.path.dirname(__file__))
    from test_catalog_rest import MockCatalog, _readback_equal

    from philotes_spark.sources.catalog_rest import RestCatalog

    spark, _ = fuzz_env
    init_sql = (
        "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s, "
        "CAST(c_nationkey AS INT) AS n "
        "FROM customer WHERE c_custkey % 3 = 0"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "evo_mor"))
    tbl.commit(spark.sql(init_sql), stats_cols=["k"])
    own_duck = duckdb.connect()
    own_duck.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    own_duck.sql(f"CREATE TABLE evo_mor AS {init_sql}")
    own_duck.sql("CREATE TEMP TABLE pend (k BIGINT)")
    pending_deleted: list[int] = []
    vcol = "v"  # current name of the float payload column (rename target)

    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
    try:
        for op in _gen_evolution_mor(seed):
            if op[0] == "mor_delete":
                _, m, r = op
                pending_deleted.extend(
                    row.k for row in tbl.read().filter(f"k % {m} = {r}")
                    .select("k").collect()
                )
                changes = (
                    tbl.read().filter(f"k % {m} = {r}")
                    .withColumn("_del", F.lit(True))
                )
                tbl.merge(changes, key_cols=["k"], delete_col="_del",
                          mode="mor")
                own_duck.sql(
                    f"INSERT INTO pend SELECT k FROM evo_mor "
                    f"WHERE k % {m} = {r}"
                )
                own_duck.sql(f"DELETE FROM evo_mor WHERE k % {m} = {r}")
            elif op[0] == "mor_upsert":
                _, m, r, dv = op
                changes = (
                    tbl.read().filter(f"k % {m} = {r}")
                    .withColumn(vcol, F.col(vcol) + dv)
                )
                tbl.merge(changes, key_cols=["k"], mode="mor")
                own_duck.sql(
                    f"INSERT INTO pend SELECT k FROM evo_mor "
                    f"WHERE k % {m} = {r}"
                )
                own_duck.sql(
                    f"UPDATE evo_mor SET {vcol} = {vcol} + {dv} "
                    f"WHERE k % {m} = {r}"
                )
            elif op[0] == "pos_delete":
                _, cond = op
                tbl.delete_where_positional(cond)
                own_duck.sql(f"DELETE FROM evo_mor WHERE {cond}")
            elif op[0] == "append":
                _, off, count = op
                schema = tbl.read().schema
                rows = _evo_append_rows(schema, off, count)
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in schema.fields
                )
                tbl.commit(spark.createDataFrame(rows, ddl).coalesce(1))
                vals = ", ".join(
                    "(" + ", ".join(
                        f"'{v}'" if isinstance(v, str) else str(v)
                        for v in row
                    ) + ")"
                    for row in rows
                )
                names = ", ".join(f.name for f in schema.fields)
                own_duck.sql(
                    f"INSERT INTO evo_mor ({names}) "
                    f"SELECT * FROM (VALUES {vals}) "
                    f"t({names}) WHERE k NOT IN (SELECT k FROM pend)"
                )
            elif op[0] == "append_overlap":
                sample = sorted(set(pending_deleted))[:12]
                if not sample:
                    continue
                schema = tbl.read().schema
                rows = [
                    tuple(
                        k if f.name == "k"
                        else 0 if f.dataType.simpleString() in ("bigint", "int")
                        else 0.0 if f.dataType.simpleString() == "double"
                        else "X"
                        for f in schema.fields
                    )
                    for k in sample
                ]
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in schema.fields
                )
                tbl.commit(spark.createDataFrame(rows, ddl).coalesce(1))
                vals = ", ".join(
                    "(" + ", ".join(
                        f"'{v}'" if isinstance(v, str) else str(v)
                        for v in row
                    ) + ")"
                    for row in rows
                )
                names = ", ".join(f.name for f in schema.fields)
                own_duck.sql(
                    f"INSERT INTO evo_mor ({names}) "
                    f"SELECT * FROM (VALUES {vals}) "
                    f"t({names}) WHERE k NOT IN (SELECT k FROM pend)"
                )
            elif op[0] == "compact":
                tbl.compact_deltas()
                own_duck.sql("DELETE FROM pend")
                pending_deleted.clear()
            elif op[0] == "rewrite_late":
                tbl.rewrite_late_appends()
            elif op[0] == "publish":
                # one-call publish: the overlap states self-heal via the
                # in-band rewrite (VERDICT r10 #4), mid-sequence
                cat.publish_snapshot(
                    "fz", f"evo{seed}", tbl, auto_rewrite=True
                )
                cat.verify_publish("fz", f"evo{seed}", tbl)
            elif op[0] == "publish_backfill":
                # publish an OLDER version mid-sequence: exercises
                # align_field_ids(is_newest=False) history recovery and
                # the backfill-cannot-regress-served-state guarantees
                # under random evolution/MoR interleavings. An old
                # version whose own late appends diverge legally refuses
                # (auto_rewrite only applies to the head). Candidates
                # come from the versions retention still KEEPS — an
                # interleaved expire op deletes older manifests.
                cands = [int(m[1:9]) for m in tbl._manifests()][:-1]
                if not cands:
                    continue
                v = cands[min(int(op[1] * len(cands)), len(cands) - 1)]
                try:
                    cat.publish_snapshot("fz", f"evo{seed}", tbl, version=v)
                except ValueError as e:
                    assert "rewrite_late_appends" in str(e)
                    continue
                # non-regression: the head republishes and still verifies
                cat.publish_snapshot(
                    "fz", f"evo{seed}", tbl, auto_rewrite=True
                )
                cat.verify_publish("fz", f"evo{seed}", tbl)
            elif op[0] == "expire":
                # STATEMENT-surface expiry mid-lifecycle (VERDICT r11
                # #2): on a published table VACUUM prunes the served
                # history in the same statement; when the served current
                # snapshot would be doomed, the guarded path refuses
                # with local state untouched — publish-then-retry must
                # then succeed. Afterward every STILL-SERVED snapshot
                # must plan only existing files (no stranding, ever).
                from philotes_spark.sources.catalog_rest import CatalogError
                from philotes_spark.sources.iceberg_manifest import (
                    plan_entries,
                )
                from philotes_spark.sql_frontend import sql as _stmt_sql

                n_before = len(tbl._manifests())
                try:
                    _stmt_sql(
                        spark, "VACUUM t RETAIN 2 VERSIONS", {"t": tbl},
                        catalog=cat,
                    )
                except ValueError as e:
                    assert "publish a newer version first" in str(e), e
                    assert len(tbl._manifests()) == n_before  # untouched
                    cat.publish_snapshot(
                        "fz", f"evo{seed}", tbl, auto_rewrite=True
                    )
                    _stmt_sql(
                        spark, "VACUUM t RETAIN 2 VERSIONS", {"t": tbl},
                        catalog=cat,
                    )
                try:
                    meta = cat.load_table(
                        "fz", f"evo{seed}"
                    ).get("metadata", {})
                except CatalogError:
                    continue  # never published yet: local-only expiry
                for s in meta.get("snapshots", []):
                    data, _ = plan_entries(s["manifest-list"])
                    assert all(
                        os.path.exists(f["file_path"]) for f in data
                    ), (
                        f"seed={seed}: served snapshot "
                        f"{s['snapshot-id']} plans deleted files after "
                        "statement-surface expiry"
                    )
            elif op[0] == "alter_rename":
                _, old, new = op
                tbl.alter_rename_column(old, new)
                own_duck.sql(
                    f"ALTER TABLE evo_mor RENAME COLUMN {old} TO {new}"
                )
                if old == vcol:
                    vcol = new
            elif op[0] == "alter_drop":
                _, col = op
                tbl.alter_drop_column(col)
                own_duck.sql(f"ALTER TABLE evo_mor DROP COLUMN {col}")
            elif op[0] == "alter_widen":
                tbl.alter_widen_column("n", "bigint")
                own_duck.sql(
                    "ALTER TABLE evo_mor ALTER COLUMN n SET DATA TYPE BIGINT"
                )
            else:  # alter_add
                _, name = op
                tbl.alter_add_columns([(name, "double")])
                own_duck.sql(f"ALTER TABLE evo_mor ADD COLUMN {name} DOUBLE")

        cols = sorted(tbl.read().columns)
        d_cols = sorted(
            r[0] for r in own_duck.sql(
                "SELECT column_name FROM information_schema.columns "
                "WHERE table_name = 'evo_mor'"
            ).fetchall()
        )
        assert cols == d_cols, f"seed={seed}: columns {cols} != {d_cols}"
        s_rows = {r["k"]: tuple(r[c] for c in cols)
                  for r in (row.asDict() for row in tbl.read().collect())}
        sel = ", ".join(cols)
        d_rows = {row[cols.index("k")]: row for row in own_duck.sql(
            f"SELECT {sel} FROM evo_mor"
        ).fetchall()}
        assert sorted(s_rows) == sorted(d_rows), f"seed={seed}: key sets"
        for k in s_rows:
            for c, a, b in zip(cols, s_rows[k], d_rows[k]):
                if isinstance(a, float) and isinstance(b, float):
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                        f"seed={seed} k={k} {c}: {a} != {b}"
                    )
                else:
                    assert a == b, f"seed={seed} k={k} {c}: {a!r} != {b!r}"
        own_duck.close()
        # external legs: published chain + name mapping read back equal
        # through the engine's external reader AND the independent
        # pandas planner (inside _readback_equal)
        assert _readback_equal(
            spark, tbl, "fz", f"evo{seed}", cat
        ) == len(s_rows)
    finally:
        srv.shutdown()
        srv.server_close()


def test_family11_expire_op_coverage():
    """VERDICT r11 #2 'done' criterion: the statement-surface expire op
    is drawn in well over 5 of family 11's 15 seeds (pinned so a
    generator change can't silently drop the coverage)."""
    seeds_with_expire = [
        s for s in range(1100, 1115)
        if any(op[0] == "expire" for op in _gen_evolution_mor(s))
    ]
    assert len(seeds_with_expire) >= 5, seeds_with_expire


def test_family11_drop_backfill_publish_ordering(fuzz_env, tmp_path):
    """The VERDICT r10 #3 'drop → backfill-old-version → publish'
    ordering, deterministic: after a drop is published as the newest
    schema, backfilling an OLDER version that still carries the dropped
    column must recover the column's HISTORICAL field id (its manifest
    stats key on it), never evolve the served current schema, and leave
    the newest state externally readable."""
    import json as _json
    import os
    import sys
    import threading

    sys.path.insert(0, os.path.dirname(__file__))
    from test_catalog_rest import MockCatalog, _readback_equal
    from test_manifest_independent_decode import independent_read_ocf

    from philotes_spark.sources.catalog_rest import RestCatalog
    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env
    tbl = SnapshotTable(spark, str(tmp_path / "backfill_drop"))
    tbl.commit(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "k long, junk string, v double"
        ).coalesce(1),
        stats_cols=["k", "junk"],
    )
    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("fz", "bfd", tbl)  # v1: junk gets id 2
        tbl.commit(
            spark.createDataFrame(
                [(3, "c", 3.0)], "k long, junk string, v double"
            ).coalesce(1)
        )  # v2: same schema, never published yet
        tbl.alter_drop_column("junk")  # v3
        cat.publish_snapshot("fz", "bfd", tbl)  # newest: current = (k, v)
        meta = cat.load_table("fz", "bfd")["metadata"]
        cur_before = meta["current-schema-id"]
        # backfill the pre-drop v2 — served current schema must not move
        cat.publish_snapshot("fz", "bfd", tbl, version=2)
        meta = cat.load_table("fz", "bfd")["metadata"]
        assert meta["current-schema-id"] == cur_before
        cur = next(
            s for s in meta["schemas"]
            if s["schema-id"] == meta["current-schema-id"]
        )
        assert [f["name"] for f in cur["fields"]] == ["k", "v"]
        # the backfilled manifest keys junk's stats on its HISTORICAL id
        # (2), recovered through align_field_ids(is_newest=False) — read
        # the v2 snapshot's manifest through the cleanroom decoder
        snap2 = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == 2
        )
        _, _, ml = independent_read_ocf(snap2["manifest-list"])
        data_mf = next(m for m in ml if m["content"] == 0)
        _, _, entries = independent_read_ocf(data_mf["manifest_path"])
        v2_entry = next(
            e for e in entries
            if e["status"] != 2 and e["sequence_number"] in (None, 2)
            and e["data_file"]["content"] == 0
        )
        bounds = v2_entry["data_file"].get("lower_bounds") or []
        bound_ids = {e["key"] for e in bounds}
        assert 2 in bound_ids, (
            f"junk's historical id 2 missing from bounds keys {bounds}"
        )
        junk_bound = next(e["value"] for e in bounds if e["key"] == 2)
        assert junk_bound == b"c"  # the v2 rows' min junk value
        # newest state still reads back equal externally (4 legs)
        junk_ids = {
            f["id"] for s in meta["schemas"] for f in s["fields"]
            if f["name"] == "junk"
        }
        assert junk_ids == {2}
        assert _readback_equal(spark, tbl, "fz", "bfd", cat) == 3
        # the served name mapping never resurrects the dropped column
        mapping = _json.loads(
            meta["properties"]["schema.name-mapping.default"]
        )
        assert "junk" not in {n for e in mapping for n in e["names"]}
    finally:
        srv.shutdown()
        srv.server_close()


# ---------------------------------------------------------------------------
# Family 12 (r12): the expiry × refs × publish lifecycle through the
# STATEMENT surface. Random interleavings of appends/overwrites, head
# publishes, local tags, catalog refs (tags + retargets), VACUUM (the
# guarded expire-and-prune path) and CALL prune_expired_snapshots.
# Invariants, checked after EVERY expiry-class op and at the end:
#   (a) no stranding, ever: every catalog-served snapshot plans only
#       files that exist on disk;
#   (b) ref safety: a served ref (or the served current) pinning a
#       doomed version refuses the WHOLE statement with local state
#       untouched — never expire-then-fail;
#   (c) the engine's own read always equals the python-side expected
#       state, and the final published chain reads back equal through
#       the external Avro reader (+ independent planner).


def _gen_expiry_lifecycle(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    ops: list[tuple] = [("append", 0)]
    n_ref = 0
    for _ in range(rng.randint(8, 14)):
        kind = rng.choice(
            ["append", "overwrite", "publish", "tag_and_publish_ref",
             "retarget_refs", "vacuum", "call_prune", "vacuum"]
        )
        if kind in ("append", "overwrite"):
            ops.append((kind, rng.randint(1, 5)))
        elif kind == "tag_and_publish_ref":
            n_ref += 1
            ops.append(("tag_and_publish_ref", f"audit{n_ref}", rng.random()))
        elif kind == "vacuum":
            ops.append(("vacuum", rng.randint(1, 3)))
        else:
            ops.append((kind,))
    # deterministic branch-coverage tail: every seed must drive BOTH
    # refusal guards and the recovery path, whatever the random middle
    # produced — (1) a catalog-only ref on the oldest served snapshot +
    # commits past the served head force the ref guard, (2) retargeting
    # exposes the served-current guard, (3) republish + vacuum prunes,
    # (4) call_prune is then a no-op. The executor VERIFIES each
    # outcome against an independently computed expectation either way.
    ops += [
        ("publish",),
        ("ref_old_no_tag",),
        ("append", 6),
        ("append", 7),
        ("vacuum", 1),
        ("retarget_refs",),
        ("vacuum", 1),
        ("publish",),
        ("vacuum", 1),
        ("call_prune",),
    ]
    return ops


@pytest.mark.parametrize("seed", range(1200, 1210))
def test_same_expiry_lifecycle_same_final_state(fuzz_env, tmp_path, seed):
    import os
    import sys
    import threading

    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F401

    from philotes_spark.sources.iceberg_manifest import plan_entries
    from philotes_spark.sources.snapshots import SnapshotTable
    from philotes_spark.sql_frontend import sql as stmt_sql

    sys.path.insert(0, os.path.dirname(__file__))
    from test_catalog_rest import MockCatalog, _readback_equal

    from philotes_spark.sources.catalog_rest import (
        CatalogError,
        RestCatalog,
    )

    spark, _ = fuzz_env
    tbl = SnapshotTable(spark, str(tmp_path / "exp_life"))
    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
    tabs = {"t": tbl}
    expected: list[tuple] = []  # python mirror of the CURRENT version
    published = False
    refs: dict[str, int] = {}  # served catalog refs -> snapshot id

    def served_meta():
        return cat.load_table("fz", f"exp{seed}").get("metadata", {})

    def assert_no_stranding():
        if not published:
            return
        meta = served_meta()
        for s in meta.get("snapshots", []):
            data, _ = plan_entries(s["manifest-list"])
            missing = [
                f["file_path"] for f in data
                if not os.path.exists(f["file_path"])
            ]
            assert not missing, (
                f"seed={seed}: served snapshot {s['snapshot-id']} plans "
                f"deleted files {missing}"
            )

    try:
        for op in _gen_expiry_lifecycle(seed):
            if op[0] in ("append", "overwrite"):
                off = op[1] * 100 + tbl_version(tbl) * 10
                rows = [(off + i, float(off + i) / 2) for i in range(3)]
                tbl.commit(
                    spark.createDataFrame(rows, "k long, v double")
                    .coalesce(1),
                    operation="append" if op[0] == "append" else "overwrite",
                )
                if op[0] == "append":
                    expected.extend(rows)
                else:
                    expected = list(rows)
            elif op[0] == "publish":
                cat.publish_snapshot("fz", f"exp{seed}", tbl)
                cat.verify_publish("fz", f"exp{seed}", tbl)
                published = True
            elif op[0] == "tag_and_publish_ref":
                _, name, frac = op
                if not published:
                    continue
                served = sorted(
                    s["snapshot-id"]
                    for s in served_meta().get("snapshots", [])
                )
                v = served[min(int(frac * len(served)), len(served) - 1)]
                # ~half the refs are ALSO tagged locally (retention then
                # keeps the version on both sides); the other half exist
                # only catalog-side — the case where VACUUM's pre-check
                # must refuse BEFORE deleting anything
                if frac < 0.5 and v in {
                    int(m[1:9]) for m in tbl._manifests()
                }:
                    tbl.tag(f"{name}_{v}", version=v)
                cat.publish_ref("fz", f"exp{seed}", name, v, ref_type="tag")
                refs[name] = v
            elif op[0] == "ref_old_no_tag":
                if not published:
                    continue
                oldest = min(
                    s["snapshot-id"]
                    for s in served_meta().get("snapshots", [])
                )
                cat.publish_ref(
                    "fz", f"exp{seed}", "pin_oldest", oldest, ref_type="tag"
                )
                refs["pin_oldest"] = oldest
            elif op[0] == "retarget_refs":
                if not published or not refs:
                    continue
                head = max(
                    s["snapshot-id"]
                    for s in served_meta().get("snapshots", [])
                )
                for name in list(refs):
                    cat.publish_ref(
                        "fz", f"exp{seed}", name, head, ref_type="tag"
                    )
                    refs[name] = head
            elif op[0] == "vacuum":
                keep = op[1]
                n_before = len(tbl._manifests())
                # independently computed guard oracle: what SHOULD this
                # statement do, from the dry run + the served metadata?
                doomed = set(tbl.expiring_versions(keep_last=keep))
                expect_ref = expect_head = False
                if published and doomed:
                    meta = served_meta()
                    served_refs = meta.get("refs", {})
                    expect_ref = any(
                        name != "main" and r.get("snapshot-id") in doomed
                        for name, r in served_refs.items()
                    )
                    expect_head = (
                        meta.get("current-snapshot-id") in doomed
                        or served_refs.get("main", {}).get("snapshot-id")
                        in doomed
                    )
                try:
                    stmt_sql(
                        spark,
                        f"VACUUM t RETAIN {keep} VERSIONS",
                        tabs,
                        catalog=cat if published else None,
                    )
                    assert not (expect_ref or expect_head), (
                        f"seed={seed}: VACUUM succeeded but the guard "
                        f"oracle expected a refusal (ref={expect_ref}, "
                        f"head={expect_head}, doomed={sorted(doomed)})"
                    )
                except ValueError as e:
                    msg = str(e)
                    if "still points at it" in msg:
                        assert expect_ref, f"seed={seed}: {msg}"
                    elif "publish a newer version first" in msg:
                        assert expect_head and not expect_ref, (
                            f"seed={seed}: {msg}"
                        )
                    else:
                        raise
                    # refusal is all-or-nothing: local state untouched
                    assert len(tbl._manifests()) == n_before
                assert_no_stranding()
            elif op[0] == "call_prune":
                if not published:
                    continue
                try:
                    stmt_sql(
                        spark,
                        "CALL prune_expired_snapshots('t')",
                        tabs,
                        catalog=cat,
                    )
                except ValueError as e:
                    msg = str(e)
                    assert (
                        "still points at it" in msg
                        or "publish a newer version first" in msg
                    ), msg
                assert_no_stranding()

        # (c) engine read == python mirror, always
        got = sorted(
            (r.k, r.v) for r in tbl.read().select("k", "v").collect()
        )
        assert got == sorted(expected), f"seed={seed}"
        # final publish happened; external readback equals the engine
        assert_no_stranding()
        assert _readback_equal(
            spark, tbl, "fz", f"exp{seed}", cat
        ) == len(expected)
        # every surviving local tag still resolves (ref-aware expiry)
        for v in tbl._tagged_versions():
            tbl.read(version=v)
    finally:
        srv.shutdown()
        srv.server_close()


def tbl_version(tbl) -> int:
    try:
        return tbl.current_version()
    except FileNotFoundError:
        return 0


# --- family 13: partition-spec evolution × DML (r12) --------------------------
# The differential property IS layout independence: the DuckDB mirror has
# no notion of partition layout, so if the engine's read ever depends on
# which spec a file was written under (path-derived vs data columns,
# mixed-root unions, spec-keyed rewrites), the mirror diverges. Ops:
# appends under the current default spec, random evolve_partition_spec
# (metadata-only — the mirror no-ops), MoR delete/upsert (layout-blind by
# design), CoW merges (REFUSE on mixed specs when partitioned — the fuzzer
# asserts the guard, migrates via compact(), retries), and compaction
# (the spec-migration rewrite). Final state must be row-identical, and the
# $partition_specs accounting must cover every live file.


def _gen_spec_evolution(seed: int) -> list[tuple]:
    rng = random.Random(seed)
    ops: list[tuple] = []
    # r13: transform specs join the pool — bucket over a long source
    # (vectorized murmur3 path) and over a string source (scalar path),
    # the calendar transforms over the date column, and truncate, alone
    # and mixed with identity fields. Evolutions to/from them route
    # through the ALTER statement spellings when the shape allows, so
    # the transform grammar is fuzzed differentially too; the mirror
    # stays layout-blind either way.
    specs = [
        [], ["s"], ["n"], ["n", "s"],
        ["bucket(4,k)"], ["bucket(2,s)", "n"],
        ["days(d)"], ["months(d)", "s"], ["truncate(100,k)"],
    ]
    # r13: write-order evolution joins the pool — set/clear the write
    # order (metadata-only; the mirror is order-blind the same way it is
    # layout-blind) and the full clustered rewrite. The executor resolves
    # the two directional guards deterministically: an order drawn onto
    # an identity partition field drops that column; an evolve blocked by
    # a clustered column clears the order first (asserting the guard
    # fired) and retries.
    # r14: DESC / NULLS LAST spellings join the pool — direction is
    # invisible to the mirror (like layout), but the canonical
    # round-trip and the desc-clustered write paths get fuzzed; so do
    # TRANSFORM sort fields (days(d) — the derived-value clustered
    # write and its published transform order)
    orders = [[], ["k"], ["v"], ["k", "n"],
              ["v DESC"], ["k DESC NULLS FIRST", "n"],
              ["days(d)", "k"]]
    cur: list = []
    n_appends = 0
    for _ in range(rng.randint(6, 10)):
        kind = rng.choice(
            ["append", "append", "evolve", "evolve", "mor_delete",
             "mor_upsert", "cow_merge", "compact", "order", "recluster"]
        )
        if kind == "append":
            ops.append(("append", 3_000_000 + n_appends * 100_000,
                        3 + rng.randint(0, 6)))
            n_appends += 1
        elif kind == "evolve":
            target = rng.choice([s for s in specs if s != cur])
            ops.append(("evolve", list(target)))
            cur = target
        elif kind == "order":
            ops.append(("order", list(rng.choice(orders))))
        elif kind == "recluster":
            # r14: the partial-progress mode joins the pool — the
            # file-group-incremental rewrite must land the SAME final
            # state as the monolithic one through arbitrary op
            # interleavings (its pending-MoR-delta refusal is part of
            # the fuzzed surface: the executor applies the named
            # remedy, exactly as a real operator would)
            mode = rng.choice(["zorder", "sort", "partial", "partial"])
            # r14: the scoped (where-filtered) partial rewrite joins —
            # file-granular scope selection must stay row-invisible to
            # the mirror through arbitrary interleavings
            # r15: IN and OR-of-ranges scopes join the pool (union of
            # probe sets — VERDICT r14 what's-missing #4)
            where = (
                rng.choice(
                    [None, "k <= 500000",
                     "k BETWEEN 3000000 AND 3400000",
                     "k <= 500000 OR k BETWEEN 3000000 AND 3400000",
                     "(k BETWEEN 0 AND 250000) OR (k >= 3300000)",
                     "v IN (10.0, 20.0, 30.0) AND k <= 800000"]
                )
                if mode == "partial"
                else None
            )
            ops.append(("recluster", mode, where))
        elif kind == "mor_delete":
            ops.append(("mor_delete", rng.choice([5, 7, 9]),
                        rng.randint(0, 4)))
        elif kind == "mor_upsert":
            ops.append(("mor_upsert", rng.choice([4, 6, 8]),
                        rng.randint(0, 3), rng.choice([1.5, -2.0, 100.0])))
        elif kind == "cow_merge":
            ops.append(("cow_merge", rng.choice([11, 13]),
                        rng.randint(0, 5), rng.choice([0.25, 10.0])))
        else:
            ops.append(("compact",))
    return ops


def test_family13_op_coverage():
    """The r13 write-order ops are genuinely exercised: across the 20
    family-13 seeds, order evolutions and clustered rewrites are each
    drawn in well over 5 sequences, and every other op kind stays in
    the pool (pinned so a generator edit can't silently starve a
    family of its coverage)."""
    kinds: dict[str, int] = {}
    recluster_modes: dict[str, int] = {}
    for seed in range(1300, 1320):
        for op in _gen_spec_evolution(seed):
            kinds[op[0]] = kinds.get(op[0], 0) + 1
            if op[0] == "recluster":
                recluster_modes[op[1]] = recluster_modes.get(op[1], 0) + 1
    assert kinds.get("order", 0) >= 5, kinds
    assert kinds.get("recluster", 0) >= 5, kinds
    # r14: the partial-progress mode is genuinely drawn, not just pooled
    assert recluster_modes.get("partial", 0) >= 3, recluster_modes
    # ... and at least one draw carries a where scope, including the
    # r15 IN/OR union shapes
    scopes = [
        op[2]
        for seed in range(1300, 1320)
        for op in _gen_spec_evolution(seed)
        if op[0] == "recluster" and op[1] == "partial" and op[2]
    ]
    assert len(scopes) >= 1, "no scoped partial rewrite drawn"
    assert any(
        " OR " in s or " IN " in s for s in scopes
    ), f"no IN/OR scope drawn: {scopes}"
    for k in ("append", "evolve", "mor_delete", "mor_upsert",
              "cow_merge", "compact"):
        assert kinds.get(k, 0) >= 3, (k, kinds)


@pytest.mark.parametrize("seed", range(1300, 1320))
def test_same_spec_evolution_same_final_state(fuzz_env, sf_dir, tmp_path, seed):
    import duckdb
    from pyspark.sql import functions as F

    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env
    # the `d` date column (portable `DATE + int-days` in both dialects)
    # exists so CALENDAR transforms (days/months) join the spec pool —
    # the mirror stays layout-blind, `d` is just data to it
    init_sql = (
        "SELECT c_custkey AS k, c_acctbal AS v, c_mktsegment AS s, "
        "CAST(c_nationkey AS INT) AS n, "
        "DATE '2024-01-01' + CAST(c_custkey % 40 AS INT) AS d "
        "FROM customer WHERE c_custkey % 3 = 1"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "spec_evo"))
    tbl.commit(spark.sql(init_sql), stats_cols=["k"])
    own_duck = duckdb.connect()
    own_duck.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    own_duck.sql(f"CREATE TABLE evo_spec AS {init_sql}")

    def run_cow(m, r, dv):
        if not tbl.read().filter(f"k % {m} = {r}").take(1):
            return
        for _attempt in range(3):
            changes = (
                tbl.read().filter(f"k % {m} = {r}")
                .withColumn("v", F.col("v") + dv)
            )
            try:
                tbl.merge(changes, key_cols=["k"])
                break
            except ValueError as e:
                # both CoW guards are expected states here, each with its
                # named remedy: pending MoR deltas → compact_deltas();
                # mixed specs (partitioned default) → compact() migration
                if "pending MoR deltas" in str(e):
                    tbl.compact_deltas()
                elif "not under the current default" in str(e):
                    tbl.compact()
                else:
                    raise
        else:
            raise AssertionError(f"seed={seed}: CoW never unblocked")
        own_duck.sql(
            f"UPDATE evo_spec SET v = v + {dv} WHERE k % {m} = {r}"
        )

    for op in _gen_spec_evolution(seed):
        if op[0] == "append":
            _, off, count = op
            schema = tbl.read().schema
            rows = _evo_append_rows(schema, off, count)
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in schema.fields
            )
            tbl.commit(spark.createDataFrame(rows, ddl).coalesce(1))
            import datetime as _dt

            def lit(v):
                if isinstance(v, _dt.date):
                    return f"DATE '{v}'"
                return f"'{v}'" if isinstance(v, str) else str(v)

            vals = ", ".join(
                "(" + ", ".join(lit(v) for v in row) + ")" for row in rows
            )
            names = ", ".join(f.name for f in schema.fields)
            own_duck.sql(
                f"INSERT INTO evo_spec ({names}) VALUES {vals}"
            )
        elif op[0] == "evolve":
            # mirror: layout-invisible. Route through the STATEMENT
            # surface whenever the shape allows (single add / drop /
            # swap — the ALTER spellings), so the SQL path is fuzzed
            # differentially too; other shapes use the API directly.
            from philotes_spark.sql_frontend import sql as _stmt_sql

            cur_fields = tbl._load(
                f"v{tbl.current_version():08d}.json"
            ).get("partition_by") or []
            target = list(op[1])
            added = [c for c in target if c not in cur_fields]
            dropped = [c for c in cur_fields if c not in target]

            def _dispatch_evolve():
                if (
                    len(added) == 1
                    and not dropped
                    and target == cur_fields + added
                ):
                    _stmt_sql(
                        spark,
                        f"ALTER TABLE t ADD PARTITION FIELD {added[0]}",
                        {"t": tbl},
                    )
                elif len(dropped) == 1 and not added:
                    _stmt_sql(
                        spark,
                        f"ALTER TABLE t DROP PARTITION FIELD {dropped[0]}",
                        {"t": tbl},
                    )
                elif (
                    len(added) == 1
                    and len(dropped) == 1
                    and target
                    == [
                        added[0] if c == dropped[0] else c
                        for c in cur_fields
                    ]
                ):
                    _stmt_sql(
                        spark,
                        f"ALTER TABLE t REPLACE PARTITION FIELD "
                        f"{dropped[0]} WITH {added[0]}",
                        {"t": tbl},
                    )
                else:
                    tbl.evolve_partition_spec(target)

            try:
                _dispatch_evolve()
            except ValueError as e:
                # r13 guard interplay: an identity field landing on a
                # clustered column refuses with the named remedy — clear
                # the write order (WRITE UNORDERED) and retry
                if "sort/z-order clustering" not in str(e):
                    raise
                _stmt_sql(spark, "ALTER TABLE t WRITE UNORDERED", {"t": tbl})
                _dispatch_evolve()
            assert (
                tbl._load(f"v{tbl.current_version():08d}.json").get(
                    "partition_by"
                )
                or []
            ) == target
        elif op[0] == "order":
            # mirror: order-invisible, exactly like layout. An order
            # drawn onto a current identity partition field drops that
            # column (the engine refuses it; real users pick another) —
            # deterministic given the seed's op sequence.
            from philotes_spark.sql_frontend import sql as _stmt_sql

            from philotes_spark.sources.transforms import (
                format_sort_field,
                parse_sort_field,
            )

            identity = {
                c
                for c in (
                    tbl._load(
                        f"v{tbl.current_version():08d}.json"
                    ).get("partition_by")
                    or []
                )
                if "(" not in c
            }
            # the identity guard keys on the SOURCE column, so a
            # direction- or transform-spelled field must be filtered by
            # its source
            from philotes_spark.sources.transforms import parse_part_field

            cols = [
                c
                for c in op[1]
                if parse_part_field(parse_sort_field(c).name).source
                not in identity
            ]
            if cols:
                _stmt_sql(
                    spark,
                    f"ALTER TABLE t WRITE ORDERED BY ({', '.join(cols)})",
                    {"t": tbl},
                )
            else:
                _stmt_sql(spark, "ALTER TABLE t WRITE UNORDERED", {"t": tbl})
            assert (
                tbl._load(f"v{tbl.current_version():08d}.json").get(
                    "sort_by"
                )
                or []
            ) == [format_sort_field(parse_sort_field(c)) for c in cols]
        elif op[0] == "recluster":
            # clustered rewrite, three spellings (all row-invisible to
            # the mirror): OPTIMIZE ZORDER BY sets a z-order and
            # rewrites; the sort-strategy CALL reclusters by the current
            # order (passing sort_order when there is none — the bare
            # call now refuses, ADVICE r13 #1); partial_progress => true
            # is the r14 file-group-incremental mode, whose
            # pending-MoR-delta refusal is remedied in-sequence with
            # compact_deltas exactly as the error names
            from philotes_spark.sql_frontend import sql as _stmt_sql

            mcur = tbl._load(f"v{tbl.current_version():08d}.json")
            identity = {
                c
                for c in (mcur.get("partition_by") or [])
                if "(" not in c
            }
            zcols = [c for c in ("k", "v") if c not in identity]
            has_order = bool(mcur.get("sort_by") or mcur.get("zorder_by"))
            if op[1] == "zorder" and zcols:
                _stmt_sql(
                    spark,
                    f"OPTIMIZE t ZORDER BY ({', '.join(zcols)})",
                    {"t": tbl},
                )
            elif has_order or zcols:
                stmt = (
                    "CALL rewrite_data_files(table => 't', "
                    "strategy => 'sort'"
                )
                if not has_order:
                    # the guard fires without an order to rewrite by —
                    # asserted, then remedied by naming one
                    with pytest.raises(ValueError, match="no write order"):
                        _stmt_sql(spark, stmt + ")", {"t": tbl})
                    stmt += f", sort_order => '{', '.join(zcols)}'"
                if op[1] == "partial":
                    stmt += (
                        ", partial_progress => true, "
                        "max_file_group_size_bytes => 65536"
                    )
                    if op[2]:
                        stmt += f", where => '{op[2]}'"
                for _attempt in range(2):
                    try:
                        _stmt_sql(spark, stmt + ")", {"t": tbl})
                        break
                    except ValueError as e:
                        if "compact_deltas first" not in str(e):
                            raise
                        tbl.compact_deltas()
                else:
                    raise AssertionError(
                        f"seed={seed}: recluster never unblocked"
                    )
            # else: both dims are identity partition fields and no
            # standing order — nothing to cluster by, a user no-op
        elif op[0] == "mor_delete":
            _, m, r = op
            changes = (
                tbl.read().filter(f"k % {m} = {r}")
                .withColumn("_del", F.lit(True))
            )
            if changes.take(1):
                tbl.merge(changes, key_cols=["k"], delete_col="_del",
                          mode="mor")
            own_duck.sql(f"DELETE FROM evo_spec WHERE k % {m} = {r}")
        elif op[0] == "mor_upsert":
            _, m, r, dv = op
            changes = (
                tbl.read().filter(f"k % {m} = {r}")
                .withColumn("v", F.col("v") + dv)
            )
            if changes.take(1):
                tbl.merge(changes, key_cols=["k"], mode="mor")
            own_duck.sql(
                f"UPDATE evo_spec SET v = v + {dv} WHERE k % {m} = {r}"
            )
        elif op[0] == "cow_merge":
            run_cow(op[1], op[2], op[3])
        else:  # compact: migrates mixed specs, else folds deltas
            if tbl._mixed_specs(
                tbl._load(f"v{tbl.current_version():08d}.json")
            ):
                tbl.compact()
            else:
                tbl.compact_deltas()

    # engine read == layout-blind mirror, row for row
    cols = sorted(tbl.read().columns)
    s_rows = {r["k"]: tuple(r[c] for c in cols)
              for r in (row.asDict() for row in tbl.read().collect())}
    sel = ", ".join(cols)
    d_rows = {row[cols.index("k")]: row for row in own_duck.sql(
        f"SELECT {sel} FROM evo_spec"
    ).fetchall()}
    own_duck.close()
    assert sorted(s_rows) == sorted(d_rows), f"seed={seed}: key sets"
    for k in s_rows:
        for c, a, b in zip(cols, s_rows[k], d_rows[k]):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"seed={seed} k={k} {c}: {a} != {b}"
                )
            else:
                assert a == b, f"seed={seed} k={k} {c}: {a!r} != {b!r}"
    # $partition_specs accounting covers every live file exactly once
    m = tbl._load(f"v{tbl.current_version():08d}.json")
    spec_rows = tbl.partition_specs().collect()
    assert sum(r.live_file_count for r in spec_rows) == len(m["files"])
    assert sum(1 for r in spec_rows if r.is_default) == 1
    # external leg (r12 wire support): the mixed-spec end state publishes
    # (add-spec/set-default-spec ride the commit, one data manifest per
    # spec) and BOTH external readers reconstruct it row-identically
    import os
    import sys
    import threading

    sys.path.insert(0, os.path.dirname(__file__))
    from test_catalog_rest import MockCatalog, _readback_equal

    from philotes_spark.sources.catalog_rest import RestCatalog

    srv = MockCatalog()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("fz", f"spec{seed}", tbl)
        assert _readback_equal(
            spark, tbl, "fz", f"spec{seed}", cat
        ) == len(s_rows)
    finally:
        srv.shutdown()
        srv.server_close()


# --------------------------------------------------------------------------
# family 14 (r15): the branch / write-audit-publish lifecycle — appends land
# on main directly or stage on an audit branch; a publish takes the
# fast-forward path when main held still and MUST take refusal-then-
# cherrypick when main advanced past the fork; abandoned branches vanish
# without a trace. The mirror is visibility-ordered: a row exists exactly
# when it is readable ON MAIN, so any lost-main-commit (the pre-r15
# wholesale fast_forward), dropped stage, or double-application diverges.
# --------------------------------------------------------------------------


def _gen_branch_lifecycle(seed: int) -> list[tuple]:
    import random

    rng = random.Random(seed)
    ops: list[tuple] = [("append", 0, 40)]
    nxt = 1000
    staged = False
    for _ in range(rng.randint(6, 12)):
        kind = rng.choice(
            ["append", "fork", "stage", "publish", "abandon"]
        )
        if kind == "append":
            ops.append(("append", nxt, rng.randint(5, 30)))
            nxt += 1000
        elif kind == "fork" and not staged:
            ops.append(("fork",))
            staged = True
        elif kind == "stage" and staged:
            ops.append(("stage", nxt, rng.randint(5, 30)))
            nxt += 1000
        elif kind == "publish" and staged:
            ops.append(("publish",))
            staged = False
        elif kind == "abandon" and staged:
            ops.append(("abandon",))
            staged = False
    if staged:
        ops.append(("publish",))  # always exercise the publish path
    return ops


def test_family14_op_coverage():
    """Both publish paths are genuinely drawn across the seeds: some
    publishes happen with main un-advanced since the fork (fast-forward)
    and some with main advanced (refusal → cherrypick)."""
    ff = cp = 0
    for seed in range(1400, 1420):
        advanced = False
        forked = False
        for op in _gen_branch_lifecycle(seed):
            if op[0] == "fork":
                forked, advanced = True, False
            elif op[0] == "append" and forked:
                advanced = True
            elif op[0] == "publish":
                if advanced:
                    cp += 1
                else:
                    ff += 1
                forked = False
            elif op[0] == "abandon":
                forked = False
    assert ff >= 3 and cp >= 3, (ff, cp)


@pytest.mark.parametrize("seed", range(1400, 1412))
def test_same_branch_lifecycle_same_final_state(fuzz_env, tmp_path, seed):
    from philotes_spark.sources.snapshots import SnapshotTable

    spark, _ = fuzz_env

    tbl = SnapshotTable(spark, str(tmp_path / "wap"))
    mirror: dict[int, int] = {}  # k -> v (visibility-ordered on MAIN)

    def rows_for(off, n):
        return [(off + i, (off + i) * 2) for i in range(n)]

    def commit_rows(target, rows):
        target.commit(
            spark.createDataFrame(rows, "k long, v long").repartition(2)
        )

    branch = None
    pending: list[tuple[int, int]] = []
    n_forks = 0
    fork_version = None
    for op in _gen_branch_lifecycle(seed):
        if op[0] == "append":
            rows = rows_for(op[1], op[2])
            commit_rows(tbl, rows)
            mirror.update(dict(rows))
        elif op[0] == "fork":
            n_forks += 1
            branch = tbl.create_branch(f"wip{n_forks}")
            fork_version = tbl.current_version()
            pending = []
        elif op[0] == "stage":
            rows = rows_for(op[1], op[2])
            commit_rows(branch, rows)
            pending += rows
            # staging is INVISIBLE on main until the publish
            got = {r.k: r.v for r in tbl.read().collect()}
            assert got == mirror, f"seed={seed}: staged rows leaked to main"
        elif op[0] == "publish":
            name = f"wip{n_forks}"
            if tbl.current_version() != fork_version:
                # main advanced: wholesale adoption must refuse, the
                # named remedy must land BOTH sides
                with pytest.raises(ValueError, match="cherrypick"):
                    tbl.fast_forward(name)
                tbl.cherrypick(name)
            else:
                tbl.fast_forward(name)
            mirror.update(dict(pending))
            branch, pending = None, []
            got = {r.k: r.v for r in tbl.read().collect()}
            assert got == mirror, f"seed={seed}: publish diverged"
        elif op[0] == "abandon":
            branch, pending = None, []

    got = {r.k: r.v for r in tbl.read().collect()}
    assert got == mirror, f"seed={seed}: final state diverged"
    # every version in the chain remains a valid readable table
    for v in range(1, tbl.current_version() + 1):
        assert tbl.read(version=v).count() >= 0
