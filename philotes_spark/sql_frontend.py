"""SQL statement front-end with time-travel rewriting (B5 as *SQL text*).

The reference documents its time-travel surface as Trino SQL statements
(`docs/query/sample-queries.sql:47-52`: ``SELECT ... FROM t FOR VERSION
AS OF 123`` / ``FOR TIMESTAMP AS OF TIMESTAMP '...'``) — the engine must
accept the statement string, not just a programmatic ``read(version=)``.
Spark SQL only parses ``VERSION AS OF`` for v2 catalog tables, so for
the path-based snapshot tables this front-end rewrites the clause: each
``<table> [FOR] VERSION|TIMESTAMP AS OF <v>`` reference is resolved
through :class:`SnapshotTable` into a temp view pinned to that snapshot,
the statement is rewritten to name the view, and the rest of the SQL —
joins, aggregates, anything — runs unchanged through ``spark.sql``.
Plain statements pass through untouched, so this is a superset of the
bare SQL surface. (On a cluster with Iceberg/Delta on the classpath the
rewrite becomes unnecessary — Spark parses the clause natively; this
keeps the *statement* contract identical either way.)
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession

from philotes_spark.sources.snapshots import SnapshotTable

# <table> [FOR] VERSION AS OF <int>  |  [FOR] TIMESTAMP AS OF '<ts>'
# (both the Trino/Iceberg `FOR ...` spelling in sample-queries.sql and
# the Spark/Delta spelling without FOR)
_TT_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_.]*)\s+(?:FOR\s+)?"
    r"(VERSION|SYSTEM_VERSION|TIMESTAMP|SYSTEM_TIME)\s+AS\s+OF\s+"
    r"(?:TIMESTAMP\s+)?('[^']*'|\d+)",
    re.IGNORECASE,
)


def _as_of_ms(literal: str) -> int:
    ts = dt.datetime.fromisoformat(literal.strip("'"))
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=dt.timezone.utc)
    return int(ts.timestamp() * 1000)


_DML_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][\w.]*)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_UPDATE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][\w.]*)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][\w.]*)\s*"
    r"(?:\(\s*([\w\s,]+?)\s*\))?\s*"
    r"((?:SELECT|VALUES)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
# the canonical upsert MERGE (Trino/Spark-SQL shape), constrained to the
# full-row clauses the snapshot merge implements natively:
#   MERGE INTO t USING src [AS alias] ON t.k = src.k [AND t.k2 = src.k2]
#   [WHEN MATCHED AND <del-col> THEN DELETE]
#   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
_DML_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+([A-Za-z_][\w.]*)\s+USING\s+([A-Za-z_][\w.]*)"
    r"(?:\s+AS\s+(\w+))?\s+ON\s+(.+?)\s*"
    r"(?:WHEN\s+MATCHED\s+AND\s+(\w+)\s+THEN\s+DELETE\s+)?"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _merge_on_keys(on: str, target: str, src_names: set[str]) -> list[str]:
    """Extract key columns from an equi-conjunction ``t.k = s.k [AND …]``;
    anything else is unsupported (merge keys must be equality pairs)."""
    keys = []
    for part in re.split(r"\bAND\b", on, flags=re.IGNORECASE):
        m = re.fullmatch(
            r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*", part
        )
        if not m:
            raise ValueError(f"unsupported MERGE ON term: {part.strip()!r}")
        names = {m.group(1), m.group(3)}
        if target not in names or not (names - {target}) <= src_names:
            raise ValueError(f"MERGE ON must join target to source: {part.strip()!r}")
        if m.group(2) != m.group(4):
            raise ValueError(
                f"MERGE ON must pair identical column names: {part.strip()!r}"
            )
        keys.append(m.group(2))
    return keys


def _split_set_list(s: str) -> dict[str, str]:
    """``a = expr1, b = expr2`` → {a: expr1, b: expr2}; commas inside
    parentheses or quotes do not split."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    out = {}
    for p in parts:
        col, _, expr = p.partition("=")
        if not _ or not col.strip() or not expr.strip():
            raise ValueError(f"bad SET clause item: {p.strip()!r}")
        out[col.strip()] = expr.strip()
    return out


def sql(
    spark: SparkSession,
    statement: str,
    snapshot_tables: dict[str, SnapshotTable] | None = None,
    dml_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Run ``statement``, serving ``[FOR] VERSION/TIMESTAMP AS OF`` over
    the engine's snapshot tables (see module docs). ``snapshot_tables``
    maps the table names usable with AS OF to their snapshot roots.

    ``DELETE FROM t WHERE …`` and ``UPDATE t SET … WHERE …`` statements
    (the row-level DML the reference's users run through Trino on
    Iceberg) execute against registered snapshot tables via
    ``delete_where``/``update_where`` — stats-pruned copy-on-write
    commits with time travel preserved. ``dml_keys`` maps each
    DML-enabled table to its key columns; the statement returns a 1-row
    frame (table, operation, version)."""
    tables = snapshot_tables or {}
    keys = dml_keys or {}

    def _dml_target(name: str) -> tuple[SnapshotTable, list[str]]:
        if name not in tables:
            raise ValueError(
                f"DML on {name!r}: not a registered snapshot table "
                f"(have {sorted(tables)})"
            )
        if name not in keys:
            raise ValueError(
                f"DML on {name!r}: no key columns registered (pass "
                "dml_keys={'" + name + "': [...]})"
            )
        return tables[name], keys[name]

    m = _DML_DELETE.match(statement)
    if m:
        tbl, key_cols = _dml_target(m.group(1))
        version = tbl.delete_where(m.group(2), key_cols=key_cols)
        return spark.createDataFrame(
            [(m.group(1), "delete", version)],
            "table string, operation string, version int",
        )
    m = _DML_UPDATE.match(statement)
    if m:
        tbl, key_cols = _dml_target(m.group(1))
        version = tbl.update_where(
            m.group(3), _split_set_list(m.group(2)), key_cols=key_cols
        )
        return spark.createDataFrame(
            [(m.group(1), "update", version)],
            "table string, operation string, version int",
        )
    m = _DML_INSERT.match(statement)
    if m:
        name, col_list, body = m.group(1, 2, 3)
        body = body.rstrip().rstrip(";")
        if name not in tables:
            raise ValueError(
                f"INSERT into {name!r}: not a registered snapshot table "
                f"(have {sorted(tables)})"
            )
        tbl = tables[name]
        rows = spark.sql(body)
        if col_list:
            cols = [c.strip() for c in col_list.split(",")]
            if len(cols) != len(rows.columns):
                raise ValueError(
                    f"INSERT column list has {len(cols)} names for "
                    f"{len(rows.columns)} projected columns"
                )
            rows = rows.toDF(*cols)
        if tbl.current_version():
            want = tbl.read().schema
            if sorted(rows.columns) != sorted(f.name for f in want):
                raise ValueError(
                    f"INSERT columns {sorted(rows.columns)} do not match "
                    f"table columns {sorted(f.name for f in want)}"
                )
            # align order AND types to the table schema (VALUES literals
            # arrive as INT where the table stores BIGINT, etc. — the
            # standard insert coercion)
            from pyspark.sql import functions as F

            rows = rows.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in want]
            )
        version = tbl.commit(rows, operation="append")
        return spark.createDataFrame(
            [(name, "insert", version)],
            "table string, operation string, version int",
        )
    m = _DML_MERGE.match(statement)
    if m:
        name, src, alias, on, del_col = m.group(1, 2, 3, 4, 5)
        if name not in tables:
            raise ValueError(
                f"MERGE into {name!r}: not a registered snapshot table "
                f"(have {sorted(tables)})"
            )
        key_cols = _merge_on_keys(on, name, {src, alias} - {None})
        changes = spark.table(src)
        version = tables[name].merge(
            changes, key_cols=key_cols, delete_col=del_col
        )
        return spark.createDataFrame(
            [(name, "merge", version)],
            "table string, operation string, version int",
        )

    def _rewrite(m: re.Match) -> str:
        name, kind, literal = m.group(1), m.group(2).upper(), m.group(3)
        if name not in tables:
            raise ValueError(
                f"time travel on {name!r}: not a registered snapshot table "
                f"(have {sorted(tables)})"
            )
        tbl = tables[name]
        if kind in ("VERSION", "SYSTEM_VERSION"):
            if literal.startswith("'"):
                # Iceberg/Spark accept a STRING version meaning a named
                # ref: `VERSION AS OF 'audit-2024'` — a tag, or (Iceberg
                # branch semantics) a branch's current head
                ref = literal.strip("'")
                try:
                    df = tbl.read(tag=ref)
                except FileNotFoundError:
                    try:
                        df = tbl.branch(ref).read()
                    except FileNotFoundError:
                        raise ValueError(
                            f"no tag or branch {ref!r} on {name!r}"
                        ) from None
                safe = re.sub(r"[^A-Za-z0-9_]", "_", ref)
                view = f"{name}__asof_tag_{safe}"
            else:
                version = int(literal)
                df = tbl.read(version=version)
                view = f"{name}__asof_v{version}"
        else:
            ms = _as_of_ms(literal)
            df = tbl.read(as_of_ms=ms)
            view = f"{name}__asof_t{ms}"
        df.createOrReplaceTempView(view)
        created.append(view)
        return view

    created: list[str] = []
    try:
        return spark.sql(_TT_RE.sub(_rewrite, statement))
    finally:
        # analysis resolved the views into the returned plan; drop them so
        # the statement leaves no residue in the session catalog (B1's
        # SHOW TABLES must keep listing only real tables)
        for view in created:
            spark.catalog.dropTempView(view)
