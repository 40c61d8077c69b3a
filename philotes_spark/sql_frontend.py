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


def sql(
    spark: SparkSession,
    statement: str,
    snapshot_tables: dict[str, SnapshotTable] | None = None,
) -> DataFrame:
    """Run ``statement``, serving ``[FOR] VERSION/TIMESTAMP AS OF`` over
    the engine's snapshot tables (see module docs). ``snapshot_tables``
    maps the table names usable with AS OF to their snapshot roots."""
    tables = snapshot_tables or {}

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
