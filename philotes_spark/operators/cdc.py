"""CDC dataflow operators, Spark-first.

Reference parity map (SURVEY §2A):
- ``normalize_events``      ← A2 decode/normalize (``internal/cdc/source/
  postgres/reader.go:172-253``): op mapping, before/after handling per op,
  CDC system columns (``internal/iceberg/types.go:178-201``).
- ``latest_view``           ← B10 dedup-to-latest (``docs/query/
  sample-queries.sql:94-102``) — the canonical "current state" view.
- ``history_view``          ← B11 change history (``sample-queries.sql:104-112``).
- ``apply_cdc``             ← materialize current state from a CDC log
  (insert/update upsert, delete removal) — what MERGE INTO would do on
  Delta/Iceberg, expressed as window-dedup + filter so it runs anywhere.
- ``buffer_stats``          ← A8 (``internal/cdc/buffer/postgres.go:237-265``).

Everything is built-in DataFrame ops — single window shuffle per view, no
Python in the hot path. At 100 TB the latest-view shuffle partitions by the
key column; AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def op_from_wal_action(action: Column) -> Column:
    """WAL action code → operation name (reader.go:172-186 op-code map:
    I/U/D/T → INSERT/UPDATE/DELETE/TRUNCATE)."""
    return (
        F.when(action == "I", "INSERT")
        .when(action == "U", "UPDATE")
        .when(action == "D", "DELETE")
        .when(action == "T", "TRUNCATE")
        .otherwise(None)
    )


def with_cdc_system_columns(
    df: DataFrame, op: Column, ts: Column, lsn: Column
) -> DataFrame:
    """Append the three required CDC system columns every lake table gets
    (internal/iceberg/types.go:178-201)."""
    return (
        df.withColumn("_cdc_operation", op)
        .withColumn("_cdc_timestamp", ts)
        .withColumn("_cdc_lsn", lsn)
    )


def latest_window(key_cols: list[str], order_cols: list[Column]) -> Window:
    """The dedup-to-latest window: partition by key, newest first.

    Ordering must end with a unique column (LSN / event id) so replays and
    out-of-order delivery resolve deterministically (SURVEY §2B note on
    LSN monotonicity)."""
    return Window.partitionBy(*key_cols).orderBy(*[c.desc() for c in order_cols])


def latest_view(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """B10: one row per key — the newest version
    (``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC, lsn DESC)
    = 1``, the reference's canonical query, sample-queries.sql:94-102).

    Serves the WINDOW plan — pinned by measurement (VERDICT r06 #5,
    measured r07, best-of-3 cold, salted fixtures):

    | plan   | sf0.1   | sf1     |
    |--------|---------|---------|
    | window | 0.664 s | 1.360 s |
    | max_by | 0.760 s | 1.544 s |

    The r06 ``max_by(struct(cols), struct(order))`` re-plan was billed
    "neutral at sf0.1, better at scale" but is 12–14% SLOWER at both
    measurable SFs: its map-side-combine shuffle savings don't offset
    the per-row struct construction inside the aggregation buffer at
    these dup factors, while the window's per-key sort is cheap. The
    aggregate twin stays available as :func:`latest_view_agg` — on a
    real cluster with many map partitions and a high per-partition key
    duplication factor its ≤1-row-per-key-per-map-partition shuffle is
    the better asymptote; re-measure there before switching defaults."""
    return latest_view_window(df, key_cols, order_cols)


def latest_view_agg(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """The aggregate twin of :func:`latest_view`: ``max_by(struct(cols),
    struct(order))`` — map-side partial hash aggregate, no sort; the
    shuffle carries at most one row per key per map partition. Ordering
    compares the ``order_cols`` struct lexicographically — identical to
    the window's DESC-first ranking; ties (never present in the
    fixtures: the LSN / event_id tie-break is unique) pick one row
    arbitrarily, same as ``row_number``. Measured SLOWER than the window
    plan at sf0.1 and sf1 (see :func:`latest_view`); kept for
    on-cluster re-evaluation and pinned value-equal by tests."""
    if order_cols is None:
        order_cols = [F.col("_cdc_timestamp"), F.col("_cdc_lsn")]
    value_cols = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*value_cols), F.struct(*order_cols)).alias("__row")
    )
    return agg.select(
        *[F.col(f"__row.{c}").alias(c) if c in value_cols else F.col(c)
          for c in df.columns]
    )


def latest_view_window(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """ROW_NUMBER = 1 over the latest_window: one hash-partitioning
    shuffle + per-key sort. The measured-fastest plan at bench scale
    (see :func:`latest_view`, which delegates here) and the natural
    shape for rank-N generalizations."""
    if order_cols is None:
        order_cols = [F.col("_cdc_timestamp"), F.col("_cdc_lsn")]
    w = latest_window(key_cols, order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _lex_gt(cols: list[Column], vals: list) -> Column:
    """``(c1, c2, ...) > (v1, v2, ...)`` lexicographically, as a plain
    boolean expression over literals — unlike a struct comparison against a
    broadcast row, the leading conjunct ``c1 >= v1`` (added by the caller)
    is a parquet-pushable range predicate."""
    pred = F.lit(False)
    for c, v in zip(reversed(cols), reversed(vals)):
        pred = (c > F.lit(v)) | ((c == F.lit(v)) & pred)
    return pred


def truncate_cut(
    df: DataFrame,
    order_cols: list[Column],
    op_col: str = "_cdc_operation",
):
    """Commit position of the newest TRUNCATE event, or None.

    A bounded scalar collect: the scan is column-pruned to (op, order
    cols) and the ``op = 'TRUNCATE'`` filter is pushed to parquet, so at
    100 TB this reads only row groups whose stats admit TRUNCATE — it
    does NOT rescan the data pages the main query reads. The returned
    row inlines into the main plan as literals (see :func:`apply_cdc`),
    which removes the broadcast-exchange job the previous plan paid."""
    ord_struct = F.struct(*order_cols)
    row = (
        df.filter(F.col(op_col) == "TRUNCATE")
        .agg(F.max(ord_struct).alias("__cut"))
        .first()
    )
    return row[0] if row is not None else None


def apply_cdc(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column] | None = None,
    op_col: str = "_cdc_operation",
    truncate_aware: bool = True,
) -> DataFrame:
    """Current-state materialization: latest version per key, minus keys
    whose latest operation is DELETE. This is the read-side equivalent of
    the reference's at-least-once + dedup-at-read design (SURVEY §7.4
    risk 3).

    TRUNCATE semantics: a TRUNCATE event carries no row data
    (reader.go:236-238) but wipes the table — every event at or before the
    newest TRUNCATE's commit position is dropped before the latest-version
    window. The cut point is a bounded scalar collect (column-pruned,
    filter-pushed — :func:`truncate_cut`) inlined as literals, so the
    no-TRUNCATE common case costs one near-empty metadata-ish job and the
    main query stays a single window shuffle; the leading ``>=`` conjunct
    on the first ordering column additionally pushes to parquet row-group
    stats, which the old broadcast-struct comparison never could.

    Pass ``truncate_aware=False`` when the operation domain provably
    cannot contain TRUNCATE (e.g. a source mapping that only emits
    I/U/D, as the `events` fixture's op map does): the cut scan is
    skipped entirely and the whole materialization is exactly one
    shuffle. This matches the declared B10 semantics
    (sample-queries.sql:94-102), which have no TRUNCATE clause."""
    if order_cols is None:
        order_cols = [F.col("_cdc_timestamp"), F.col("_cdc_lsn")]
    if truncate_aware:
        cut = truncate_cut(df, order_cols, op_col)
        if cut is not None:
            vals = list(cut)
            if any(v is None for v in vals):
                # null ordering fields: keep the exact struct-comparison
                # semantics (null comparisons drop the row)
                fields = df.select(*order_cols).schema.fields
                cut_struct = F.struct(
                    *[F.lit(v).cast(f.dataType) for v, f in zip(vals, fields)]
                )
                df = df.filter(F.struct(*order_cols) > cut_struct)
            else:
                df = df.filter(
                    (order_cols[0] >= F.lit(vals[0]))  # parquet-pushable
                    & _lex_gt(order_cols, vals)
                )
    return latest_view(df, key_cols, order_cols).filter(
        ~F.col(op_col).isin("DELETE", "TRUNCATE")
    )


def history_view(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """B11: full change history for filtering by key, ordered by commit
    position. Filter-by-key prunes partitions/row-groups before the sort."""
    return df.orderBy(*key_cols, order_col)


def buffer_stats(df: DataFrame, processed_col: str = "processed_at") -> DataFrame:
    """A8: queue depth + oldest-unprocessed lag in one aggregate pass
    (COUNT / COUNT FILTER / MIN FILTER — buffer/postgres.go:237-265)."""
    unprocessed = F.col(processed_col).isNull()
    return df.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.count(F.when(unprocessed, 1)).alias("unprocessed_events"),
        F.min(F.when(unprocessed, F.col("created_at"))).alias("oldest_unprocessed"),
    )
