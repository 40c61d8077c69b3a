"""Streaming CDC → versioned snapshot table (the reference's end state:
CDC events applied to an Iceberg table — ``internal/iceberg/writer``
append + the latest-state query; here the apply is a real MERGE).

``merge_stream_into_snapshot`` wires a CDC event stream into
``SnapshotTable.merge`` per micro-batch:

  batch → latest-change-per-key (within-batch dedup by LSN)
        → MERGE (upsert, DELETE ops drop keys)
        → new snapshot version

Replay safety: ``foreachBatch`` is at-least-once — a crashed batch
re-runs whole. MERGE is idempotent in STATE (re-applying the same change
set yields the same table; only an extra version is recorded), so a
replayed batch can never duplicate or lose rows — the same property the
reference gets from its read-side dedup view, enforced write-side here.
Time travel across batches comes free from the snapshot versioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def latest_change_per_key(changes: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """One surviving change per key — the within-batch dedup (a batch may
    carry several versions of one row; only the newest applies)."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_stream_into_snapshot(
    stream: DataFrame,
    table_path: str,
    key_cols: list[str],
    order_col: str = "_cdc_lsn_int",
    op_col: str = "_cdc_operation",
    checkpoint_dir: str | None = None,
    stats_cols: list[str] | None = None,
    mode: str = "cow",
    compact_every: int | None = None,
):
    """Start the streaming query that maintains a snapshot table as the
    MERGEd latest state of a CDC stream. Returns the StreamingQuery.

    Each micro-batch: dedup to the newest change per key, mark DELETE
    ops, and merge into ``table_path`` (first batch creates the table
    with ``stats_cols`` so later merges get file-skipping).

    ``mode='mor'`` merges each batch as a merge-on-read delta — write
    cost O(batch) regardless of table size, THE configuration for
    high-frequency CDC micro-batches at 100 TB (a CoW merge rewrites
    every key-range-overlapping base file per batch) — with
    ``compact_every=N`` folding the accumulated deltas back into base
    files every N batches (the background compaction half; readers
    between compactions pay the delta anti-joins)."""
    from philotes_spark.sources.snapshots import SnapshotTable

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = latest_change_per_key(batch_df, key_cols, order_col)
        changes = latest.withColumn("_del", F.col(op_col) == "DELETE")
        tbl = SnapshotTable(spark, table_path)
        if tbl.current_version() == 0:
            tbl.commit(
                changes.filter(~F.col("_del")).drop("_del"),
                stats_cols=stats_cols or list(key_cols),
            )
        else:
            tbl.merge(changes, key_cols=key_cols, delete_col="_del", mode=mode)
            if (
                mode == "mor"
                and compact_every
                and len(tbl._resolve().get("deltas", [])) >= compact_every
            ):
                tbl.compact_deltas()

    writer = stream.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
