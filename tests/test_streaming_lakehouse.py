"""Streaming CDC → MERGEd snapshot table: latest-state maintenance with
upserts + deletes across micro-batches, versioning, and replay
idempotence (streaming/lakehouse.py)."""

import datetime as dt

from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.streaming.lakehouse import (
    latest_change_per_key,
    merge_stream_into_snapshot,
)

SCHEMA = (
    "id long, name string, _cdc_lsn_int long, _cdc_operation string"
)

BATCH1 = [
    (1, "a1", 10, "INSERT"),
    (2, "b1", 11, "INSERT"),
    (3, "c1", 12, "INSERT"),
    (1, "a2", 13, "UPDATE"),  # same batch: only the newest a-version applies
]
BATCH2 = [
    (2, None, 20, "DELETE"),
    (3, "c2", 21, "UPDATE"),
    (4, "d1", 22, "INSERT"),
]


def _write_feed(spark, d, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        f"{d}/{name}", mode="overwrite"
    )


def test_latest_change_per_key(spark):
    df = spark.createDataFrame(BATCH1, SCHEMA)
    latest = latest_change_per_key(df, ["id"], "_cdc_lsn_int")
    got = {r.id: (r.name, r._cdc_operation) for r in latest.collect()}
    assert got[1] == ("a2", "UPDATE") and len(got) == 3


def test_stream_merges_to_latest_state(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, BATCH1, "f1")
    _write_feed(spark, feed, BATCH2, "f2")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one merge per feed file
        .parquet(feed + "/*")
    )
    q = merge_stream_into_snapshot(
        stream,
        str(tmp_path / "snap"),
        key_cols=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    q.stop()

    tbl = SnapshotTable(spark, str(tmp_path / "snap"))
    got = {r.id: r.name for r in tbl.read().select("id", "name").collect()}
    assert got == {1: "a2", 3: "c2", 4: "d1"}, "deletes applied, upserts latest"
    assert tbl.current_version() == 2, "one version per micro-batch"
    # time travel to the pre-delete state
    v1 = {r.id: r.name for r in tbl.read(version=1).select("id", "name").collect()}
    assert v1 == {1: "a2", 2: "b1", 3: "c1"}


def test_replayed_batch_is_state_idempotent(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, BATCH1, "f1")
    snap = str(tmp_path / "snap")
    stream = spark.readStream.schema(SCHEMA).parquet(feed + "/*")
    q = merge_stream_into_snapshot(
        stream, snap, key_cols=["id"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    q.stop()
    tbl = SnapshotTable(spark, snap)
    before = sorted(
        map(tuple, tbl.read().select("id", "name").collect())
    )

    # simulate an at-least-once replay: re-apply the same change set
    changes = latest_change_per_key(
        spark.createDataFrame(BATCH1, SCHEMA), ["id"], "_cdc_lsn_int"
    ).withColumn("_del", F.col("_cdc_operation") == "DELETE")
    tbl.merge(changes, key_cols=["id"], delete_col="_del")

    after = sorted(map(tuple, tbl.read().select("id", "name").collect()))
    assert after == before, "replaying a batch must not change table state"
    assert tbl.current_version() == 2  # the replay is visible only as history


def test_mor_mode_stream_agrees_with_cow(spark, tmp_path):
    """The same CDC feed merged in MoR mode (with periodic delta
    compaction) must land on the identical final state as CoW — only the
    write amplification differs."""
    import datetime as dt

    from philotes_spark.sources.snapshots import SnapshotTable
    from philotes_spark.streaming.lakehouse import merge_stream_into_snapshot

    feed = str(tmp_path / "morfeed")
    schema = (
        "k long, val double, _cdc_lsn_int long, _cdc_operation string"
    )
    b1 = [(1, 1.0, 10, "INSERT"), (2, 2.0, 11, "INSERT"), (3, 3.0, 12, "INSERT")]
    b2 = [(2, 2.5, 20, "UPDATE"), (3, 0.0, 21, "DELETE"), (4, 4.0, 22, "INSERT")]
    b3 = [(1, 1.5, 30, "UPDATE"), (4, 0.0, 31, "DELETE")]

    def run(path, mode, compact_every=None):
        for i, b in enumerate((b1, b2, b3)):
            spark.createDataFrame(b, schema).coalesce(1).write.parquet(
                feed + mode, mode="append"
            )
            q = merge_stream_into_snapshot(
                spark.readStream.schema(schema).parquet(feed + mode),
                path,
                key_cols=["k"],
                checkpoint_dir=str(tmp_path / f"ck_{mode}"),
                mode=mode,
                compact_every=compact_every,
            )
            q.awaitTermination(120)
            q.stop()
        return SnapshotTable(spark, path)

    cow = run(str(tmp_path / "cow_t"), "cow")
    mor = run(str(tmp_path / "mor_t"), "mor", compact_every=2)
    want = {r.k: r.val for r in cow.read().select("k", "val").collect()}
    got = {r.k: r.val for r in mor.read().select("k", "val").collect()}
    assert got == want == {1: 1.5, 2: 2.5}
    ops = [r.operation for r in mor.snapshots().orderBy("version").collect()]
    assert "merge-mor" in ops and "compact-deltas" in ops
