"""WAL-shaped CDC stream source (SURVEY §2A A1) — the reference's ingress.

The reference reads PostgreSQL logical replication directly
(``internal/cdc/source/postgres/reader.go:56-140``: pgstream → WAL
messages → decoded events ordered by LSN). A sandboxed Spark cluster has
no Postgres, so the same contract is expressed twice here:

1. ``WalDataSource`` — a PySpark 4 Python data source
   (``spark.dataSource.register`` + ``readStream.format("philotes_wal")``)
   that replays a WAL-shaped JSONL log strictly by LSN with resumable
   offsets. The offset IS the LSN (reader.go keeps the confirmed flush
   LSN the same way), so checkpoint/restart resumes exactly where the
   last batch committed; ``maxLsnPerBatch`` is admission control at the
   source (A5/A24). Against a real Postgres, this class is where a
   pgoutput/wal2json client would live — the Spark-facing surface
   (offsets, partitions, schema) is unchanged.

2. ``debezium_to_cdc`` — a pure DataFrame projection adapting a
   Debezium-format Kafka topic (the production-grade ingress on a real
   cluster: ``readStream.format("kafka")`` → this adapter → the same
   downstream pipeline).

Scale: one WAL is inherently a single ordered log — a partition per
batch is correct (matches the reference's single reader goroutine);
parallelism comes from fan-out AFTER normalize, not from the log read.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from philotes_spark.types import CDC_EVENT_SCHEMA

WAL_GLOB_PREFIX = "wal-"


class _WalRange(InputPartition):
    def __init__(
        self, path: str, start_lsn: int, end_lsn: int, files: list[str]
    ) -> None:
        self.path = path
        self.start_lsn = start_lsn
        self.end_lsn = end_lsn
        self.files = files  # only segments overlapping (start, end]


class WalStreamReader(DataSourceStreamReader):
    """Replays ``wal-*.jsonl`` segments in LSN order. Offsets are
    ``{"lsn": n}`` — monotone, resumable, committed by the engine's
    checkpoint exactly like the reference's confirmed-flush LSN."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("philotes_wal requires .option('path', <dir>)")
        cap = options.get("maxLsnPerBatch")
        self.max_lsn_per_batch = int(cap) if cap else None
        # The committed position, when known. The API has no
        # latestOffset(start, limit) and calls latestOffset BEFORE
        # initialOffset even on a fresh query (verified), so the first
        # batch is always uncapped catch-up; the reader learns the
        # engine's position from initialOffset/partitions/commit and the
        # cap governs every batch after that. Capping the first batch
        # from 0 would hand a restarted engine an offset BEHIND its
        # checkpointed start — a stalled (availableNow) or regressed
        # stream.
        self._position: int | None = None
        # per-segment ((size, mtime_ns), min_lsn, max_lsn) — segments are
        # append-only, so a segment is only re-parsed when its size or
        # mtime changes (mtime catches an in-place rewrite of identical
        # length, e.g. compaction); this keeps latestOffset incremental
        # (O(new data), not O(whole log) per tick)
        self._seg_stats: dict[str, tuple[tuple[int, int], int, int]] = {}

    # --- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:  # noqa: N802
        self._position = 0  # fresh query (restarts skip this call)
        return {"lsn": 0}

    def _scan_segments(self) -> dict[str, tuple[int, int, int]]:
        if not os.path.isdir(self.path):
            return {}
        live = {}
        for f in sorted(os.listdir(self.path)):
            if not f.startswith(WAL_GLOB_PREFIX):
                continue
            full = os.path.join(self.path, f)
            st = os.stat(full)
            stat_key = (st.st_size, st.st_mtime_ns)
            cached = self._seg_stats.get(f)
            if cached is not None and cached[0] == stat_key:
                live[f] = cached
                continue
            mn, mx = None, 0
            with open(full) as fh:
                for line in fh:
                    if line.strip():
                        lsn = int(json.loads(line)["lsn_int"])
                        mn = lsn if mn is None else min(mn, lsn)
                        mx = max(mx, lsn)
            live[f] = (stat_key, mn if mn is not None else 0, mx)
        self._seg_stats = live
        return live

    def latestOffset(self) -> dict:  # noqa: N802
        stats = self._scan_segments()
        mx = max((s[2] for s in stats.values()), default=0)
        if self.max_lsn_per_batch is not None and self._position is not None:
            # steady-state admission control relative to the known position
            mx = min(mx, self._position + self.max_lsn_per_batch)
        return {"lsn": mx}

    # --- partitions/read ---------------------------------------------------

    def partitions(self, start: dict, end: dict):
        lo, hi = start["lsn"], end["lsn"]
        self._position = max(self._position or 0, lo, hi)
        if lo >= hi:
            return []
        stats = self._scan_segments()
        files = [
            f for f, (_, mn, mx) in sorted(stats.items()) if mx > lo and mn <= hi
        ]
        return [_WalRange(self.path, lo, hi, files)]

    def read(self, partition: _WalRange):
        for f in partition.files:
            with open(os.path.join(partition.path, f)) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    lsn = int(e["lsn_int"])
                    if partition.start_lsn < lsn <= partition.end_lsn:
                        yield self._to_row(e)

    @staticmethod
    def _to_row(e: dict) -> tuple:
        ts = e.get("event_time")
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts)
        elif isinstance(ts, (int, float)):
            ts = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc).replace(tzinfo=None)
        return (
            e["id"],
            e.get("lsn"),
            e.get("transaction_id"),
            ts,
            e.get("schema_name"),
            e.get("table_name"),
            e["operation"],
            json.dumps(e["before"]) if e.get("before") is not None else None,
            json.dumps(e["after"]) if e.get("after") is not None else None,
            e.get("key_columns"),
            e.get("metadata"),
        )

    def commit(self, end: dict) -> None:
        # durability is the engine's checkpoint; just track progress so the
        # admission cap advances relative to the committed position
        self._position = max(self._position or 0, end["lsn"])


class WalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "philotes_wal"

    def schema(self):
        return CDC_EVENT_SCHEMA

    def streamReader(self, schema):  # noqa: N802
        return WalStreamReader(self.options)


def register_wal_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` for the WAL source."""
    spark.dataSource.register(WalDataSource)


def read_wal_stream(spark, path: str, max_lsn_per_batch: int | None = None) -> DataFrame:
    """``readStream`` over a WAL directory — drop-in replacement for the
    file-based CDC feed in ``CdcIngestPipeline`` (A1)."""
    register_wal_source(spark)
    reader = spark.readStream.format("philotes_wal").option("path", path)
    if max_lsn_per_batch is not None:
        reader = reader.option("maxLsnPerBatch", str(max_lsn_per_batch))
    return reader.load()


# --- Debezium topic adapter (documented Kafka ingress) ---------------------

_DEBEZIUM_PAYLOAD = (
    "STRUCT<op: STRING, ts_ms: BIGINT, before: STRING, after: STRING, "
    "source: STRUCT<lsn: BIGINT, txId: BIGINT, schema: STRING, table: STRING>>"
)

_DEBEZIUM_OPS = {"c": "INSERT", "u": "UPDATE", "d": "DELETE", "r": "INSERT"}


def debezium_to_cdc(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Map a Debezium JSON envelope (Kafka ``value``) onto the engine's CDC
    event columns — the production ingress adapter:

        spark.readStream.format("kafka")...load()
            .transform(debezium_to_cdc)
            .transform(CdcIngestPipeline.normalize)

    Pure JVM projection (from_json), no Python in the hot path."""
    p = F.from_json(F.col(value_col).cast("string"), _DEBEZIUM_PAYLOAD)
    op = F.col("_p.op")
    op_mapped = None
    for k, v in _DEBEZIUM_OPS.items():
        cond = F.when(op == k, F.lit(v))
        op_mapped = cond if op_mapped is None else op_mapped.when(op == k, F.lit(v))
    return (
        df.withColumn("_p", p)
        .select(
            F.concat_ws(
                "-", F.col("_p.source.txId").cast("string"), F.col("_p.source.lsn").cast("string")
            ).alias("id"),
            # PG text form X/Y (hex), same as parse_lsn expects
            F.concat_ws(
                "/",
                F.conv(F.shiftright(F.col("_p.source.lsn"), 32).cast("string"), 10, 16),
                F.conv(
                    (F.col("_p.source.lsn") % F.lit(2**32)).cast("string"), 10, 16
                ),
            ).alias("lsn"),
            F.col("_p.source.txId").alias("transaction_id"),
            F.timestamp_millis(F.col("_p.ts_ms")).alias("event_time"),
            F.col("_p.source.schema").alias("schema_name"),
            F.col("_p.source.table").alias("table_name"),
            (op_mapped.otherwise(F.upper(op))).alias("operation"),
            F.col("_p.before").alias("before"),
            F.col("_p.after").alias("after"),
            F.lit(None).cast("array<string>").alias("key_columns"),
            F.create_map().cast("map<string,string>").alias("metadata"),
        )
    )
