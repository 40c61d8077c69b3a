"""Structured Streaming CDC ingest pipeline (SURVEY §3.1 / §2A A1-A10,
A19, A22-A24).

The reference's whole dataflow —

    WAL source → normalize → durable buffer → 5s/1000-row micro-batcher →
    per-table lake writer, with checkpointing, DLQ, backpressure

— collapses in Spark to ONE streaming query:

    readStream (file/kafka/rate source)          # A1 source, A3 keep-alive
      → normalize projection                     # A2
      → writeStream.foreachBatch(                # A9 micro-batcher
            valid → per-table partitioned write  # A10/A14/A18
            invalid → quarantine table)          # A21 DLQ
        .trigger(processingTime='5 seconds')     # flush interval parity
        .option('checkpointLocation', ...)       # A19 checkpoint/restart
        .option('maxFilesPerTrigger', ...)       # A5 LIMIT / backpressure

Checkpointing, replay, at-least-once delivery, and rate limiting are the
engine's (offset + commit logs replace the buffer DB, SURVEY §1.1); the
dedup-to-latest view (operators/cdc.latest_view) is the correctness
backstop for redelivery, same as the reference (SURVEY §7.4 risk 3).

State machine (A23): Spark has no pause — pause/resume maps to
stop + restart-from-checkpoint, exposed with the reference's state names
(internal/cdc/pipeline/state.go:47-156).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.sources.writer import write_batch_per_table
from philotes_spark.streaming.reliability import (
    MetricsListener,
    quarantine,
    split_valid_invalid,
)

# Reference operating envelope (BASELINE.md)
DEFAULT_TRIGGER = "5 seconds"  # PHILOTES_CDC_FLUSH_INTERVAL
DEFAULT_MAX_FILES_PER_TRIGGER = 4  # batch-size cap analogue (A5/A9)

STATES = ("starting", "running", "paused", "stopping", "stopped", "failed")
_VALID_TRANSITIONS = {
    "starting": {"running", "failed", "stopping"},
    "running": {"paused", "stopping", "failed"},
    "paused": {"running", "stopping", "failed"},
    "stopping": {"stopped", "failed"},
    "stopped": {"starting"},
    "failed": {"starting"},
}


class StateMachine:
    """A23 pipeline state machine with validated transitions
    (state.go:47-156)."""

    def __init__(self) -> None:
        self.state = "stopped"
        self.listeners = []

    def transition(self, new: str) -> None:
        if new not in STATES:
            raise ValueError(f"unknown state {new!r}")
        if new not in _VALID_TRANSITIONS[self.state]:
            raise ValueError(f"invalid transition {self.state} → {new}")
        old, self.state = self.state, new
        for cb in self.listeners:
            cb(old, new)

    def can_process(self) -> bool:
        return self.state == "running"


@dataclass
class IngestConfig:
    source_dir: str
    lake_dir: str
    checkpoint_dir: str
    dlq_dir: str
    trigger: str = DEFAULT_TRIGGER
    max_files_per_trigger: int = DEFAULT_MAX_FILES_PER_TRIGGER


class CdcIngestPipeline:
    """A22 pipeline orchestrator: one named streaming query wrapping the
    normalize → fan-out-write → quarantine dataflow."""

    def __init__(self, spark: SparkSession, config: IngestConfig) -> None:
        self.spark = spark
        self.config = config
        self.state = StateMachine()
        self.listener = MetricsListener()
        self.query = None
        self.backpressure = None

    def attach_backpressure(self, get_size, bp_config=None):
        """A24: wire the hysteresis controller to this pipeline's
        pause/resume; ``get_size`` is the buffer-depth gauge (injectable
        like the reference's BufferSizeFunc). Call ``.check()`` on the
        operator's cadence."""
        from philotes_spark.streaming.backpressure import (
            BackpressureConfig,
            BackpressureController,
        )

        self.backpressure = BackpressureController(
            bp_config or BackpressureConfig(),
            get_size,
            pause=self.pause,
            resume=self.resume,
        )
        return self.backpressure

    # --- source (A1): file-based CDC event feed ---------------------------
    def _read_stream(self) -> DataFrame:
        from philotes_spark.types import CDC_EVENT_SCHEMA

        return (
            self.spark.readStream.schema(CDC_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.config.max_files_per_trigger)
            .parquet(self.config.source_dir)
        )

    # --- normalize (A2/A3) ------------------------------------------------
    @staticmethod
    def normalize(df: DataFrame) -> DataFrame:
        """Keep-alive filter + system-column projection. The payload stays
        a JSON string in flight (typed projection happens at write/read —
        the schema-evolution mechanism, SURVEY §7.4 risk 2)."""
        from philotes_spark.types import parse_lsn

        return (
            df.filter(F.col("operation").isNotNull())  # A3 keep-alives
            .withColumn("_cdc_operation", F.col("operation"))
            .withColumn("_cdc_timestamp", F.col("event_time"))
            .withColumn("_cdc_lsn", F.col("lsn"))
            .withColumn("_cdc_lsn_int", parse_lsn(F.col("lsn")))
        )

    # --- micro-batch sink (A9/A10/A21) ------------------------------------
    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        valid, invalid = split_valid_invalid(
            batch_df,
            F.col("_cdc_operation").isin("INSERT", "UPDATE", "DELETE", "TRUNCATE")
            & F.col("table_name").isNotNull(),
        )
        write_batch_per_table(valid, self.config.lake_dir)
        bad = quarantine(invalid, "invalid operation or missing table", "validation")
        if bad.take(1):
            bad.write.mode("append").parquet(self.config.dlq_dir)

    # --- lifecycle (A22/A23) ----------------------------------------------
    def start(self, available_now: bool = False):
        self.state.transition("starting")
        self.spark.streams.addListener(self.listener)
        stream = self.normalize(self._read_stream())
        writer = stream.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.config.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.config.trigger)
        self.query = writer.queryName(
            f"cdc_ingest_{os.path.basename(self.config.lake_dir)}"
        ).start()
        self.state.transition("running")
        return self.query

    def stop(self) -> None:
        self.state.transition("stopping")
        if self.query is not None:
            self.query.stop()
        self.spark.streams.removeListener(self.listener)
        self.state.transition("stopped")

    def pause(self) -> None:
        """A24-equivalent: Spark has no pause — stop the query, keep the
        checkpoint; resume() restarts from it (SURVEY §7.4 risk 5)."""
        if self.query is not None:
            self.query.stop()
            self.query = None
        self.state.transition("paused")

    def resume(self):
        self.state.transition("running")
        stream = self.normalize(self._read_stream())
        self.query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.config.checkpoint_dir)
            .trigger(processingTime=self.config.trigger)
            .start()
        )
        return self.query

    # --- health (A25) ------------------------------------------------------
    def health(self) -> dict:
        active = self.query is not None and self.query.isActive
        out = {
            "state": self.state.state,
            "healthy": active or self.state.state in ("stopped", "paused"),
            "query_active": active,
            "metrics": self.listener.metrics.__dict__,
        }
        if self.backpressure is not None:
            bp = self.backpressure.stats
            out["backpressure"] = {
                "is_paused": bp.is_paused,
                "pause_count": bp.pause_count,
                "resume_count": bp.resume_count,
                "buffer_depth": bp.last_size,
            }
        return out
