"""Reliability layer (SURVEY §2A A20/A21/A25/A26): retry with backoff,
dead-letter quarantine, metrics listener, health snapshot.

Spark's engine supplies most of the reference's reliability machinery
(task retries, checkpoint/restart, rate limiting); what remains custom is
thin: sink-call retries inside foreachBatch, the quarantine table, and a
StreamingQueryListener exposing the reference's metric families.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

# --- A20: retry with exponential backoff + jitter -------------------------
# Defaults mirror internal/cdc/pipeline/retry.go:34-42:
# 3 attempts, 1s → 30s, ×2.0, ±25% jitter.


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    initial_backoff: float = 1.0
    max_backoff: float = 30.0
    multiplier: float = 2.0
    jitter: float = 0.25

    def backoff(self, attempt: int, rng: random.Random) -> float:
        base = min(self.initial_backoff * self.multiplier**attempt, self.max_backoff)
        return base * (1 + rng.uniform(-self.jitter, self.jitter))


def retry(fn, policy: RetryPolicy | None = None, seed: int | None = None):
    """Execute ``fn`` under the retry policy (retry.go:115-247). Used for
    sink/commit calls inside foreachBatch; task-level retries are Spark's
    (spark.task.maxFailures)."""
    policy = policy or RetryPolicy()
    rng = random.Random(seed)
    last = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — the classifier decides
            last = e
            if attempt < policy.max_attempts - 1:
                time.sleep(policy.backoff(attempt, rng))
    raise last


# --- A21: dead-letter quarantine ------------------------------------------
# Schema mirrors internal/cdc/deadletter/deadletter.go:28-68.

ERROR_TYPES = ("transient", "permanent", "validation", "schema")


def quarantine(df: DataFrame, error_message: str, error_type: str = "validation") -> DataFrame:
    """Wrap failed rows in the DLQ envelope: original event serialized as
    JSON + error class + timestamps (7-day TTL like buffer/batch.go:75-83)."""
    if error_type not in ERROR_TYPES:
        raise ValueError(f"error_type must be one of {ERROR_TYPES}")
    return df.select(
        F.to_json(F.struct(*df.columns)).alias("event_data"),
        F.lit(error_message).alias("error_message"),
        F.lit(error_type).alias("error_type"),
        F.lit(0).alias("retry_count"),
        F.current_timestamp().alias("created_at"),
        (F.current_timestamp() + F.expr("INTERVAL 7 DAYS")).alias("expires_at"),
    )


def split_valid_invalid(
    df: DataFrame, validity: F.Column
) -> tuple[DataFrame, DataFrame]:
    """Partition a batch into (valid, invalid) on a validity predicate —
    the append-vs-quarantine fork of the batch processor
    (buffer/batch.go:264-285)."""
    return df.filter(validity), df.filter(~validity)


# --- A25/A26: metrics + health --------------------------------------------


@dataclass
class PipelineMetrics:
    """In-process mirror of the reference's Prometheus families
    (internal/metrics/metrics.go:35-259)."""

    events_total: int = 0
    batches_total: int = 0
    errors_total: int = 0
    last_batch_rows: int = 0
    last_progress_ts: float = 0.0
    lag_seconds: float = 0.0
    by_operation: dict = field(default_factory=dict)


class MetricsListener(StreamingQueryListener):
    """StreamingQueryListener → metrics sink (the Spark-native home for
    philotes_cdc_events_total / lag / batches; SURVEY A26)."""

    def __init__(self) -> None:
        self.metrics = PipelineMetrics()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        n = p.numInputRows or 0
        self.metrics.events_total += n
        self.metrics.batches_total += 1
        self.metrics.last_batch_rows = n
        self.metrics.last_progress_ts = time.time()

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.metrics.errors_total += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
