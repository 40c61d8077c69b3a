"""Streaming deduplication within an event-time watermark.

The reference's delivery contract is at-least-once: the WAL reader
re-emits events on reconnect/restart (`internal/cdc/source/postgres/
reader.go` resumes from the confirmed LSN, so everything after the last
checkpoint is redelivered) and the buffer's mark-processed is a separate
step from delivery. Downstream exactly-once therefore needs a dedup
stage keyed by event identity. In Spark this is the built-in
``dropDuplicatesWithinWatermark``: state is kept per key only until the
event-time watermark passes ``delay`` beyond the key's first arrival,
so state size is bounded by the redelivery horizon — not by the stream's
lifetime key cardinality (the 100 TB-safe property; a plain
``dropDuplicates`` on a stream retains every key forever).

Semantics guarantee: a duplicate arriving within ``delay`` of the first
copy is dropped; one arriving after the state expired may be emitted
again (at-least-once tail). Spark defines streaming operators by batch
equivalence — the batch twin of "first copy wins within the horizon" is
plain ``dropDuplicates`` over the keys — but Spark refuses
``dropDuplicatesWithinWatermark`` on a batch frame outright, so
:func:`dedup_within_watermark` dispatches on ``df.isStreaming``; the
batch path is what the correctness gate hash-checks, the streaming path
is exercised end-to-end in tests/test_streaming_dedup.py (drop inside
the horizon, checkpoint-surviving state, re-emission after expiry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "60 seconds",
) -> DataFrame:
    """First-copy-wins dedup over ``keys`` with per-key state bounded by
    the ``delay`` event-time horizon (see module docs)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
