"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-key running current-state (the streaming twin of the B10 latest-view).

The reference materializes "current state" only at read time, with the
dedup window over the append-only CDC table (sample-queries.sql:94-102).
``running_latest`` maintains the same answer *incrementally* in stream
state: one state row per key holding the winning (order, payload) tuple;
each micro-batch emits only the keys whose state changed. Late /
redelivered events (SURVEY §7.4 risk 3) lose the (ts, event_id)
comparison and emit nothing — out-of-order input cannot regress state.

Scale shape: state is one fixed-width row per distinct key, partitioned
by the grouping key across executors (RocksDB-backed state store on a
real cluster); per-batch work is one shuffle on the key + an Arrow-batch
pass per group. This is the `applyInPandasWithState` pattern the built-in
operators can't express: dropDuplicatesWithinWatermark keeps *first*
seen, this keeps *winner by ordering columns* and emits transitions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_micros", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

# state = the current winner: (ts_micros, event_id, event_type, value)
_STATE_SCHEMA = StructType(
    [
        StructField("ts_micros", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _fold_winner(best, pdf_iter):
    """Fold Arrow batches into the winning (ts_micros, event_id, type,
    value) tuple — max by (ts, event_id), vectorized within each batch.
    Shared by both stateful APIs so their semantics cannot drift."""
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        ts_us = pdf["ts"].astype("int64") // 1000
        order = list(zip(ts_us, pdf["event_id"].astype("int64")))
        i = max(range(len(order)), key=order.__getitem__)
        cand = (
            int(ts_us.iloc[i]),
            int(pdf["event_id"].iloc[i]),
            str(pdf["event_type"].iloc[i]),
            float(pdf["value"].iloc[i]),
        )
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    return best


def _emit_row(key, best) -> pd.DataFrame:
    return pd.DataFrame(
        [{
            "user_id": key[0],
            "ts_micros": best[0],
            "event_id": best[1],
            "event_type": best[2],
            "value": best[3],
        }]
    )


def _update_latest(key, pdf_iter, state: GroupState):
    """Fold this batch's rows for one key into the stored winner; emit the
    new state iff it changed."""
    prior = tuple(state.get) if state.exists else None
    best = _fold_winner(prior, pdf_iter)
    if best is not None and best != prior:
        state.update(best)
        yield _emit_row(key, best)


def running_latest(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """(key, ts_micros, event_id, event_type, value): the per-key current
    state, emitted on change. Works on a streaming DataFrame; the batch
    equivalent is operators/cdc.latest_view (tests assert they agree)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_latest,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor as _StatefulProcessor,
)


class LatestStateProcessor(_StatefulProcessor):
    """``StatefulProcessor`` twin of :func:`running_latest` on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-46815): named state variables on a
    handle, native state TTL, and timer support. Semantics are identical
    to ``_update_latest`` (winner by (ts, event_id), emit on change);
    ``ttl_ms`` additionally expires idle keys' state — the retention
    story a multi-tenant 100 TB state store needs, for free from the
    runtime instead of hand-rolled timeout bookkeeping.

    ENVIRONMENT GATE: the transformWithState runtime needs the
    ``protobuf`` Python package (its driver worker speaks a protobuf
    state protocol, pyspark's ``StateMessage_pb2``), which this
    container lacks — so the pytest coverage for this operator SKIPS
    here (``tests/test_streaming_state.py`` asserts the skip reason is
    exactly that missing import, nothing else). On a protobuf-equipped
    Spark 4 deployment the gated tests run (and gate) it for real; in
    this container the operator is therefore NOT verified end-to-end —
    the ``applyInPandasWithState`` twin above is the verified path for
    the same semantics, and this class shares its fold logic."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState("latest", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(self, key, rows, timerValues):
        prior = tuple(self._state.get()) if self._state.exists() else None
        best = _fold_winner(prior, rows)
        if best is not None and best != prior:
            self._state.update(best)
            yield _emit_row(key, best)

    def close(self) -> None:
        pass


def running_latest_tws(
    events: DataFrame, key_col: str = "user_id", ttl_ms: int | None = None
) -> DataFrame:
    """:func:`running_latest` on the transformWithStateInPandas API.
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``), which is also
    the right provider at scale: state lives off-heap per executor with
    incremental checkpointing to the checkpoint location."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=LatestStateProcessor(ttl_ms),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
