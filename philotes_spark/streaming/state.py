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


def _update_latest(key, pdf_iter, state: GroupState):
    """Fold this batch's rows for one key into the stored winner; emit the
    new state iff it changed."""
    best = state.get if state.exists else None  # (ts_micros, id, type, value)
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        # vectorized winner within the Arrow batch: max by (ts, event_id)
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
    changed = best is not None and (not state.exists or tuple(state.get) != best)
    if changed:
        state.update(best)
        yield pd.DataFrame(
            [{
                "user_id": key[0],
                "ts_micros": best[0],
                "event_id": best[1],
                "event_type": best[2],
                "value": best[3],
            }]
        )


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
