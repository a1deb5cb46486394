"""Streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator path: per-user session state (start, last ts,
count) carried across micro-batches, sessions emitted on gap timeout. The
streaming twin of ``operators/sessions.sessionize``; the batch form is the
correctness oracle in tests (same gap rule ⇒ same closed sessions).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
_STATE_SCHEMA = "start long, last long, n long"

GAP_SECONDS = 30 * 60


def _update(key, pdfs, state: GroupState):
    """Fold new events into the open session; emit sessions closed by gap."""
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            rows.append((user_id, start, last, n))
            state.remove()
    else:
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
        ts_all.sort()
        if not ts_all:
            yield pd.DataFrame(columns=["user_id", "session_start", "session_end", "n_events"])
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_all[0], ts_all[0], 0
        for t in ts_all:
            if t - last > GAP_SECONDS:
                rows.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(GAP_SECONDS * 1000)
    out = pd.DataFrame(
        rows, columns=["user_id", "session_start", "session_end", "n_events"]
    )
    if not out.empty:
        out["session_start"] = out["session_start"].map(
            lambda s: dt.datetime.utcfromtimestamp(s)
        )
        out["session_end"] = out["session_end"].map(lambda s: dt.datetime.utcfromtimestamp(s))
    yield out


def session_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
