"""Gap sessionization: batch window form + applyInPandasWithState stream,
with the batch form as the streaming oracle (same gap rule)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from batch_doc_vqa_spark.operators import sessions
from batch_doc_vqa_spark.streaming.sessions_stream import session_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, "click", 1.0, "{}") for i, (u, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_sessionize_gap_rule(spark):
    rows = [
        (1, 0), (1, 60), (1, 120),          # session 1: 3 events
        (1, 120 + 1801),                     # gap > 30min → session 2
        (1, 120 + 1801 + 100),               # still session 2
        (2, 0),                              # user 2, one session
    ]
    s = sessions.session_stats(_ev(spark, rows))
    got = {(r["user_id"], r["session_idx"]): r["n_events"] for r in s.collect()}
    assert got == {(1, 1): 3, (1, 2): 2, (2, 1): 1}


def test_sessionize_exact_boundary_is_same_session(spark):
    rows = [(1, 0), (1, 1800)]  # gap == 1800s: NOT a break (rule is >)
    s = sessions.session_stats(_ev(spark, rows))
    assert s.count() == 1 and s.collect()[0]["n_events"] == 2


def test_streaming_sessions_match_batch(spark, tmp_path, sf_dir):
    src = str(tmp_path / "ev")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.write.parquet(src)

    q = (
        session_stream(spark, src)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sessions_out")
    batch = sessions.session_stats(events)

    # a single availableNow pass closes sessions whose gap elapsed *within*
    # the batch; open tail sessions stay in state — so emitted ⊆ batch
    assert 0 < got.count() <= batch.count()
    b = {
        (r["user_id"], int(r["session_start"].timestamp()), r["n_events"])
        for r in batch.collect()
    }
    for r in got.collect():
        key = (r["user_id"], int(r["session_start"].timestamp()), r["n_events"])
        assert key in b, f"streamed session {key} not found in batch sessions"


def test_streaming_late_event_merges_into_open_session(spark, tmp_path):
    """A late event (allowed by the watermark, older than the stored 'last')
    must merge into the open session instead of corrupting its state; the
    next far-future event closes the session with the late event counted."""
    src = str(tmp_path / "late_ev")
    ckpt = str(tmp_path / "late_ckpt")
    out_dir = str(tmp_path / "late_out")
    _ev(spark, [(1, 0), (1, 60)]).write.parquet(src)

    def drain():
        q = (
            session_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # batch 2: late event at t=30 (inside the open session's span) plus a
    # far-future event that breaks the gap and forces the emission
    spark.createDataFrame(
        [(100, T0 + dt.timedelta(seconds=30), 1, "click", 1.0, "{}"),
         (101, T0 + dt.timedelta(seconds=10000), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("append").parquet(src)
    drain()
    out = spark.read.parquet(out_dir).collect()
    closed = [r for r in out if r["n_events"] == 3]
    assert closed, f"expected the 3-event session (late merge), got {out}"
    r = closed[0]
    assert int(r["session_start"].timestamp() - T0.timestamp()) == 0
    assert int(r["session_end"].timestamp() - T0.timestamp()) == 60


def test_update_fold_too_old_events_emit_immediately():
    """Unit test of the stateful fold: events older than start-GAP can never
    join the open session — they fold into their own sessions and emit now;
    'last' never moves backwards."""
    import pandas as pd

    from batch_doc_vqa_spark.streaming import sessions_stream as ss

    class StubState:
        hasTimedOut = False

        def __init__(self, state):
            self._s = state
            self.updated = None

        @property
        def exists(self):
            return self._s is not None

        @property
        def get(self):
            return self._s

        def update(self, v):
            self.updated = v

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    t0 = int(T0.timestamp())
    # open session state: start=t0+100000, last=t0+100060, n=2
    st = StubState((t0 + 100000, t0 + 100060, 2))
    late = pd.DataFrame({"ts": [T0 + dt.timedelta(seconds=10), T0 + dt.timedelta(seconds=20),
                                T0 + dt.timedelta(seconds=5000)]})
    out = pd.concat(list(ss._update((1,), iter([late]), st)))
    # two too-old sessions emitted: (10,20) folded together, (5000) alone
    emitted = {(int(r.session_start.timestamp()) - t0, int(r.session_end.timestamp()) - t0, r.n_events)
               for r in out.itertuples()}
    assert emitted == {(10, 20, 2), (5000, 5000, 1)}
    # open session untouched, last not moved backwards
    assert st.updated == (t0 + 100000, t0 + 100060, 2)
