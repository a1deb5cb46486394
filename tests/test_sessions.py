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
