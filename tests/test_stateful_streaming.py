"""applyInPandasWithState sessionization: state merges across
micro-batches (separate AvailableNow runs sharing a checkpoint) and
sessions close exactly once on gap violations."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from data_pipeline_foundations_spark.streaming.stateful import (
    _merge_sessions, sessionize_stream,
)

T0 = dt.datetime(2025, 6, 1, 10, 0, 0)
SCHEMA = "event_id long, ts timestamp, user_id long"


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _run(spark, events_dir, out_dir, ckpt):
    stream = (spark.readStream.schema(SCHEMA).format("parquet").load(events_dir))
    q = (sessionize_stream(stream)
         .writeStream.outputMode("append")
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:  # no output committed yet
        return []


def test_merge_sessions_unit():
    us = 1_000_000
    mins = lambda m: m * 60 * us  # noqa: E731
    closed, cur = _merge_sessions(
        [mins(0), mins(5), mins(90), mins(95)], gap_us=mins(30), prior=None)
    assert closed == [(mins(0), mins(5), 2)]
    assert cur == (mins(90), mins(95), 2)
    # prior state merges when within gap
    closed, cur = _merge_sessions([mins(20)], gap_us=mins(30),
                                  prior=(mins(0), mins(5), 2))
    assert closed == [] and cur == (mins(0), mins(20), 3)


def test_sessionize_across_microbatches(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, name):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
        spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1) \
            .write.mode("append").parquet(events_dir)

    # batch 1: user 1 two events 5min apart; user 2 one event
    write_batch([(1, _mins(0), 1), (2, _mins(5), 1), (3, _mins(2), 2)], "b1")
    out1 = _run(spark, events_dir, str(tmp_path / "out"), ckpt)
    assert out1 == []  # nothing closed yet — sessions still open in state

    # batch 2: user 1 event 120min later → gap > 30 closes user 1's first
    # session on data arrival. User 2's event at 12min MERGES with state
    # (proving state survived the restart), and then the event-time
    # timeout fires within the same AvailableNow run: the watermark
    # advanced to 120min, past user 2's 12+30min gap, so no earlier event
    # can still arrive and the merged session correctly closes too.
    write_batch([(4, _mins(120), 1), (5, _mins(12), 2)], "b2")
    out2 = {(r.user_id, r.session_start): r for r in
            _run(spark, events_dir, str(tmp_path / "out"), ckpt)}
    assert set(out2) == {(1, _mins(0)), (2, _mins(2))}
    closed = out2[(1, _mins(0))]
    assert closed.session_end == _mins(5) and closed.n_events == 2
    u2 = out2[(2, _mins(2))]
    assert u2.session_end == _mins(12) and u2.n_events == 2  # merged 2+12

    # batch 3: far-future events advance the watermark → user 1's open
    # 120min session times out and closes; the new 400min sessions stay
    # open in state.
    write_batch([(6, _mins(400), 1), (7, _mins(400), 2)], "b3")
    out3 = {(r.user_id, r.session_start): r for r in
            _run(spark, events_dir, str(tmp_path / "out"), ckpt)}
    u1b = out3[(1, _mins(120))]
    assert u1b.session_end == _mins(120) and u1b.n_events == 1
    assert (1, _mins(400)) not in out3 and (2, _mins(400)) not in out3
    # exactly-once: the batch-1 session appears once across all outputs
    assert len([k for k in out3 if k == (1, _mins(0))]) == 1
