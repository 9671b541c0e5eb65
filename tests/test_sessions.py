"""Sessionization: batch window semantics + streaming-stateful parity."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from ocr_spark.operators.sessions import sessionize, sessionize_stream

SF = "/root/testdata/sf0.001"


def test_batch_sessionize_hand_case(spark):
    base = datetime.datetime(2024, 1, 1)
    mk = lambda m, eid, uid, v: (eid, base + datetime.timedelta(minutes=m), uid, "x", v, "")
    rows = [
        mk(0, 1, 7, 1.0), mk(10, 2, 7, 2.0),   # session 1 (gap 10m)
        mk(50, 3, 7, 4.0),                      # session 2 (gap 40m > 30m)
        mk(55, 4, 7, 8.0),
        mk(0, 5, 9, 1.5),                       # other user: own session
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r.user_id, r.session_no): (r.n_events, r.sum_value)
        for r in sessionize(events).collect()
    }
    assert got == {(7, 1): (2, 3.0), (7, 2): (2, 12.0), (9, 1): (1, 1.5)}


def test_streaming_sessions_match_batch(spark, tmp_path):
    inp = str(tmp_path / "ev")
    out = str(tmp_path / "sess")
    ckpt = str(tmp_path / "ckpt")
    events = spark.read.parquet(f"{SF}/events.parquet")
    events.write.parquet(inp)

    q = sessionize_stream(spark, inp, out, ckpt)
    q.awaitTermination(600)
    got = spark.read.parquet(out)
    assert got.count() > 0

    batch = sessionize(events)
    # the stream's watermark keeps trailing (possibly-open) sessions in
    # state; every EMITTED session must match the batch result exactly
    exact = got.join(
        batch,
        ["user_id", "session_no", "n_events", "session_start", "session_end",
         "sum_value"],
    )
    assert exact.count() == got.count()


def test_streaming_late_event_merges_into_open_session(spark, tmp_path):
    """A late event (earlier ts, later micro-batch, within gap of the open
    session window) must MERGE into the session, not split it."""
    import datetime

    from ocr_spark.operators.sessions import sessionize_stream

    inp = str(tmp_path / "ev")
    out = str(tmp_path / "sess")
    ckpt = str(tmp_path / "ckpt")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def mk(minutes, eid, v):
        return (eid, base + datetime.timedelta(minutes=minutes), 7, "x", v, "")

    # batch 1: events at 12:00 and 12:10 (new files land in the SAME dir —
    # the file stream source does not recurse into nested subdirs)
    spark.createDataFrame([mk(0, 1, 1.0), mk(10, 2, 2.0)], schema).write.mode(
        "append"
    ).parquet(inp)
    q = sessionize_stream(spark, inp, out, ckpt)
    q.awaitTermination(300)

    # batch 2: a LATE event at 11:55 (within gap of session start 12:00)
    # plus a far-future event at 14:00 that closes the session via gap
    spark.createDataFrame([mk(-5, 3, 4.0), mk(120, 4, 8.0)], schema).write.mode(
        "append"
    ).parquet(inp)
    q = sessionize_stream(spark, inp, out, ckpt)
    q.awaitTermination(300)

    rows = {
        r.session_no: (r.n_events, r.sum_value, r.session_start, r.session_end)
        for r in spark.read.parquet(out).collect()
    }
    # session 1 emitted closed: all three early events merged, start moved
    # back to 11:55
    assert rows[1][0] == 3 and rows[1][1] == 7.0
    assert rows[1][2] == base - datetime.timedelta(minutes=5)
    assert rows[1][3] == base + datetime.timedelta(minutes=10)
