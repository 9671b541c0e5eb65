"""as-of join: hand-verified semantics incl. the no-prior-row NULL case
and simultaneous-timestamp visibility."""

from __future__ import annotations

import datetime

from ocr_spark.operators.asof import asof_join


def test_asof_hand_case(spark):
    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    snapshots = spark.createDataFrame(
        [(7, t(0), 1.0), (7, t(30), 2.0), (9, t(10), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    marks = spark.createDataFrame(
        [
            (7, t(0)),   # exactly simultaneous → snapshot visible
            (7, t(15)),  # between snapshots → 1.0
            (7, t(45)),  # after the second → 2.0
            (9, t(5)),   # BEFORE user 9's first snapshot → NULL
            (8, t(20)),  # user with no snapshots at all → NULL
        ],
        "user_id long, mark timestamp",
    )
    out = asof_join(
        marks, snapshots, key="user_id", left_ts="mark", right_ts="ts",
        value_cols=["value"],
    )
    got = {(r.user_id, r.mark.minute): r.asof_value for r in out.collect()}
    assert got == {
        (7, 0): 1.0,
        (7, 15): 1.0,
        (7, 45): 2.0,
        (9, 5): None,
        (8, 20): None,
    }
    assert out.count() == marks.count()  # left-join cardinality preserved


def test_asof_null_semantics(spark):
    """NULL right timestamps never match; a NULL field in the LATEST
    snapshot stays NULL (row-level carry, not per-column)."""
    import datetime

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    snapshots = spark.createDataFrame(
        [
            (9, None, 99.0, 99.0),          # NULL ts: must never match
            (7, t(0), 1.0, None),           # a=1.0, b=NULL
            (7, t(10), None, 2.0),          # a=NULL, b=2.0  <- latest
        ],
        "user_id long, ts timestamp, a double, b double",
    )
    marks = spark.createDataFrame(
        [(7, t(20)), (9, t(20))], "user_id long, mark timestamp"
    )
    out = asof_join(
        marks, snapshots, key="user_id", left_ts="mark", right_ts="ts",
        value_cols=["a", "b"],
    )
    got = {r.user_id: (r.asof_a, r.asof_b) for r in out.collect()}
    # user 7: the matched 12:10 row verbatim — (NULL, 2.0), NOT (1.0, 2.0)
    assert got[7] == (None, 2.0)
    # user 9: only a NULL-ts snapshot exists — no match
    assert got[9] == (None, None)
