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
