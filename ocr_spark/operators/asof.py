"""As-of (time-travel) join: for each left row, the latest right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN; the scalable spelling is the union-window
trick: tag both sides, union on (key, ts), and carry the latest right ROW
forward with ``last(snapshot_struct, ignorenulls=True)`` over an unbounded
preceding window — one shuffle on the key, no range self-join blowup, and
AQE-safe. This is the standard feature-store / point-in-time-correctness
join for training-data assembly (label at time t joined to the latest
feature snapshot ≤ t, never a future one — leakage-free by construction).

Semantics pinned to ASOF JOIN proper (and verified against DuckDB's
native implementation by the ``events_asof`` oracle):

* the whole matched right row is carried as ONE struct — NULL fields in
  the latest snapshot stay NULL (a per-column carry would stitch values
  from different rows and resurrect stale non-NULLs);
* right rows with NULL timestamps can never match (filtered up front —
  Spark's nulls-first sort would otherwise leak them into every frame);
* ties among right rows at identical (key, ts) break deterministically on
  the value columns.

Cost model: sort within key partitions of |L|+|R| rows — same order as the
window sessionization; skew bounded by the hottest key, cap upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + the latest right ``value_cols`` at-or-before left_ts
    (as ``asof_<col>``). Left rows with no prior right row get NULLs; a
    right row exactly simultaneous with a left row IS visible to it.
    """
    # collision-safe internal names
    ts_c, side_c, snap_c = "__asof_ts__", "__asof_side__", "__asof_snap__"
    while any(
        n in left.columns or n in right.columns
        for n in (ts_c, side_c, snap_c)
    ):
        ts_c += "_"
        side_c += "_"
        snap_c += "_"

    rt = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).cast("timestamp").alias(ts_c),
        F.lit(0).alias(side_c),
        F.struct(*[F.col(c) for c in value_cols]).alias(snap_c),
    )
    snap_type = rt.schema[snap_c].dataType
    lt = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias(ts_c),
        F.lit(1).alias(side_c),
        F.lit(None).cast(snap_type).alias(snap_c),
    )
    rt_aligned = rt.select(
        *[
            F.col(f.name)
            if f.name in (key, ts_c, side_c, snap_c)
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in lt.schema.fields
        ]
    )
    both = lt.unionByName(rt_aligned)
    # right rows sort BEFORE left rows at identical timestamps (side 0<1)
    # so an exactly-simultaneous snapshot is visible; ties among right
    # rows break deterministically on the snapshot fields
    w = (
        Window.partitionBy(key)
        .orderBy(
            ts_c, side_c, *[F.col(snap_c)[c] for c in value_cols]
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        snap_c, F.last(snap_c, ignorenulls=True).over(w)
    )
    out = carried.filter(F.col(side_c) == 1)
    return out.select(
        *left.columns,
        *[F.col(snap_c)[c].alias(f"asof_{c}") for c in value_cols],
    )
