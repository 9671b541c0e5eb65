"""As-of (time-travel) join: for each left row, the latest right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN; the scalable spelling is the union-window
trick: tag both sides, union on (key, ts), and carry the right side's
values forward with ``last(..., ignorenulls=True)`` over an unbounded
preceding window — one shuffle on the key, no range self-join blowup, and
AQE-safe. This is the standard feature-store / point-in-time-correctness
join for training-data assembly (label at time t joined to the latest
feature snapshot ≤ t, never a future one — leakage-free by construction).

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
    """Left rows + the latest right ``value_cols`` at-or-before left_ts.

    Right rows with no subsequent left row contribute nothing; left rows
    with no prior right row get NULL values (standard ASOF semantics).
    """
    lt = left.withColumn("_ts", F.col(left_ts).cast("timestamp")).withColumn(
        "_side", F.lit(1)
    )
    rt = (
        right.select(
            key,
            F.col(right_ts).cast("timestamp").alias("_ts"),
            *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    # union with aligned schemas: left carries NULL feature slots
    for c in value_cols:
        lt = lt.withColumn(f"_v_{c}", F.lit(None).cast(rt.schema[f"_v_{c}"].dataType))
    rt_full = rt
    for f in lt.schema.fields:
        if f.name not in set(rt.columns):
            rt_full = rt_full.withColumn(f.name, F.lit(None).cast(f.dataType))
    both = lt.unionByName(rt_full.select(*lt.columns))
    # right rows sort BEFORE left rows at identical timestamps (_side 0<1),
    # so an exactly-simultaneous snapshot is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
