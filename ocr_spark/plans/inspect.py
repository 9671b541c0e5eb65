"""Physical-plan inspection helpers.

The performance discipline of this engine is enforced, not hoped for:
tests assert that scans carry pushed filters and pruned schemas, that
stages stay inside whole-stage codegen, that small dimensions broadcast,
and that a pipeline has exactly the number of exchanges its design calls
for. The reference hand-rolls the equivalents (slice-before-compute,
threshold-before-geometry — ``/root/reference/DetectUtil.py:155-172``,
``:19-20``); here Catalyst does the work and these helpers keep it honest.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE-planned
    exchanges included; broadcast exchanges excluded)."""
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hash|range|RoundRobin)", text)) + len(
        re.findall(r"Exchange SinglePartition", text)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple") or (
        "BroadcastNestedLoopJoin" in explain_str(df, "simple")
    )


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Count of whole-stage codegen spans in the plan (the ``*(n)``
    operator prefixes of the simple explain)."""
    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df, "simple"))))
