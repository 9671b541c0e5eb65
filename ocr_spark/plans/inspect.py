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


def _tree_depth(line: str) -> int:
    """Position where a plan line's node text starts. Spark's tree render
    prefixes nodes with spaces plus ``+-`` connectors AND ``:`` / ``:-``
    branch-continuation marks (non-last join children), so leading-SPACE
    count alone does not grow with depth inside a ``:`` branch — the full
    connector-prefix length does (3 chars per level in both styles)."""
    return len(line) - len(line.lstrip(" :+-"))


def _strip_cached_subtrees(text: str) -> str:
    """Drop plan lines nested under an InMemoryRelation: the cached
    relation's STORED build plan (including its original exchanges) is
    printed inline, but the query reads the cache and executes none of it
    — counting those exchanges would make plan assertions depend on
    whether some other code cached a shared subtree."""
    out: list[str] = []
    skip_depth: int | None = None
    for line in text.splitlines():
        depth = _tree_depth(line)
        if skip_depth is not None:
            if line.strip() and depth > skip_depth:
                continue
            skip_depth = None
        if "InMemoryRelation" in line:
            skip_depth = depth
            continue
        out.append(line)
    return "\n".join(out)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges the query would EXECUTE (AQE-planned
    exchanges included; broadcast exchanges excluded; exchanges inside
    cached InMemoryRelation build plans excluded)."""
    text = _strip_cached_subtrees(explain_str(df, "simple"))
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
