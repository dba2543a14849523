"""Plan auditing: inspect and assert on Catalyst physical plans.

The scale posture (SCALE.md) depends on plan properties — pushdown,
pruning, broadcast choices, shuffle counts — that a refactor can
silently regress. These helpers make those properties checkable in
code; `tests/test_plans.py` uses them as regression gates, and they
work interactively for tuning:

    from pyairbyte_spark import plans
    plans.explain_str(df)                # full formatted plan
    plans.shuffle_count(df)              # number of Exchange nodes
    plans.pushed_filters(df)             # filters that reached the scan
    plans.scan_columns(df)               # columns each scan reads
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print."""
    jdf = getattr(df, "_jdf", None)
    if jdf is None:  # pragma: no cover - Spark Connect
        raise NotImplementedError("plan inspection requires classic PySpark")
    sc = df.sparkSession._sc
    return sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    return explain_str(df, "simple").count("Exchange")


def pushed_filters(df: DataFrame) -> list[str]:
    """Per-scan pushed-filter lists, one string per file scan."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
    ]


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan read-schema column names — what each scan actually
    reads off disk (column pruning evidence)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", explain_str(df)):
        body = m.group(1)
        out.append([p.split(":")[0].strip() for p in body.split(",") if ":" in p])
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def uses_take_ordered(df: DataFrame) -> bool:
    """True when top-k compiles to TakeOrderedAndProject (per-partition
    heap + driver merge) instead of a global sort."""
    return "TakeOrderedAndProject" in explain_str(df, "simple")
