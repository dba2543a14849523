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
    """The plan string ``df.explain(mode)`` would print.

    Classic PySpark goes straight to the JVM query execution (no
    stdout involved). Under Spark Connect there is no ``_jdf`` — the
    plan text comes from the server via ``df.explain()``, which only
    PRINTS; the fallback captures that output so every plan gate in
    ``tests/test_plans.py`` runs in both modes."""
    jdf = getattr(df, "_jdf", None)
    if jdf is None:  # Spark Connect: capture the printed explain
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()
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


def _balanced_args(text: str, start: int) -> list[str]:
    """Split the top-level comma-separated args of the paren group
    opening at ``text[start] == '('``."""
    depth, args, buf = 0, [], []
    for ch in text[start:]:
        if ch == "(":
            depth += 1
            if depth == 1:
                continue
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        if depth >= 1:
            if ch == "," and depth == 1:
                args.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
    if buf:
        args.append("".join(buf).strip())
    return args


def has_unpartitioned_window(df: DataFrame) -> bool:
    """True when any Window operator has an EMPTY partition spec —
    the 'WindowExec: No Partition Defined' shape that funnels the whole
    input through one task and dies at scale."""
    plan = explain_str(df, "extended")
    for m in re.finditer(r"windowspecdefinition\(", plan):
        args = _balanced_args(plan, m.end() - 1)
        if not args:
            return True
        first = args[0]
        # Partition expressions are plain; sort orders carry a direction
        # keyword, and the frame spec comes last. If the FIRST top-level
        # arg is already a sort order or the frame, nothing partitions.
        if re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)$", first) or first.startswith(
            "specifiedwindowframe"
        ):
            return True
    return False
