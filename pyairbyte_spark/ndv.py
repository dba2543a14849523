"""ANALYZE-style NDV (approximate distinct) statistics for store tables.

Warehouse CBOs want per-column distinct counts without scanning; Delta
and Iceberg carry no NDV either (Databricks ANALYZE computes them out
of band). This module does the same for ``CommitLogTableStore``
tables, deliberately OUTSIDE the commit-critical path: a stats sidecar
(``<table>._ndv.json``) holding HLL registers per column plus the
snapshot version they describe.

- :func:`analyze_ndv` — ONE scan computes registers for every
  requested column (columns stack into (col, value) rows pre-shuffle,
  so the pass is a single keyed aggregation regardless of column
  count), persisted with the version watermark.
- :func:`approx_distinct` — serves estimates from the sidecar,
  catching up first: if every commit since the watermark is
  row-preserving-or-append (``append``/``compact``/``set_check``),
  the change feed folds in by register max (never rescans the base
  table — ``operators/sketches.py`` maintenance); any DML/schema op
  forces a re-analyze (registers are max-monotone, deletes cannot
  lower them).

Estimates are produced by the SAME Spark expressions as
``hll_estimate`` (a 256-row local frame), so an estimate served from
maintained stats is bit-identical to a from-scratch sketch — which is
what lets ``store_ndv_stats_events`` sit under the DuckDB oracle gate.

NULLs are excluded (SQL COUNT(DISTINCT) semantics).

Reference analog: none — the reference's ``Dataset.count`` is an
exact ``SELECT count(*)`` per call (``airbyte/datasets/_sql.py``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyairbyte_spark.operators.sketches import (
    hll_estimate,
    hll_params,
    hll_registers,
)

# Ops that cannot change the multiset of (column, value) pairs other
# than by inserting rows: append adds rows (register-monotone),
# compact rewrites files row-preserving (the change feed skips it),
# set_check is metadata-only.
_ROW_MONOTONE_OPS = {
    "append", "compact", "set_check", "repair_metadata", "set_bloom_index",
}


def _stats_path(store, table_name: str) -> str:
    return store.table_path(table_name) + "._ndv.json"


def _stack_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col, value-as-string) rows; one scan covers every column."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("__col"),
                            F.col(c).cast("string").alias("__val"),
                        )
                        for c in columns
                    ]
                )
            ).alias("cv")
        )
        .select(F.col("cv.__col").alias("__col"), F.col("cv.__val").alias("__val"))
        .filter(F.col("__val").isNotNull())
    )


def _collect_registers(regs: DataFrame) -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    for r in regs.collect():
        out.setdefault(r["__col"], {})[str(r["__hll_bucket"])] = r["__hll_m"]
    return out


def analyze_ndv(
    store, table_name: str, columns: list[str], *, p: int = 8
) -> dict:
    """Compute + persist NDV registers for ``columns`` at the latest
    snapshot. Returns the stats document."""
    hll_params(p)
    version = store.latest_version(table_name)
    snap = store.read_version(table_name, version)
    regs = hll_registers(
        _stack_columns(snap, columns),
        group_cols=["__col"],
        value="__val",
        p=p,
    )
    doc = {
        "version": version,
        "p": p,
        "columns": _collect_registers(regs),
    }
    # Ensure every requested column appears, even if all-NULL/empty.
    for c in columns:
        doc["columns"].setdefault(c, {})
    store.io.write_text(_stats_path(store, table_name), json.dumps(doc))
    return doc


def _ops_between(store, table_name: str, from_v: int, to_v: int) -> set:
    """Operation kinds of commits [from_v, to_v] — reads ONLY those
    commit JSONs (op is a top-level field, no manifest resolution).
    ``history()`` would list and read every commit ever written, an
    O(total commits) cost per serve on a long-lived table."""
    import os as _os

    d = store._commits_dir(table_name)
    ops: set = set()
    for v in range(from_v, to_v + 1):
        raw = store.io.read_text(_os.path.join(d, f"{v:020d}.json"))
        ops.add(json.loads(raw).get("op"))
    return ops


def _load(store, table_name: str) -> dict | None:
    try:
        return json.loads(store.io.read_text(_stats_path(store, table_name)))
    except FileNotFoundError:
        return None
    except Exception:
        return None


def approx_distinct(
    spark: SparkSession, store, table_name: str, *, p: int = 8
) -> dict[str, int]:
    """Per-column approximate distinct counts from maintained stats.

    Catches the sidecar up to the latest version first (incremental
    for row-monotone histories, re-analyze otherwise), persists the
    refreshed registers, then estimates — with the same Spark
    expressions as a from-scratch sketch, so the result is
    bit-identical to one."""
    stats = _load(store, table_name)
    if stats is None:
        raise ValueError(
            f"no NDV stats for {table_name!r}: run analyze_ndv() first"
        )
    if stats.get("p") != p:
        raise ValueError(f"stats were analyzed with p={stats.get('p')}")
    columns = sorted(stats["columns"])
    latest = store.latest_version(table_name)
    if latest > stats["version"]:
        try:
            since = _ops_between(
                store, table_name, stats["version"] + 1, latest
            )
            incremental = since <= _ROW_MONOTONE_OPS
            if incremental:
                feed = store.read_changes(
                    table_name, stats["version"], latest
                )
                delta = hll_registers(
                    _stack_columns(feed, columns),
                    group_cols=["__col"],
                    value="__val",
                    p=p,
                )
                merged = dict(stats["columns"])
                for col, buckets in _collect_registers(delta).items():
                    cur = dict(merged.get(col, {}))
                    for b, m in buckets.items():
                        if m > cur.get(b, 0):
                            cur[b] = m
                    merged[col] = cur
                stats = {"version": latest, "p": p, "columns": merged}
        except OSError:
            # Vacuum may have reclaimed commits (or their data files)
            # inside the catch-up window — the change feed needs every
            # version since the watermark. The safe fallback is a full
            # re-analyze of the current snapshot — stale stats never
            # error out.
            incremental = False
        except Exception as e:  # missing data files surface from Spark
            if type(e).__name__ not in (
                "AnalysisException",
                "SparkFileNotFoundException",
            ):
                raise
            incremental = False
        if not incremental:
            stats = analyze_ndv(store, table_name, columns, p=p)
        store.io.write_text(
            _stats_path(store, table_name), json.dumps(stats)
        )
    rows = [
        (col, int(b), int(m))
        for col, buckets in stats["columns"].items()
        for b, m in buckets.items()
    ]
    if not rows:
        return {c: 0 for c in columns}
    regs = spark.createDataFrame(
        rows, "__col string, __hll_bucket long, __hll_m int"
    )
    est = hll_estimate(regs, group_cols=["__col"], p=p)
    out = {r["__col"]: r["approx_distinct"] for r in est.collect()}
    for c in columns:
        out.setdefault(c, 0)
    return out
