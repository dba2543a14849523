#!/usr/bin/env python
"""Trace every Spark ACTION (caller site + duration) one query runs.

Attribution for the lifecycle rows: which Python call sites launch the
50-odd jobs a sync lifecycle pays? Wraps the DataFrame action surface
(collect / count / first / parquet-write / localCheckpoint) and logs
the non-pyspark caller frame, wall time, and how many Spark jobs the
action launched (statusTracker delta).

Run: python scripts/job_trace.py <query_name>
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EVENTS: list[tuple[str, str, float, int]] = []
_SC = None


def _caller() -> str:
    for f in reversed(traceback.extract_stack()):
        fn = f.filename
        if (
            "/pyspark/" not in fn
            and "job_trace" not in fn
            and "py4j" not in fn
        ):
            return f"{fn.rsplit('/pyairbyte_spark/', 1)[-1].rsplit('/repo/', 1)[-1]}:{f.lineno}"
    return "?"


def _wrap(cls, meth):
    orig = getattr(cls, meth)

    def run(self, *a, **k):
        t0 = time.monotonic()
        before = len(_SC.statusTracker().getJobIdsForGroup("traced") or [])
        try:
            return orig(self, *a, **k)
        finally:
            after = len(_SC.statusTracker().getJobIdsForGroup("traced") or [])
            EVENTS.append(
                (meth, _caller(), time.monotonic() - t0, after - before)
            )

    setattr(cls, meth, run)


def main() -> None:
    global _SC
    name = sys.argv[1]
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    spark = get_spark(
        "job-trace", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    _SC = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ["lineitem", "orders", "events", "documents", "embeddings"]:
        q.t(spark, SF_DIR, tbl).limit(1).collect()

    for m in ["collect", "count", "first", "head", "localCheckpoint", "toPandas"]:
        if hasattr(DataFrame, m):
            _wrap(DataFrame, m)
    _wrap(DataFrameWriter, "parquet")
    _wrap(DataFrameWriter, "save")

    from pyairbyte_spark.writers import CommitLogTableStore as _S

    for sm in ["_stage", "_stage_local", "_stage_dv"]:
        orig = getattr(_S, sm)

        def mk(sm, orig):
            def run(self, df, table_name, *a, **k):
                t0 = time.monotonic()
                try:
                    return orig(self, df, table_name, *a, **k)
                finally:
                    EVENTS.append(
                        (f"{sm}:{table_name}", _caller(), time.monotonic() - t0, 0)
                    )
            return run

        setattr(_S, sm, mk(sm, orig))

    EVENTS.clear()
    sc = spark.sparkContext
    sc.setJobGroup("traced", name)
    fn = q.queries()[name]
    t0 = time.monotonic()
    n = fn(spark, SF_DIR).count()
    wall = time.monotonic() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup("traced"))
    print(f"{name}: wall {wall:.2f}s, {jobs} spark jobs, {n} rows")
    print(f"{'action':14s} {'jobs':>4} {'sec':>8}  caller")
    for meth, caller, dt, nj in EVENTS:
        print(f"{meth:14s} {nj:4d} {dt:8.3f}  {caller}")
    by: dict[str, tuple[float, int, int]] = {}
    for meth, caller, dt, nj in EVENTS:
        s, c, j = by.get(caller, (0.0, 0, 0))
        by[caller] = (s + dt, c + 1, j + nj)
    print("\nby caller:")
    for caller, (s, c, j) in sorted(by.items(), key=lambda kv: -kv[1][0]):
        print(f"  {s:8.3f}s  x{c:3d} {j:4d} jobs  {caller}")
    spark.stop()


if __name__ == "__main__":
    main()
