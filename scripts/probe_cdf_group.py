#!/usr/bin/env python
"""A/B probe: grouped-append CDF steps vs the per-commit path.

Builds a 20-append window and times read_changes + a consuming
aggregation with the grouping enabled (NEW) and disabled (OLD),
alternating within ONE Spark session. Reports plan-build seconds,
execution seconds, Spark-job counts and the number of FileScan
relations in the executed plan (the O(commits) → O(1) claim).

Run: python scripts/probe_cdf_group.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import functions as F

    from pyairbyte_spark import get_spark
    from pyairbyte_spark.writers import CommitLogTableStore

    spark = get_spark(
        "cdf-group-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    store = CommitLogTableStore(spark, tempfile.mkdtemp(prefix="cdfg-"), "q")
    for i in range(20):
        store.write_append(
            spark.range(i * 1000, (i + 1) * 1000).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).alias("g"),
                (F.col("id") * 2).cast("long").alias("val"),
            ),
            "ev",
        )

    def run(disable: bool, label: str) -> None:
        orig = CommitLogTableStore._cdf_groupable_append
        if disable:
            CommitLogTableStore._cdf_groupable_append = (
                lambda self, t, v: None
            )
        try:
            sc.setJobGroup(label, label)
            t0 = time.monotonic()
            df = store.read_changes("ev", 0, include_preimages=True)
            agg = df.groupBy("g").agg(
                F.sum("val"), F.count("*"), F.max("_commit_version")
            )
            t1 = time.monotonic()
            agg.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            jobs = len(sc.statusTracker().getJobIdsForGroup(label))
            scans = (
                df._jdf.queryExecution().executedPlan().toString()
            ).count("FileScan")
            print(
                f"{label}: plan-build {t1 - t0:.2f}s exec {t2 - t1:.2f}s "
                f"jobs {jobs} scanRelations {scans}"
            )
            sys.stdout.flush()
        finally:
            sc.setJobGroup(None, None)
            if disable:
                CommitLogTableStore._cdf_groupable_append = orig

    for rnd in range(3):
        run(True, f"old{rnd}")
        run(False, f"new{rnd}")
    spark.stop()


if __name__ == "__main__":
    main()
