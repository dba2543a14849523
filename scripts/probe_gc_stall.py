#!/usr/bin/env python
"""Correlate the intermittent multi-second stall with driver JVM GC:
run one query N times, record wall + delta GC time/count per run.
Usage: python scripts/probe_gc_stall.py <query> [n]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def gc_totals(jvm):
    ms = 0
    n = 0
    for b in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans():
        ms += b.getCollectionTime()
        n += b.getCollectionCount()
    return ms, n


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(
        "probe-gc", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    jvm = spark.sparkContext._jvm
    fn = q.queries()[name]
    for i in range(n):
        g0, c0 = gc_totals(jvm)
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        wall = time.monotonic() - t0
        g1, c1 = gc_totals(jvm)
        print(
            f"run {i}: wall {wall:6.2f}s  gc +{(g1 - g0) / 1000:5.2f}s "
            f"({c1 - c0} collections)"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
