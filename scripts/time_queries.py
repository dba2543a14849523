#!/usr/bin/env python
"""Bench-methodology timing for a subset of queries: 3 runs, median.

Same timed action as bench.py (df.count() after building the frame),
same warmup. Usage: python scripts/time_queries.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    names = sys.argv[1:]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(
        "pyairbyte-spark-time",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ["lineitem", "orders", "events", "documents", "embeddings"]:
        q.t(spark, SF_DIR, tbl).limit(1).collect()
    registry = q.queries()
    for name in names:
        fn = registry[name]
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            samples.append(time.monotonic() - t0)
        samples.sort()
        med = samples[len(samples) // 2]
        print(
            f"{name}: median {med:.2f}s  samples "
            + " ".join(f"{s:.2f}" for s in samples)
        )


if __name__ == "__main__":
    main()
