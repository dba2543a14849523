#!/usr/bin/env python
"""Within-one-session interleaved A/B of run_concurrently (overlap
on/off), bench methodology (count after build). Usage:
python scripts/ab_overlap.py <query> [rounds]"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import writers
    from pyairbyte_spark import queries as q

    name = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        "ab-overlap", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = q.queries()[name]

    real = writers.run_concurrently

    def seq(*thunks):
        return [t() for t in thunks]

    samples = {"seq": [], "overlap": []}
    for r in range(rounds):
        order = ["seq", "overlap"] if r % 2 == 0 else ["overlap", "seq"]
        for arm in order:
            writers.run_concurrently = seq if arm == "seq" else real
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            samples[arm].append(time.monotonic() - t0)
    writers.run_concurrently = real
    for arm, xs in samples.items():
        print(
            f"{name} {arm}: med {statistics.median(xs):.2f}s "
            f"samples {' '.join(f'{x:.2f}' for x in sorted(xs))}"
        )


if __name__ == "__main__":
    main()
