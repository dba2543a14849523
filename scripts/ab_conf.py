#!/usr/bin/env python
"""Within-one-session interleaved A/B of a runtime SQL conf across
queries. Usage:
python scripts/ab_conf.py <conf=key:val[,key:val]> <rounds> q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    spec = sys.argv[1]
    rounds = int(sys.argv[2])
    names = sys.argv[3:]
    confs = dict(kv.split(":", 1) for kv in spec.split(","))
    spark = get_spark(
        "ab-conf", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = q.queries()
    defaults = {k: spark.conf.get(k) for k in confs}
    for name in names:
        fn = reg[name]
        samples = {"OLD": [], "NEW": []}
        for r in range(rounds):
            arms = ["OLD", "NEW"] if r % 2 == 0 else ["NEW", "OLD"]
            for arm in arms:
                for k, v in (confs if arm == "NEW" else defaults).items():
                    spark.conf.set(k, v)
                t0 = time.monotonic()
                fn(spark, SF_DIR).count()
                samples[arm].append(time.monotonic() - t0)
        for k, v in defaults.items():
            spark.conf.set(k, v)
        o, n = samples["OLD"], samples["NEW"]
        print(
            f"{name:42s} OLD med {statistics.median(o):6.2f} "
            f"NEW med {statistics.median(n):6.2f}   "
            f"old({' '.join(f'{x:.2f}' for x in sorted(o))}) "
            f"new({' '.join(f'{x:.2f}' for x in sorted(n))})"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
