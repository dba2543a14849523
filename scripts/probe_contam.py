#!/usr/bin/env python
"""Stage-wise decomposition of contamination_check at a given SF dir:
time (1) the exploded+hashed pair build, (2) + repartition+distinct,
(3) + the two windows, (4) the full query — each via the noop sink
(guide §1.4), twice, medians. Usage:
SPARK_GRAFT_SF_DIR=... python scripts/probe_contam.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pyairbyte_spark import get_spark
    from pyairbyte_spark.operators import text
    from pyairbyte_spark.queries import contamination_check, t

    spark = get_spark(
        "probe-contam", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    sh = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("bigint")
    pairs = docs.select(
        "doc_id", F.explode(text.ngrams_expr("text", 5)).alias("s")
    ).select("doc_id", sh.alias("sh"))
    dist = pairs.repartition("sh").distinct()
    w = W.partitionBy("sh")
    wind = (
        dist.withColumn("__df", F.count(F.lit(1)).over(w))
        .withColumn(
            "__bench", F.max((F.col("doc_id") % 50 == 0).cast("int")).over(w)
        )
        .filter(F.col("__df") <= F.lit(100))
    )

    stages = {
        "1 pairs(explode+hash)": lambda: noop(pairs),
        "2 +repart+distinct": lambda: noop(dist),
        "3 +windows+filter": lambda: noop(wind),
        "4 full query": lambda: noop(contamination_check(spark, SF_DIR)),
    }
    for label, fn in stages.items():
        xs = []
        for _ in range(2):
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(label)
            fn()
            xs.append(time.monotonic() - t0)
        print(f"{label:24s} {' '.join(f'{x:.2f}' for x in xs)}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
