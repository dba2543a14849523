#!/usr/bin/env python
"""Branch-scale stress: what does a LONG-lived branch cost main?

The design claim (SCALE.md round 11): branch commits are dead space on
main's number line — main readers skip them with O(KB) header reads,
main writers slide past them with slot probes, and the publish (or any
main commit) landing above restores O(1) walks. This measures those
costs directly at N branch commits.

Run: python scripts/stress_branches.py [n_branch_commits]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.writers import CommitLogTableStore


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    spark = get_spark("branch-stress")
    store = CommitLogTableStore(spark, tempfile.mkdtemp("brstress"), "s")
    df = spark.range(0, 1000).toDF("id").withColumn(
        "v", F.col("id").cast("string")
    )
    store.write_append(df, "t", None)
    store.create_branch("t", "bulk")
    bv = store.branch("bulk")
    t0 = time.monotonic()
    for i in range(n):
        bv.write_append(
            spark.createDataFrame([(10_000 + i, "x")], "id long, v string"),
            "t",
            None,
        )
    print(f"{n} branch commits in {time.monotonic() - t0:.1f}s")

    # main reads while the branch tip towers above main's head: the
    # walk pays N header reads, never resolves a manifest it skips
    t0 = time.monotonic()
    for _ in range(20):
        store._man_cache.clear()
        assert store._latest_commit("t")[0] == 1
    per_read = (time.monotonic() - t0) / 20
    print(f"main head resolution under {n} branch commits: "
          f"{per_read * 1000:.1f} ms/read (cold cache)")

    # one main commit slides past all N branch slots, then walks are
    # O(1) again
    t0 = time.monotonic()
    store.write_append(
        spark.createDataFrame([(1, "m")], "id long, v string"), "t", None
    )
    print(f"main append slid past {n} slots in "
          f"{time.monotonic() - t0:.2f}s")
    t0 = time.monotonic()
    for _ in range(20):
        store._man_cache.clear()
        store._latest_commit("t")
    print(f"main head resolution after the slide: "
          f"{(time.monotonic() - t0) / 20 * 1000:.1f} ms/read")

    # publish is metadata-only however many commits the branch took
    t0 = time.monotonic()
    try:
        store.publish_branch("t", "bulk")
        print(f"publish: {time.monotonic() - t0:.2f}s")
    except Exception as e:  # main advanced: expected with the append above
        print(f"publish refused after main advanced (expected): {e}")
        store.drop_branch("t", "bulk")
    print(f"main rows: {store.read('t').count()}")


if __name__ == "__main__":
    main()
