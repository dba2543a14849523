#!/usr/bin/env python
"""Stress ChangeFeedFollower over a 1k-commit DML-heavy history.

Two questions, both 100-TB-shaped:

1. **Does the follower converge across a long, hostile history?**
   The history mixes merges, predicate deletes, updates, and RESTOREs
   (snapshot swaps whose re-inserted rows carry ORIGINAL timestamps —
   the case that forced final-change-per-key apply ordering, see
   streaming/feed.py:_finalize_window). After draining, the
   destination must equal the source snapshot exactly.

2. **What does catch-up cost as the backlog grows?** The follower's
   default path now collapses each window to ONE snapshot diff
   between the endpoint versions (store.diff_snapshots) — per-window
   cost is O(data), independent of the number of commits in the
   window, where the per-commit read_changes replay paid a fixed
   job-overhead cost PER VERSION (~0.5 s/version in the round-6
   measurement of this script). This script measures per-version
   catch-up cost at window sizes 25/50/100/200 over the same backlog
   (expected: flat per-window time → per-version cost falling as
   1/window), then drains the full history in bounded windows.

Run: python scripts/stress_follower.py [n_commits] (default 1000)
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyairbyte_spark import get_spark  # noqa: E402
from pyairbyte_spark.cache import SparkCache  # noqa: E402
from pyairbyte_spark.streaming import ChangeFeedFollower  # noqa: E402


def _df(spark, rows, p):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(p), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_spark(
        "stress-follower",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    td = tempfile.mkdtemp(prefix="follower_stress_")
    src = SparkCache(spark, warehouse_dir=f"{td}/src", table_format="commitlog")
    t = src.table_name("raw")
    store = src.store
    rng = random.Random(7)

    print(f"== building {n_commits}-commit DML-heavy history ==")
    t0 = time.monotonic()
    store.write_merge(
        _df(spark, [(i, f"init{i}") for i in range(1, 9)], "r"), t, ["id"]
    )
    n_restores = 0
    while store.latest_version(t) < n_commits:
        i = store.latest_version(t)
        roll = rng.random()
        if roll < 0.70:
            rows = list(
                {
                    (k := rng.randint(1, 50)): (k, f"v{i}")
                    for _ in range(rng.randint(1, 3))
                }.values()
            )
            store.write_merge(_df(spark, rows, f"m{i}"), t, ["id"])
        elif roll < 0.82:
            store.delete_where(t, [("id", "=", rng.randint(1, 50))])
        elif roll < 0.94:
            store.update_where(
                t, [("id", "=", rng.randint(1, 50))], {"v": f"'u{i}'"}
            )
        else:
            cur = store.latest_version(t)
            if cur >= 3:
                store.restore(t, rng.randint(max(1, cur - 10), cur - 1))
                n_restores += 1
    build_s = time.monotonic() - t0
    print(
        f"built {n_commits} commits in {build_s:.1f}s "
        f"({n_commits / build_s:.1f} commits/s), {n_restores} restores"
    )

    print("== catch-up cost vs window size (same backlog prefix) ==")
    for win in (25, 50, 100, 200):
        dst = SparkCache(
            spark, warehouse_dir=f"{td}/dst_w{win}", table_format="commitlog"
        )
        fol = ChangeFeedFollower(
            src, "raw", dst, "clean",
            primary_keys=["id"], apply_deletes=True,
            max_versions_per_cycle=win,
        )
        t0 = time.monotonic()
        res = fol.process_once()  # exactly one bounded window
        dt = time.monotonic() - t0
        print(
            f"window={win:4d}: {dt:6.2f}s for versions "
            f"({res['from_version']},{res['to_version']}] -> "
            f"{dt / win * 1000:7.1f} ms/version"
        )

    print("== full drain in bounded windows (win=100) ==")
    dst = SparkCache(
        spark, warehouse_dir=f"{td}/dst_drain", table_format="commitlog"
    )
    fol = ChangeFeedFollower(
        src, "raw", dst, "clean",
        primary_keys=["id"], apply_deletes=True, max_versions_per_cycle=100,
    )
    t0 = time.monotonic()
    results = fol.run(poll_interval=0.0, stop_when_caught_up=True)
    drain_s = time.monotonic() - t0
    cycles = [r for r in results if r["to_version"] > r["from_version"]]
    print(
        f"drained {n_commits} commits in {drain_s:.1f}s over "
        f"{len(cycles)} cycles ({drain_s / n_commits * 1000:.1f} ms/version)"
    )

    src_rows = sorted(
        (r["id"], r["v"]) for r in store.read(t).select("id", "v").collect()
    )
    dst_rows = sorted(
        (r["id"], r["v"])
        for r in dst.store.read(dst.table_name("clean"))
        .select("id", "v")
        .collect()
    )
    assert dst_rows == src_rows, (
        f"DIVERGED: {len(dst_rows)} dest rows vs {len(src_rows)} source"
    )
    print(
        f"CONVERGED: destination == source snapshot "
        f"({len(src_rows)} rows) across {n_restores} restore boundaries"
    )


if __name__ == "__main__":
    main()
