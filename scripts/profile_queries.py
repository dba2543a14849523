#!/usr/bin/env python
"""Per-query Spark-job-count + wall profiler (guide §1: measure first).

For each named query: run once tagged with a job group, report
(wall seconds, number of Spark jobs launched). Job count is the
load-insensitive signal — the lifecycle rows are plan-count-bound at
sf0.1, so "N jobs" is the orchestration floor a change must move.

Run: python scripts/profile_queries.py [query ...]
     (default: the top lifecycle rows)

Optionally set SPARK_GRAFT_PROFILE_PHASES=1 to time CommitLogTableStore
stage/commit and the footer harvest per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "dedup_minhash_index_lookup",
    "text_index_wap_sync_search",
    "ann_ivf_sync_topk",
    "dedup_minhash_refresh_events",
    "text_index_sync_search",
    "store_incremental_agg_events",
    "store_snapshot_consistent_join_events",
    "store_txn_atomic_events",
    "graph_pagerank_part_supplier",
    "ann_pq_sync_topk",
    "store_sum_tier_events",
    "store_bloom_skipping_events",
]


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(
        "pyairbyte-spark-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ["lineitem", "orders", "events", "documents", "embeddings"]:
        q.t(spark, SF_DIR, tbl).limit(1).collect()

    phases = os.environ.get("SPARK_GRAFT_PROFILE_PHASES") == "1"
    acc = {"stage": 0.0, "commit": 0.0, "harvest": 0.0, "n_stage": 0}
    if phases:
        from pyairbyte_spark import filestats
        from pyairbyte_spark.writers import CommitLogTableStore as _S

        def timed(which, orig, counter=None):
            def run(*a, **k):
                t0 = time.monotonic()
                try:
                    return orig(*a, **k)
                finally:
                    acc[which] += time.monotonic() - t0
                    if counter:
                        acc[counter] += 1

            return run

        _S._stage = timed("stage", _S._stage, "n_stage")
        _S._commit = timed("commit", _S._commit)
        filestats.harvest_file_stats = timed(
            "harvest", filestats.harvest_file_stats
        )

    sc = spark.sparkContext
    registry = q.queries()
    print(f"{'query':45s} {'wall':>7} {'jobs':>5}" + ("  phases" if phases else ""))
    for name in names:
        fn = registry[name]
        for k in acc:
            acc[k] = 0.0 if k != "n_stage" else 0
        tag = f"prof-{name}"
        sc.setJobGroup(tag, name)
        t0 = time.monotonic()
        n = fn(spark, SF_DIR).count()
        dt = time.monotonic() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup("idle", "idle")
        extra = ""
        if phases:
            extra = (
                f"  stage={acc['stage']:.2f}s/{int(acc['n_stage'])}x"
                f" commit={acc['commit']:.2f}s harvest={acc['harvest']:.2f}s"
            )
        print(f"{name:45s} {dt:7.2f} {jobs:5d}{extra}  ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
