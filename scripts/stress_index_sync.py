#!/usr/bin/env python
"""Index-sync scaling stress: does sync cost track the DIFF or the INDEX?

The design claim (SCALE.md round 12): `sync_text_index` derives its
retraction tombstones from the source's old snapshot, so a sync's cost
is O(changed docs) compute with ZERO postings-table I/O — where the
round-11 derivation scanned the whole postings table per sync. This
measures both paths at a fixed index size across diff sizes, plus the
probe cost before/after, printing a small table for SCALE.md.

Run: python scripts/stress_index_sync.py [n_docs]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.operators.search import (
    attach_text_index,
    sync_text_index,
    text_index_search,
)
from pyairbyte_spark.writers import CommitLogTableStore


def _mk_store(spark, docs, buckets=None):
    store = CommitLogTableStore(
        spark, tempfile.mkdtemp("idxsync"), "s", merge_buckets=buckets
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti", target_files=32)
    return store


def _delete(store, spark, n_del):
    store.merge_into(
        "docs",
        spark.range(0, n_del).select(F.col("id").alias("doc_id")),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("idx-sync-stress")
    docs = (
        spark.range(0, n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.md5(((F.col("id") * p) % 9973).cast("string"))
                    for p in (3, 7, 11, 13, 17, 19, 23, 29)
                ],
            ).alias("text"),
        )
        .localCheckpoint()
    )
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = None
    print(
        f"corpus: {n} docs; index postings target_files=32; "
        f"source merge_buckets={buckets} (r13: bucketed sources give "
        "the entry-pruned diff its O(touched buckets) shape; pass 0 "
        "for the unbucketed full-rewrite contrast)"
    )
    sc = spark.sparkContext

    def _timed_sync(store, tag):
        """(wall, result, spark-job count) for one sync tick — the
        tick is plan-count-bound at small diffs, so the job count IS
        the orchestration floor being measured."""
        sc.setJobGroup(tag, tag)
        t0 = time.monotonic()
        r = sync_text_index(store, "ti")
        dt = time.monotonic() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup(None, None)
        return dt, r, jobs

    for n_del in (10, 100, 1000, 10_000):
        store = _mk_store(spark, docs, buckets=buckets or None)
        if rows is None:
            rows = store.table_stats("ti_postings")["rows"]
            print(f"postings rows: {rows}")
        _delete(store, spark, n_del)
        dt, r, n_jobs = _timed_sync(store, f"sync-{n_del}")
        # force the netted index-side derivation (the oob/vacuumed
        # fallback) for the same diff: record the oob_appends flag
        store2 = _mk_store(spark, docs, buckets=buckets or None)
        store2.write_replace(
            store2.read("ti_meta").withColumn("oob_appends", F.lit(True)),
            "ti_meta",
        )
        _delete(store2, spark, n_del)
        t0 = time.monotonic()
        r2 = sync_text_index(store2, "ti")
        dt2 = time.monotonic() - t0
        t0 = time.monotonic()
        text_index_search(store, "ti", ["spark", "data"]).count()
        dt_probe = time.monotonic() - t0
        print(
            f"diff={n_del:>6}: O(diff) sync {dt:6.2f}s ({n_jobs} jobs) | "
            f"index-scan sync {dt2:6.2f}s | probe {dt_probe:5.2f}s | "
            f"changed {r['docs_changed']} / {r2['docs_changed']}"
        )
        if n_del == 10:
            # r14: a doctor-prescribed compact between syncs used to
            # force an O(table) diff on the next tick; the
            # rewrite-transparent window shrink makes it an empty diff
            store.compact("docs")
            dt_c, r_c, jobs_c = _timed_sync(store, "sync-post-compact")
            print(
                f"post-compact tick: {dt_c:6.2f}s ({jobs_c} jobs) | "
                f"changed {r_c['docs_changed']} (provably-empty window)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
