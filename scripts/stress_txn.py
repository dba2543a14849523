#!/usr/bin/env python
"""Stress the multi-table transaction protocol: many concurrent
coordinators and plain writers race two tables; measure group
throughput and verify linearized final state + FSCK-clean chains.

Exercises exactly the paths a busy pipeline hits: decision races,
writer-driven force-aborts of crashed coordinators, slot sliding past
aborted prepares, and retry-budget behavior under contention.
Records the numbers quoted in SCALE.md.

Run: python scripts/stress_txn.py [groups] [threads]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyairbyte_spark import get_spark
from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
    TxnGroupAbortedError,
)


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("txn-stress")
    store = CommitLogTableStore(
        spark, tempfile.mkdtemp(prefix="stress-txn-"), "main"
    )
    store.TXN_RESOLVE_GRACE_S = 0.3
    store.write_append(spark.range(1).toDF("a"), "raw")
    store.write_append(spark.range(1).toDF("b"), "agg")

    rng = random.Random(7)
    fates = [
        rng.choice(["commit", "commit", "commit", "abort", "crash"])
        for _ in range(n_groups)
    ]
    lock = threading.Lock()
    tally = {"a": 1, "b": 1, "committed": 0, "forced": 0, "gaveup": 0}
    work = list(enumerate(fates))

    def worker() -> None:
        while True:
            with lock:
                if not work:
                    return
                i, fate = work.pop()
            na, nb = (i % 3) + 1, (i % 2) + 1
            try:
                t = store.begin_txn()
                t.write_append(
                    spark.range(i * 1000, i * 1000 + na).toDF("a"), "raw"
                )
                t.write_append(
                    spark.range(i * 1000, i * 1000 + nb).toDF("b"), "agg"
                )
                if fate == "commit":
                    try:
                        t.commit()
                        with lock:
                            tally["a"] += na
                            tally["b"] += nb
                            tally["committed"] += 1
                    except TxnGroupAbortedError:
                        with lock:
                            tally["forced"] += 1
                elif fate == "abort":
                    t.prepare()
                    t.abort()
                else:  # crash: slots claimed, no decision
                    t.prepare()
            except ConcurrentCommitError:
                with lock:
                    tally["gaveup"] += 1
                try:
                    t.abort()
                except Exception:
                    pass

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.monotonic() - t0

    # resolve any crashed group still at a head, then verify
    store.write_append(spark.range(1).toDF("a"), "raw")
    store.write_append(spark.range(1).toDF("b"), "agg")
    tally["a"] += 1
    tally["b"] += 1
    got_a = store.read("raw").count()
    got_b = store.read("agg").count()
    assert got_a == tally["a"], (got_a, tally["a"])
    assert got_b == tally["b"], (got_b, tally["b"])
    assert store.read_changes("raw", 0).count() == got_a
    fsck_a = store.verify_table("raw", deep=False)
    fsck_b = store.verify_table("agg", deep=False)
    assert fsck_a["ok"] and fsck_b["ok"], (fsck_a, fsck_b)
    slots = store._discover_latest("raw") + store._discover_latest("agg")
    print(
        f"groups={n_groups} threads={n_threads} wall={wall:.1f}s "
        f"({n_groups / wall:.1f} groups/s) committed={tally['committed']} "
        f"force_aborted={tally['forced']} gave_up={tally['gaveup']} "
        f"slots={slots} rows=({got_a},{got_b}) fsck=ok linearized=ok"
    )


if __name__ == "__main__":
    main()
