#!/usr/bin/env python
"""Stress the commit-log store's metadata layer: many-file tables,
plan_scan driver cost, skipping-read vs full-read wall time, change
feed on a wide history. Records the numbers quoted in SCALE.md.

Run: python scripts/stress_store.py [rows] [files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.writers import CommitLogTableStore


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spark = get_spark("store-stress")
    store = CommitLogTableStore(
        spark, tempfile.mkdtemp(prefix="stress-store-"), "main"
    )

    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("g"),
            F.timestamp_seconds(F.col("id") % 86400 + 1700000000).alias("ts"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    t0 = time.time()
    store.write_append(df.repartition(64), "t")
    t_write = time.time() - t0

    t0 = time.time()
    res = store.compact("t", zorder_by=["id", "g"], target_files=files)
    t_compact = time.time() - t0
    assert res["compacted"]

    # metadata-layer costs
    t0 = time.time()
    st = store.table_stats("t")
    t_stats = time.time() - t0
    t0 = time.time()
    plan = store.plan_scan("t", [("id", "<", rows // 100)])
    t_plan = time.time() - t0

    # skipping read vs full filter
    t0 = time.time()
    n_skip = store.read_where("t", [("id", "<", rows // 100)]).count()
    t_skipread = time.time() - t0
    t0 = time.time()
    n_full = store.read("t").filter(F.col("id") < rows // 100).count()
    t_fullread = time.time() - t0
    assert n_skip == n_full

    # second-dimension pruning (the z-order claim)
    g_plan = store.plan_scan("t", [("g", "<", 10)])

    print(
        json.dumps(
            {
                "rows": rows,
                "files": plan["files_total"],
                "write_s": round(t_write, 2),
                "zorder_compact_s": round(t_compact, 2),
                "table_stats_s": round(t_stats, 4),
                "plan_scan_s": round(t_plan, 4),
                "id_files_selected": plan["files_selected"],
                "g_files_selected": g_plan["files_selected"],
                "skip_read_s": round(t_skipread, 2),
                "full_read_s": round(t_fullread, 2),
                "manifest_bytes": os.path.getsize(
                    os.path.join(
                        store._commits_dir("t"),
                        sorted(os.listdir(store._commits_dir("t")))[-1],
                    )
                ),
                "stats_rows": st["rows"],
            }
        )
    )


if __name__ == "__main__":
    main()
