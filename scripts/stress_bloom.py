#!/usr/bin/env python
"""Stress the bloom-filter point-lookup index: build cost, index size,
pruning factor, and lookup wall time at many-file scale. Records the
numbers quoted in SCALE.md.

Run: python scripts/stress_bloom.py [rows] [files]
"""

from __future__ import annotations

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
    spark = get_spark("bloom-stress")
    store = CommitLogTableStore(
        spark, tempfile.mkdtemp(prefix="stress-bloom-"), "main"
    )
    # High-cardinality unsorted keys, modulo-split into `files` files:
    # every file's [min, max] key range spans the domain, so zone maps
    # prune NOTHING for an equality lookup.
    df = (
        spark.range(rows)
        .withColumn("key", F.md5(F.col("id").cast("string")))
        .withColumn("v", F.col("id") * 2)
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .repartition(files, F.col("id") % files)
    )
    t0 = time.monotonic()
    store.write_append(df, "t")
    print(f"append {rows:,} rows / {files} files: {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    r = store.build_bloom_index("t", ["key"])
    build_s = time.monotonic() - t0
    ref = store._read_manifest("t", store.latest_version("t"))[
        "bloom_index"
    ]["ref"]
    bpath = os.path.join(store.table_path("t"), ref)
    idx_bytes = sum(
        sz for _rel, sz in store.io.list_files(bpath)
    )
    data_bytes = sum(
        f["bytes"]
        for e in store._read_manifest("t", store.latest_version("t"))["entries"]
        for f in e["files"]
    )
    print(
        f"bloom build: {build_s:.1f}s, {r['files_indexed']} files, "
        f"index {idx_bytes/1e6:.1f} MB ({100*idx_bytes/data_bytes:.1f}% "
        f"of {data_bytes/1e6:.0f} MB data)"
    )

    key = spark.range(rows // 2, rows // 2 + 1).select(
        F.md5(F.col("id").cast("string"))
    ).first()[0]
    t0 = time.monotonic()
    plan = store.plan_scan("t", [("key", "=", key)])
    plan_s = time.monotonic() - t0
    t0 = time.monotonic()
    n = store.read_where("t", [("key", "=", key)]).count()
    bloom_read_s = time.monotonic() - t0
    t0 = time.monotonic()
    n2 = (
        store.read_version("t", 1)
        .filter(F.col("key") == key)
        .count()
    )
    full_read_s = time.monotonic() - t0
    assert n == n2 == 1
    print(
        f"point lookup: {plan['files_selected']}/{plan['files_total']} "
        f"files (plan {plan_s:.2f}s), read {bloom_read_s:.2f}s vs "
        f"unindexed full scan {full_read_s:.2f}s "
        f"({full_read_s/max(bloom_read_s,1e-9):.1f}x)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
