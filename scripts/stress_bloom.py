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



def synthetic(n_files: int = 1_000_000) -> None:
    """Exercise the bloom build's RELATIONAL metadata path at a
    synthetic ≥1M-file manifest: live-file frame, prior-index
    anti-join (only_missing target derivation), dir-collapse, coverage
    watermark, and distributed plan_scan — proving no step holds a
    per-file list on the driver. (The data files are synthetic, so the
    SCAN itself is exercised end-to-end by main() on real files — the
    two share every line of target-derivation code.)

    Run: python scripts/stress_bloom.py --synthetic [files]
    """
    import pyspark.sql.functions as SF

    from pyairbyte_spark import manifest as mf

    spark = get_spark("bloom-stress-syn")
    store = CommitLogTableStore(
        spark, tempfile.mkdtemp(prefix="stress-bloom-syn-"), "main"
    )
    per = 1024
    n_entries = max(1, n_files // per)
    t0 = time.monotonic()
    entries = [
        {
            "path": f"d-{e:012x}",
            "files": [
                {
                    "path": f"part-{i:05d}.parquet",
                    "rows": 100_000,
                    "bytes": 10_000_000,
                }
                for i in range(per)
            ],
        }
        for e in range(n_entries)
    ]
    store._commit("syn", {"op": "append", "entries": entries}, 1)
    del entries  # fabrication scaffolding, not part of the path under test
    store._invalidate_manifests("syn")  # _commit cached the driver form
    store.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    print(
        f"fabricated sidecar manifest: {n_entries * per:,} files "
        f"({time.monotonic() - t0:.1f}s)"
    )

    t0 = time.monotonic()
    top, entries_df, man = store._scan_source("syn", 1)
    assert man is None, "must resolve via the distributed sidecar path"
    files_df = store._live_files_frame("syn", None, entries_df)
    total = files_df.count()
    assert total == n_entries * per
    print(f"live-files frame: {total:,} rows ({time.monotonic() - t0:.1f}s)")

    # Fabricate a prior index covering half the files (tiny bitsets —
    # the anti-join cost is what's under test) and derive the
    # only_missing target set relationally.
    t0 = time.monotonic()
    ref = "bloomidx-synthetic0"
    half = files_df.filter(
        SF.crc32(SF.concat_ws("/", "entry_path", "file_path")) % 2 == 0
    )
    (
        half.select(
            "entry_path",
            "file_path",
            SF.lit("key").alias("col"),
            SF.lit(64).alias("m"),
            SF.lit(4).alias("k"),
            SF.lit(bytes(8)).alias("bits"),
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(store.table_path("syn"), ref))
    )
    prior = spark.read.parquet(os.path.join(store.table_path("syn"), ref))
    uncov = files_df.join(
        prior.select("entry_path", "file_path").distinct(),
        ["entry_path", "file_path"],
        "left_anti",
    )
    n_new = uncov.count()
    n_dirs = uncov.select("entry_path").distinct().count()
    print(
        f"only_missing derivation: {n_new:,} uncovered files across "
        f"{n_dirs:,} dirs — bulk regime reads {n_dirs:,} dir paths, "
        f"never a {n_new:,}-element driver list "
        f"({time.monotonic() - t0:.1f}s)"
    )
    assert 0 < n_new < total

    # Coverage watermark + distributed plan at the same scale.
    store._commit(
        "syn",
        {
            "op": "set_bloom_index",
            "base": 1,
            "remove_paths": [],
            "add_entries": [],
            "replace_entries": {},
            "bloom_index": {"ref": ref, "columns": ["key"], "fpr": 0.01},
        },
        2,
    )
    store._man_cache.pop(("syn", 2), None)
    t0 = time.monotonic()
    cov = store.bloom_coverage("syn")
    print(
        f"bloom_coverage: {cov['files_covered']:,}/{cov['files_total']:,} "
        f"covered ({time.monotonic() - t0:.1f}s)"
    )
    assert cov["files_total"] == total
    assert cov["files_covered"] + n_new == total
    t0 = time.monotonic()
    plan = store.plan_scan("syn", [("key", "=", "zzz-absent")])
    print(
        f"distributed plan over synthetic index: "
        f"{plan['files_selected']:,}/{plan['files_total']:,} selected, "
        f"{plan['files_bloom_uncovered']:,} uncovered "
        f"({time.monotonic() - t0:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    if "--synthetic" in sys.argv:
        sys.argv.remove("--synthetic")
        synthetic(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
    else:
        main()
