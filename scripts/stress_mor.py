#!/usr/bin/env python
"""Merge-on-read vs copy-on-write DELETE: the write-amplification
measurement behind the mode="mor" design (SCALE.md round 7).

Builds a wide table (payload column ~200 B/row across many files),
deletes a small id-range slice both ways on identical copies, and
reports BYTES WRITTEN (deterministic — walk the table dir; immune to
CPU contention), files rewritten, and read-back parity. The expected
shape at any scale: COW rewrites the full row width of every matched
file; MoR writes a KB-sized (file, pos) sidecar and nothing else.

Usage: python scripts/stress_mor.py [rows] [files]
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


def dir_bytes(root: str) -> int:
    total = 0
    for r, _d, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(r, f))
    return total


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress-mor")
    base = (
        spark.range(0, rows)
        .withColumn("k", F.col("id") % 1000)
        .withColumn("payload", F.repeat(F.concat(F.lit("x"), F.col("id")), 20))
        .repartitionByRange(files, "id")
    )
    root = tempfile.mkdtemp(prefix="stress-mor-")
    store = CommitLogTableStore(spark, root, "m")
    results = {}
    # one id-range slice: zone maps prune to ~1 file either way
    lo, hi = rows // 2, rows // 2 + rows // 1000  # 0.1% of rows
    for mode in ("cow", "mor"):
        store.write_append(base, mode)
        tdir = os.path.join(root, "m", mode)
        before = dir_bytes(tdir)
        t0 = time.monotonic()
        res = store.delete_where(
            mode,
            [("id", ">=", lo), ("id", "<", hi)],
            mode=mode,
        )
        wall = time.monotonic() - t0
        written = dir_bytes(tdir) - before
        n = store.read(mode).count()
        assert n == rows - (hi - lo), (mode, n)
        results[mode] = {
            "deleted_rows": res["deleted_rows"],
            "files_rewritten": res["files_rewritten"],
            "bytes_written": written,
            "wall_s": round(wall, 2),
        }
        print(
            f"{mode}: deleted {res['deleted_rows']} rows, "
            f"{res['files_rewritten']} files rewritten, "
            f"{written:,} bytes written, {wall:.2f}s",
            flush=True,
        )
    ratio = results["cow"]["bytes_written"] / max(
        1, results["mor"]["bytes_written"]
    )
    print(f"write amplification cow/mor: {ratio:,.0f}x")
    assert results["mor"]["files_rewritten"] == 0
    assert results["cow"]["bytes_written"] > results["mor"]["bytes_written"]
    # read overhead with a live DV: one broadcast anti-join
    t0 = time.monotonic()
    store.read("mor").count()
    t_mor = time.monotonic() - t0
    t0 = time.monotonic()
    store.read("cow").count()
    t_cow = time.monotonic() - t0
    print(f"full-scan read: cow {t_cow:.2f}s, mor(dv) {t_mor:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
