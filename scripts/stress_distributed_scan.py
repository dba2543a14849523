#!/usr/bin/env python
"""Distributed manifest scans: driver memory must stay FLAT as the
table's file count grows 10k → 1M.

The round-5 finding this answers: ``plan_scan`` resolved the snapshot
into a full Python entry list on the driver (~1-2 KB per file dict →
multi-GB at 10M files) and pruned it in a Python loop. With the
distributed path, the checkpoint sidecar is read as a Spark DataFrame,
the zone-map DNF runs as an Arrow-batched filter on the executors, and
only SURVIVING paths cross back — driver allocations scale with the
predicate's selectivity, not the table.

Measured with tracemalloc (peak Python allocations during plan_scan —
exactly the driver-materialization cost under test) plus VmRSS deltas
for corroboration. The Python path is measured at the small sizes for
contrast and skipped at 1M (it is the regime being retired).

Run: python scripts/stress_distributed_scan.py [max_entries]
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


def _file(v: int) -> dict:
    return {
        "path": f"part-{v:012d}.parquet",
        "bucket": None,
        "bytes": 1 << 20,
        "rows": 10_000,
        "sv": 2,
        "stats": {
            "id": {"min": v * 10_000, "max": (v + 1) * 10_000 - 1,
                   "nulls": 0},
            "g": {"min": 0, "max": 999, "nulls": 0},
            "ts": {"min": 1700000000000000, "max": 1700086400000000,
                   "nulls": 0},
            "payload": {"min": "0" * 8, "max": "f" * 8, "nulls": 0},
        },
    }


def _entry(e: int, files_per_entry: int = 1) -> dict:
    v0 = e * files_per_entry
    return {
        "path": f"d-{e:012d}",
        "buckets": None,
        "files": [_file(v) for v in range(v0, v0 + files_per_entry)],
    }


def _build_table(root: str, n_files: int, files_per_entry: int = 1) -> None:
    """A table whose v1 checkpoint sidecar carries ``n_files`` data
    files across ``n_files // files_per_entry`` entries, streamed in
    ~10k-file batches (setup itself stays bounded)."""
    d = os.path.join(root, "main", "t", "_commits")
    os.makedirs(d, exist_ok=True)
    ref = f"{1:020d}.stress00.checkpoint.parquet"
    n_entries = n_files // files_per_entry
    schema = pq.read_schema(
        io.BytesIO(mf.entries_to_parquet_bytes([_entry(0, files_per_entry)]))
    )
    batch_entries = max(1, 10_000 // files_per_entry)
    with pq.ParquetWriter(os.path.join(d, ref), schema) as w:
        for off in range(0, n_entries, batch_entries):
            batch = [
                _entry(e, files_per_entry)
                for e in range(off, min(off + batch_entries, n_entries))
            ]
            t = pq.read_table(io.BytesIO(mf.entries_to_parquet_bytes(batch)))
            # entry_idx restarts per batch; re-base so the Python-path
            # decoder (keyed by entry_idx) sees unique values
            i = t.schema.get_field_index("entry_idx")
            t = t.set_column(
                i, "entry_idx", pc.add(t.column("entry_idx"), off)
            )
            w.write_table(t)
    with open(os.path.join(d, f"{1:020d}.json"), "w") as f:
        json.dump(
            {"version": 1, "op": "append", "merge_buckets": None,
             "entries_ref": ref, "n_entries": n_entries},
            f,
        )


def _vm_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _measure(store: CommitLogTableStore, preds) -> dict:
    store._invalidate_manifests("t")
    rss0 = _vm_rss_mb()
    tracemalloc.start()
    t0 = time.time()
    plan = store.plan_scan("t", preds)
    dt = time.time() - t0
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return {
        "s": round(dt, 2),
        "py_peak_mb": round(peak / 1e6, 1),
        "rss_delta_mb": round(_vm_rss_mb() - rss0, 1),
        "selected": plan["files_selected"],
        "total": plan["files_total"],
        "distributed": bool(plan.get("distributed")),
        "groups": len(plan["groups"]),
        "groups_with_paths": sum(
            1 for g in plan["groups"] if g["paths"] is not None
        ),
    }


def main() -> None:
    max_entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pyairbyte_spark import get_spark

    spark = get_spark("stress-distributed-scan")
    preds = [("id", "<", 20_000)]  # 2 surviving files at every size
    out = []
    for n in (10_000, 100_000, max_entries):
        root = tempfile.mkdtemp(prefix="stress-dscan-")
        t0 = time.time()
        _build_table(root, n)
        gen_s = round(time.time() - t0, 1)
        dist = CommitLogTableStore(spark, root, "main")
        dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
        rec = {"entries": n, "gen_s": gen_s,
               "distributed": _measure(dist, preds)}
        assert rec["distributed"]["distributed"]
        assert rec["distributed"]["selected"] == 2
        if n <= 100_000:  # the retired regime, for contrast
            drv = CommitLogTableStore(spark, root, "main")
            rec["python_path"] = _measure(drv, preds)
            assert not rec["python_path"]["distributed"]
        out.append(rec)
        print(json.dumps(rec), flush=True)
    flat = out[-1]["distributed"]["py_peak_mb"] <= max(
        2.0, 3 * out[0]["distributed"]["py_peak_mb"]
    )
    print(json.dumps({"driver_mem_flat_10k_to_max": flat}))

    # Unselective predicate: EVERY file survives, so the surviving
    # path list itself is the driver cost. With the survivor collapse,
    # fully-surviving entries (here 1000 files each — the realistic
    # many-files-per-data-dir layout) become whole-dir groups and
    # driver memory is O(entries), not O(files). Contrast at 100k
    # files: collapse off (threshold above the survivor count) vs on.
    wide = [("id", ">=", 0)]
    un_out = []
    for n, collapse in ((100_000, False), (100_000, True),
                        (max_entries, True)):
        root = tempfile.mkdtemp(prefix="stress-dscan-wide-")
        _build_table(root, n, files_per_entry=1000)
        dist = CommitLogTableStore(spark, root, "main")
        dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
        dist.DISTRIBUTED_SURVIVOR_COLLAPSE_MIN = 0 if collapse else n + 1
        rec = {"files": n, "entries": n // 1000, "collapse": collapse,
               "unselective": _measure(dist, wide)}
        assert rec["unselective"]["selected"] == n
        if collapse:
            assert rec["unselective"]["groups_with_paths"] == 0
            assert rec["unselective"]["groups"] == n // 1000
        un_out.append(rec)
        print(json.dumps(rec), flush=True)
    collapsed_flat = un_out[-1]["unselective"]["py_peak_mb"] <= max(
        2.0, 3 * un_out[1]["unselective"]["py_peak_mb"]
    )
    print(json.dumps({"unselective_driver_mem_flat": collapsed_flat}))


if __name__ == "__main__":
    main()
