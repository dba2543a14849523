#!/usr/bin/env python
"""Stress the incremental-manifest layer: many-commit append churn.

The round-4 finding this answers: full-snapshot manifests made every
commit O(table) — ~578 B/file of JSON rewritten per commit (5.8 GB at
10M files). With delta manifests + checkpoints, commit I/O must be
O(changed entries) and stay flat as the table grows; reads pay a
bounded (< CHECKPOINT_INTERVAL) chain walk amortized by the manifest
cache.

This drives the REAL store commit path (`_commit` → diff → FileIO
put_if_absent) with synthetic-but-realistic entries (1 file, 4
columns of stats each ≈ the 578 B/file SCALE.md constant); no Spark
jobs — it is the driver metadata layer under test, data-path
correctness is pytest's job (tests/test_manifest.py).

Run: python scripts/stress_manifests.py [n_commits]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


def _entry(v: int) -> dict:
    return {
        "path": f"d-{uuid.uuid4().hex[:12]}",
        "buckets": None,
        "files": [
            {
                "path": f"part-{uuid.uuid4().hex}.parquet",
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
        ],
    }


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    root = tempfile.mkdtemp(prefix="stress-manifests-")
    store = CommitLogTableStore(None, root, "main")

    entries: list[dict] = []
    commit_s: list[float] = []
    delta_bytes: list[int] = []
    ckpt_bytes: list[int] = []
    d = store._commits_dir("t")
    for v in range(1, n_commits + 1):
        entries = entries + [_entry(v)]  # append: one new entry
        man = {"op": "append", "merge_buckets": None, "entries": entries}
        t0 = time.time()
        store._commit("t", man, v)
        commit_s.append(time.time() - t0)
        size = os.path.getsize(os.path.join(d, f"{v:020d}.json"))
        # parquet-checkpointed commits carry a sidecar — count it
        raw = json.load(open(os.path.join(d, f"{v:020d}.json")))
        if raw.get("entries_ref"):
            size += os.path.getsize(os.path.join(d, raw["entries_ref"]))
        (ckpt_bytes if v == 1 or v % mf.CHECKPOINT_INTERVAL == 0
         else delta_bytes).append(size)

    # cold reader: chain resolution + plan over the full metadata
    fresh = CommitLogTableStore(None, root, "main")
    # latest-version discovery: pointer + forward probes (O(1) in
    # commit count) vs the listing fallback (O(commits) names)
    t0 = time.time()
    latest_ptr = fresh._discover_latest("t")
    t_latest_ptr = time.time() - t0
    fresh2 = CommitLogTableStore(None, root, "main")
    fresh2.io.delete_file(os.path.join(d, fresh2._LATEST_PTR))
    t0 = time.time()
    latest_listed = fresh2._discover_latest("t")
    t_latest_listing = time.time() - t0
    assert latest_ptr == latest_listed == n_commits
    fresh._advance_latest_pointer("t", latest_ptr)  # restore
    t0 = time.time()
    latest = fresh.latest_version("t")
    man = fresh._read_manifest("t", latest)
    t_resolve = time.time() - t0
    assert len(man["entries"]) == n_commits
    t0 = time.time()
    plan = fresh.plan_scan("t", [("id", "<", 20_000)])
    t_plan = time.time() - t0

    total_bytes = sum(delta_bytes) + sum(ckpt_bytes)
    full_every_commit = sum(
        ckpt_bytes[-1] * v // n_commits for v in range(1, n_commits + 1)
    )  # what full-snapshot-per-commit would have written (linear growth)
    print(
        json.dumps(
            {
                "commits": n_commits,
                "entries_final": n_commits,
                "delta_bytes_p50": int(statistics.median(delta_bytes)),
                "delta_bytes_max": max(delta_bytes),
                "checkpoint_bytes_final": ckpt_bytes[-1],
                "total_commit_bytes": total_bytes,
                "full_snapshot_regime_bytes": full_every_commit,
                "io_reduction_x": round(full_every_commit / total_bytes, 1),
                "commit_s_p50": round(statistics.median(commit_s), 5),
                "commit_s_p99": round(
                    sorted(commit_s)[int(0.99 * len(commit_s))], 5
                ),
                "latest_pointer_s": round(t_latest_ptr, 5),
                "latest_listing_s": round(t_latest_listing, 5),
                "cold_resolve_s": round(t_resolve, 3),
                "plan_scan_s": round(t_plan, 3),
                "files_selected": plan["files_selected"],
                "files_total": plan["files_total"],
            }
        )
    )


if __name__ == "__main__":
    main()
