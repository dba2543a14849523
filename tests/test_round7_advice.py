"""Round-7 hardening: the four advisory findings.

- **Survivor collapse vs COW DML**: the distributed scan's whole-dir
  collapse must never apply to an entry whose file list was shrunk by
  delete_where / update_where / optimize — the superseded files remain
  on disk until vacuum, so a dir read would resurrect deleted rows and
  duplicate rewritten ones. Entries are flagged ``pruned`` at the
  shrink sites and the collapse excludes them.
- **NDV catch-up vs vacuum**: approx_distinct's incremental catch-up
  replays the change feed since the stats watermark; when vacuum has
  reclaimed commits in that window it must fall back to a full
  re-analyze, not raise.
- **DV broadcast sizing**: the anti-join broadcast decision is
  byte-based from the sidecars' recorded parquet sizes; unknown-size
  DVs are never force-broadcast.
- **Post-add appends**: a frame appended after ADD COLUMN that omits
  the added column materializes explicit NULLs — it must not read the
  existing-rows default back (Delta gives NULL for such inserts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


@pytest.fixture()
def dist_stores(spark, tmp_path, monkeypatch):
    """Two stores over one warehouse: distributed-forced vs driver."""
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    dist = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    dist.DISTRIBUTED_SURVIVOR_COLLAPSE_MIN = 0
    drv = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    return dist, drv


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id",
        F.concat(F.lit(raw_prefix), F.col("id").cast("string")),
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "v").collect())


# -- survivor collapse vs COW DML -------------------------------------------


def _seed(spark, store, n_entries=4, per=5, files_per=2):
    for i in range(n_entries):
        rows = [(i * 100 + j, f"v{i * 100 + j}") for j in range(per)]
        # range-disjoint files so a range predicate can touch SOME
        # files of an entry (zone maps prune the rest)
        store.write_append(
            _df(spark, rows, f"p{i}").repartitionByRange(files_per, "id"),
            "t",
        )
    store._invalidate_manifests("t")


@pytest.mark.parametrize("dml", ["delete", "update", "optimize"])
@pytest.mark.slow
def test_collapse_excludes_cow_pruned_entries(spark, dist_stores, dml):
    """After a COW rewrite the shrunk entry must ship explicit file
    lists even in the unselective (collapse) regime — whole-dir reads
    of its dir would resurrect superseded files."""
    dist, drv = dist_stores
    if dml == "optimize":
        # one entry mixing a big (kept) and a small (compacted) file,
        # plus a small-only entry — the mixed entry must come out
        # flagged, the small-only one is dropped whole
        # RDD union keeps its two 1-slice inputs as two partitions
        # (the SQL optimizer collapses DataFrame-level single-partition
        # unions), so the entry stages one big and one tiny file
        sc = spark.sparkContext
        rdd = sc.parallelize(
            [(i, f"v{i}") for i in range(1000, 21000)], 1
        ).union(sc.parallelize([(0, "v0"), (1, "v1")], 1))
        mixed = (
            spark.createDataFrame(rdd, ["id", "v"])
            .withColumn(
                "_airbyte_raw_id",
                F.concat(F.lit("big"), F.col("id").cast("string")),
            )
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
        )
        dist.write_append(mixed, "t")
        dist.write_append(
            _df(spark, [(2, "v2"), (3, "v3")], "t2").coalesce(1), "t"
        )
        dist._invalidate_manifests("t")
        drv.optimize("t", small_file_bytes=16384, min_files=2)
    else:
        _seed(spark, dist)
        if dml == "delete":
            drv.delete_where("t", [("id", "<", 102)])
        else:
            drv.update_where("t", [("id", "<", 102)], {"v": "'upd'"})
    dist._invalidate_manifests("t")
    drv._invalidate_manifests("t")
    for preds in ([], [("id", ">=", 0)]):
        p_dist = dist.plan_scan("t", preds)
        assert p_dist.get("distributed") is True
        got = _rows(dist.read_where("t", preds))
        want = _rows(drv.read_where("t", preds))
        assert got == want, (dml, preds)
    # the DML shrank at least one entry: that entry must NOT be a
    # whole-dir group in the collapsed plan
    man = drv._read_manifest("t", drv.latest_version("t"))
    pruned_dirs = {
        e["path"] for e in man["entries"] if e.get("pruned")
    }
    assert pruned_dirs, "DML should have flagged a shrunk entry"
    plan = dist.plan_scan("t", [])
    for g in plan["groups"]:
        if g["paths"] is None:
            assert not any(g["base"].endswith(p) for p in pruned_dirs), g


def test_untouched_entries_still_collapse(spark, dist_stores):
    """The fix must not tax append-only entries: dirs the DML never
    touched keep collapsing to whole-dir groups."""
    dist, drv = dist_stores
    _seed(spark, dist)
    drv.delete_where("t", [("id", "<", 2)])  # touches entry 0 only
    dist._invalidate_manifests("t")
    plan = dist.plan_scan("t", [])
    collapsed = [g for g in plan["groups"] if g["paths"] is None]
    explicit = [g for g in plan["groups"] if g["paths"] is not None]
    assert collapsed, "untouched entries should still collapse"
    assert explicit, "the pruned entry must ship explicit files"


def test_pruned_flag_survives_sidecar_roundtrip(spark, store):
    """The ``pruned`` flag rides the parquet sidecar's extra column
    (header rows) and round-trips through the delta chain."""
    _seed(spark, store, n_entries=2)
    store.delete_where("t", [("id", "<", 2)])
    man = store._read_manifest("t", store.latest_version("t"))
    flagged = [e for e in man["entries"] if e.get("pruned")]
    assert flagged
    data = mf.entries_to_parquet_bytes(man["entries"])
    back = mf.entries_from_parquet_bytes(data)
    assert [e.get("pruned") for e in back] == [
        e.get("pruned") for e in man["entries"]
    ]


# -- NDV catch-up vs vacuum ---------------------------------------------------


def test_ndv_catchup_falls_back_after_vacuum(spark, store):
    """Vacuum reclaiming commits inside the catch-up window must not
    break serving: the estimate falls back to a full re-analyze."""
    from pyairbyte_spark import ndv

    rows = [(i, f"t{i % 5}") for i in range(200)]
    ev = spark.createDataFrame(rows, "id long, event_type string")
    store.write_append(ev.filter(F.col("id") < 50), "events")
    ndv.analyze_ndv(store, "events", ["event_type"], p=8)
    for lo in (50, 100, 150):
        store.write_append(
            ev.filter((F.col("id") >= lo) & (F.col("id") < lo + 50)),
            "events",
        )
    # drop everything but the newest commit: the stats watermark's
    # catch-up window is gone
    store.vacuum("events", keep_commits=1)
    store._invalidate_manifests("events")
    est = ndv.approx_distinct(spark, store, "events", p=8)
    assert est["event_type"] == 5


# -- DV broadcast sizing ------------------------------------------------------


def test_dv_broadcast_decision(spark, store):
    assert store._dv_broadcastable([{"path": "a", "rows": 10, "bytes": 100}])
    assert not store._dv_broadcastable(
        [{"path": "a", "rows": 10, "bytes": 10**9}]
    )
    # bytes wins over rows when both present
    assert not store._dv_broadcastable(
        [{"path": "a", "rows": 1, "bytes": 10**9}]
    )
    # rows-only (legacy sidecar records): conservative row bound
    assert store._dv_broadcastable([{"path": "a", "rows": 1000}])
    assert not store._dv_broadcastable([{"path": "a", "rows": 10**8}])
    # unknown size: never force a broadcast
    assert not store._dv_broadcastable([{"path": "a"}])
    assert not store._dv_broadcastable(
        [{"path": "a", "bytes": 100}, {"path": "b"}]
    )


def test_stage_dv_records_bytes(spark, store):
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(20)]).coalesce(1), "t"
    )
    store.delete_where("t", [("id", "<", 5)], mode="mor")
    man = store._read_manifest("t", store.latest_version("t"))
    dvs = man.get("delete_vectors") or []
    assert dvs and all(d.get("bytes", 0) > 0 for d in dvs)
    # and the MoR read still excludes the deleted rows
    assert _rows(store.read("t")) == [
        (i, f"v{i}") for i in range(5, 20)
    ]


# -- post-add appends materialize NULL ---------------------------------------


def test_post_add_append_missing_column_reads_null(spark, store):
    """New rows appended after ADD COLUMN without the column must read
    NULL, not the existing-rows default."""
    store.write_append(
        _df(spark, [(1, "a"), (2, "b")]).coalesce(1), "t"
    )
    store.add_column("t", "score", "int", default=7)
    store.write_append(_df(spark, [(3, "c")], "q").coalesce(1), "t")
    got = {
        r["id"]: r["score"]
        for r in store.read("t").select("id", "score").collect()
    }
    assert got == {1: 7, 2: 7, 3: None}


def test_post_add_merge_missing_column_reads_null(spark, store):
    """Same contract on the incremental-merge path (new-bucket staging
    of incoming alone)."""
    store.write_merge(
        _df(spark, [(1, "a"), (2, "b")]).repartition(2), "t", ["id"]
    )
    store.add_column("t", "score", "int", default=7)
    store.write_merge(_df(spark, [(3, "c")], "q").coalesce(1), "t", ["id"])
    got = {
        r["id"]: r["score"]
        for r in store.read("t").select("id", "score").collect()
    }
    assert got == {1: 7, 2: 7, 3: None}


def test_vacuum_repairs_dir_completeness(spark, dist_stores):
    """Once vacuum physically removes the superseded files, the dir is
    complete again: vacuum publishes a repair_metadata commit clearing
    the pruned flags, and the distributed scan's whole-dir collapse
    becomes legal once more — results still exact."""
    dist, drv = dist_stores
    _seed(spark, dist)
    drv.delete_where("t", [("id", "<", 102)])
    drv.vacuum("t", keep_commits=1)
    dist._invalidate_manifests("t")
    drv._invalidate_manifests("t")
    man = drv._read_manifest("t", drv.latest_version("t"))
    assert man["op"] == "repair_metadata"
    assert not any(e.get("pruned") for e in man["entries"])
    plan = dist.plan_scan("t", [])
    assert plan.get("distributed") is True
    assert all(g["paths"] is None for g in plan["groups"])  # collapsed
    assert _rows(dist.read_where("t", [])) == _rows(drv.read_where("t", []))
    # CDF, NDV catch-up, and the streaming tail all classify the
    # repair commit as metadata-only
    v = drv.latest_version("t")
    assert drv.read_changes("t", v - 1, v).count() == 0


def test_vacuum_keeps_flag_when_old_snapshot_pins_files(spark, dist_stores):
    """With the pre-DML snapshot still retained, its files survive
    vacuum inside the dir — the entry must STAY flagged (a whole-dir
    read would resurrect them for the latest snapshot)."""
    dist, drv = dist_stores
    _seed(spark, dist)
    drv.delete_where("t", [("id", "<", 102)])
    before = drv.latest_version("t")
    drv.vacuum("t", keep_commits=5)  # keeps the pre-delete snapshot
    drv._invalidate_manifests("t")
    man = drv._read_manifest("t", drv.latest_version("t"))
    assert drv.latest_version("t") == before  # no repair commit
    assert any(e.get("pruned") for e in man["entries"])
    dist._invalidate_manifests("t")
    assert _rows(dist.read_where("t", [])) == _rows(drv.read_where("t", []))
