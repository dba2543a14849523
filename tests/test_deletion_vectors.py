"""Merge-on-read DELETE (deletion vectors) for the commit-log store.

``delete_where(..., mode="mor")`` records position deletes in a
``dv-<hex>/`` parquet sidecar instead of rewriting data files —
Iceberg v2's position-delete design expressed Spark-first through the
native ``_metadata.file_path`` / ``row_index`` columns, applied at
read time as a broadcast anti-join. The suite pins:

- read correctness (read / read_version / read_where / table_stats)
  and MoR-vs-COW result equivalence;
- exact ``deleted_rows`` across overlapping deletes (re-deleting an
  already-deleted row counts zero);
- the live-file invariant: any op that REWRITES files (COW delete,
  update_where, incremental merge) retires the rewritten files' DV
  positions, so no read resurrects MoR-deleted rows and the stats
  arithmetic stays exact;
- lifecycle: compact materializes + clears DVs, vacuum reclaims
  superseded sidecars, restore resurrects the target version's DVs,
  metadata commits (checks, renames) carry them forward;
- the change feed emits exactly the newly-deleted rows for a MoR
  commit (position set difference — exact through consolidation);
- optimistic concurrency: DV-set changes are commit conflicts, a
  disjoint concurrent append still rebases.

Reference parity note: the reference has no DELETE at all (caches are
append/replace/merge only) — this is net-new capability the 100 TB
deployment needs (GDPR point deletes without full-width rewrites).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _seed(spark, store, name="t", n=1000, files=4):
    """A table whose k values are SPREAD across several files, so a
    point predicate zone-matches only some files."""
    df = (
        spark.range(0, n)
        .withColumn("k", F.col("id") % 10)
        .withColumn("v", F.col("id") * 2)
        .repartitionByRange(files, "k")
    )
    store.write_append(df, name)
    return name


def _dvs(store, name):
    return store._latest_commit(name)[1].get("delete_vectors") or []


def test_mor_delete_matches_cow_results(spark, store):
    _seed(spark, store, "a")
    _seed(spark, store, "b")
    ra = store.delete_where("a", [("k", "in", [2, 5])], mode="mor")
    rb = store.delete_where("b", [("k", "in", [2, 5])])
    assert ra["deleted_rows"] == rb["deleted_rows"] == 200
    assert ra["files_rewritten"] == 0 and rb["files_rewritten"] > 0
    got_a = {tuple(r) for r in store.read("a").select("id", "k", "v").collect()}
    got_b = {tuple(r) for r in store.read("b").select("id", "k", "v").collect()}
    assert got_a == got_b and len(got_a) == 800
    assert _dvs(store, "a") and not _dvs(store, "b")


def test_overlapping_mor_deletes_count_only_new_rows(spark, store):
    _seed(spark, store)
    r1 = store.delete_where("t", [("k", "=", 3)], mode="mor")
    assert r1["deleted_rows"] == 100
    # superset predicate: k=3 rows are already gone — only k=4 is new
    r2 = store.delete_where("t", [("k", "in", [3, 4])], mode="mor")
    assert r2["deleted_rows"] == 100
    # fully-covered predicate: an exact no-op, version unchanged
    before = store.latest_version("t")
    r3 = store.delete_where("t", [("k", "=", 3)], mode="mor")
    assert r3["deleted_rows"] == 0 and r3["version"] == before
    assert store.latest_version("t") == before
    assert store.read("t").count() == 800


def test_reads_and_stats_apply_dvs(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 7)], mode="mor")
    assert store.read("t").filter("k = 7").count() == 0
    assert store.read("t").count() == 900
    # predicate-pushdown read: both the deleted and a surviving key
    assert store.read_where("t", [("k", "=", 7)]).count() == 0
    assert store.read_where("t", [("k", "=", 6)]).count() == 100
    # metadata-only stats see the exact corrected row count
    assert store.table_stats("t")["rows"] == 900
    # time travel to the pre-delete snapshot ignores the DV
    assert store.read_version("t", 1).count() == 1000


def test_cow_rewrite_retires_dvs_no_resurrection(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 2)], mode="mor")
    # COW delete zone-matches every file (id spans all files) — the
    # rewrite must apply the DV (no k=2 resurrection) and retire it.
    store.delete_where("t", [("id", "<", 100)])
    got = store.read("t")
    assert got.filter("k = 2").count() == 0
    assert got.count() == 1000 - 100 - 90  # k=2 overlaps id<100 by 10
    assert not _dvs(store, "t")
    assert store.table_stats("t")["rows"] == got.count()


def test_update_where_applies_and_retires_dvs(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 4)], mode="mor")
    r = store.update_where("t", [("k", "=", 4)], {"v": "v + 1"})
    # every k=4 row is MoR-deleted: nothing left to update
    assert r["updated_rows"] == 0
    assert store.read("t").filter("k = 4").count() == 0
    r2 = store.update_where("t", [("k", "=", 6)], {"v": "0"})
    assert r2["updated_rows"] == 100
    got = store.read("t")
    assert got.count() == 900
    assert got.filter("k = 6").agg(F.sum("v")).collect()[0][0] == 0
    assert store.table_stats("t")["rows"] == 900


def _mergeable(spark, lo, hi, v, raw_prefix):
    return (
        spark.range(lo, hi)
        .withColumn("k", F.col("id") % 10)
        .withColumn("v", F.lit(v))
        .withColumn(
            "_airbyte_raw_id",
            F.concat(F.lit(raw_prefix), F.col("id").cast("string")),
        )
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )


def test_incremental_merge_does_not_resurrect(spark, store):
    store.merge_buckets = 4
    store.write_merge(_mergeable(spark, 0, 400, 1, "a"), "m", ["id"])
    store.delete_where("m", [("k", "=", 3)], mode="mor")
    assert store.read("m").count() == 360
    # merge new rows into SOME buckets; deleted rows in the rewritten
    # buckets must not re-enter via latest-wins dedup
    store.write_merge(_mergeable(spark, 0, 50, 2, "b"), "m", ["id"])
    got = store.read("m")
    # ids 0..49 re-merged (live again with v=2 — an upsert wins over a
    # previous delete only for the re-inserted keys)
    assert got.filter("id < 50").count() == 50
    # ids >= 50 with k=3 stay deleted
    assert got.filter("id >= 50 and k = 3").count() == 0
    assert got.count() == 400 - 40 + 5  # 40 deleted ids>=50… see below
    # (k=3 ⇒ ids 3,13,…,393: 40 rows; 5 of them < 50 are re-inserted)


def test_compact_materializes_and_clears(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 1)], mode="mor")
    res = store.compact("t")
    assert res["compacted"]
    assert not _dvs(store, "t")
    assert store.read("t").count() == 900
    assert store.read("t").filter("k = 1").count() == 0
    assert store.table_stats("t")["rows"] == 900


def test_single_entry_table_with_dvs_still_compacts(spark, store):
    df = spark.range(0, 100).withColumn("k", F.col("id") % 10)
    store.write_replace(df, "t")
    store.delete_where("t", [("k", "=", 0)], mode="mor")
    res = store.compact("t")
    assert res["compacted"]
    assert not _dvs(store, "t")
    assert store.read("t").count() == 90


def test_vacuum_reclaims_superseded_dv_dirs(spark, store, tmp_path):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 1)], mode="mor")
    live = {d["path"] for d in _dvs(store, "t")}
    store.compact("t")  # materializes: the dv dir is now unreferenced
    removed = store.vacuum("t", keep_commits=1)
    assert live <= {r for r in removed if r.startswith("dv-")}
    tdir = os.path.join(str(tmp_path / "wh"), "main", "t")
    assert not [n for n in os.listdir(tdir) if n.startswith("dv-")]
    assert store.read("t").count() == 900


def test_vacuum_keeps_live_dv_dirs(spark, store, tmp_path):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 1)], mode="mor")
    live = {d["path"] for d in _dvs(store, "t")}
    removed = store.vacuum("t", keep_commits=1)
    assert not [r for r in removed if r.startswith("dv-")]
    tdir = os.path.join(str(tmp_path / "wh"), "main", "t")
    assert live <= set(os.listdir(tdir))
    assert store.read("t").count() == 900


def test_restore_resurrects_target_dvs(spark, store):
    _seed(spark, store)  # v1
    store.delete_where("t", [("k", "=", 1)], mode="mor")  # v2
    store.delete_where("t", [("k", "=", 2)], mode="mor")  # v3
    store.restore("t", 2)  # v4: back to one delete
    assert store.read("t").count() == 900
    assert store.read("t").filter("k = 1").count() == 0
    assert store.read("t").filter("k = 2").count() == 100
    assert store.table_stats("t")["rows"] == 900
    store.restore("t", 1)  # v5: back to no deletes
    assert store.read("t").count() == 1000
    assert not _dvs(store, "t")


def test_metadata_commits_carry_dvs(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 9)], mode="mor")
    store.set_check("t", "v_nonneg", "v >= 0")
    assert store.read("t").count() == 900
    store.drop_check("t", "v_nonneg")
    store.rename_column("t", "v", "val")
    assert store.read("t").count() == 900
    store.drop_column("t", "val")
    got = store.read("t")
    assert got.count() == 900 and "val" not in got.columns
    # appends carry too
    extra = (
        spark.range(2000, 2100)
        .withColumn("k", F.lit(99))
    )
    store.write_append(extra, "t")
    assert store.read("t").count() == 1000
    assert store.read("t").filter("k = 9").count() == 0


def test_change_feed_emits_exact_mor_deletes(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 5)], mode="mor")
    changes = store.read_changes("t", 1, 2)
    rows = changes.collect()
    assert len(rows) == 100
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert {r["k"] for r in rows} == {5}
    # a second, overlapping MoR delete emits only the NEW positions
    store.delete_where("t", [("k", "in", [5, 6])], mode="mor")
    rows2 = store.read_changes("t", 2, 3).collect()
    assert len(rows2) == 100
    assert {r["k"] for r in rows2} == {6}


def test_change_feed_cow_after_mor_not_double_counted(spark, store):
    _seed(spark, store)
    store.delete_where("t", [("k", "=", 5)], mode="mor")  # v2
    store.delete_where("t", [("id", "<", 200)])  # v3, COW, overlaps k=5
    rows = store.read_changes("t", 2, 3).collect()
    # k=5 rows with id<200 were already deleted at v2 — not re-emitted
    assert len(rows) == 200 - 20
    assert not [r for r in rows if r["k"] == 5]


def test_dv_consolidation_bounds_sidecar_count(spark, store):
    _seed(spark, store, n=1000)
    for i in range(10):
        store.delete_where("t", [("id", "=", i)], mode="mor")
    dvs = _dvs(store, "t")
    assert len(dvs) <= store._DV_CONSOLIDATE_AT + 1
    assert sum(d["rows"] for d in dvs) == 10
    assert store.read("t").count() == 990
    assert store.table_stats("t")["rows"] == 990


def test_concurrent_mor_deletes_conflict(spark, store, tmp_path, monkeypatch):
    """Writer A stages a MoR delete; writer B lands another MoR delete
    first. A must NOT rebase (its DV list would drop B's deletes)."""
    _seed(spark, store)
    orig = CommitLogTableStore._commit
    fired = {"done": False}

    def race(self, table_name, manifest, version):
        if not fired["done"] and manifest.get("op") == "delete":
            fired["done"] = True
            other = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
            other.delete_where(table_name, [("k", "=", 8)], mode="mor")
        return orig(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", race)
    with pytest.raises(ConcurrentCommitError, match="deletion-vector"):
        store.delete_where("t", [("k", "=", 3)], mode="mor")
    # B's delete survived; re-running A converges
    monkeypatch.setattr(CommitLogTableStore, "_commit", orig)
    store.delete_where("t", [("k", "=", 3)], mode="mor")
    assert store.read("t").count() == 800


def test_mor_delete_rebases_past_disjoint_append(
    spark, store, tmp_path, monkeypatch
):
    _seed(spark, store)
    orig = CommitLogTableStore._commit
    fired = {"done": False}

    def race(self, table_name, manifest, version):
        if not fired["done"] and manifest.get("op") == "delete":
            fired["done"] = True
            other = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
            extra = (
                spark.range(5000, 5100)
                .withColumn("k", F.lit(50))
                .withColumn("v", F.lit(0))
            )
            other.write_append(extra, table_name)
        return orig(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", race)
    r = store.delete_where("t", [("k", "=", 3)], mode="mor")
    assert r["deleted_rows"] == 100
    got = store.read("t")
    assert got.count() == 1000 - 100 + 100
    assert got.filter("k = 50").count() == 100


def test_mor_delete_after_column_rename(spark, store):
    """Position deletes are name-independent: delete through the
    LOGICAL name on a renamed column."""
    _seed(spark, store)
    store.rename_column("t", "k", "kind")
    r = store.delete_where("t", [("kind", "=", 3)], mode="mor")
    assert r["deleted_rows"] == 100
    assert store.read("t").filter("kind = 3").count() == 0
    assert store.read("t").count() == 900


def test_diff_snapshots_sees_mor_deletes(spark, store):
    df = (
        spark.range(0, 300)
        .withColumn("k", F.col("id") % 3)
        .withColumn("v", F.lit(1))
    )
    store.write_append(df, "t")
    store.delete_where("t", [("k", "=", 1)], mode="mor")
    diff = store.diff_snapshots("t", 1, 2, primary_keys=["id"])
    rows = diff.collect()
    assert len(rows) == 100
    assert {r["_change_type"] for r in rows} == {"delete"}


def test_optimize_packs_small_files_only(spark, store):
    """OPTIMIZE rewrites the small-file tail, carries big files by
    reference, applies + retires DVs on the rewritten files, and emits
    no change-feed rows."""
    big = spark.range(0, 20000).withColumn("k", F.col("id") % 10).coalesce(1)
    store.write_append(big, "t")  # one big file
    for i in range(3):  # small appends — the sync-cadence tail
        store.write_append(
            spark.range(20000 + i * 10, 20010 + i * 10).withColumn(
                "k", F.lit(77)
            ),
            "t",
        )
    man = store._latest_commit("t")[1]
    big_paths = {
        f'{e["path"]}/{f["path"]}'
        for e in man["entries"]
        for f in e["files"]
        if (f.get("bytes") or 0) >= 4096
    }
    store.delete_where("t", [("id", "=", 20001)], mode="mor")  # DV on small
    res = store.optimize("t", small_file_bytes=4096)
    assert res["optimized"] and res["files_rewritten"] >= 3
    man2 = store._latest_commit("t")[1]
    paths2 = {
        f'{e["path"]}/{f["path"]}'
        for e in man2["entries"]
        for f in e["files"]
    }
    assert big_paths <= paths2  # big files carried BY REFERENCE
    assert store.read("t").count() == 20000 + 30 - 1
    assert not man2.get("delete_vectors")  # DV applied + retired
    # CDF: bytes moved, no row changes
    v = store.latest_version("t")
    assert store.read_changes("t", v - 1, v).count() == 0
    # second run: nothing left to pack
    res2 = store.optimize("t", small_file_bytes=4096)
    assert not res2["optimized"]


def test_optimize_rebases_past_concurrent_append(
    spark, store, tmp_path, monkeypatch
):
    for i in range(3):
        store.write_append(
            spark.range(i * 10, i * 10 + 10).withColumn("k", F.lit(1)), "t"
        )
    orig = CommitLogTableStore._commit
    fired = {"done": False}

    def race(self, table_name, manifest, version):
        if not fired["done"] and manifest.get("op") == "compact":
            fired["done"] = True
            other = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
            other.write_append(
                spark.range(1000, 1010).withColumn("k", F.lit(9)),
                table_name,
                txn=("app", 4),
            )
        return orig(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", race)
    res = store.optimize("t", small_file_bytes=1 << 20)
    monkeypatch.undo()
    assert res["optimized"]
    assert store.read("t").count() == 40
    assert store.txn_version("t", "app") == 4  # watermark carried on rebase


def test_optimize_preserves_bucket_layout(spark, store):
    store.merge_buckets = 4
    df = (
        spark.range(0, 200)
        .withColumn("k", F.col("id") % 10)
        .withColumn(
            "_airbyte_raw_id", F.concat(F.lit("a"), F.col("id"))
        )
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    store.write_merge(df, "m", ["id"])
    for i in range(2):
        store.write_append(
            spark.range(1000 + i * 5, 1005 + i * 5)
            .withColumn("k", F.lit(0))
            .withColumn(
                "_airbyte_raw_id", F.concat(F.lit("b"), F.col("id"))
            )
            .withColumn("_airbyte_extracted_at", F.current_timestamp()),
            "m",
            ["id"],
        )
    res = store.optimize("m", small_file_bytes=1 << 20)
    assert res["optimized"]
    assert store.read("m").count() == 210
    # a later incremental merge still routes correctly (bucket column
    # survived the rewrite)
    upd = (
        spark.range(0, 10)
        .withColumn("k", F.lit(42))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("c"), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2030-01-01 00:00:00").cast("timestamp"),
        )
    )
    store.write_merge(upd, "m", ["id"])
    got = store.read("m")
    assert got.count() == 210
    assert got.filter("id < 10 and k = 42").count() == 10
