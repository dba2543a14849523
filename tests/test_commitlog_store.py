"""CommitLogTableStore ACID contract: crash injection, snapshot
isolation, optimistic concurrency, time travel, vacuum.

The headline test pair demonstrates WHY the commit-log store exists:
a crash between stage and publish leaves the previous snapshot fully
readable, while the parquet store's rename swap has a window in which
the table simply does not exist (reference parity note: the reference's
REPLACE is the same "atomic-ish" swap, ``sql_processor.py:1061-1087``).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import (
    BUCKET_COL,
    CommitLogTableStore,
    ConcurrentCommitError,
    TableStore,
)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, rows, raw_prefix="r"):
    """Rows of (id, v) with the airbyte bookkeeping columns merge needs."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


def test_store_init_does_not_mutate_session_conf(spark, tmp_path):
    """Constructing a store must not flip session-global parquet confs
    (that silently changes output for the caller's unrelated writes);
    an INT96 session gets a warning instead — INT96 only degrades
    temporal pruning, never correctness."""
    import warnings

    key = "spark.sql.parquet.outputTimestampType"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "INT96")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            CommitLogTableStore(spark, str(tmp_path / "wh_warn"), "main")
        assert spark.conf.get(key) == "INT96"  # untouched
        assert any("INT96" in str(w.message) for w in caught)
        # MICROS session (get_spark's default): no warning
        spark.conf.set(key, "TIMESTAMP_MICROS")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            CommitLogTableStore(spark, str(tmp_path / "wh_ok"), "main")
        assert not caught
    finally:
        spark.conf.set(key, orig)


# -- basic strategies ---------------------------------------------------------


def test_append_replace_roundtrip(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")
    store.write_append(_df(spark, [(2, "b")]), "t")
    assert _rows(store.read("t")) == [(1, "a"), (2, "b")]
    store.write_replace(_df(spark, [(9, "z")]), "t")
    assert _rows(store.read("t")) == [(9, "z")]
    assert store.table_exists("t")
    assert store.list_tables() == ["t"]


def test_merge_latest_wins_and_versions_accumulate(spark, store):
    store.write_merge(_df(spark, [(1, "v0"), (2, "v0")], "a"), "t", ["id"])
    store.write_merge(_df(spark, [(1, "v1")], "b"), "t", ["id"])
    assert _rows(store.read("t")) == [(1, "v1"), (2, "v0")]
    hist = store.history("t")
    assert [h["version"] for h in hist] == [2, 1]
    # time travel: version 1 still shows the pre-merge value
    assert _rows(store.read_version("t", 1)) == [(1, "v0"), (2, "v0")]


# -- crash injection ----------------------------------------------------------


def test_crash_before_commit_preserves_previous_snapshot(spark, store, monkeypatch):
    """Kill the writer between data staging and commit publication: the
    reader must still see the old table, byte for byte."""
    store.write_replace(_df(spark, [(1, "old")]), "t")

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(store, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.write_replace(_df(spark, [(2, "new")]), "t")
    monkeypatch.undo()
    assert _rows(store.read("t")) == [(1, "old")]
    # recovery: re-running the replace converges
    store.write_replace(_df(spark, [(2, "new")]), "t")
    assert _rows(store.read("t")) == [(2, "new")]


def test_crash_mid_merge_preserves_snapshot_and_rerun_converges(
    spark, tmp_path, monkeypatch
):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main", merge_buckets=4)
    store.write_merge(_df(spark, [(i, "v0") for i in range(20)], "a"), "t", ["id"])

    real_commit = CommitLogTableStore._commit

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before merge commit")

    monkeypatch.setattr(CommitLogTableStore, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    monkeypatch.setattr(CommitLogTableStore, "_commit", real_commit)
    # old snapshot intact — no duplicate, no partial overwrite
    assert _rows(store.read("t")) == [(i, "v0") for i in range(20)]
    # re-run converges with no duplicates
    store.write_merge(_df(spark, [(3, "v1")], "c"), "t", ["id"])
    rows = _rows(store.read("t"))
    assert rows.count((3, "v1")) == 1 and (3, "v0") not in rows
    assert len(rows) == 20


def test_parquet_store_swap_crash_exposes_missing_table(spark, tmp_path, monkeypatch):
    """The contrast case: the rename-swap parquet store crashed between
    its two renames leaves NO table — the gap the ACID store closes."""
    import pyairbyte_spark.writers as writers_mod

    store = TableStore(spark, str(tmp_path / "wh"), "main")
    store.write_replace(_df(spark, [(1, "old")]), "t")
    assert store.table_exists("t")

    real_replace = os.replace
    calls = {"n": 0}

    def crashy_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # after final→deleteme, before temp→final
            raise RuntimeError("injected crash mid-swap")
        return real_replace(src, dst)

    monkeypatch.setattr(writers_mod.os, "replace", crashy_replace)
    with pytest.raises(RuntimeError, match="mid-swap"):
        store.write_replace(_df(spark, [(2, "new")]), "t")
    monkeypatch.undo()
    # the table vanished: neither old nor new data is visible
    assert not store.table_exists("t")


# -- optimistic concurrency ---------------------------------------------------


def test_commit_version_collision_raises(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")  # publishes version 1
    with pytest.raises(ConcurrentCommitError):
        store._commit("t", {"op": "append", "entries": []}, 1)


def test_append_rebases_past_a_commit_race(spark, store, monkeypatch):
    """An append losing the version race must rebase onto the winner's
    manifest and retry — both writers' rows survive."""
    store.write_append(_df(spark, [(0, "base")]), "t")

    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if not raced["done"]:
            raced["done"] = True
            # a concurrent writer lands first with the same version
            competitor = _df(spark, [(50, "raced")])
            entry = self._stage(competitor, table_name)
            snap = self._latest_commit(table_name)
            entries = list(snap[1]["entries"]) if snap else []
            real_commit(
                self,
                table_name,
                {"op": "append", "merge_buckets": None, "entries": entries + [entry]},
                version,
            )
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    store.write_append(_df(spark, [(1, "mine")]), "t")
    monkeypatch.undo()
    rows = _rows(store.read("t"))
    assert (0, "base") in rows and (1, "mine") in rows and (50, "raced") in rows


# -- file-pruned merge --------------------------------------------------------


def test_incremental_merge_stages_only_touched_buckets(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main", merge_buckets=8)
    store.write_merge(_df(spark, [(i, "v0") for i in range(64)], "a"), "t", ["id"])
    v1_entries = store._latest_commit("t")[1]["entries"]
    assert len(v1_entries) == 1 and len(v1_entries[0]["buckets"]) == 8
    first_dir = v1_entries[0]["path"]

    store.write_merge(_df(spark, [(5, "v1")], "b"), "t", ["id"])
    man = store._latest_commit("t")[1]
    by_path = {e["path"]: e for e in man["entries"]}
    # old dir is still live for 7 buckets; the new dir carries exactly 1
    assert len(by_path[first_dir]["buckets"]) == 7
    new_dirs = [e for e in man["entries"] if e["path"] != first_dir]
    assert len(new_dirs) == 1 and len(new_dirs[0]["buckets"]) == 1
    # the staged dir physically contains ONE bucket partition
    staged = os.path.join(store.table_path("t"), new_dirs[0]["path"])
    assert (
        sum(1 for d in os.listdir(staged) if d.startswith(f"{BUCKET_COL}=")) == 1
    )
    # and correctness holds
    rows = dict(_rows(store.read("t")))
    assert rows[5] == "v1" and len(rows) == 64


def test_snapshot_prunes_superseded_bucket_data(spark, tmp_path):
    """After an incremental merge, the superseded copy of a touched
    bucket still exists on disk in the old dir but must never be read."""
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main", merge_buckets=4)
    store.write_merge(_df(spark, [(i, "v0") for i in range(16)], "a"), "t", ["id"])
    store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    rows = _rows(store.read("t"))
    assert len(rows) == 16  # no phantom duplicate of key 3's bucket-mates
    assert dict(rows)[3] == "v1"


# -- vacuum / time travel -----------------------------------------------------


def test_vacuum_reclaims_dead_dirs_and_old_versions(spark, store):
    store.write_replace(_df(spark, [(1, "a")]), "t")
    store.write_replace(_df(spark, [(2, "b")]), "t")
    store.write_replace(_df(spark, [(3, "c")]), "t")
    tdir = store.table_path("t")
    assert sum(1 for d in os.listdir(tdir) if d.startswith("d-")) == 3
    assert _rows(store.read_version("t", 1)) == [(1, "a")]

    removed = store.vacuum("t")
    assert len(removed) == 2
    assert sum(1 for d in os.listdir(tdir) if d.startswith("d-")) == 1
    assert _rows(store.read("t")) == [(3, "c")]  # latest untouched
    with pytest.raises(FileNotFoundError):
        store.read_version("t", 1)  # vacuumed away


def test_drop_removes_table(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")
    store.drop("t")
    assert not store.table_exists("t")
    assert store.list_tables() == []


def test_compact_collapses_append_fragmentation(spark, store):
    for i in range(5):
        store.write_append(_df(spark, [(i, f"v{i}")]), "t")
    assert len(store._latest_commit("t")[1]["entries"]) == 5
    res = store.compact("t")
    assert res == {"compacted": True, "dirs_before": 5, "dirs_after": 1}
    assert len(store._latest_commit("t")[1]["entries"]) == 1
    assert _rows(store.read("t")) == [(i, f"v{i}") for i in range(5)]
    # pre-compaction version still time-travels (until vacuum)
    assert len(_rows(store.read_version("t", 3))) == 3
    # idempotent second call is a no-op
    assert store.compact("t")["compacted"] is False


def test_compact_preserves_bucket_layout(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main", merge_buckets=4)
    store.write_merge(_df(spark, [(i, "v0") for i in range(16)], "a"), "t", ["id"])
    store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    assert len(store._latest_commit("t")[1]["entries"]) == 2
    res = store.compact("t")
    assert res["compacted"]
    man = store._latest_commit("t")[1]
    assert man["merge_buckets"] == 4
    assert len(man["entries"]) == 1
    assert sorted(man["entries"][0]["buckets"]) == sorted(
        set(man["entries"][0]["buckets"])
    )
    # incremental merge still prunes correctly after compaction
    store.write_merge(_df(spark, [(7, "v2")], "c"), "t", ["id"])
    rows = dict(_rows(store.read("t")))
    assert rows[3] == "v1" and rows[7] == "v2" and len(rows) == 16


def test_cache_maintenance_surface(spark, tmp_path):
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(spark, str(tmp_path / "wh"), table_format="commitlog")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    cache.write_dataframe(df, "s")
    cache.write_dataframe(spark.createDataFrame([(2, "b")], ["id", "v"]), "s")
    hist = cache.table_history("s")
    assert [h["version"] for h in hist] == [2, 1]
    assert cache.read_stream_version("s", 1).count() == 1
    assert cache.compact("s")["compacted"]
    assert cache.vacuum("s")  # reclaimed the pre-compaction dirs
    assert len(cache["s"]) == 2

    plain = SparkCache(spark, str(tmp_path / "plain"))
    with pytest.raises(NotImplementedError, match="commitlog"):
        plain.table_history("s")


# -- restore (rollback) -------------------------------------------------------


def test_restore_rolls_back_as_forward_commit(spark, store):
    store.write_replace(_df(spark, [(1, "v1")]), "t")
    store.write_replace(_df(spark, [(2, "v2")]), "t")
    store.write_append(_df(spark, [(3, "v3")], "s"), "t")
    assert _rows(store.read("t")) == [(2, "v2"), (3, "v3")]
    new_v = store.restore("t", 1)
    assert new_v == 4
    assert _rows(store.read("t")) == [(1, "v1")]
    # the rollback is itself history: pre-restore versions still read
    assert _rows(store.read_version("t", 3)) == [(2, "v2"), (3, "v3")]
    hist = store.history("t")[0]
    assert hist["op"] == "restore" and hist["restored_version"] == 1
    assert hist.get("ts")
    # change feed reports the swap
    kinds = sorted(
        (r["_change_type"], r["id"])
        for r in store.read_changes("t", 3).select("_change_type", "id").collect()
    )
    assert kinds == [("delete", 2), ("delete", 3), ("insert", 1)]
    # writes continue normally on the restored snapshot
    store.write_append(_df(spark, [(9, "new")], "z"), "t")
    assert _rows(store.read("t")) == [(1, "v1"), (9, "new")]


def test_restore_restores_table_metadata(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")
    store.set_check("t", "id_pos", "id > 0")
    store.write_append(_df(spark, [(2, "b")], "s"), "t")
    v_with_check = store.latest_version("t")
    store.drop_check("t", "id_pos")
    store.restore("t", v_with_check)
    assert store.table_checks("t") == {"id_pos": "id > 0"}


def test_restore_refuses_vacuumed_version(spark, store):
    store.write_replace(_df(spark, [(1, "v1")]), "t")
    store.write_replace(_df(spark, [(2, "v2")]), "t")
    store.vacuum("t", keep_commits=1)  # v1's data dir reclaimed
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        store.restore("t", 1)


def test_vacuum_time_based_retention(spark, store):
    """keep_hours retains every commit younger than the horizon (the
    "7 days of time travel" contract); the keep_commits floor still
    applies when the horizon keeps nothing."""
    from pyspark.sql import functions as F

    store.write_append(spark.range(0, 10).withColumn("v", F.lit(0)), "t")
    store.write_replace(
        spark.range(0, 30).withColumn("v", F.lit(1)), "t"
    )  # supersedes the appended dir
    # horizon in the future → nothing young → count floor (latest only)
    removed = store.vacuum("t", keep_commits=1, keep_hours=-1)
    assert any(r.startswith("d-") for r in removed)
    assert store.read("t").count() == 30
    # fresh history again; a 1-hour horizon keeps everything (commits
    # were written seconds ago) even with keep_commits=1
    store.write_append(spark.range(100, 110).withColumn("v", F.lit(9)), "t")
    store.write_append(spark.range(110, 120).withColumn("v", F.lit(9)), "t")
    v = store.latest_version("t")
    removed2 = store.vacuum("t", keep_commits=1, keep_hours=1.0)
    assert removed2 == []
    assert store.read_version("t", v - 1).count() == 40  # time travel intact


def test_history_reports_dv_and_txn_metadata(spark, store):
    from pyspark.sql import functions as F

    store.write_append(
        spark.range(0, 100).withColumn("k", F.col("id") % 10),
        "t",
        txn=("app", 3),
    )
    store.delete_where("t", [("k", "=", 1)], mode="mor")
    h = store.history("t")
    assert h[0]["op"] == "delete"
    assert h[0]["delete_vectors"] == 1 and h[0]["dv_rows"] == 10
    assert h[0]["txns"] == {"app": 3}
    assert h[1]["txns"] == {"app": 3}


def test_timestamp_as_of_time_travel(spark, tmp_path, monkeypatch):
    """TIMESTAMP AS OF: version_at_timestamp resolves the newest
    commit at-or-before the target; read_as_of serves that snapshot.
    Commit clocks are controlled via time.time monkeypatching."""
    import time as _time

    from pyspark.sql import functions as F

    from pyairbyte_spark import writers as w

    store = CommitLogTableStore(spark, str(tmp_path / "tt"), "main")
    clock = {"t": 1_000_000.0}
    monkeypatch.setattr(w.time, "time", lambda: clock["t"])

    def df(lo, hi):
        return (
            spark.range(lo, hi)
            .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
            .coalesce(1)
        )

    store.write_append(df(0, 10), "t")  # v1 @ 1e6
    clock["t"] = 1_000_100.0
    store.write_append(df(10, 30), "t")  # v2 @ 1e6+100
    clock["t"] = 1_000_200.0
    store.delete_where("t", [("id", "<", 5)])  # v3 @ 1e6+200
    monkeypatch.undo()
    assert store.version_at_timestamp("t", 1_000_000) == 1
    assert store.version_at_timestamp("t", 1_000_150) == 2
    assert store.version_at_timestamp("t", _time.time()) == 3
    import datetime as dt

    iso = dt.datetime.fromtimestamp(1_000_150).isoformat()
    assert store.version_at_timestamp("t", iso) == 2
    assert store.read_as_of("t", 1_000_000).count() == 10
    assert store.read_as_of("t", 1_000_199).count() == 30
    assert store.read_as_of("t", 1_000_201).count() == 25
    with pytest.raises(ValueError, match="predates"):
        store.version_at_timestamp("t", 999_999)


# -- round 10: group commit (append coalescing) -----------------------------


def test_write_appends_one_commit_many_batches(spark, tmp_path):
    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "gc"), "main")
    batches = [
        spark.range(i * 10, (i + 1) * 10)
        .withColumn("b", F.lit(i))
        .coalesce(1)
        for i in range(5)
    ]
    r = store.write_appends(batches, "t")
    assert r == {"version": 1, "appended": 5, "skipped": 0}
    assert store.latest_version("t") == 1, "5 batches, ONE commit"
    assert store.read("t").count() == 50
    man = store._read_manifest("t", 1)
    assert len(man["entries"]) == 5, "one entry per batch"
    # the change feed sees every batch's rows as inserts of v1
    ch = store.read_changes("t", 0, 1)
    assert ch.filter(F.col("_change_type") == "insert").count() == 50
    # follow-up group onto the existing table
    r2 = store.write_appends(batches[:2], "t")
    assert r2["version"] == 2 and store.read("t").count() == 70


def test_write_appends_txn_exactly_once(spark, tmp_path):
    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "gc2"), "main")
    mk = lambda lo: spark.range(lo, lo + 10).coalesce(1)  # noqa: E731
    r = store.write_appends(
        [mk(0), mk(10), mk(20)],
        "t",
        txns=[("a", 0), ("b", 0), None],
    )
    assert r["appended"] == 3 and r["version"] == 1
    # replay of the whole group: watermarked batches skip BEFORE
    # staging, the untracked frame appends again (caller's contract)
    r2 = store.write_appends(
        [mk(0), mk(10)], "t", txns=[("a", 0), ("b", 0)]
    )
    assert r2 == {"version": 1, "appended": 0, "skipped": 2}
    assert store.read("t").count() == 30
    # per-app watermarks advanced independently
    assert store.txn_version("t", "a") == 0
    assert store.txn_version("t", "b") == 0
    # two batches of one app in one group is a caller error
    with pytest.raises(ValueError, match="per app_id"):
        store.write_appends(
            [mk(0), mk(10)], "t", txns=[("a", 1), ("a", 2)]
        )


def test_write_appends_race_drops_only_duplicated_batch(
    spark, tmp_path, monkeypatch
):
    """A racer landing ONE of the group's (app, batch) watermarks
    mid-commit drops exactly that entry on the rebase; the rest land."""
    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "gc3"), "main")
    other = CommitLogTableStore(spark, str(tmp_path / "gc3"), "main")
    store.write_append(spark.range(0, 5).coalesce(1), "t")
    mk = lambda lo: spark.range(lo, lo + 10).coalesce(1)  # noqa: E731
    orig = store._commit
    raced = {"n": 0}

    def racy(table, manifest, version):
        if raced["n"] == 0 and len(manifest.get("entries") or []) > 2:
            raced["n"] = 1
            other.write_append(mk(100), "t", txn=("a", 5))
        return orig(table, manifest, version)

    monkeypatch.setattr(store, "_commit", racy)
    r = store.write_appends(
        [mk(10), mk(20)], "t", txns=[("a", 5), ("b", 1)]
    )
    assert raced["n"] == 1
    assert r["appended"] == 1 and r["skipped"] == 1
    # racer's 10 rows + our surviving batch; the duplicated (a,5)
    # batch appears exactly once
    assert store.read("t").count() == 5 + 10 + 10


def test_rebucket_table_layout_evolution(spark, store):
    """Bucket-layout evolution: resize the merge-bucket layout in one
    rewrite; rows identical (CDF-silent), DVs materialized, later
    merges hash with the new N; un-bucketing works; no-op detected."""
    store.merge_buckets = 4
    store.write_merge(_df(spark, [(i, f"v{i}") for i in range(40)]), "t", ["id"])
    assert store._persisted_buckets("t") == 4
    # outstanding deletion vectors must materialize through the rewrite
    store.delete_where("t", [("id", "=", 39)], mode="mor")
    v0 = store.latest_version("t")
    r = store.rebucket_table("t", 16)
    assert r == {"rebucketed": True, "from": 4, "to": 16}
    assert store._persisted_buckets("t") == 16
    assert store.read("t").count() == 39
    assert not store._latest_commit("t")[1].get("delete_vectors")
    # rows identical: the rewrite emits no change rows
    assert store.read_changes("t", v0).count() == 0
    # merges keep working against the new layout
    store.write_merge(_df(spark, [(3, "updated")]), "t", ["id"])
    got = {r["id"]: r["v"] for r in store.read("t").select("id", "v").collect()}
    assert got[3] == "updated" and len(got) == 39
    # un-bucket, then no-op detection
    assert store.rebucket_table("t", None)["rebucketed"] is True
    assert store._persisted_buckets("t") is None
    assert store.read("t").count() == 39
    assert store.rebucket_table("t", None)["rebucketed"] is False
    # bucketing requires recorded keys
    store.write_append(_df(spark, [(1, "x")]), "nokeys")
    with pytest.raises(ValueError, match="primary keys"):
        store.rebucket_table("nokeys", 8)


def test_verify_table_fsck(spark, store, tmp_path):
    """verify_table: clean tables pass (shallow + deep), a deleted
    data file and a size drift are caught with the offending path,
    an in-flight txn prepare raises no false alarms, and orphan
    staged dirs are counted."""
    import os

    store.write_append(_df(spark, [(1, "a"), (2, "b")]), "t")
    store.write_append(_df(spark, [(3, "c")]), "t")
    assert store.verify_table("t") == {
        "ok": True,
        "issues": [],
        "checked_files": store.verify_table("t")["checked_files"],
        "orphan_dirs": 0,
    }
    assert store.verify_table("t", deep=True)["ok"]
    # in-flight prepare: no false alarm
    store.TXN_RESOLVE_GRACE_S = 0.2
    t = store.begin_txn()
    t.write_append(_df(spark, [(9, "z")]), "t")
    t.prepare()
    assert store.verify_table("t", deep=True)["ok"]
    t.abort()
    # corrupt a data file → caught with the path named
    man = store._latest_commit("t")[1]
    e0 = next(e for e in man["entries"] if e.get("files"))
    f0 = e0["files"][0]["path"]
    victim = os.path.join(store.table_path("t"), e0["path"], f0)
    size0 = os.path.getsize(victim)
    os.remove(victim)
    r = store.verify_table("t")
    assert not r["ok"] and any("file missing" in i for i in r["issues"])
    # size drift → caught
    with open(victim, "wb") as fh:
        fh.write(b"x" * (size0 + 7))
    r2 = store.verify_table("t")
    assert not r2["ok"] and any("size drift" in i for i in r2["issues"])


def test_verify_table_deep_reports_broken_delta_chain(spark, store):
    """Regression (ADVICE r10): deep FSCK re-read unresolvable
    manifests without a guard and crashed — on exactly the broken
    delta chain it exists to diagnose. It must REPORT, never raise."""
    import os

    store.write_append(_df(spark, [(1, "a")]), "t")  # v1 (full)
    store.write_append(_df(spark, [(2, "b")]), "t")  # v2 (delta on v1)
    store.write_replace(_df(spark, [(9, "z")]), "t")  # v3 (stored full)
    os.remove(
        os.path.join(store._commits_dir("t"), f"{1:020d}.json")
    )  # v2's delta base is gone → v2 unresolvable
    store._man_cache.clear()  # drop write-time cached manifests
    r = store.verify_table("t", deep=True)
    assert not r["ok"]
    assert any("manifest unresolvable" in i for i in r["issues"])
    # the head itself stayed readable (stored full)
    assert store.read("t").count() == 1


def test_rebucket_retries_through_commit_race(spark, store):
    """Regression (ADVICE r10): rebucket published with a single
    _commit and no rebase loop — any concurrent commit discarded the
    whole one-shuffle migration. It must re-plan and retry like every
    other rewrite verb."""
    store.merge_buckets = 4
    store.write_merge(_df(spark, [(i, "v") for i in range(10)]), "t", ["id"])
    real = store._commit
    raced = {"n": 0}

    def flaky(table_name, manifest, version):
        if manifest.get("rebucketed_from") is not None and raced["n"] < 2:
            raced["n"] += 1
            # another writer lands first, twice
            store.write_append(
                _df(spark, [(100 + raced["n"], "late")]), "t"
            )
            from pyairbyte_spark.writers import ConcurrentCommitError

            raise ConcurrentCommitError("slot taken")
        return real(table_name, manifest, version)

    store._commit = flaky
    try:
        r = store.rebucket_table("t", 16)
    finally:
        store._commit = real
    assert r == {"rebucketed": True, "from": 4, "to": 16}
    assert raced["n"] == 2
    # the re-planned rewrite is based on the RACING writers' snapshot:
    # their rows survived the migration
    assert store.read("t").count() == 12
    assert store._persisted_buckets("t") == 16


def test_append_carries_primary_keys(spark, store):
    """A plain append must not drop the table's recorded merge keys:
    merge_into's key resolution, update_where's PK guard, and
    rebucket_table all read them from the LATEST manifest."""
    store.merge_buckets = 4
    store.write_merge(_df(spark, [(1, "a"), (2, "b")]), "t", ["id"])
    store.write_append(_df(spark, [(3, "c")]), "t")
    man = store._latest_commit("t")[1]
    assert man.get("primary_keys") == ["id"]
    assert man.get("merge_buckets") == 4
    # rebucket directly after an append works (previously: ValueError)
    assert store.rebucket_table("t", 8)["rebucketed"] is True
    # group commit carries them too
    store.write_appends(
        [_df(spark, [(4, "d")]), _df(spark, [(5, "e")])], "t"
    )
    assert store._latest_commit("t")[1].get("primary_keys") == ["id"]


def test_merge_rebase_reuses_stage_on_disjoint_append(spark, store):
    """A merge losing its commit race to a bucket-DISJOINT append
    (ingest landing on other keys — the dominant contention shape)
    must rebase the MANIFEST only: the staged rewrite is reused, no
    second staging job. Overlapping or metadata-changing interlopers
    force the full re-plan."""
    store.merge_buckets = 8
    store.write_merge(_df(spark, [(i, "v0") for i in range(32)], "a"), "t", ["id"])
    plans = {"n": 0}
    real_plan = store._plan_merge

    def counting_plan(*a, **k):
        plans["n"] += 1
        return real_plan(*a, **k)

    store._plan_merge = counting_plan
    real_commit = store._commit
    state = {"raced": False}

    def racing_commit(table_name, manifest, version):
        if manifest.get("op") == "merge" and not state["raced"]:
            state["raced"] = True
            # interloper: append rows whose ids hash to OTHER buckets
            # (ids 1000.. map across buckets; the merge touches only
            # id=3's bucket — pick disjoint ids by probing)
            from pyairbyte_spark.writers import BUCKET_COL

            touched = {
                r[0]
                for r in store._with_bucket(
                    _df(spark, [(3, "x")], "p"), ["id"], 8
                ).select(BUCKET_COL).collect()
            }
            cand = store._with_bucket(
                _df(spark, [(i, "late") for i in range(1000, 1040)], "L"),
                ["id"],
                8,
            )
            keep = cand.filter(~F.col(BUCKET_COL).isin(sorted(touched))).drop(
                BUCKET_COL
            )
            store._commit = real_commit  # the interloper commits cleanly
            store.write_append(keep, "t", ["id"])
            state["n_late"] = keep.count()
            store._commit = racing_commit
            from pyairbyte_spark.writers import ConcurrentCommitError

            raise ConcurrentCommitError("slot taken")
        return real_commit(table_name, manifest, version)

    store._commit = racing_commit
    try:
        plans["n"] = 0
        store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    finally:
        store._commit = real_commit
        store._plan_merge = real_plan
    assert state["raced"]
    assert plans["n"] == 1, "disjoint race must NOT re-plan the merge"
    got = {r["id"]: r["v"] for r in store.read("t").select("id", "v").collect()}
    assert got[3] == "v1" and len(got) == 32 + state["n_late"]
    assert all(got[i] == "late" for i in got if i >= 1000)


def test_merge_replans_on_overlapping_append(spark, store):
    """An interloper appending INTO a touched bucket invalidates the
    staged rewrite — the rebase must refuse and the full re-plan must
    pick the interloper's rows up (latest-wins correctness)."""
    store.merge_buckets = 4
    store.write_merge(_df(spark, [(i, "v0") for i in range(16)], "a"), "t", ["id"])
    plans = {"n": 0}
    real_plan = store._plan_merge

    def counting_plan(*a, **k):
        plans["n"] += 1
        return real_plan(*a, **k)

    store._plan_merge = counting_plan
    real_commit = store._commit
    state = {"raced": False}

    def racing_commit(table_name, manifest, version):
        if manifest.get("op") == "merge" and not state["raced"]:
            state["raced"] = True
            store._commit = real_commit
            # same KEY as the merge: same bucket, overlapping
            store.write_append(_df(spark, [(3, "older")], "zz"), "t", ["id"])
            store._commit = racing_commit
            from pyairbyte_spark.writers import ConcurrentCommitError

            raise ConcurrentCommitError("slot taken")
        return real_commit(table_name, manifest, version)

    store._commit = racing_commit
    try:
        plans["n"] = 0
        store.write_merge(_df(spark, [(3, "winner")], "newer"), "t", ["id"])
    finally:
        store._commit = real_commit
        store._plan_merge = real_plan
    assert plans["n"] == 2, "overlapping race must re-plan"
    got = {r["id"]: r["v"] for r in store.read("t").select("id", "v").collect()}
    # the re-planned merge deduped the interloper's row against the
    # merge's newer one (raw-id ordering: 'newer3' > ... latest wins
    # by extracted_at which current_timestamp gives the merge frame)
    assert len(got) == 16


def test_maintenance_plan_signals(spark, store):
    """Table doctor: healthy table -> empty plan; dir sprawl, DV
    buildup, bloom decay, commit sprawl, and a stuck txn head each
    produce their action with a concrete reason."""
    store.write_merge(_df(spark, [(i, "v") for i in range(20)], "a"), "t", ["id"])
    assert store.maintenance_plan("t") == []
    # dir sprawl
    for i in range(9):
        store.write_append(_df(spark, [(100 + i, "x")], f"p{i}"), "t")
    plan = store.maintenance_plan("t")
    assert any(
        p["action"] == "compact" and "live data dirs" in p["reason"]
        for p in plan
    )
    store.compact("t")
    assert store.maintenance_plan("t") == []
    # MoR deletion-vector buildup (thresholds tightened to trip small)
    store.delete_where("t", [("id", "=", 3)], mode="mor")
    plan = store.maintenance_plan("t", max_dv_files=0)
    assert any("deletion vectors" in p["reason"] for p in plan)
    # bloom decay: build, then rewrite files out from under it
    store.build_bloom_index("t", ["v"])
    store.compact("t")  # new files, zero covered
    plan = store.maintenance_plan("t")
    assert any(p["action"] == "refresh_bloom" for p in plan)
    store.build_bloom_index("t", ["v"], only_missing=True)
    assert not any(
        p["action"] == "refresh_bloom" for p in store.maintenance_plan("t")
    )
    # commit sprawl
    plan = store.maintenance_plan("t", max_retained_commits=3)
    assert any(p["action"] == "vacuum" for p in plan)
    # stuck txn head (undecided prepare)
    store.TXN_RESOLVE_GRACE_S = 0.2
    txn = store.begin_txn()
    txn.write_append(_df(spark, [(999, "z")], "zz"), "t")
    txn.prepare()
    plan = store.maintenance_plan("t")
    assert any(p["action"] == "resolve" for p in plan)
    txn.abort()
