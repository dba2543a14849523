"""Concurrent-writer liveness: optimistic concurrency across real
threads and injected races.

The guarantees (Delta-style optimistic concurrency):
- concurrent APPENDs all commit (position-independent rebase);
- MERGE re-runs its whole attempt on a lost race and converges
  (deterministic latest-wins);
- DML (delete/update) commutes past a concurrent append only when the
  appended files provably contain no predicate-matching row (zone-map
  read-set check); overlapping writes abort with
  ConcurrentCommitError — exactly one winner.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


def test_two_thread_appends_both_commit(spark, store):
    """Real-thread race: N writers appending concurrently must ALL
    land — no lost updates, no failures."""
    store.write_append(_df(spark, [(0, "base")]).coalesce(1), "t")
    errors: list[Exception] = []

    def appender(i):
        try:
            store.write_append(
                _df(spark, [(100 + i, f"w{i}")], f"p{i}").coalesce(1), "t"
            )
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rows = _rows(store.read("t"))
    assert len(rows) == 5
    assert {r[0] for r in rows} == {0, 100, 101, 102, 103}
    assert store.latest_version("t") == 5  # five distinct commits


def test_two_thread_overlapping_deletes_one_winner(spark, store):
    """Concurrent deletes over the SAME files: exactly one commits,
    the loser aborts (its rewrite was computed from a stale read
    set), and the surviving table equals the winner's result."""
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(20)]).coalesce(1), "t"
    )
    barrier = threading.Barrier(2)
    outcomes: dict[str, object] = {}
    real_commit = CommitLogTableStore._commit
    lock = threading.Lock()

    def slow_commit(self, table_name, manifest, version):
        # serialize the actual publication so both threads finish
        # staging before either commits — a guaranteed version race
        barrier.wait(timeout=30)
        with lock:
            return real_commit(self, table_name, manifest, version)

    def deleter(name, pred):
        try:
            outcomes[name] = store.delete_where("t", pred)
        except ConcurrentCommitError as e:
            outcomes[name] = e

    orig = CommitLogTableStore._commit
    CommitLogTableStore._commit = slow_commit
    try:
        t1 = threading.Thread(target=deleter, args=("a", [("id", "<", 10)]))
        t2 = threading.Thread(target=deleter, args=("b", [("id", "<", 5)]))
        t1.start(); t2.start(); t1.join(); t2.join()
    finally:
        CommitLogTableStore._commit = orig
    kinds = {
        k: ("err" if isinstance(v, Exception) else "ok")
        for k, v in outcomes.items()
    }
    assert sorted(kinds.values()) == ["err", "ok"], outcomes
    winner = next(k for k, v in kinds.items() if v == "ok")
    expect = 10 if winner == "a" else 15
    assert store.read("t").count() == expect


def test_delete_rebases_past_disjoint_concurrent_append(spark, store, monkeypatch):
    """An append of rows that provably cannot match the delete
    predicate commutes: both writes land."""
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t"
    )
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "delete" and not raced["done"]:
            raced["done"] = True
            # concurrent append lands first: ids 100+ — zone maps prove
            # they cannot match "id < 3"
            store.write_append(
                _df(spark, [(100, "x"), (101, "y")], "s").coalesce(1), "t"
            )
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    res = store.delete_where("t", [("id", "<", 3)])
    monkeypatch.undo()
    assert res["deleted_rows"] == 3
    rows = _rows(store.read("t"))
    assert len(rows) == 9  # 7 survivors + 2 appended
    assert (100, "x") in rows and (101, "y") in rows
    assert not [r for r in rows if r[0] < 3]


def test_delete_aborts_on_concurrent_matching_append(spark, store, monkeypatch):
    """An append that MAY contain predicate-matching rows cannot
    commute with the delete — the delete aborts instead of silently
    missing the new rows."""
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t"
    )
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "delete" and not raced["done"]:
            raced["done"] = True
            store.write_append(
                _df(spark, [(1, "again")], "s").coalesce(1), "t"
            )
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    with pytest.raises(ConcurrentCommitError, match="matching rows"):
        store.delete_where("t", [("id", "<", 3)])
    monkeypatch.undo()
    # the conflicting append is intact; re-running the delete resolves
    res = store.delete_where("t", [("id", "<", 3)])
    assert res["deleted_rows"] == 4  # 0,1,2 + the raced (1, "again")
    assert store.read("t").count() == 7


def test_update_aborts_on_concurrent_overlapping_dml(spark, store, monkeypatch):
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t"
    )
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "update" and not raced["done"]:
            raced["done"] = True
            store.delete_where("t", [("id", "=", 9)])  # rewrites the file
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    with pytest.raises(ConcurrentCommitError, match="overlapping"):
        store.update_where("t", [("id", "<", 3)], {"v": F.lit("U")})
    monkeypatch.undo()
    # re-run resolves against the new snapshot
    res = store.update_where("t", [("id", "<", 3)], {"v": F.lit("U")})
    assert res["updated_rows"] == 3
    assert store.read("t").count() == 9


def test_merge_race_retries_and_converges(spark, tmp_path, monkeypatch):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=4)
    store.write_merge(_df(spark, [(i, "v0") for i in range(20)], "a"), "t", ["id"])
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "merge" and not raced["done"]:
            raced["done"] = True
            # a competitor merge lands the same version first
            real = CommitLogTableStore._commit
            monkeypatch.setattr(CommitLogTableStore, "_commit", real_commit)
            try:
                store.write_merge(
                    _df(spark, [(19, "raced")], "c"), "t", ["id"]
                )
            finally:
                monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    monkeypatch.undo()
    rows = _rows(store.read("t"))
    assert len(rows) == 20  # no duplicates from the retry
    assert (3, "v1") in rows and (19, "raced") in rows
    assert rows.count((3, "v1")) == 1


def test_threaded_merges_converge_with_rebase(spark, tmp_path):
    """6 writers merge disjoint key ranges into one bucketed table
    concurrently: every row lands exactly once, latest-wins holds, and
    losers converge through the bucket-disjoint manifest rebase when
    buckets allow (or the full re-plan when they collide) — either
    way, no lost updates and a fully decided chain."""
    import threading

    from pyspark.sql import functions as F

    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    store.merge_buckets = 8

    def frame(lo, hi, tag):
        return (
            spark.range(lo, hi)
            .toDF("id")
            .withColumn("v", F.lit(tag))
            .withColumn(
                "_airbyte_raw_id", F.concat(F.lit(tag), F.col("id"))
            )
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
        )

    store.write_merge(frame(0, 10, "seed"), "t", ["id"])
    errs = []

    def worker(i):
        try:
            store.write_merge(
                frame(100 * (i + 1), 100 * (i + 1) + 20, f"w{i}"),
                "t",
                ["id"],
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    got = {r["id"]: r["v"] for r in store.read("t").select("id", "v").collect()}
    assert len(got) == 10 + 6 * 20
    for i in range(6):
        assert got[100 * (i + 1)] == f"w{i}"
    # chain fully decided and FSCK-clean
    r = store.verify_table("t")
    assert r["ok"], r["issues"]
