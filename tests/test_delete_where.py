"""delete_where: file-pruned SQL DELETE on the commit-log store, plus
its change-feed and time-travel interactions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, lo, hi, raw_prefix="r"):
    return (
        spark.range(lo, hi)
        .toDF("id")
        .withColumn("v", F.concat(F.lit("v"), F.col("id").cast("string")))
        .withColumn("_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id")))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_delete_removes_matching_rows_only(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    res = store.delete_where("t", [("id", ">=", 90)])
    assert res["deleted_rows"] == 10
    assert res["version"] == 2
    assert _ids(store.read("t")) == list(range(90))


def test_delete_prunes_untouched_files(spark, store):
    for lo in (0, 100, 200, 300):
        store.write_append(_df(spark, lo, lo + 100), "t")
    res = store.delete_where("t", [("id", ">=", 350)])
    assert res["deleted_rows"] == 50
    assert res["files_rewritten"] == 1  # only the [300,400) file matched
    assert _ids(store.read("t")) == list(range(350))
    # untouched files still carried by reference in the new manifest
    man = store._latest_commit("t")[1]
    assert sum(len(e["files"]) for e in man["entries"]) == 4


def test_delete_null_predicate_rows_stay(spark, store):
    """SQL DELETE: NULL predicate result keeps the row."""
    df = (
        spark.createDataFrame(
            [(1, 5), (2, None), (3, 50)], "id bigint, x bigint"
        )
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )
    store.write_append(df, "t")
    res = store.delete_where("t", [("x", ">", 10)])
    assert res["deleted_rows"] == 1
    assert _ids(store.read("t")) == [1, 2]  # the NULL-x row survives


def test_delete_no_match_publishes_nothing(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    res = store.delete_where("t", [("id", ">", 999)])
    assert res == {"deleted_rows": 0, "files_rewritten": 0, "version": 1}
    assert store.latest_version("t") == 1


def test_delete_requires_predicates_and_stats(spark, store):
    import json
    import os

    store.write_append(_df(spark, 0, 10), "t")
    with pytest.raises(ValueError, match="requires predicates"):
        store.delete_where("t", [])
    d = store._commits_dir("t")
    (name,) = [n for n in os.listdir(d) if n.endswith(".json")]
    p = os.path.join(d, name)
    with open(p) as fh:
        man = json.load(fh)
    for e in man["entries"]:
        e.pop("files")
    with open(p, "w") as fh:
        json.dump(man, fh)
    store._invalidate_manifests("t")  # simulate a fresh (legacy) reader
    with pytest.raises(ValueError, match="compact"):
        store.delete_where("t", [("id", "=", 1)])


def test_delete_on_bucketed_table(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, 0, 200), "t", ["id"])
    res = store.delete_where("t", [("v", "=", "v7")])
    assert res["deleted_rows"] == 1
    assert _ids(store.read("t")) == [i for i in range(200) if i != 7]
    # merge after delete works and doesn't resurrect the deleted row
    store.write_merge(
        _df(spark, 100, 110, raw_prefix="z").withColumn("v", F.lit("NEW")),
        "t",
        ["id"],
    )
    got = store.read("t")
    assert got.filter(F.col("id") == 7).count() == 0
    assert got.filter(F.col("v") == "NEW").count() == 10


def test_delete_change_feed_emits_deleted_rows(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    store.delete_where("t", [("id", "in", [3, 7])])
    feed = store.read_changes("t", 1)
    rows = sorted(
        (r["_change_type"], r["id"]) for r in feed.select("_change_type", "id").collect()
    )
    assert rows == [("delete", 3), ("delete", 7)]


def test_delete_time_travel_preserves_predelete_snapshot(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    store.delete_where("t", [("id", "<", 5)])
    assert _ids(store.read("t")) == [5, 6, 7, 8, 9]
    assert _ids(store.read_version("t", 1)) == list(range(10))


def test_delete_all_rows_keeps_schema(spark, store):
    """Deleting everything leaves an empty, schema-complete table (the
    staged keep file carries the schema) — appends still work."""
    store.write_append(_df(spark, 0, 10), "t")
    res = store.delete_where("t", [("id", ">=", 0)])
    assert res["deleted_rows"] == 10
    assert store.read("t").count() == 0
    assert "id" in store.read("t").columns
    store.write_append(_df(spark, 50, 52), "t")
    assert _ids(store.read("t")) == [50, 51]


def test_compact_then_vacuum_reclaims_deleted_bytes(spark, store):
    import os

    store.write_append(_df(spark, 0, 1000), "t")
    store.delete_where("t", [("id", ">=", 500)])
    store.compact("t")
    removed = store.vacuum("t", keep_commits=1)
    assert removed  # pre-delete dirs gone
    assert _ids(store.read("t")) == list(range(500))
    live_dirs = [
        n for n in os.listdir(store.table_path("t")) if n.startswith("d-")
    ]
    assert len(live_dirs) == 1


def test_file_level_vacuum_reclaims_deleted_files(spark, store):
    """A dir holding several files stays referenced after a delete
    drops one of them; only FILE-level vacuum can reclaim that file."""
    import os

    df = _df(spark, 0, 400).repartitionByRange(4, "id")  # 4 files, one dir
    store.write_append(df, "t")
    store.delete_where("t", [("id", ">=", 300)])  # exactly one file matches
    tdir = store.table_path("t")
    n_files_before = sum(
        1 for dp, _, ns in os.walk(tdir) for n in ns if n.endswith(".parquet")
    )
    removed = store.vacuum("t", keep_commits=1)
    # the deleted file is physically gone without a compact
    assert any("/" in r for r in removed), removed
    n_files_after = sum(
        1 for dp, _, ns in os.walk(tdir) for n in ns if n.endswith(".parquet")
    )
    assert n_files_after < n_files_before
    assert _ids(store.read("t")) == list(range(300))


def test_file_level_vacuum_respects_time_travel_window(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    store.delete_where("t", [("id", ">=", 50)])
    # keep both commits: the pre-delete version still pins its file
    removed = store.vacuum("t", keep_commits=2)
    assert removed == []
    assert _ids(store.read_version("t", 1)) == list(range(100))
    # shrink retention: now the dropped file may go
    removed = store.vacuum("t", keep_commits=1)
    assert removed
    assert _ids(store.read("t")) == list(range(50))


def test_delete_everything_reads_empty_then_recovers(spark, tmp_path):
    """DELETE matching every row leaves a legal, READABLE table: empty
    frame with the staged schema (found by the DML property machine —
    the all-files-pruned snapshot used to raise FileNotFoundError).
    The empty table must survive compact + vacuum (schema comes from
    the manifest entry, not the reclaimed data files) and accept new
    writes; MoR delete-everything behaves the same."""
    store = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=3
    )
    store.write_merge(_df(spark, 0, 5), "t", ["id"])
    store.delete_where("t", [("id", ">=", 0)])
    df = store.read("t")
    assert df.count() == 0
    assert set(df.columns) == {
        "id", "v", "_airbyte_raw_id", "_airbyte_extracted_at"
    }
    store.compact("t")
    store.vacuum("t")
    assert store.read("t").count() == 0
    store.write_merge(_df(spark, 7, 9), "t", ["id"])
    assert _ids(store.read("t")) == [7, 8]
    store.delete_where("t", [("id", ">=", 0)], mode="mor")
    assert store.read("t").count() == 0
