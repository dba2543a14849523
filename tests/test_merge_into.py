"""Clause-based MERGE INTO (Delta's matched/not-matched subset) for
the commit-log store: update / delete / insert clauses, bucketed
incremental rewrites, renamed tables, deletion-vector interaction,
duplicate-source rejection, and CDF classification (including the
deletes the latest-wins upsert path can never produce).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _target(spark, store, name="t", buckets=None):
    if buckets:
        store.merge_buckets = buckets
    df = (
        spark.range(0, 100)
        .withColumn("v", F.col("id").cast("long"))
        .withColumn("flag", F.lit("old"))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("a"), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
    )
    if buckets:
        store.write_merge(df, name, ["id"])
    else:
        store.write_append(df, name)
    return name


def _src(spark, ids, v=1000):
    return (
        spark.createDataFrame([(i,) for i in ids], ["id"])
        .withColumn("v", F.lit(v).cast("long"))
        .withColumn("flag", F.lit("new"))
    )


def test_all_three_clauses(spark, store):
    _target(spark, store)
    res = store.merge_into(
        "t",
        _src(spark, [5, 6, 7, 200, 201]),
        ["id"],
        when_matched_update={"v": "s.v + t.v", "flag": "s.flag"},
        when_matched_delete="t.id = 7",
        when_not_matched_insert=True,
    )
    assert res["inserted"] == 2 and res["updated"] == 2 and res["deleted"] == 1
    got = {r["id"]: r for r in store.read("t").collect()}
    assert len(got) == 100 - 1 + 2
    assert got[5]["v"] == 1005 and got[5]["flag"] == "new"
    assert got[6]["v"] == 1006
    assert 7 not in got
    assert got[200]["v"] == 1000 and got[200]["flag"] == "new"
    assert got[1]["v"] == 1 and got[1]["flag"] == "old"  # untouched


def test_update_only_and_delete_only(spark, store):
    _target(spark, store)
    res = store.merge_into(
        "t",
        _src(spark, [1, 500]),
        ["id"],
        when_matched_update={"v": "0"},
        when_not_matched_insert=False,
    )
    assert res == {
        "inserted": 0,
        "updated": 1,
        "deleted": 0,
        "version": res["version"],
    }
    assert store.read("t").count() == 100
    res2 = store.merge_into(
        "t",
        _src(spark, [2, 3]),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert res2["deleted"] == 2
    assert store.read("t").count() == 98


def test_bucketed_incremental_touches_only_source_buckets(spark, store):
    _target(spark, store, buckets=8)
    man_before = store._latest_commit("t")[1]
    res = store.merge_into(
        "t",
        _src(spark, [10, 300]),
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    man_after = store._latest_commit("t")[1]
    # untouched buckets carried by reference (same entry paths live)
    before_paths = {e["path"] for e in man_before["entries"]}
    after_paths = {e["path"] for e in man_after["entries"]}
    assert before_paths & after_paths, "expected carried entries"
    got = {r["id"]: r["v"] for r in store.read("t").collect()}
    assert got[10] == 1000 and got[300] == 1000 and len(got) == 101
    # a later latest-wins merge still routes (bucket layout intact)
    df = (
        spark.range(0, 5)
        .withColumn("v", F.lit(7).cast("long"))
        .withColumn("flag", F.lit("m"))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("z"), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2030-01-01 00:00:00").cast("timestamp"),
        )
    )
    store.write_merge(df, "t", ["id"])
    got2 = {r["id"]: r["v"] for r in store.read("t").collect()}
    assert got2[0] == 7 and len(got2) == 101


def test_merge_into_respects_deletion_vectors(spark, store):
    _target(spark, store)
    store.delete_where("t", [("id", "<", 10)], mode="mor")
    res = store.merge_into(
        "t",
        _src(spark, [5, 50]),
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,
    )
    # id=5 is MoR-deleted → NOT matched → re-inserted as a new row
    assert res["inserted"] == 1 and res["updated"] == 1
    got = {r["id"]: r for r in store.read("t").collect()}
    assert got[5]["v"] == 1000 and got[5]["flag"] == "new"
    assert got[50]["v"] == 1000
    assert 3 not in got  # other MoR-deleted ids stay deleted
    assert store.read("t").count() == 100 - 10 + 1 + 1 - 1


def test_merge_into_on_renamed_column(spark, store):
    _target(spark, store)
    store.rename_column("t", "v", "val")
    res = store.merge_into(
        "t",
        _src(spark, [5]).withColumnRenamed("v", "val"),
        ["id"],
        when_matched_update={"val": "s.val + t.val"},
        when_not_matched_insert=False,
    )
    assert res["updated"] == 1
    got = {r["id"]: r["val"] for r in store.read("t").collect()}
    assert got[5] == 1005


def test_duplicate_source_keys_rejected(spark, store):
    _target(spark, store)
    dup = _src(spark, [5, 5])
    with pytest.raises(Exception, match="MERGE_SOURCE_DUPLICATE"):
        store.merge_into(
            "t", dup, ["id"], when_matched_update={"v": "s.v"}
        )
    assert store.latest_version("t") == 1  # nothing committed


def test_cdf_classifies_merge_into_changes(spark, store):
    _target(spark, store, buckets=4)
    store.merge_into(
        "t",
        _src(spark, [5, 6, 300]),
        ["id"],
        when_matched_update={"v": "s.v"},
        when_matched_delete="t.id = 6",
        when_not_matched_insert=True,
    )
    v = store.latest_version("t")
    feed = store.read_changes("t", v - 1, v)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type == {
        "insert": {300},
        "update_postimage": {5},
        "delete": {6},
    }
    # preimages pair with the update
    pre = [
        r
        for r in store.read_changes(
            "t", v - 1, v, include_preimages=True
        ).collect()
        if r["_change_type"] == "update_preimage"
    ]
    assert len(pre) == 1 and pre[0]["id"] == 5 and pre[0]["v"] == 5


# -- WHEN NOT MATCHED BY SOURCE (Delta's full-sync idiom) --------------------


def test_not_matched_by_source_delete_full_sync(spark, store):
    """MERGE … WHEN NOT MATCHED BY SOURCE THEN DELETE makes the target
    exactly mirror the source."""
    _target(spark, store)
    res = store.merge_into(
        "t",
        _src(spark, [0, 1, 2, 200]),
        ["id"],
        when_matched_update={"v": "s.v", "flag": "s.flag"},
        when_not_matched_insert=True,
        when_not_matched_by_source_delete=True,
    )
    assert res["inserted"] == 1 and res["updated"] == 3
    assert res["deleted"] == 97
    got = {r["id"]: r for r in store.read("t").collect()}
    assert set(got) == {0, 1, 2, 200}
    assert all(r["v"] == 1000 and r["flag"] == "new" for r in got.values())


def test_not_matched_by_source_update_and_predicate_delete(spark, store):
    """BY SOURCE update marks stale rows (t.* exprs; source columns
    NULL); a BY SOURCE delete predicate scopes the drop."""
    _target(spark, store)
    res = store.merge_into(
        "t",
        _src(spark, [0, 1]),
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=False,
        when_not_matched_by_source_update={"flag": "'stale'"},
        when_not_matched_by_source_delete="t.id >= 90",
    )
    assert res["inserted"] == 0
    assert res["updated"] == 2 + 88  # matched + by-source marks
    assert res["deleted"] == 10
    got = {r["id"]: r for r in store.read("t").collect()}
    assert len(got) == 90
    assert got[0]["v"] == 1000 and got[0]["flag"] == "old"
    assert got[5]["flag"] == "stale" and got[5]["v"] == 5
    assert 95 not in got


def test_by_source_forces_full_path_on_bucketed_table(spark, store):
    """On a bucketed table the BY SOURCE clauses read every bucket
    (absence from the source is global) — results identical to the
    unbucketed path, and untouched-bucket rows still get marked."""
    _target(spark, store, buckets=8)
    res = store.merge_into(
        "t",
        _src(spark, [3]),
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=False,
        when_not_matched_by_source_update={"flag": "'stale'"},
    )
    assert res["updated"] == 100
    got = {r["id"]: r for r in store.read("t").collect()}
    assert got[3]["v"] == 1000 and got[3]["flag"] == "old"
    assert all(
        r["flag"] == "stale" for i, r in got.items() if i != 3
    )


def test_by_source_only_clause_and_cdf(spark, store):
    """A BY-SOURCE-only merge is legal (prune stale rows against a
    snapshot feed) and the change feed classifies its deletes."""
    _target(spark, store)
    v0 = store.latest_version("t")
    res = store.merge_into(
        "t",
        _src(spark, list(range(50))),
        ["id"],
        when_not_matched_insert=False,
        when_not_matched_by_source_delete=True,
    )
    assert res["deleted"] == 50 and res["updated"] == 0
    feed = store.read_changes("t", v0, store.latest_version("t"))
    kinds = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert kinds.get("delete") == 50
    assert not kinds.get("insert")


def test_schema_evolution_adds_source_columns(spark, store):
    """Delta autoMerge semantics: schema_evolution=True adds
    source-only columns — inserts carry source values, updates only
    when a clause names them, pre-existing rows read NULL; follow-up
    appends see the evolved schema."""
    _target(spark, store)
    src = _src(spark, [5, 6, 200]).withColumn(
        "score", F.col("id").cast("double") / 2
    )
    # default: extra source columns are ignored (target-shaped)
    store.merge_into(
        "t", src, ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=False,
    )
    assert "score" not in store.read("t").columns
    res = store.merge_into(
        "t", src, ["id"],
        when_matched_update={"v": "s.v + 1", "score": "s.score"},
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    assert res["inserted"] == 1 and res["updated"] == 2
    got = {r["id"]: r for r in store.read("t").collect()}
    assert got[200]["score"] == 100.0          # insert: source value
    assert got[5]["score"] == 2.5              # update clause named it
    assert got[50]["score"] is None            # untouched row: NULL
    assert store.read("t").schema["score"].dataType.simpleString() == "double"
    # the evolved schema is the table's schema for later writers
    store.merge_into(
        "t",
        _src(spark, [300]).withColumn("score", F.lit(9.0)),
        ["id"],
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    got2 = {r["id"]: r for r in store.read("t").collect()}
    assert got2[300]["score"] == 9.0 and got2[50]["score"] is None


def test_schema_evolution_bucketed_incremental(spark, store):
    """Evolution on the bucketed incremental path: untouched buckets
    carry BY REFERENCE (no rewrite) yet read NULL for the new column
    via schema merge."""
    _target(spark, store, buckets=8)
    src = _src(spark, [3, 4]).withColumn("note", F.lit("tagged"))
    before = {
        e["path"]
        for e in store._read_manifest("t", store.latest_version("t"))[
            "entries"
        ]
    }
    res = store.merge_into(
        "t", src, ["id"],
        when_matched_update={"v": "s.v", "note": "s.note"},
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    assert res["updated"] == 2
    man = store._read_manifest("t", store.latest_version("t"))
    assert before & {e["path"] for e in man["entries"]}, (
        "untouched buckets must carry by reference"
    )
    got = {r["id"]: r for r in store.read("t").collect()}
    assert got[3]["note"] == "tagged" and got[4]["note"] == "tagged"
    assert got[77]["note"] is None
    assert store.read("t").count() == 100
