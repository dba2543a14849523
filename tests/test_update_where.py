"""update_where: file-pruned SQL UPDATE with pre-update-value
semantics, plus change-feed post-images."""

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
        .withColumn("x", F.col("id") * 10)
        .withColumn("v", F.concat(F.lit("v"), F.col("id").cast("string")))
        .withColumn("_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id")))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )


def test_update_matching_rows_only(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    res = store.update_where("t", [("id", ">=", 90)], {"v": F.lit("HOT")})
    assert res["updated_rows"] == 10
    assert res["version"] == 2
    got = store.read("t")
    assert got.filter(F.col("v") == "HOT").count() == 10
    assert got.filter((F.col("id") < 90) & (F.col("v") == "HOT")).count() == 0
    assert got.count() == 100


def test_update_prunes_untouched_files(spark, store):
    for lo in (0, 100, 200, 300):
        store.write_append(_df(spark, lo, lo + 100), "t")
    res = store.update_where("t", [("id", ">=", 350)], {"x": "x + 1"})
    assert res["updated_rows"] == 50
    assert res["files_rewritten"] == 1
    got = store.read("t")
    assert got.count() == 400
    assert got.filter(F.col("x") % 10 == 1).count() == 50


def test_update_assignments_see_pre_update_values(spark, store):
    """SQL UPDATE: all RHS expressions and the predicate evaluate
    against the row's PRE-update values (swap must really swap)."""
    df = (
        spark.createDataFrame([(1, 10, 20)], "id bigint, a bigint, b bigint")
        .withColumn("_airbyte_raw_id", F.lit("r1"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )
    store.write_append(df, "t")
    store.update_where("t", [("id", "=", 1)], {"a": "b", "b": "a"})
    (row,) = store.read("t").select("a", "b").collect()
    assert (row["a"], row["b"]) == (20, 10)


def test_update_sql_expression_strings(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    store.update_where(
        "t", [("id", "<", 5)], {"x": "x * 2", "v": "upper(v)"}
    )
    got = {r["id"]: (r["x"], r["v"]) for r in store.read("t").collect()}
    assert got[3] == (60, "V3")
    assert got[7] == (70, "v7")


def test_update_guards(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    with pytest.raises(ValueError, match="requires predicates"):
        store.update_where("t", [], {"x": "1"})
    with pytest.raises(ValueError, match="requires assignments"):
        store.update_where("t", [("id", "=", 1)], {})
    with pytest.raises(ValueError, match="bookkeeping"):
        store.update_where("t", [("id", "=", 1)], {"_airbyte_raw_id": "'x'"})
    with pytest.raises(ValueError, match="unknown column"):
        store.update_where("t", [("id", "=", 1)], {"nope": "1"})


def test_update_rejects_primary_key_assignment(spark, tmp_path):
    """Regression: SET on a merge pk would keep the row's old
    __pk_bucket, so a later merge hashes the new pk to a different
    bucket and dedup never sees the stale row → duplicate pks on
    read. The store must refuse."""
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, 0, 50), "t", ["id"])
    with pytest.raises(ValueError, match="merge primary key"):
        store.update_where("t", [("id", "=", 3)], {"id": "7"})
    # non-pk assignments on the same table still work
    res = store.update_where("t", [("id", "=", 3)], {"v": F.lit("OK")})
    assert res["updated_rows"] == 1


def test_update_no_match_publishes_nothing(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    res = store.update_where("t", [("id", ">", 999)], {"x": "0"})
    assert res == {"updated_rows": 0, "files_rewritten": 0, "version": 1}


def test_update_change_feed_emits_postimages(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    store.update_where("t", [("id", "in", [2, 5])], {"v": F.lit("NEW")})
    feed = store.read_changes("t", 1)
    rows = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in feed.select("_change_type", "id", "v").collect()
    )
    assert rows == [
        ("update_postimage", 2, "NEW"),
        ("update_postimage", 5, "NEW"),
    ]


def test_update_noop_assignment_feed_is_silent(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    res = store.update_where("t", [("id", "=", 3)], {"x": "x"})
    assert res["updated_rows"] == 1  # matched (rows counted by predicate)
    assert store.read_changes("t", 1).count() == 0  # but values unchanged


def test_update_time_travel(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    store.update_where("t", [("id", "=", 1)], {"v": F.lit("B")})
    assert store.read_version("t", 1).filter(F.col("v") == "B").count() == 0
    assert store.read("t").filter(F.col("v") == "B").count() == 1


def test_update_bucketed_then_merge(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, 0, 200), "t", ["id"])
    store.update_where("t", [("id", "<", 20)], {"v": F.lit("U")})
    assert store.read("t").filter(F.col("v") == "U").count() == 20
    store.write_merge(
        _df(spark, 10, 15, raw_prefix="z").withColumn("v", F.lit("M")),
        "t",
        ["id"],
    )
    got = store.read("t")
    assert got.count() == 200
    assert got.filter(F.col("v") == "M").count() == 5
    assert got.filter(F.col("v") == "U").count() == 15


# -- merge-on-read UPDATE (position delete + postimage append) ---------------


def test_mor_update_matches_cow_result(spark, store, tmp_path):
    """mode='mor' produces the same table state as mode='cow' — only
    the physical encoding differs (DV + appended postimages vs file
    rewrite)."""
    cow = CommitLogTableStore(spark, str(tmp_path / "wh2"), "main")
    for s in (store, cow):
        s.write_append(_df(spark, 0, 100), "t")
    r_mor = store.update_where(
        "t", [("id", ">=", 90)], {"v": F.lit("HOT"), "x": "x + 1"},
        mode="mor",
    )
    r_cow = cow.update_where(
        "t", [("id", ">=", 90)], {"v": F.lit("HOT"), "x": "x + 1"}
    )
    assert r_mor["updated_rows"] == r_cow["updated_rows"] == 10
    assert r_mor["files_rewritten"] == 0
    key = lambda s: sorted(  # noqa: E731
        tuple(r) for r in s.read("t").select("id", "x", "v").collect()
    )
    assert key(store) == key(cow)
    # physical encoding: entries grew by ONE (postimages), none shrank
    man = store._read_manifest("t", store.latest_version("t"))
    assert len(man["entries"]) == 2
    assert not any(e.get("pruned") for e in man["entries"])
    assert man.get("delete_vectors")


def test_mor_update_cdf_and_preimages(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    store.update_where(
        "t", [("id", "<", 3)], {"x": "x + 1000"}, mode="mor"
    )
    v = store.latest_version("t")
    feed = store.read_changes("t", v - 1, v, include_preimages=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type == {
        "update_postimage": {0, 1, 2},
        "update_preimage": {0, 1, 2},
    }
    post = {
        r["id"]: r["x"]
        for r in feed.filter("_change_type = 'update_postimage'").collect()
    }
    assert post == {0: 1000, 1: 1010, 2: 1020}


def test_mor_update_noop_feed_silent_and_no_match(spark, store):
    store.write_append(_df(spark, 0, 50), "t")
    v0 = store.latest_version("t")
    r = store.update_where("t", [("id", ">", 999)], {"x": "x + 1"}, mode="mor")
    assert r["updated_rows"] == 0 and store.latest_version("t") == v0
    store.update_where("t", [("id", "<", 5)], {"x": "x"}, mode="mor")
    v = store.latest_version("t")
    assert store.read_changes("t", v - 1, v).count() == 0  # no-op suppressed
    assert store.read("t").count() == 50


def test_mor_update_stacks_with_mor_delete_and_compact(spark, store):
    """MoR delete then MoR update then MoR update again: DVs stack,
    reads stay exact, compact materializes everything."""
    store.write_append(_df(spark, 0, 100), "t")
    store.delete_where("t", [("id", "<", 10)], mode="mor")
    r1 = store.update_where(
        "t", [("id", "<", 20)], {"v": F.lit("A")}, mode="mor"
    )
    assert r1["updated_rows"] == 10  # 0-9 already MoR-deleted
    r2 = store.update_where(
        "t", [("id", "<", 15)], {"v": F.lit("B")}, mode="mor"
    )
    assert r2["updated_rows"] == 5  # only 10-14 still match live rows
    got = {r["id"]: r["v"] for r in store.read("t").collect()}
    assert len(got) == 90 and 5 not in got
    assert all(got[i] == "B" for i in range(10, 15))
    assert all(got[i] == "A" for i in range(15, 20))
    assert got[50] == "v50"
    before = sorted(got.items())
    store.compact("t")
    man = store._read_manifest("t", store.latest_version("t"))
    assert not man.get("delete_vectors")
    after = sorted(
        (r["id"], r["v"]) for r in store.read("t").collect()
    )
    assert before == after


def test_mor_update_respects_guards(spark, store, tmp_path):
    pk = CommitLogTableStore(spark, str(tmp_path / "wh3"), "main")
    pk.write_merge(_df(spark, 0, 20), "t", ["id"])
    with pytest.raises(ValueError, match="primary key"):
        pk.update_where("t", [("x", "=", 0)], {"id": "id + 1"}, mode="mor")
    store.write_append(_df(spark, 0, 20), "t")
    with pytest.raises(ValueError, match="unknown column"):
        store.update_where("t", [("id", "<", 5)], {"zz": "1"}, mode="mor")
    with pytest.raises(ValueError, match="unknown update mode"):
        store.update_where("t", [("id", "<", 5)], {"x": "1"}, mode="wat")
