"""CommitLogTableStore data skipping: manifest zone maps, clustered
compaction, file-targeted reads. Every skipping assertion is paired
with a result-equality check against the unpruned read — skipping may
only ever change I/O, never answers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, lo, hi, raw_prefix="r"):
    """ids in [lo, hi) with bookkeeping columns, single output file."""
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


def test_stage_records_per_file_stats(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    man = store._latest_commit("t")[1]
    (entry,) = man["entries"]
    assert len(entry["files"]) == 1
    f = entry["files"][0]
    assert f["rows"] == 100
    assert f["stats"]["id"] == {"min": 0, "max": 99, "nulls": 0}
    assert f["stats"]["v"]["min"] == "v0"
    assert f["bucket"] is None


def test_plan_scan_skips_disjoint_appends(spark, store):
    for lo in (0, 100, 200, 300):
        store.write_append(_df(spark, lo, lo + 100), "t")
    plan = store.plan_scan("t", [("id", ">=", 250)])
    assert plan["files_total"] == 4
    assert plan["files_selected"] == 2  # [200,300) and [300,400)
    empty = store.plan_scan("t", [("id", ">", 1000)])
    assert empty["files_selected"] == 0
    nofilter = store.plan_scan("t")
    assert nofilter["files_selected"] == 4


def test_read_where_matches_unpruned_filter(spark, store):
    for lo in (0, 100, 200):
        store.write_append(_df(spark, lo, lo + 100), "t")
    got = store.read_where("t", [("id", ">=", 150), ("id", "<", 250)])
    want = store.read("t").filter((F.col("id") >= 150) & (F.col("id") < 250))
    assert _ids(got) == _ids(want)
    assert "__pk_bucket" not in got.columns


def test_read_where_all_skipped_returns_empty_with_schema(spark, store):
    store.write_append(_df(spark, 0, 50), "t")
    out = store.read_where("t", [("id", ">", 999)])
    assert out.count() == 0
    assert "id" in out.columns and "v" in out.columns


def test_read_where_string_and_null_ops(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    assert _ids(store.read_where("t", [("v", "=", "v7")])) == [7]
    assert _ids(store.read_where("t", [("v", "is_null")])) == []
    assert len(_ids(store.read_where("t", [("v", "not_null")]))) == 10
    assert _ids(store.read_where("t", [("id", "in", [3, 5, 99])])) == [3, 5]


def test_read_where_time_travel(spark, store):
    store.write_replace(_df(spark, 0, 10), "t")
    store.write_replace(_df(spark, 100, 110), "t")
    assert _ids(store.read_where("t", [("id", "<", 50)], version=1)) == list(range(10))
    assert _ids(store.read_where("t", [("id", "<", 50)])) == []


def test_read_where_pre_stats_manifest_falls_back(spark, store):
    """Manifests written before the stats layer (no "files" key) read
    whole dirs — correct, just unskippable."""
    import json

    store.write_append(_df(spark, 0, 100), "t")
    d = store._commits_dir("t")
    (name,) = [n for n in os.listdir(d) if n.endswith(".json")]
    p = os.path.join(d, name)
    with open(p) as fh:
        man = json.load(fh)
    for e in man["entries"]:
        e.pop("files", None)
    with open(p, "w") as fh:
        json.dump(man, fh)
    store._invalidate_manifests("t")  # simulate a fresh (legacy) reader
    plan = store.plan_scan("t", [("id", ">", 999)])
    assert plan["files_total"] == 0 and plan["groups"]  # whole-dir group
    assert _ids(store.read_where("t", [("id", "<", 5)])) == list(range(5))


def test_bucketed_read_where_honors_live_buckets(spark, tmp_path):
    """After an incremental merge supersedes bucket data in an old dir,
    read_where must not resurrect the superseded files."""
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, 0, 200), "t", ["id"])
    # update a slice → touched buckets get restaged, old dir's live set shrinks
    upd = _df(spark, 0, 20, raw_prefix="s").withColumn("v", F.lit("NEW"))
    store.write_merge(upd, "t", ["id"])
    got = store.read_where("t", [("id", "<", 20)])
    assert got.count() == 20
    assert got.filter(F.col("v") != "NEW").count() == 0
    # equality with plain read under the same filter
    want = store.read("t").filter(F.col("id") < 20)
    assert sorted((r["id"], r["v"]) for r in got.collect()) == sorted(
        (r["id"], r["v"]) for r in want.collect()
    )


def test_bucketed_stage_records_file_buckets(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=4)
    store.write_merge(_df(spark, 0, 100), "t", ["id"])
    (entry,) = store._latest_commit("t")[1]["entries"]
    buckets = {f["bucket"] for f in entry["files"]}
    assert buckets <= set(range(4)) and None not in buckets
    assert set(entry["buckets"]) == buckets


def test_compact_sort_by_sharpens_skipping(spark, store):
    """Interleaved appends have overlapping id ranges (no skipping);
    a clustered compact makes file ranges disjoint."""
    # two appends, each covering the full id range (stride interleave)
    a = _df(spark, 0, 400).filter(F.col("id") % 2 == 0).coalesce(1)
    b = _df(spark, 0, 400).filter(F.col("id") % 2 == 1).coalesce(1)
    store.write_append(a, "t")
    store.write_append(b, "t")
    before = store.plan_scan("t", [("id", "<", 100)])
    assert before["files_selected"] == before["files_total"] == 2  # no skipping
    res = store.compact("t", sort_by=["id"], target_files=4)
    assert res["compacted"]
    after = store.plan_scan("t", [("id", "<", 100)])
    assert after["files_total"] == 4
    assert after["files_selected"] < after["files_total"]
    assert _ids(store.read_where("t", [("id", "<", 100)])) == list(range(100))


def test_compact_sort_by_bucketed_keeps_layout(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=4)
    store.write_merge(_df(spark, 0, 200), "t", ["id"])
    store.write_merge(_df(spark, 200, 400), "t", ["id"])
    res = store.compact("t", sort_by=["id"])
    assert res["compacted"]
    man = store._latest_commit("t")[1]
    assert man["merge_buckets"] == 4
    (entry,) = man["entries"]
    assert {f["bucket"] for f in entry["files"]} <= set(range(4))
    # merge after clustered compact still works
    store.write_merge(
        _df(spark, 0, 10, raw_prefix="z").withColumn("v", F.lit("X")), "t", ["id"]
    )
    assert store.read("t").filter(F.col("v") == "X").count() == 10
    assert store.read("t").count() == 400


def test_compact_sort_by_unknown_column_raises(spark, store):
    store.write_append(_df(spark, 0, 10), "t")
    with pytest.raises(ValueError, match="sort_by columns"):
        store.compact("t", sort_by=["nope"])


def test_cache_surface_read_where_and_clustered_compact(spark, tmp_path):
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    tname = cache.table_name("s1")
    cache.store.write_append(_df(spark, 0, 100), tname)
    cache.store.write_append(_df(spark, 100, 200), tname)
    cache.compact("s1", sort_by=["id"])
    got = cache.read_stream_where("s1", [("id", ">=", 190)])
    assert _ids(got) == list(range(190, 200))


def test_bucketed_clustered_compact_prunes_within_buckets(spark, tmp_path):
    """Range-partitioning on (bucket, key) must split each hash bucket
    into disjoint-key files so zone maps prune INSIDE buckets — the
    sort-within-one-file-per-bucket shape would never skip."""
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=4)
    store.write_merge(_df(spark, 0, 2000), "t", ["id"])
    res = store.compact("t", sort_by=["id"], target_files=12)
    assert res["compacted"]
    plan = store.plan_scan("t", [("id", ">=", 1900)])
    assert plan["files_total"] >= 12
    assert plan["files_selected"] < plan["files_total"] / 2
    got = store.read_where("t", [("id", ">=", 1900)])
    assert _ids(got) == list(range(1900, 2000))
    # merge after the range-clustered rewrite still targets buckets
    upd = _df(spark, 0, 5, raw_prefix="z").withColumn("v", F.lit("X"))
    store.write_merge(upd, "t", ["id"])
    assert store.read("t").filter(F.col("v") == "X").count() == 5
    assert store.read("t").count() == 2000


def test_table_stats_metadata_only(spark, store):
    store.write_append(_df(spark, 0, 100), "t")
    store.write_append(_df(spark, 100, 150), "t")
    st = store.table_stats("t")
    assert st["rows"] == 150
    assert st["files"] == 2
    assert st["bytes"] > 0
    assert st["columns"]["id"]["min"] == 0
    assert st["columns"]["id"]["max"] == 149
    assert st["version"] == 2
    # agrees with an actual scan
    assert st["rows"] == store.read("t").count()


def test_table_stats_bucketed_excludes_superseded(spark, tmp_path):
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, 0, 200), "t", ["id"])
    store.write_merge(
        _df(spark, 0, 20, raw_prefix="s").withColumn("v", F.lit("N")), "t", ["id"]
    )
    st = store.table_stats("t")
    assert st["rows"] == 200 == store.read("t").count()


def test_table_stats_pre_stats_manifest_returns_unknown(spark, store):
    import json

    store.write_append(_df(spark, 0, 10), "t")
    d = store._commits_dir("t")
    (name,) = [n for n in os.listdir(d) if n.endswith(".json")]
    p = os.path.join(d, name)
    with open(p) as fh:
        man = json.load(fh)
    for e in man["entries"]:
        e.pop("files", None)
    with open(p, "w") as fh:
        json.dump(man, fh)
    store._invalidate_manifests("t")  # simulate a fresh (legacy) reader
    st = store.table_stats("t")
    assert st["rows"] is None and st["files"] is None


def test_or_predicates_prune_and_filter(spark, store):
    """DNF predicates: [[...],[...]] = OR of ANDs — pruning keeps a
    file if ANY branch may match; the residual filter is the OR."""
    for lo in (0, 100, 200, 300):
        store.write_append(_df(spark, lo, lo + 100), "t")
    dnf = [[("id", "<", 50)], [("id", ">=", 350)]]
    plan = store.plan_scan("t", dnf)
    assert plan["files_total"] == 4
    assert plan["files_selected"] == 2  # first and last file only
    got = _ids(store.read_where("t", dnf))
    assert got == list(range(50)) + list(range(350, 400))
    # AND inside a branch
    dnf2 = [[("id", ">=", 10), ("id", "<", 20)], [("v", "=", "v250")]]
    assert _ids(store.read_where("t", dnf2)) == list(range(10, 20)) + [250]
    with pytest.raises(ValueError, match="all tuples"):
        store.plan_scan("t", [("id", "<", 1), [("id", ">", 2)]])


def test_or_predicates_in_delete(spark, store):
    for lo in (0, 100, 200):
        store.write_append(_df(spark, lo, lo + 100), "t")
    res = store.delete_where("t", [[("id", "<", 10)], [("id", ">=", 290)]])
    assert res["deleted_rows"] == 20
    assert res["files_rewritten"] == 2  # middle file untouched
    assert _ids(store.read("t")) == list(range(10, 290))
