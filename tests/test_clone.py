"""SHALLOW CLONE: zero-copy table clones referencing the source's
files by absolute base, diverging independently after the clone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, lo, hi, pre="r"):
    return (
        spark.range(lo, hi)
        .toDF("id")
        .withColumn("v", F.concat(F.lit("v"), F.col("id").cast("string")))
        .withColumn("_airbyte_raw_id", F.concat(F.lit(pre), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
        .coalesce(1)
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_clone_is_zero_copy_and_reads_equal(spark, store):
    for lo in (0, 50, 100):
        store.write_append(_df(spark, lo, lo + 50), "src")
    store.clone_table("src", "dst")
    assert _ids(store.read("dst")) == _ids(store.read("src"))
    # zero bytes copied: no data dirs under the clone's table path
    names = store.io.list_names(store.table_path("dst"))
    assert not [n for n in names if n.startswith("d-")]
    # change feed: the initial snapshot is inserts
    feed = store.read_changes("dst", 0, 1)
    assert feed.filter("_change_type = 'insert'").count() == 150


def test_clone_diverges_independently(spark, store):
    store.write_append(_df(spark, 0, 100), "src")
    store.clone_table("src", "dst")
    store.delete_where("dst", [("id", "<", 10)])
    store.update_where("dst", [("id", ">=", 90)], {"v": "'HOT'"})
    store.write_append(_df(spark, 1000, 1010, "n"), "dst")
    store.delete_where("dst", [("id", "=", 55)], mode="mor")
    got = {r["id"]: r["v"] for r in store.read("dst").collect()}
    assert len(got) == 100 - 10 - 1 + 10
    assert 5 not in got and 55 not in got
    assert got[95] == "HOT" and got[1005] == "v1005"
    # the source never moved
    assert _ids(store.read("src")) == list(range(100))
    # and source DML after the clone does not leak into the clone
    store.delete_where("src", [("id", ">=", 50)])
    assert 60 in {r["id"] for r in store.read("dst").collect()}


def test_clone_carries_mor_deletes_and_metadata(spark, store):
    store.write_append(_df(spark, 0, 40), "src")
    store.delete_where("src", [("id", "<", 5)], mode="mor")
    store.rename_column("src", "v", "val")
    store.set_check("src", "pos_id", "id >= 0")
    store.clone_table("src", "dst")
    assert _ids(store.read("dst")) == list(range(5, 40))
    assert "val" in store.read("dst").columns
    assert store.table_checks("dst") == {"pos_id": "id >= 0"}
    # fresh lineage: no txn watermarks on the clone
    assert store.txn_version("dst", "anything") == -1


def test_compact_materializes_then_source_can_die(spark, store):
    store.write_append(_df(spark, 0, 30), "src")
    store.clone_table("src", "dst")
    store.compact("dst")
    man = store._read_manifest("dst", store.latest_version("dst"))
    assert not any(e.get("base") for e in man["entries"])
    store.drop("src")
    assert _ids(store.read("dst")) == list(range(30))


def test_clone_bucketed_and_merge_on_clone(spark, store, tmp_path):
    src_store = CommitLogTableStore(
        spark, str(tmp_path / "other"), "main", merge_buckets=8
    )
    src_store.write_merge(_df(spark, 0, 80), "src", ["id"])
    # cross-store clone: source lives in a different warehouse
    store.clone_table("src", "dst", source_store=src_store)
    upd = _df(spark, 70, 90, "u").withColumn("v", F.lit("NEW"))
    store.write_merge(upd, "dst", ["id"])
    got = {r["id"]: r["v"] for r in store.read("dst").collect()}
    assert len(got) == 90
    assert got[75] == "NEW" and got[85] == "NEW" and got[5] == "v5"
    assert src_store.read("src").count() == 80


def test_clone_at_version_and_guards(spark, store):
    store.write_append(_df(spark, 0, 10), "src")  # v1
    store.write_append(_df(spark, 10, 20), "src")  # v2
    store.clone_table("src", "old", version=1)
    assert _ids(store.read("old")) == list(range(10))
    with pytest.raises(ValueError, match="already exists"):
        store.clone_table("src", "old")
    with pytest.raises(FileNotFoundError):
        store.clone_table("nope", "x")


def test_clone_distributed_scan_equivalence(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    drv = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    for lo in (0, 50, 100, 150):
        drv.write_append(_df(spark, lo, lo + 50), "src")
    drv.clone_table("src", "dst")
    drv.delete_where("dst", [("id", "<", 20)])  # mixed local/foreign
    dist = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    dist.DISTRIBUTED_SURVIVOR_COLLAPSE_MIN = 0
    for preds in ([], [("id", ">=", 120)], [("id", "<", 60)]):
        p_dist = dist.plan_scan("dst", preds)
        assert p_dist.get("distributed") is True
        a = _ids(dist.read_where("dst", preds))
        b = _ids(drv.read_where("dst", preds))
        assert a == b, preds
    # collapsed whole-dir groups resolve to the SOURCE's dirs
    plan = dist.plan_scan("dst", [])
    src_base = drv.table_path("src")
    foreign = [g for g in plan["groups"] if g["base"].startswith(src_base)]
    assert foreign, plan["groups"]


def test_clone_cdf_classifies_dml_on_foreign_files(spark, store):
    """DML on a clone touches FOREIGN-based files; the change feed's
    dir reads must resolve their base from the prior manifest."""
    store.write_append(_df(spark, 0, 60), "src")
    store.clone_table("src", "dst")
    v0 = store.latest_version("dst")
    store.delete_where("dst", [("id", "<", 10)])
    store.update_where("dst", [("id", ">=", 50)], {"v": "'X'"})
    feed = store.read_changes("dst", v0, store.latest_version("dst"))
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type["delete"] == set(range(10))
    assert by_type["update_postimage"] == set(range(50, 60))


def test_clone_of_clone_preserves_original_base(spark, store):
    """A clone of a clone references the ORIGINAL table's files (base
    carries through) — dropping the intermediate clone is harmless."""
    store.write_append(_df(spark, 0, 25), "a")
    store.clone_table("a", "b")
    store.clone_table("b", "c")
    man = store._read_manifest("c", 1)
    a_base = store.table_path("a")
    assert all(e.get("base") == a_base for e in man["entries"])
    store.drop("b")
    assert _ids(store.read("c")) == list(range(25))
