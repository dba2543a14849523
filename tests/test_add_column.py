"""Metadata-only ADD COLUMN with an existing-rows default.

The exactness claim under test: because data dirs are immutable and
staged whole, every PART either predates the column (all its rows see
the recorded default) or carries it in its files (explicit NULLs stay
NULL) — `_fill_added` applies per part, before any union, so the two
populations never blur. Plus: zero data I/O at add time, writes after
the add behave normally, DML predicates/assignments on the added
column work, rename/drop compose, the change feed skips the add
commit, and full rewrites materialize the values.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _data_bytes(store, tmp_path, name):
    tdir = os.path.join(str(tmp_path / "wh"), "main", name)
    total = 0
    for root, _dirs, files in os.walk(tdir):
        if "_commits" in root:
            continue
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_add_column_zero_data_io_and_default(spark, store, tmp_path):
    store.write_append(spark.range(0, 100).withColumn("v", F.col("id")), "t")
    before = _data_bytes(store, tmp_path, "t")
    v = store.add_column("t", "score", "double", default=1.5)
    assert v == 2
    assert _data_bytes(store, tmp_path, "t") == before  # ZERO data I/O
    got = store.read("t")
    assert got.filter("score = 1.5").count() == 100
    # default NULL variant
    store.add_column("t", "note", "string")
    assert store.read("t").filter("note IS NULL").count() == 100


def test_mixed_old_and_new_files_exact_null_semantics(spark, store):
    store.write_append(spark.range(0, 50).withColumn("v", F.col("id")), "t")
    store.add_column("t", "score", "double", default=1.5)
    # post-add write with EXPLICIT NULLs for even ids
    newer = spark.range(100, 150).withColumn("v", F.col("id")).withColumn(
        "score",
        F.when(F.col("id") % 2 == 0, F.lit(None)).otherwise(F.lit(9.0)),
    )
    store.write_append(newer, "t")
    got = store.read("t")
    # pre-add rows: default, never NULL
    assert got.filter("id < 50 and score = 1.5").count() == 50
    # post-add explicit NULLs stay NULL (a union-level coalesce would
    # have overwritten them with the default)
    assert got.filter("id >= 100 and score IS NULL").count() == 25
    assert got.filter("id >= 100 and score = 9.0").count() == 25


def test_dml_on_added_column(spark, store):
    store.write_append(
        spark.range(0, 100)
        .withColumn("v", F.col("id"))
        .repartitionByRange(4, "id"),
        "t",
    )
    store.add_column("t", "score", "double", default=1.0)
    r = store.update_where("t", [("id", "<", 10)], {"score": "score + 1"})
    assert r["updated_rows"] == 10
    got = store.read("t")
    assert got.filter("score = 2.0").count() == 10
    assert got.filter("score = 1.0").count() == 90
    r2 = store.delete_where("t", [("score", "=", 2.0)])
    assert r2["deleted_rows"] == 10
    assert store.read("t").count() == 90
    # MoR delete predicated on the added column (files stay live,
    # every row position lands in the DV)
    r3 = store.delete_where("t", [("score", "=", 1.0)], mode="mor")
    assert r3["deleted_rows"] == 90
    assert store.read("t").count() == 0


def test_rename_and_drop_compose_with_added(spark, store):
    store.write_append(spark.range(0, 20).withColumn("v", F.col("id")), "t")
    store.add_column("t", "score", "double", default=0.5)
    store.rename_column("t", "score", "quality")
    got = store.read("t")
    assert "quality" in got.columns and "score" not in got.columns
    assert got.filter("quality = 0.5").count() == 20
    store.drop_column("t", "quality")
    assert "quality" not in store.read("t").columns
    # re-adding the dropped name is refused until materialized
    with pytest.raises(ValueError, match="previously dropped"):
        store.add_column("t", "score", "double")


def test_add_column_guards(spark, store):
    store.write_append(spark.range(0, 5).withColumn("v", F.col("id")), "t")
    with pytest.raises(ValueError, match="already exists"):
        store.add_column("t", "v", "long")
    with pytest.raises(ValueError, match="bookkeeping"):
        store.add_column("t", "__x", "long")
    with pytest.raises(ValueError, match="invalid column type"):
        store.add_column("t", "x", "not_a_type")
    assert store.latest_version("t") == 1  # nothing committed


def test_cdf_and_merge_after_add(spark, store):
    store.merge_buckets = 4
    df = (
        spark.range(0, 100)
        .withColumn("v", F.col("id"))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("a"), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
    )
    store.write_merge(df, "t", ["id"])
    store.add_column("t", "score", "double", default=3.0)  # v2
    v = store.latest_version("t")
    # add commit itself emits no changes
    assert store.read_changes("t", v - 1, v).count() == 0
    # merge_into updating the added column on a bucketed table
    src = spark.createDataFrame([(5,), (6,)], ["id"]).withColumn(
        "score", F.lit(7.0)
    )
    res = store.merge_into(
        "t",
        src,
        ["id"],
        when_matched_update={"score": "s.score"},
        when_not_matched_insert=False,
    )
    assert res["updated"] == 2
    got = store.read("t")
    assert got.filter("score = 7.0").count() == 2
    assert got.filter("score = 3.0").count() == 98
    # compact materializes the default into files; record may drop
    store.compact("t")
    assert store.read("t").filter("score = 3.0").count() == 98


def test_append_missing_added_column_reads_null_not_default(spark, store):
    """A post-add append that OMITS the column materializes explicit
    NULLs at write time (write_append calls _materialize_added), so
    the new rows read NULL — Delta's semantics — while pre-add rows
    keep reading the recorded default."""
    store.write_append(spark.range(0, 10).withColumn("v", F.col("id")), "t")
    store.add_column("t", "score", "double", default=2.5)
    store.write_append(
        spark.range(10, 20).withColumn("v", F.col("id")), "t"
    )
    got = store.read("t")
    assert got.filter("score = 2.5").count() == 10
    assert got.filter("score IS NULL").count() == 10
