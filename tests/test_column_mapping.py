"""Metadata-only column rename / drop (column mapping): files keep
their physical names forever; the manifest mapping defines the
logical view; writes translate incoming names back to physical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


@pytest.fixture()
def bstore(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "bwh"), "m", merge_buckets=4)


def _df(spark, lo, hi, raw_prefix="r", vcol="v"):
    return (
        spark.range(lo, hi)
        .toDF("id")
        .withColumn(vcol, F.concat(F.lit("v"), F.col("id").cast("string")))
        .withColumn("_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id")))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )


def test_rename_is_metadata_only_and_visible(spark, store):
    import os

    store.write_append(_df(spark, 0, 10), "t")
    files_before = sorted(
        os.path.join(dp, n)
        for dp, _, ns in os.walk(store.table_path("t"))
        for n in ns
        if n.endswith(".parquet")
    )
    v = store.rename_column("t", "v", "text")
    assert v == 2
    files_after = sorted(
        os.path.join(dp, n)
        for dp, _, ns in os.walk(store.table_path("t"))
        for n in ns
        if n.endswith(".parquet")
    )
    assert files_before == files_after  # zero data I/O
    got = store.read("t")
    assert "text" in got.columns and "v" not in got.columns
    assert got.filter(F.col("text") == "v3").count() == 1


def test_rename_time_travel_sees_old_name(spark, store):
    store.write_append(_df(spark, 0, 5), "t")
    store.rename_column("t", "v", "text")
    assert "v" in store.read_version("t", 1).columns
    assert "text" in store.read_version("t", 2).columns


def test_append_after_rename_translates_names(spark, store):
    store.write_append(_df(spark, 0, 5), "t")
    store.rename_column("t", "v", "text")
    store.write_append(_df(spark, 5, 8, raw_prefix="s", vcol="text"), "t")
    got = store.read("t")
    assert got.count() == 8
    assert got.filter(F.col("text") == "v6").count() == 1
    # old and new files both serve the logical name
    assert sorted(r["id"] for r in got.select("id").collect()) == list(range(8))


def test_merge_after_rename_bucketed(spark, bstore):
    bstore.write_merge(_df(spark, 0, 100), "t", ["id"])
    bstore.rename_column("t", "v", "text")
    upd = _df(spark, 0, 5, raw_prefix="z", vcol="text").withColumn(
        "text", F.lit("NEW")
    )
    bstore.write_merge(upd, "t", ["id"])
    got = bstore.read("t")
    assert got.count() == 100
    assert got.filter(F.col("text") == "NEW").count() == 5


def test_rename_pk_then_merge_uses_physical_hash(spark, bstore):
    bstore.write_merge(_df(spark, 0, 50), "t", ["id"])
    bstore.rename_column("t", "id", "doc_id")
    upd = (
        spark.range(0, 5)
        .toDF("doc_id")
        .withColumn("v", F.lit("NEW"))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("z"), F.col("doc_id")))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    bstore.write_merge(upd, "t", ["doc_id"])
    got = bstore.read("t")
    assert got.count() == 50  # upsert, no dupes → hashing matched old layout
    assert got.filter(F.col("v") == "NEW").count() == 5


def test_read_where_and_stats_on_logical_names(spark, store):
    for lo in (0, 100):
        store.write_append(_df(spark, lo, lo + 100), "t")
    store.rename_column("t", "id", "key")
    plan = store.plan_scan("t", [("key", ">=", 150)])
    assert plan["files_selected"] == 1  # stats keyed physically, still prune
    got = store.read_where("t", [("key", ">=", 150)])
    assert "key" in got.columns
    assert got.count() == 50
    st = store.table_stats("t")
    assert st["columns"]["key"]["max"] == 199
    assert "id" not in st["columns"]


def test_delete_update_on_renamed_column(spark, store):
    store.write_append(_df(spark, 0, 20), "t")
    store.rename_column("t", "v", "text")
    res = store.delete_where("t", [("text", "=", "v3")])
    assert res["deleted_rows"] == 1
    res = store.update_where("t", [("id", "<", 2)], {"text": "upper(text)"})
    assert res["updated_rows"] == 2
    got = store.read("t")
    assert got.filter(F.col("text") == "V1").count() == 1
    assert got.count() == 19


def test_change_feed_emits_logical_names(spark, store):
    store.write_append(_df(spark, 0, 3), "t")
    store.rename_column("t", "v", "text")
    store.write_append(_df(spark, 3, 5, raw_prefix="s", vcol="text"), "t")
    feed = store.read_changes("t", 2)
    assert "text" in feed.columns
    assert feed.count() == 2


def test_drop_column_hides_everywhere(spark, store):
    store.write_append(_df(spark, 0, 10).withColumn("secret", F.lit(42)), "t")
    store.drop_column("t", "secret")
    assert "secret" not in store.read("t").columns
    assert "secret" not in store.table_stats("t")["columns"]
    assert "secret" not in store.read_where("t", [("id", "<", 5)]).columns
    # time travel still shows it
    assert "secret" in store.read_version("t", 1).columns


def test_reusing_dropped_name_is_rejected(spark, store):
    store.write_append(_df(spark, 0, 5).withColumn("secret", F.lit(1)), "t")
    store.drop_column("t", "secret")
    bad = _df(spark, 5, 8, raw_prefix="s").withColumn("secret", F.lit(2))
    with pytest.raises(ValueError, match="dropped"):
        store.write_append(bad, "t")


def test_rename_validations(spark, store):
    store.write_append(_df(spark, 0, 5), "t")
    with pytest.raises(ValueError, match="does not exist"):
        store.rename_column("t", "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("t", "v", "id")
    with pytest.raises(ValueError, match="bookkeeping"):
        store.rename_column("t", "_airbyte_raw_id", "rid")
    with pytest.raises(ValueError, match="does not exist"):
        store.drop_column("t", "nope")


def test_drop_merge_pk_rejected(spark, bstore):
    bstore.write_merge(_df(spark, 0, 10), "t", ["id"])
    with pytest.raises(ValueError, match="primary key"):
        bstore.drop_column("t", "id")


def test_rename_chain_and_full_rewrite_materializes(spark, bstore):
    """a→b→c chains through one mapping entry; a full-rewrite merge
    materializes logical names and resets the mapping."""
    bstore.write_merge(_df(spark, 0, 10), "t", ["id"])
    bstore.rename_column("t", "v", "w")
    bstore.rename_column("t", "w", "text")
    man = bstore._latest_commit("t")[1]
    assert man["column_mapping"] == {"v": "text"}
    got = bstore.read("t")
    assert "text" in got.columns and "w" not in got.columns
    # compact carries the mapping (it rewrites PHYSICAL frames) and
    # accepts the logical name as the cluster key
    bstore.compact("t", sort_by=["text"])
    man2 = bstore._latest_commit("t")[1]
    assert man2["column_mapping"] == {"v": "text"}
    assert bstore.read("t").filter(F.col("text") == "v3").count() == 1


def test_streaming_feed_reads_mapped_table_logically(spark, store):
    """Round 5: the tail reader supports column mapping (it used to
    reject mapped tables) — logical names resolve to the stable
    physical names, so history before the rename replays correctly."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pyairbyte_spark.sources.commitlog_stream import CommitLogTailReader

    store.write_append(_df(spark, 0, 3), "t")
    store.rename_column("t", "v", "text")
    schema = StructType(
        [StructField("id", LongType()), StructField("text", StringType())]
    )
    reader = CommitLogTailReader(schema, {"path": store.table_path("t")})
    it, end = reader.read({"version": 0})
    rows = sorted(it)
    assert end == {"version": 2}
    assert rows == [(0, "v0"), (1, "v1"), (2, "v2")]


def test_rename_and_drop_carry_all_top_metadata(spark, store):
    """r13: the hand-built rename/drop manifests silently dropped
    cluster_by, bloom_index and the recorded schema (every commit
    re-states top metadata; omission loses it). A rename must carry
    all three verbatim (physical names don't change); a drop clears
    only the properties anchored to the dead column."""
    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    store.write_append(df.coalesce(2), "t")
    store.set_cluster_by("t", ["id"])
    store.build_bloom_index("t", ["k"])
    store.rename_column("t", "v", "val")
    man = store._read_manifest("t", store.latest_version("t"))
    assert man.get("cluster_by") == ["id"]
    assert (man.get("bloom_index") or {}).get("columns") == ["k"]
    assert man.get("schema")  # recorded physical schema survives
    # the bloom index still prunes point lookups after the rename
    cov = store.bloom_coverage("t")
    assert cov and cov["files_covered"] == cov["files_total"]
    # drop an UNRELATED column: properties survive
    store.drop_column("t", "val")
    man2 = store._read_manifest("t", store.latest_version("t"))
    assert man2.get("cluster_by") == ["id"]
    assert (man2.get("bloom_index") or {}).get("columns") == ["k"]
    assert man2.get("schema")
    # drop the bloom-anchored column: the pointer clears (a probe
    # could never name it), clustering on id survives
    store.drop_column("t", "k")
    man3 = store._read_manifest("t", store.latest_version("t"))
    assert man3.get("bloom_index") is None
    assert man3.get("cluster_by") == ["id"]
