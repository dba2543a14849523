"""commitlog_feed: the ACID store as a native readStream source
(commit version = Spark offset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyairbyte_spark.sources.commitlog_stream import (
    CommitLogFeedDataSource,
    CommitLogTailReader,
    register,
)
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


def _drain(spark, store, table, name, tmp_path, start_version=0):
    """Run the feed to a parquet sink (memory sink can't recover from
    a checkpoint, and recovery is exactly what's under test)."""
    register(spark)
    reader = (
        spark.readStream.format("commitlog_feed")
        .option("path", store.table_path(table))
    )
    if start_version:
        reader = reader.option("start_version", str(start_version))
    out = str(tmp_path / f"out-{name}")
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_schema_inference_adds_version_stamp(spark, store):
    store.write_append(_df(spark, 0, 5), "t")
    ds = CommitLogFeedDataSource(
        options={"path": store.table_path("t")}
    )
    schema = ds.schema()
    assert isinstance(schema, StructType)
    assert schema.fieldNames()[-1] == "_commit_version"
    assert "id" in schema.fieldNames() and "v" in schema.fieldNames()


def test_stream_tails_appends_with_versions(spark, store, tmp_path):
    store.write_append(_df(spark, 0, 3), "t")
    store.write_append(_df(spark, 3, 5), "t")
    got = _drain(spark, store, "t", "clf_tail", tmp_path)
    rows = sorted(
        (r["id"], r["v"], r["_commit_version"]) for r in got.collect()
    )
    assert rows == [
        (0, "v0", 1),
        (1, "v1", 1),
        (2, "v2", 1),
        (3, "v3", 2),
        (4, "v4", 2),
    ]


def test_stream_resumes_from_checkpoint(spark, store, tmp_path):
    store.write_append(_df(spark, 0, 3), "t")
    first = _drain(spark, store, "t", "clf_resume", tmp_path)
    assert first.count() == 3
    store.write_append(_df(spark, 3, 7), "t")
    # same checkpoint + same memory sink: only the new commit arrives
    again = _drain(spark, store, "t", "clf_resume", tmp_path)
    assert again.count() == 3 + 4
    assert (
        again.filter(F.col("_commit_version") == 2).count() == 4
    )


def test_start_version_skips_history(spark, store, tmp_path):
    store.write_append(_df(spark, 0, 100), "t")
    store.write_append(_df(spark, 100, 105), "t")
    got = _drain(spark, store, "t", "clf_skip", tmp_path, start_version=1)
    assert sorted(r["id"] for r in got.collect()) == list(range(100, 105))


def test_compact_commits_emit_no_rows(spark, store, tmp_path):
    store.write_append(_df(spark, 0, 3), "t")
    first = _drain(spark, store, "t", "clf_compact", tmp_path)
    assert first.count() == 3
    store.write_append(_df(spark, 3, 5), "t")
    store.compact("t")
    again = _drain(spark, store, "t", "clf_compact", tmp_path)
    assert again.count() == 5  # 2 new rows, nothing re-emitted by compact


def test_merge_table_rejected_with_guidance(spark, store):
    store.write_merge(_df(spark, 0, 3), "t", ["id"])
    from pyspark.sql.types import LongType, StructField

    schema = StructType([StructField("id", LongType())])
    reader = CommitLogTailReader(schema, {"path": store.table_path("t")})
    with pytest.raises(ValueError, match="ChangeFeedFollower"):
        reader.read({"version": 0})


def test_reader_direct_offset_window(spark, store):
    """readBetweenOffsets replays a bounded window exactly."""
    store.write_append(_df(spark, 0, 3), "t")
    store.write_append(_df(spark, 3, 5), "t")
    store.write_append(_df(spark, 5, 6), "t")
    from pyspark.sql.types import LongType, StructField

    schema = StructType(
        [StructField("id", LongType()), StructField("_commit_version", LongType())]
    )
    reader = CommitLogTailReader(schema, {"path": store.table_path("t")})
    rows = list(reader.readBetweenOffsets({"version": 1}, {"version": 2}))
    assert sorted(r[0] for r in rows) == [3, 4]
    assert {r[1] for r in rows} == {2}


def test_max_files_per_trigger_throttles_replay(spark, store):
    """Rate limiting: a bounded batch replays only as many commits as
    fit the cap; the rest arrive in later read() calls. Offsets stay
    commit-aligned (a commit is never split)."""
    for lo in (0, 3, 5, 8):
        store.write_append(_df(spark, lo, lo + 2, f"p{lo}"), "t")
    from pyspark.sql.types import LongType, StructField

    schema = StructType(
        [StructField("id", LongType()), StructField("_commit_version", LongType())]
    )
    reader = CommitLogTailReader(
        schema,
        {"path": store.table_path("t"), "max_files_per_trigger": "1"},
    )
    offsets = [{"version": 0}]
    batches = []
    while True:
        it, end = reader.read(offsets[-1])
        rows = list(it)
        if end == offsets[-1]:
            break
        offsets.append(end)
        batches.append(rows)
    # each commit staged 1 file (coalesce(1)) → one commit per batch
    assert [o["version"] for o in offsets] == [0, 1, 2, 3, 4]
    assert all({r[1] for r in b} == {v} for b, v in zip(batches, (1, 2, 3, 4)))
    assert sorted(r[0] for b in batches for r in b) == [0, 1, 3, 4, 5, 6, 8, 9]
    # commit-count cap works the same way
    reader2 = CommitLogTailReader(
        schema,
        {"path": store.table_path("t"), "max_commits_per_trigger": "2"},
    )
    it, end = reader2.read({"version": 0})
    assert end == {"version": 2} and len(list(it)) == 4


def test_stream_across_rename_column_boundary(spark, store, tmp_path):
    """Schema evolution in the streaming path: commits before AND
    after a rename_column replay under the stream's logical schema
    (files keep stable physical names; the mapping bridges)."""
    store.write_append(_df(spark, 0, 3), "t")
    store.rename_column("t", "v", "val")
    store.write_append(
        _df(spark, 3, 5, "s").withColumnRenamed("v", "val"), "t"
    )
    ds = CommitLogFeedDataSource(options={"path": store.table_path("t")})
    names = ds.schema().fieldNames()
    assert "val" in names and "v" not in names
    got = _drain(spark, store, "t", "rename", tmp_path)
    rows = sorted(
        (r["id"], r["val"], r["_commit_version"])
        for r in got.select("id", "val", "_commit_version").collect()
    )
    # v1 rows carry values written under the old name; v3 the new
    assert rows == [
        (0, "v0", 1), (1, "v1", 1), (2, "v2", 1),
        (3, "v3", 3), (4, "v4", 3),
    ]


def test_stream_skips_dropped_column_and_metadata_commits(spark, store, tmp_path):
    store.write_append(_df(spark, 0, 2), "t")
    store.set_check("t", "id_nonneg", "id >= 0")
    store.drop_column("t", "v")
    store.write_append(_df(spark, 2, 4, "s").drop("v"), "t")
    ds = CommitLogFeedDataSource(options={"path": store.table_path("t")})
    assert "v" not in ds.schema().fieldNames()
    got = _drain(spark, store, "t", "dropcol", tmp_path)
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3]


def test_cache_stream_feed_helper(spark, store, tmp_path):
    """cache.stream_feed: one-call readStream over a cached stream."""
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh2"), table_format="commitlog"
    )
    cache.store.write_append(_df(spark, 0, 4), cache.table_name("events"))
    out = str(tmp_path / "feed-out")
    q = (
        cache.stream_feed("events", max_commits_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "feed-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [0, 1, 2, 3]


def test_txn_prepares_gate_the_offset_frontier(spark, store):
    """The tail never advances past an UNDECIDED multi-table-txn
    prepare (its rows may become visible later — skipping them would
    lose data), streams the rows once the group commits, and
    consumes-and-skips aborted prepares."""
    from pyspark.sql.types import LongType, StructField

    store.TXN_RESOLVE_GRACE_S = 0.2
    store.write_append(_df(spark, 0, 3), "t")  # v1
    schema = StructType(
        [StructField("id", LongType()), StructField("_commit_version", LongType())]
    )
    reader = CommitLogTailReader(schema, {"path": store.table_path("t")})
    rows, off = reader.read({"version": 0})
    assert sorted(r[0] for r in list(rows)) == [0, 1, 2]
    assert off == {"version": 1}

    txn = store.begin_txn()
    txn.write_append(_df(spark, 3, 6), "t")
    txn.prepare()  # v2, undecided
    rows, off = reader.read(off)
    assert list(rows) == []
    assert off == {"version": 1}  # frontier held BEFORE the prepare

    txn.commit()
    rows, off = reader.read(off)
    assert sorted(r[0] for r in list(rows)) == [3, 4, 5]
    assert off == {"version": 2}

    t2 = store.begin_txn()
    t2.write_append(_df(spark, 90, 99), "t")
    t2.prepare()  # v3, will abort
    t2.abort()
    store.write_append(_df(spark, 6, 8), "t")  # slides to v4
    rows, off = reader.read(off)
    assert sorted(r[0] for r in list(rows)) == [6, 7]
    assert off == {"version": 4}  # aborted slot consumed, zero rows
