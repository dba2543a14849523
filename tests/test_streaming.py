"""Structured Streaming tests: windowed rollup parity with batch,
stateful cross-batch dedup, foreachBatch sink with epoch/state commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyairbyte_spark.strategies import WriteMethod
from pyairbyte_spark.streaming import (
    CacheStreamingSink,
    stream_from_parquet_dir,
    streaming_dedup,
    windowed_rollup,
)
from pyairbyte_spark.streaming.windowed import run_to_memory

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def event_dir(spark, tmp_path):
    """Three parquet files = three micro-batches of deterministic events."""
    path = str(tmp_path / "stream_in")
    rows = []
    for batch in range(3):
        batch_rows = [
            (
                batch * 100 + i,
                f"2024-01-01 {batch:02d}:{i % 60:02d}:00",
                ["click", "view"][i % 2],
                float(i),
            )
            for i in range(20)
        ]
        rows.append(batch_rows)
    for i, batch_rows in enumerate(rows):
        df = spark.createDataFrame(batch_rows, ["event_id", "tss", "event_type", "value"])
        df.select(
            "event_id",
            F.col("tss").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        ).coalesce(1).write.mode("append").parquet(path)
    return path


def test_windowed_rollup_matches_batch(spark, event_dir):
    stream = stream_from_parquet_dir(spark, event_dir, SCHEMA)
    agg = windowed_rollup(stream, window="1 hour", watermark="2 hours")
    name = run_to_memory(agg, "win_out", output_mode="update")
    streaming_out = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = spark.read.schema(SCHEMA).parquet(event_dir)
    batch_out = {
        (r["ws"], r["event_type"]): (r["n"], r["tv"])
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert streaming_out == batch_out
    assert len(streaming_out) == 6  # 3 hours x 2 event types


def test_streaming_dedup_across_batches(spark, tmp_path):
    path = str(tmp_path / "dup_in")
    # batch 1: ids 1,2 ; batch 2: ids 2,3 (2 is a cross-batch duplicate)
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "payload"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame([(2, "b"), (3, "c")], ["id", "payload"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.StringType())]
    )
    stream = stream_from_parquet_dir(spark, path, schema)
    deduped = streaming_dedup(stream, digest_cols=["id", "payload"])
    name = run_to_memory(deduped, "dedup_out", output_mode="update")
    ids = sorted(r["id"] for r in spark.sql(f"SELECT * FROM {name}").collect())
    assert ids == [1, 2, 3]


def _wait_until(predicate, timeout_s: float = 90.0) -> bool:
    """Poll ``predicate`` — with a ProcessingTimeTimeout armed, Spark
    keeps scheduling state-cleanup batches forever, so
    ``processAllAvailable``/``availableNow`` never quiesce; a TTL'd
    query is observed the way a production continuous query is."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.3)
    return False


def test_streaming_dedup_state_ttl_evicts_key(spark, tmp_path):
    """With ``state_ttl`` a key's seen-state is evicted once the
    processing-time timeout fires, so the same key re-emits after the
    TTL window — bounding state for unbounded key spaces."""
    import time

    path = str(tmp_path / "ttl_in")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.StringType())]
    )

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            path
        )

    def ids():
        return sorted(r["id"] for r in spark.sql("SELECT * FROM ttl_out").collect())

    write_batch([(1, "a")])
    stream = stream_from_parquet_dir(spark, path, schema)
    deduped = streaming_dedup(
        stream, digest_cols=["id", "payload"], state_ttl="500 milliseconds"
    )
    q = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("ttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert _wait_until(lambda: ids() == [1])
        time.sleep(1.2)  # let the 500ms TTL expire -> key 1 evicted
        write_batch([(2, "b")])
        assert _wait_until(lambda: ids() == [1, 2])
        write_batch([(1, "a")])  # key 1 is new again -> re-emitted
        assert _wait_until(lambda: ids() == [1, 1, 2]), ids()
    finally:
        q.stop()


def test_match_sequence_state_ttl_evicts_partial_match(spark, tmp_path):
    """A partial CEP match abandoned past ``state_ttl`` is evicted: the
    key restarts from stage 0, so a late completing event alone no
    longer finishes the sequence."""
    import time
    from datetime import datetime

    from pyairbyte_spark.streaming.windowed import match_sequence

    path = str(tmp_path / "cep_ttl_in")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            path
        )

    def rows_in():
        return sum(p["numInputRows"] for p in q.recentProgress)

    write_batch([(1, "view", datetime(2024, 1, 1, 10))])  # stage 0 matched
    stream = stream_from_parquet_dir(spark, path, schema)
    matched = match_sequence(
        stream,
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click"],
        state_ttl="500 milliseconds",
    )
    q = (
        matched.writeStream.outputMode("update")
        .format("memory")
        .queryName("cep_ttl_out")
        .option("checkpointLocation", str(tmp_path / "cep_ckpt"))
        .start()
    )
    try:
        assert _wait_until(lambda: rows_in() >= 1)
        time.sleep(1.2)  # TTL fires in a cleanup batch -> partial match evicted
        # The completing click arrives after eviction: user 1 restarted
        # from stage 0, a lone click matches nothing.
        write_batch([(1, "click", datetime(2024, 1, 1, 12))])
        assert _wait_until(lambda: rows_in() >= 2)
        time.sleep(1.0)  # give any (wrong) emission time to land
        assert spark.sql("SELECT * FROM cep_ttl_out").count() == 0
    finally:
        q.stop()


def test_hot_key_state_stays_bounded(spark, tmp_path):
    """Skew stress: ONE user emitting 20k events across micro-batches.
    Keyed state must stay O(keys) — the CEP operator keeps exactly one
    state row (stage index + timestamps), the dedup operator one row
    per distinct digest — never O(events). Guards against accidental
    append-to-state regressions that OOM on hot keys at scale."""
    from pyspark.sql import functions as F

    from pyairbyte_spark.streaming.windowed import match_sequence

    n_events = 20_000
    src = str(tmp_path / "hot_events")
    (
        spark.range(n_events)
        .select(
            F.lit(1).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("browse")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id").cast("double"))
            ).alias("ts"),
        )
        .coalesce(4)
        .write.parquet(src)
    )
    schema = spark.read.parquet(src).schema

    def max_state_rows(q):
        return max(
            (
                p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress
                if p.get("stateOperators")
            ),
            default=-1,
        )

    stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=2)
    matched = match_sequence(
        stream,
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "browse"],
    )
    q = (
        matched.writeStream.outputMode("update")
        .format("memory")
        .queryName("hot_cep_t")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.processAllAvailable()
    cep_state = max_state_rows(q)
    q.stop()
    assert cep_state == 1, f"CEP state grew to {cep_state} rows for 1 key"
    assert spark.table("hot_cep_t").count() == 1  # matched once, then done

    stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=2)
    deduped = streaming_dedup(stream, digest_cols=["user_id", "event_type"])
    q = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("hot_dedup_t")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    dedup_state = max_state_rows(q)
    q.stop()
    # one state row per distinct digest (3 event types x 1 user)
    assert dedup_state == 3, f"dedup state {dedup_state} != 3 distinct digests"
    assert spark.table("hot_dedup_t").count() == 3


def test_cache_sink_commits_data_then_state(spark, cache, tmp_path, event_dir):
    stream = stream_from_parquet_dir(spark, event_dir, SCHEMA)
    sink = CacheStreamingSink(
        cache,
        "events_stream",
        source_name="stream-src",
        method=WriteMethod.APPEND,
        cursor_col="ts",
    )
    q = sink.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(cache["events_stream"]) == 60
    artifact = cache.get_state_provider("stream-src").get_stream_state("events_stream")
    assert artifact is not None
    assert artifact.state["cursor"].startswith("2024-01-01 02:")
    assert int(artifact.state["epoch_id"]) >= 0


def test_cache_sink_skips_replayed_epoch(spark, cache):
    sink = CacheStreamingSink(
        cache, "s", source_name="x", method=WriteMethod.APPEND
    )
    df = spark.createDataFrame([(1,)], ["a"])
    sink(df, 0)
    sink(df, 0)  # replay of epoch 0 → skipped
    sink(df, 1)
    assert len(cache["s"]) == 2


def test_session_rollup_merges_by_gap(spark, tmp_path):
    import pandas as pd

    from pyairbyte_spark.streaming.windowed import run_to_memory, session_rollup

    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 11:30"]
            ),
            "user_id": [1, 1, 1],
        }
    )
    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(src / "p"))
    schema = spark.read.parquet(str(src / "p")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "p"))
    out = session_rollup(stream, gap="30 minutes")
    name = run_to_memory(out, "sess_test", output_mode="complete")
    got = sorted(
        (r["session_start"].minute, r["n_events"]) for r in spark.table(name).collect()
    )
    # 10:00+10:10 merge (gap < 30m); 11:30 is its own session
    assert got == [(0, 2), (30, 1)]


def test_match_sequence_across_batches(spark, tmp_path):
    """CEP stages arriving in DIFFERENT micro-batches must complete via
    keyed state; window violations and wrong order must not match."""
    from datetime import datetime

    from pyairbyte_spark.streaming.windowed import match_sequence

    path = str(tmp_path / "cep_in")
    d = datetime
    # user 1: view then click in batch 1, purchase in batch 2 -> match.
    # user 2: click BEFORE view (order violated; its later click is 26h
    #   after the view -> window violated) -> no match.
    # user 3: full sequence but purchase 25h after click -> no match.
    b1 = [
        (1, "view", d(2024, 1, 1, 10)),
        (1, "click", d(2024, 1, 1, 11)),
        (2, "click", d(2024, 1, 1, 9)),
        (2, "view", d(2024, 1, 1, 10)),
        (3, "view", d(2024, 1, 1, 10)),
        (3, "click", d(2024, 1, 1, 12)),
    ]
    b2 = [
        (1, "purchase", d(2024, 1, 2, 9)),
        (2, "click", d(2024, 1, 2, 12)),  # 26h after user 2's view
        (3, "purchase", d(2024, 1, 2, 13)),  # 25h after user 3's click
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    for batch in (b1, b2):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    stream = stream_from_parquet_dir(spark, path, schema)
    matched = match_sequence(
        stream,
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "purchase"],
        within_seconds=24 * 3600.0,
    )
    name = run_to_memory(matched, "cep_out", output_mode="update")
    rows = {r["user_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert set(rows) == {1}
    assert rows[1]["t0"] == d(2024, 1, 1, 10)
    assert rows[1]["t1"] == d(2024, 1, 1, 11)
    assert rows[1]["t2"] == d(2024, 1, 2, 9)


def test_cache_sink_works_on_commitlog_store(spark, tmp_path, event_dir):
    """The streaming cache sink composes with the ACID store: each
    micro-batch is one atomic commit, history shows one append per
    epoch, and data+state land exactly once."""
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(spark, str(tmp_path / "wh"), table_format="commitlog")
    stream = stream_from_parquet_dir(spark, event_dir, SCHEMA)
    sink = CacheStreamingSink(
        cache,
        "events_stream",
        source_name="stream-src",
        method=WriteMethod.APPEND,
        cursor_col="ts",
    )
    q = sink.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(cache["events_stream"]) == 60
    hist = cache.table_history("events_stream")
    assert len(hist) == 3 and all(h["op"] == "append" for h in hist)  # 3 epochs
    # compaction collapses the per-epoch dirs; rows unchanged
    assert cache.compact("events_stream")["compacted"]
    assert len(cache["events_stream"]) == 60


def test_streaming_dedup_event_ttl_is_deterministic(spark, tmp_path):
    """Event-time TTL: a key is evicted once the WATERMARK passes its
    last event + TTL — fully data-driven (no wall clock, no sleeps) and
    drain-trigger-safe, unlike processing-time TTL."""
    from datetime import datetime

    path = str(tmp_path / "evttl_in")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    batches = [
        [(1, datetime(2024, 1, 1, 10, 0))],  # A emitted; horizon 11:00
        [(2, datetime(2024, 1, 1, 12, 0))],  # B emitted; wm -> 12:00
        [(3, datetime(2024, 1, 1, 12, 10))],  # wm>11:00 -> A evicted here
        [(1, datetime(2024, 1, 1, 12, 30))],  # A is new again -> re-emitted
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(path)
    stream = stream_from_parquet_dir(spark, path, schema).withWatermark(
        "ts", "0 seconds"
    )
    deduped = streaming_dedup(
        stream, digest_cols=["id"], event_ttl="1 hour", ts_col="ts"
    )
    q = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("evttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()  # event-time timeouts quiesce: no spinning
    q.stop()
    ids = sorted(r["id"] for r in spark.sql("SELECT * FROM evttl_out").collect())
    assert ids == [1, 1, 2, 3]


def test_match_sequence_event_ttl_evicts_stale_partial(spark, tmp_path):
    from datetime import datetime

    from pyairbyte_spark.streaming.windowed import match_sequence

    path = str(tmp_path / "cep_evttl_in")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    batches = [
        [(1, "view", datetime(2024, 1, 1, 10, 0))],  # partial; horizon 11:00
        [(9, "view", datetime(2024, 1, 1, 12, 0))],  # wm -> 12:00
        [(8, "view", datetime(2024, 1, 1, 12, 10))],  # user 1 evicted here
        [(1, "click", datetime(2024, 1, 1, 12, 30))],  # lone click: no match
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(path)
    stream = stream_from_parquet_dir(spark, path, schema).withWatermark(
        "ts", "0 seconds"
    )
    matched = match_sequence(
        stream,
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click"],
        event_ttl="1 hour",
    )
    q = (
        matched.writeStream.outputMode("update")
        .format("memory")
        .queryName("cep_evttl_out")
        .option("checkpointLocation", str(tmp_path / "cep_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM cep_evttl_out").count() == 0


def test_cache_sink_expectations_quarantine(spark, cache, tmp_path, event_dir):
    """Per-micro-batch CHECK enforcement: violators route to the
    quarantine table, totals accumulate across batches."""
    stream = stream_from_parquet_dir(spark, event_dir, SCHEMA)
    sink = CacheStreamingSink(
        cache,
        "ev_checked",
        source_name="stream-src",
        method=WriteMethod.APPEND,
        expectations={"clicks_only": "event_type = 'click'"},
        on_violation="quarantine",
    )
    q = sink.attach(stream, checkpoint_dir=str(tmp_path / "ckpt-exp"))
    q.awaitTermination()
    assert len(cache["ev_checked"]) == 30  # half the 60 events are clicks
    quarantined = cache.store.read(cache.table_name("ev_checked_quarantine"))
    assert quarantined.count() == 30
    assert sink.violation_totals == {"clicks_only": 30}
