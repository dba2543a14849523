#!/usr/bin/env python
"""Streaming analytics end to end on the local testdata.

events.parquet replayed as a file stream (each file = one micro-batch;
swap the reader for kafka/kinesis in production and every plan below
is unchanged) -> stateful exact dedup -> watermarked hourly rollup +
session windows -> CEP funnel match (view -> click -> purchase with
24h per-stage windows, keyed state).

Run: python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import get_spark
from pyairbyte_spark.queries import _events_stream
from pyairbyte_spark.streaming.windowed import (
    match_sequence,
    run_to_memory,
    session_rollup,
    streaming_dedup,
    windowed_rollup,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-pipeline")

    # 1. stateful exact dedup on the event id (drops replays across
    # micro-batches; state = one boolean per distinct key)
    stream = _events_stream(spark, sf_dir, "ex_stream_")
    deduped = streaming_dedup(stream, digest_cols=["event_id"])
    n_unique = spark.table(run_to_memory(deduped, "ex_dedup")).count()

    # 2. watermarked hourly rollup per event type
    rollup = windowed_rollup(
        _events_stream(spark, sf_dir, "ex_roll_"), watermark="1 hour"
    )
    n_windows = spark.table(
        run_to_memory(rollup, "ex_rollup", output_mode="append")
    ).count()

    # 3. session windows per user (30-minute gap)
    sessions = session_rollup(
        _events_stream(spark, sf_dir, "ex_sess_"), gap="30 minutes"
    )
    n_sessions = spark.table(
        run_to_memory(sessions, "ex_sessions", output_mode="append")
    ).count()

    # 4. CEP conversion funnel with keyed state
    matched = match_sequence(
        _events_stream(spark, sf_dir, "ex_cep_").select(
            "user_id", "event_type", "ts"
        ),
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "purchase"],
        within_seconds=24 * 3600.0,
    )
    n_converted = spark.table(run_to_memory(matched, "ex_cep")).count()

    print(
        f"{n_unique} unique events -> {n_windows} hourly windows, "
        f"{n_sessions} sessions, {n_converted} converted funnels"
    )
    spark.stop()


if __name__ == "__main__":
    main()
