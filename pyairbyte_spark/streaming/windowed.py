"""Structured Streaming operators: windowed rollups and stateful dedup.

The reference has no event-time semantics (arrival order + cursor field
only — SURVEY §2.9); these are the Spark-native upgrades a streaming
deployment gets: watermarks for late data, tumbling/sliding windows,
and keyed state for cross-batch dedup.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_from_parquet_dir(
    spark: SparkSession, path: str, schema: T.StructType, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source (each file = one micro-batch).

    In production the same plan hangs off kafka/kinesis/socket readers —
    only this reader call changes.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_rollup(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts (+ optional sum).

    The watermark bounds state: late rows beyond it are dropped and the
    window state for closed windows is evicted — this is what makes the
    aggregation runnable forever at scale.
    """
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), key_col)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            *[c for c in ("n", "total_value") if value_col or c == "n"],
        )
    )


def streaming_hll_registers(
    stream_df: DataFrame,
    *,
    group_cols: list[str],
    value: str,
    p: int = 8,
) -> DataFrame:
    """Approximate-distinct as STREAMING state: HLL registers maintained
    by a watermark-free keyed max aggregation.

    The register table (<= 2^p rows per group, 8 bytes each) IS the
    streaming state — bounded forever regardless of stream volume,
    which is the whole point of running distinct-count approximately at
    scale (exact streaming distinct state grows with cardinality).
    Chained streaming aggregations are unsupported in Spark, so this
    emits the register level; finalize with
    ``operators.sketches.hll_estimate`` over the sink table (a view —
    the estimate is derivable from state at any time). Registers are
    max-monotone, so ``update`` output mode re-emits only changed
    registers per trigger.
    """
    from pyairbyte_spark.operators.sketches import _bucket_rho, hll_params

    hll_params(p)
    bucket, rho = _bucket_rho(F.col(value), p)
    return (
        stream_df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "__hll_bucket")
        .agg(F.max("__hll_rho").alias("__hll_m"))
    )


def streaming_cms_counts(
    stream_df: DataFrame,
    *,
    value: str,
    depth: int = 2,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch as STREAMING state: item frequencies tracked in
    a fixed depth×width counter table maintained by one keyed count
    aggregation — bounded state forever, where exact per-item counting
    state grows with key cardinality. Counters are additive, so
    ``update`` mode emits only touched counters per trigger and sink
    tables from separate shards merge by summing. Finalize point
    estimates with ``operators.sketches.cms_point_estimate`` over the
    sink."""
    from pyairbyte_spark.operators.sketches import _cms_bucket

    pairs = stream_df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(F.col(value), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    )
    return pairs.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def session_rollup(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key: events closer than ``gap`` merge into
    one session (``F.session_window`` — dynamic, data-driven windows,
    unlike fixed tumbling buckets). Output: one row per closed session
    with start, end (last event + gap), and event count.

    State is per open session per key and the watermark closes sessions
    whose end precedes it — bounded state on an unbounded stream.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def _resolve_timeout(timeout: str, state_ttl: str | int | None) -> str:
    """``state_ttl`` implies a processing-time timeout unless the caller
    already picked one explicitly."""
    if state_ttl is not None and timeout == "NoTimeout":
        return "ProcessingTimeTimeout"
    return timeout


_TTL_UNITS = {
    "ms": 1,
    "millisecond": 1,
    "milliseconds": 1,
    "s": 1000,
    "second": 1000,
    "seconds": 1000,
    "m": 60_000,
    "min": 60_000,
    "minute": 60_000,
    "minutes": 60_000,
    "h": 3_600_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "d": 86_400_000,
    "day": 86_400_000,
    "days": 86_400_000,
}


def _ttl_ms(state_ttl: str | int) -> int:
    """Duration → int milliseconds (``GroupState.setTimeoutDuration``
    only accepts an int in PySpark)."""
    if isinstance(state_ttl, int):
        return state_ttl
    parts = state_ttl.strip().split()
    if len(parts) == 2 and parts[1].lower() in _TTL_UNITS:
        return int(float(parts[0]) * _TTL_UNITS[parts[1].lower()])
    raise ValueError(
        f"state_ttl {state_ttl!r} not understood; use int millis or "
        f"'<n> <unit>' with unit in {sorted(set(_TTL_UNITS))}"
    )


def streaming_dedup(
    stream_df: DataFrame,
    *,
    digest_cols: list[str],
    timeout: str = "NoTimeout",
    state_ttl: str | int | None = None,
    event_ttl: str | int | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Cross-micro-batch exact dedup via keyed state
    (``applyInPandasWithState``): the first row per content digest is
    emitted; later duplicates — in the same OR any later batch — are
    dropped. State per key is a single boolean, so memory is O(distinct
    keys).

    ``state_ttl`` (duration string like ``"30 minutes"`` or int millis)
    bounds state for unbounded key spaces: it arms a processing-time
    timeout when a key is first seen, and the key's state is evicted
    when it fires — so a duplicate arriving after the TTL is treated as
    new. The dedup guarantee becomes "exactly once per key per TTL
    window", the standard trade for O(active keys) memory.

    Use a TTL only on continuously-running queries: with a
    processing-time timeout armed, Spark schedules state-cleanup
    batches indefinitely, so ``processAllAvailable()`` /
    ``Trigger.AvailableNow`` never quiesce.

    ``event_ttl`` (+ ``ts_col``) is the event-time alternative: a key
    is evicted once the WATERMARK passes its last-seen event time +
    TTL. Deterministic (driven by data, not wall clock), late-data-
    aware, and drain-trigger-safe — the right shape for batch-replay
    parity at scale. Requires ``withWatermark(ts_col, ...)`` upstream;
    each new sighting of a key extends its eviction horizon.
    """
    if event_ttl is not None and state_ttl is not None:
        raise ValueError("pass either state_ttl (processing-time) or event_ttl")
    if event_ttl is not None and ts_col is None:
        raise ValueError("event_ttl requires ts_col (and an upstream watermark)")
    digest = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in digest_cols])
    )
    keyed = stream_df.withColumn("__digest", digest)
    out_schema = keyed.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    if event_ttl is not None and timeout == "NoTimeout":
        timeout = "EventTimeTimeout"
    timeout = _resolve_timeout(timeout, state_ttl)
    ttl_ms = None if state_ttl is None else _ttl_ms(state_ttl)
    ev_ttl_ms = None if event_ttl is None else _ttl_ms(event_ttl)

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL expired: forget the key entirely
            return
        if state.exists:
            if ev_ttl_ms is not None:
                # duplicate sighting extends the eviction horizon
                max_ts = None
                for pdf in pdfs:
                    if len(pdf):
                        m = pdf[ts_col].max()
                        max_ts = m if max_ts is None else max(max_ts, m)
                if max_ts is not None:
                    state.setTimeoutTimestamp(int(max_ts.value // 1_000_000) + ev_ttl_ms)
            return
        first: pd.DataFrame | None = None
        max_ts = None
        for pdf in pdfs:
            if len(pdf):
                if first is None:
                    first = pdf.iloc[:1]
                if ev_ttl_ms is not None:
                    m = pdf[ts_col].max()
                    max_ts = m if max_ts is None else max(max_ts, m)
        if first is not None:
            state.update((True,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            elif ev_ttl_ms is not None and max_ts is not None:
                state.setTimeoutTimestamp(int(max_ts.value // 1_000_000) + ev_ttl_ms)
            yield first

    return (
        keyed.groupBy("__digest")
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
        .drop("__digest")
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, *, output_mode: str = "update"
) -> Any:
    """Drive a streaming plan to completion against currently-available
    data and return the in-memory result table name (test/smoke helper).
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return query_name


def match_sequence(
    stream_df: DataFrame,
    *,
    key_col: str,
    event_col: str,
    ts_col: str,
    sequence: list[str],
    within_seconds: float | None = None,
    timeout: str = "NoTimeout",
    state_ttl: str | int | None = None,
    event_ttl: str | int | None = None,
) -> DataFrame:
    """CEP-style ordered pattern match per key via keyed state
    (``applyInPandasWithState``): greedily advance through ``sequence``
    in event-time order — the first event matching stage 0 pins t0, the
    first stage-1 event AFTER t0 (and within ``within_seconds`` of it,
    when set) pins t1, and so on. Emits ONE row per key when the full
    sequence completes, carrying every stage timestamp.

    Greedy-earliest matching is exactly the min-chain the batch funnel
    computes (first A, first B after A, ...), so a batch funnel query
    over the same data is an exact oracle. No backtracking: if stage
    k+1 never lands inside stage k's window the key never completes —
    the funnel contract, not a sliding re-match.

    State per key is the current stage index + matched timestamps —
    O(len(sequence)) regardless of event volume, partitioned by key
    across executors. ``state_ttl`` (duration string or int millis)
    bounds it for unbounded key spaces: a processing-time timeout is
    (re-)armed on every update, and when it fires the key's partial
    match is evicted — an abandoned funnel stops costing memory, at the
    price that a key resuming after the TTL restarts from stage 0.
    TTL is for continuously-running queries only (an armed
    processing-time timeout keeps the engine scheduling cleanup batches,
    so drain-style triggers never quiesce). ``event_ttl`` is the
    deterministic event-time alternative (evict when the WATERMARK
    passes the key's last event + TTL; requires an upstream
    ``withWatermark(ts_col, ...)`` and works with drain triggers).
    Events may arrive across micro-batches; out-of-order WITHIN a batch
    is handled by sorting, across batches by the watermark upstream.
    """
    n_stages = len(sequence)
    if n_stages < 1:
        raise ValueError("sequence must have at least one stage")
    out_schema = T.StructType(
        [stream_df.schema[key_col]]
        + [T.StructField(f"t{i}", T.TimestampType()) for i in range(n_stages)]
    )
    state_schema = T.StructType(
        [T.StructField("stage", T.IntegerType())]
        + [T.StructField(f"t{i}", T.DoubleType()) for i in range(n_stages)]
    )
    if event_ttl is not None and state_ttl is not None:
        raise ValueError("pass either state_ttl (processing-time) or event_ttl")
    if event_ttl is not None and timeout == "NoTimeout":
        timeout = "EventTimeTimeout"
    ttl_ms = None if state_ttl is None else _ttl_ms(state_ttl)
    ev_ttl_ms = None if event_ttl is None else _ttl_ms(event_ttl)

    def match_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # abandoned partial match: evict
            return
        if state.exists:
            stored = list(state.get)
            stage = stored[0]
            times = stored[1:]
        else:
            stage, times = 0, [None] * n_stages
        if stage >= n_stages:  # already emitted for this key
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        events = pd.concat(frames, ignore_index=True)
        events = events.sort_values(ts_col, kind="mergesort")
        # Timestamps ride as exact epoch MICROSECONDS (integers < 2^53,
        # exact in the DoubleType state field) — float epoch seconds
        # would shear sub-microsecond precision and break Arrow's
        # ns→us cast on emit.
        within_us = None if within_seconds is None else within_seconds * 1e6
        for _, row in events.iterrows():
            if stage >= n_stages:
                break
            ts = float(row[ts_col].value // 1000)
            if row[event_col] != sequence[stage]:
                continue
            if stage > 0:
                prev = times[stage - 1]
                if ts <= prev:
                    continue
                if within_us is not None and ts - prev > within_us:
                    continue
            times[stage] = ts
            stage += 1
        state.update(tuple([stage] + times))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        elif ev_ttl_ms is not None and len(events):
            batch_max_ms = int(events[ts_col].max().value // 1_000_000)
            state.setTimeoutTimestamp(batch_max_ms + ev_ttl_ms)
        if stage >= n_stages:
            out = {key_col: [key[0]]}
            for i, tval in enumerate(times):
                out[f"t{i}"] = [pd.Timestamp(int(tval) * 1000)]
            yield pd.DataFrame(out)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        match_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, _resolve_timeout(timeout, state_ttl)),
    )
