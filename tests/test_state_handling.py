"""Incremental-state contract tests (mirrors reference
tests/integration_tests/test_state_handling.py:64-222)."""

from __future__ import annotations

from pyairbyte_spark import SparkCache
from pyairbyte_spark.sources import SourceFaker
from pyairbyte_spark.state import (
    JoinedStateProvider,
    PendingStateBuffer,
    StateArtifact,
    StateProvider,
    StateWriterBase,
)


def test_second_sync_processes_zero_records(cache):
    src = SourceFaker(seed=1234, count=40)
    r1 = src.read(cache, write_strategy="auto")
    assert r1.record_counts["users"] == 40
    r2 = SourceFaker(seed=1234, count=40).read(cache, write_strategy="auto")
    assert r2.record_counts["users"] == 0
    assert r2.record_counts["purchases"] == 0
    assert r2.record_counts["products"] == 100  # no cursor → full refresh
    assert len(cache["users"]) == 40


def test_state_artifacts_exist_per_stream(cache):
    SourceFaker(seed=1234, count=10).read(cache, write_strategy="auto")
    provider = cache.get_state_provider("source-faker")
    assert provider.known_stream_names >= {"users", "purchases"}
    users_state = provider.get_stream_state("users")
    assert users_state is not None and users_state.state["cursor"]


def test_table_prefix_isolation(spark, tmp_path):
    """Two caches with different prefixes keep independent state
    (reference _state_backend.py:205-260)."""
    c1 = SparkCache(spark, str(tmp_path / "w"), table_prefix="a_")
    c2 = SparkCache(spark, str(tmp_path / "w"), table_prefix="b_")
    SourceFaker(seed=1234, count=10).read(c1, write_strategy="auto")
    assert c2.get_state_provider("source-faker").state_artifacts == []
    r = SourceFaker(seed=1234, count=10).read(c2, write_strategy="auto")
    assert r.record_counts["users"] == 10  # fresh state → full read


def test_incremental_grows_from_checkpoint(cache):
    SourceFaker(seed=1234, count=30).read(cache, write_strategy="auto")
    r2 = SourceFaker(seed=1234, count=50).read(cache, write_strategy="auto")
    # only the 20 new (cursor-later) users are processed
    assert r2.record_counts["users"] == 20
    assert len(cache["users"]) == 50


def test_force_full_refresh_ignores_state(cache):
    SourceFaker(seed=1234, count=25).read(cache, write_strategy="auto")
    r2 = SourceFaker(seed=1234, count=25).read(
        cache, write_strategy="auto", force_full_refresh=True
    )
    assert r2.record_counts["users"] == 25


def test_pending_state_buffer_ordering():
    """State never finalizes ahead of data (T2): only finalize_stream
    pushes buffered artifacts to the writer, latest wins."""
    buf = PendingStateBuffer()
    writer = StateWriterBase()
    buf.add(StateArtifact("s1", {"cursor": 1}))
    buf.add(StateArtifact("s1", {"cursor": 2}))
    buf.add(StateArtifact("s2", {"cursor": 9}))
    assert writer.latest_artifacts == []
    buf.finalize_stream("s1", writer)
    assert [a.state for a in writer.latest_artifacts] == [{"cursor": 2}]
    buf.finalize_all(writer)
    assert {a.key for a in writer.latest_artifacts} == {"s1", "s2"}


def test_joined_state_provider_coalesce():
    primary = StateProvider([StateArtifact("s1", {"v": "p"})])
    secondary = StateProvider(
        [StateArtifact("s1", {"v": "s"}), StateArtifact("s2", {"v": "s2"})]
    )
    joined = JoinedStateProvider(primary, secondary)
    assert joined.get_stream_state("s1").state == {"v": "p"}  # primary wins
    assert joined.get_stream_state("s2").state == {"v": "s2"}  # secondary fills


# -- T2 failure injection -----------------------------------------------------
# The buffer-then-finalize protocol promises: state is durably committed
# only AFTER its stream's data. These tests kill the sync at each side
# of that boundary and prove (a) the ordering held, (b) the re-sync a
# source performs from the last committed state converges — exactly
# once for merge/replace, at-least-once-no-loss for append — matching
# the reference's pending-state semantics (sql_processor.py:346-401).

import pytest

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.processor import MessageStreamProcessor
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    RecordMessage,
    StateMessage,
    TraceMessage,
)
from pyairbyte_spark.state import StateBackend
from pyairbyte_spark.strategies import WriteStrategy


def _batch_messages(records, cursor):
    msgs = [
        AirbyteMessage("RECORD", record=RecordMessage("s", dict(r)))
        for r in records
    ]
    msgs.append(
        AirbyteMessage(
            "STATE",
            state=StateMessage(stream_name="s", state={"cursor": cursor}),
        )
    )
    msgs.append(
        AirbyteMessage(
            "TRACE",
            trace=TraceMessage(
                trace_type="STREAM_STATUS", stream_name="s", status="COMPLETE"
            ),
        )
    )
    return msgs


def _spec(strategy):
    return StreamSpec(
        name="s",
        json_schema={
            "properties": {"id": {"type": "integer"}, "v": {"type": "string"}}
        },
        primary_keys=["id"] if strategy == WriteStrategy.MERGE else [],
    )


def _process(cache, msgs, strategy):
    return MessageStreamProcessor(
        cache,
        source_name="src",
        specs={"s": _spec(strategy)},
        write_strategy=strategy,
    ).process_messages(iter(msgs))


def _committed_cursor(cache):
    art = cache.get_state_provider("src").get_stream_state("s")
    return art.state.get("cursor") if art else None


@pytest.mark.parametrize(
    "strategy",
    [WriteStrategy.APPEND, WriteStrategy.MERGE, WriteStrategy.REPLACE],
)
@pytest.mark.parametrize("crash_point", ["before_data", "after_data_before_state"])
def test_crash_mid_sync_then_resync_converges(
    spark, tmp_path, monkeypatch, strategy, crash_point
):
    cache = SparkCache(spark, str(tmp_path / "wh"))
    batch1 = [{"id": i, "v": "b1"} for i in range(5)]
    batch2 = [{"id": i, "v": "b2"} for i in range(5, 10)]

    # Sync 1 commits cleanly: data present, cursor=5 durable.
    _process(cache, _batch_messages(batch1, cursor=5), strategy)
    assert _committed_cursor(cache) == 5

    # Sync 2 crashes at the injected point.
    if crash_point == "before_data":
        real_write_df = SparkCache.write_dataframe

        def boom_data(self, *a, **k):
            raise RuntimeError("killed before data commit")

        monkeypatch.setattr(SparkCache, "write_dataframe", boom_data)
    else:
        real_backend_write = StateBackend.write

        def boom_state(self, *a, **k):
            raise RuntimeError("killed after data, before state commit")

        monkeypatch.setattr(StateBackend, "write", boom_state)

    with pytest.raises(RuntimeError, match="killed"):
        _process(cache, _batch_messages(batch2, cursor=10), strategy)
    monkeypatch.undo()

    # T2 ordering held: the cursor NEVER ran ahead of committed data.
    assert _committed_cursor(cache) == 5

    # The source re-syncs from the last committed cursor (=5): the
    # crashed batch replays in full.
    _process(cache, _batch_messages(batch2, cursor=10), strategy)
    assert _committed_cursor(cache) == 10

    rows = [(r["id"], r["v"]) for r in cache.get_records("s")]
    ids = sorted(i for i, _ in rows)
    if strategy == WriteStrategy.MERGE:
        # exactly once: PK dedup absorbs the replay
        assert ids == list(range(10))
    elif strategy == WriteStrategy.REPLACE:
        # replace is idempotent: whatever the crashed run left behind,
        # the replay rewrote the table to exactly the new batch
        assert sorted((r["id"], r["v"]) for r in batch2) == sorted(rows)
    else:  # APPEND: at-least-once, never loss
        assert set(range(10)) <= set(ids)
        if crash_point == "before_data":
            # nothing was committed by the crashed run: exactly once
            assert ids == list(range(10))
        else:
            # the crashed run committed data (state didn't): the replay
            # duplicates exactly that batch — the documented
            # at-least-once window, identical to the reference's
            assert ids == list(range(5)) + sorted(
                list(range(5, 10)) + list(range(5, 10))
            )


def test_crash_between_streams_isolates_state_per_stream(
    spark, tmp_path, monkeypatch
):
    """A crash while finalizing stream B must not roll back or advance
    stream A's already-committed state (per-stream finalize parity:
    sql_processor.py:368-378)."""
    cache = SparkCache(spark, str(tmp_path / "wh"))
    spec_a = StreamSpec(
        name="a", json_schema={"properties": {"id": {"type": "integer"}}}
    )
    spec_b = StreamSpec(
        name="b", json_schema={"properties": {"id": {"type": "integer"}}}
    )
    complete = lambda s: AirbyteMessage(  # noqa: E731
        "TRACE",
        trace=TraceMessage(
            trace_type="STREAM_STATUS", stream_name=s, status="COMPLETE"
        ),
    )
    msgs = [
        AirbyteMessage("RECORD", record=RecordMessage("a", {"id": 1})),
        AirbyteMessage(
            "STATE", state=StateMessage(stream_name="a", state={"cursor": 1})
        ),
        complete("a"),  # stream a fully commits here
        AirbyteMessage("RECORD", record=RecordMessage("b", {"id": 2})),
        AirbyteMessage(
            "STATE", state=StateMessage(stream_name="b", state={"cursor": 2})
        ),
        complete("b"),  # crash during b's state commit
    ]

    real_write = StateBackend.write
    def crashy(self, source_name, prefix, artifact):
        if artifact.key == "b":
            raise RuntimeError("killed during stream b state commit")
        return real_write(self, source_name, prefix, artifact)

    monkeypatch.setattr(StateBackend, "write", crashy)
    with pytest.raises(RuntimeError, match="stream b"):
        MessageStreamProcessor(
            cache,
            source_name="src",
            specs={"a": spec_a, "b": spec_b},
            write_strategy=WriteStrategy.APPEND,
        ).process_messages(iter(msgs))
    monkeypatch.undo()

    provider = cache.get_state_provider("src")
    a_state = provider.get_stream_state("a")
    assert a_state is not None and a_state.state["cursor"] == 1  # survived
    assert provider.get_stream_state("b") is None  # never committed
    # b's data landed (at-least-once window), a's is intact
    assert [r["id"] for r in cache.get_records("a")] == [1]
    assert [r["id"] for r in cache.get_records("b")] == [2]
