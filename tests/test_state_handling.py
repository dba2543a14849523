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
