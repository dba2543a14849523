"""Progress tallies (SURVEY §2.4 A5): counts, bytes, adjusted rates."""

from __future__ import annotations

import time

from pyairbyte_spark.progress import ProgressTracker


def test_counters_and_rates():
    p = ProgressTracker()
    time.sleep(0.01)
    for _ in range(10):
        p.record_read("s1")
    p.add_bytes("s1", 5_000_000)
    p.stream_finalized("s1", 10)
    p.sync_complete()
    assert p.total_records_read == 10 == p.total_records_written
    assert p.total_bytes_read == 5_000_000
    assert p.records_per_second > 0
    assert p.mb_per_second > 0
    # adjusted excludes the pre-first-record window, so it is >= raw
    assert p.records_per_second_adjusted >= p.records_per_second
    assert p.elapsed_seconds_adjusted <= p.elapsed_seconds


def test_adjusted_equals_raw_with_no_records():
    p = ProgressTracker()
    p.sync_complete()
    assert p.elapsed_seconds_adjusted == p.elapsed_seconds
    assert p.records_per_second == 0.0 and p.mb_per_second == 0.0


def test_sync_flow_populates_progress(spark, tmp_path):
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.sources import SourceFaker

    cache = SparkCache(spark, str(tmp_path))
    result = SourceFaker(seed=1234, count=50).read(cache, write_strategy="append")
    p = result.progress
    assert p is not None
    assert p.total_records_written == sum(result.record_counts.values())
    assert p.total_bytes_read > 0 and p.mb_per_second > 0
