"""Sync progress tallies.

Parity: ``airbyte/progress.py:253-380,511-593`` — records read/written
per stream, elapsed seconds, records-per-second. Driver-side counters
at the connector boundary; Spark-side counts come from the finalize
step (one count per stream commit, not per row).
"""

from __future__ import annotations

import time


class ProgressTracker:
    def __init__(self) -> None:
        self.start_time = time.monotonic()
        self.end_time: float | None = None
        self.first_record_time: float | None = None
        self.records_read: dict[str, int] = {}
        self.records_written: dict[str, int] = {}
        self.bytes_read: dict[str, int] = {}

    def record_read(self, stream_name: str, n: int = 1, n_bytes: int = 0) -> None:
        if self.first_record_time is None:
            self.first_record_time = time.monotonic()
        self.records_read[stream_name] = self.records_read.get(stream_name, 0) + n
        if n_bytes:
            self.bytes_read[stream_name] = (
                self.bytes_read.get(stream_name, 0) + n_bytes
            )

    def add_bytes(self, stream_name: str, n_bytes: int) -> None:
        self.bytes_read[stream_name] = self.bytes_read.get(stream_name, 0) + n_bytes

    def stream_finalized(self, stream_name: str, record_count: int) -> None:
        self.records_written[stream_name] = record_count

    def sync_complete(self) -> None:
        self.end_time = time.monotonic()

    @property
    def elapsed_seconds(self) -> float:
        return (self.end_time or time.monotonic()) - self.start_time

    @property
    def total_records_read(self) -> int:
        return sum(self.records_read.values())

    @property
    def total_records_written(self) -> int:
        return sum(self.records_written.values())

    @property
    def records_per_second(self) -> float:
        elapsed = self.elapsed_seconds
        return self.total_records_written / elapsed if elapsed > 0 else 0.0

    @property
    def total_bytes_read(self) -> int:
        return sum(self.bytes_read.values())

    @property
    def mb_per_second(self) -> float:
        elapsed = self.elapsed_seconds
        return (self.total_bytes_read / 1e6) / elapsed if elapsed > 0 else 0.0

    @property
    def elapsed_seconds_adjusted(self) -> float:
        """Elapsed time excluding connector startup (time to first
        record) — the reference's ``*_adjusted`` metrics
        (``airbyte/progress.py:483-509``)."""
        if self.first_record_time is None:
            return self.elapsed_seconds
        return (self.end_time or time.monotonic()) - self.first_record_time

    @property
    def records_per_second_adjusted(self) -> float:
        elapsed = self.elapsed_seconds_adjusted
        return self.total_records_written / elapsed if elapsed > 0 else 0.0

    @property
    def mb_per_second_adjusted(self) -> float:
        elapsed = self.elapsed_seconds_adjusted
        return (self.total_bytes_read / 1e6) / elapsed if elapsed > 0 else 0.0
