"""ReadResult — Mapping over the streams a sync processed.

Parity: ``airbyte/results.py:32-101``.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.datasets import CachedDataset


class ReadResult(Mapping):
    def __init__(
        self,
        cache: SparkCache,
        source_name: str,
        processed_streams: list[str],
        record_counts: dict[str, int] | None = None,
        progress=None,
    ) -> None:
        self.cache = cache
        self.source_name = source_name
        self.processed_streams = processed_streams
        self.record_counts = record_counts or {}
        self.progress = progress

    @property
    def streams(self) -> dict[str, CachedDataset]:
        return {s: self.cache.get_dataset(s) for s in self.processed_streams}

    def get_sql_engine(self):
        """Closest Spark analog: the session itself."""
        return self.cache.spark

    def __getitem__(self, stream: str) -> CachedDataset:
        if stream not in self.processed_streams:
            raise KeyError(stream)
        return self.cache.get_dataset(stream)

    def __iter__(self) -> Iterator[str]:
        return iter(self.processed_streams)

    def __len__(self) -> int:
        return len(self.processed_streams)
