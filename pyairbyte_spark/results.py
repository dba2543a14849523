"""ReadResult / WriteResult — what a sync / reverse-ETL run returns.

Parity: ``airbyte/results.py:32-101`` (ReadResult) and ``:103-150``
(WriteResult).
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


class WriteResult:
    """Result of a destination write (reference ``results.py:103-150``):
    iterable over the STATE confirmations the destination returned, with
    the delivered-record tally and a read view of destination state.
    """

    def __init__(
        self,
        *,
        destination,
        confirmations: list,
        processed_records: int,
        state_store=None,
    ) -> None:
        self._destination = destination
        self._confirmations = list(confirmations)
        self._processed_records = processed_records
        self._state_store = state_store

    @property
    def processed_records(self) -> int:
        return self._processed_records

    @property
    def confirmations(self) -> list:
        return self._confirmations

    def get_state_provider(self):
        """Destination-side state as a read-only provider."""
        if self._state_store is None:
            raise ValueError("No state store was attached to this write.")
        return self._state_store.get_destination_state_provider(
            self._destination.name
        )

    def __iter__(self):
        return iter(self._confirmations)

    def __len__(self) -> int:
        return len(self._confirmations)

    def __getitem__(self, i):
        return self._confirmations[i]
