"""Source API: discover → select → read(cache) / get_records.

The reference's ``Source`` (``airbyte/sources/base.py``) wraps an
external connector process. Here ``SparkSource`` is the abstract host:
subclasses supply a catalog (dict of StreamSpec) and a message
generator; the read path lands streams into a :class:`SparkCache` via
the :class:`MessageStreamProcessor` (see §3.1 lifecycle in SURVEY.md).

Incremental semantics (T1/T2/T9): the current state provider's
artifacts are passed to the generator, which filters records by cursor
(the reference passes a state file to the connector's ``read`` verb,
``airbyte/sources/base.py:758-806``).
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.datasets import LazyDataset
from pyairbyte_spark.processor import MessageStreamProcessor
from pyairbyte_spark.progress import ProgressTracker
from pyairbyte_spark.results import ReadResult
from pyairbyte_spark.sources.messages import AirbyteMessage
from pyairbyte_spark.state import StateProvider, StateWriterBase
from pyairbyte_spark.strategies import WriteStrategy


class SparkSource:
    name: str = "spark-source"

    def __init__(self) -> None:
        self._selected: list[str] | None = None
        self._cursor_overrides: dict[str, str] = {}
        self._pk_overrides: dict[str, list[str]] = {}

    # -- catalog ------------------------------------------------------------

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        """Stream name → spec. Subclasses implement."""
        raise NotImplementedError

    def get_available_streams(self) -> list[str]:
        return sorted(self.discovered_catalog())

    def select_all_streams(self) -> None:
        self._selected = None

    def select_streams(self, streams: list[str]) -> None:
        unknown = set(streams) - set(self.discovered_catalog())
        if unknown:
            raise ValueError(f"Unknown streams: {sorted(unknown)}")
        self._selected = list(streams)

    def set_streams(self, streams: list[str]) -> None:
        """Deprecated alias for :meth:`select_streams` (reference
        ``base.py:118``)."""
        self.select_streams(streams)

    def get_selected_streams(self) -> list[str]:
        return self.selected_streams

    def set_cursor_key(self, stream_name: str, cursor_key: str) -> None:
        self._cursor_overrides[stream_name] = cursor_key

    def set_cursor_keys(self, **kwargs: str) -> None:
        """Cursor overrides by stream name (reference ``base.py:146``)."""
        self._cursor_overrides.update(kwargs)

    def set_primary_key(self, stream_name: str, primary_keys: list[str]) -> None:
        self._pk_overrides[stream_name] = primary_keys

    def set_primary_keys(self, **kwargs: list[str] | str) -> None:
        """Primary-key overrides by stream name (reference
        ``base.py:189``); a bare string is a single-column key."""
        for stream, keys in kwargs.items():
            self._pk_overrides[stream] = [keys] if isinstance(keys, str) else list(keys)

    def get_stream_json_schema(self, stream_name: str) -> dict[str, Any]:
        catalog = self.discovered_catalog()
        if stream_name not in catalog:
            raise ValueError(f"Unknown stream: {stream_name}")
        return catalog[stream_name].json_schema

    # -- config (reference base.py:281-389) ----------------------------------

    def set_config(self, config: dict[str, Any], *, validate: bool = False) -> None:
        """Replace the connector configuration (secret-hydrated); with
        ``validate``, run the connector's check against it."""
        from pyairbyte_spark.secrets import hydrate_secrets

        self.config = hydrate_secrets(config)
        if validate and not self.check():
            from pyairbyte_spark import exceptions as exc

            raise exc.AirbyteConnectorCheckFailedError(connector_name=self.name)

    @property
    def config_spec(self) -> dict[str, Any]:
        """The connector's config JSON schema; in-process sources have
        no external spec, so the default is an open object schema."""
        return {"type": "object", "properties": {}}

    @property
    def docs_url(self) -> str:
        short = self.name.lower().removeprefix("source-")
        return f"https://docs.airbyte.com/integrations/sources/{short}"

    @property
    def selected_streams(self) -> list[str]:
        return self._selected if self._selected is not None else self.get_available_streams()

    def configured_specs(self) -> dict[str, StreamSpec]:
        catalog = self.discovered_catalog()
        out = {}
        for name in self.selected_streams:
            spec = catalog[name]
            if name in self._cursor_overrides:
                spec.cursor_field = self._cursor_overrides[name]
            if name in self._pk_overrides:
                spec.primary_keys = self._pk_overrides[name]
            out[name] = spec
        return out

    # -- message generation (subclass hook) ---------------------------------

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        raise NotImplementedError

    # -- read paths ----------------------------------------------------------

    def check(self) -> bool:
        """Connectivity check (reference `check` verb)."""
        return True

    def get_records(self, stream_name: str, *, limit: int | None = None) -> LazyDataset:
        """Cache-free live iterator (reference base.py:513-598)."""
        if stream_name not in self.discovered_catalog():
            raise ValueError(f"Unknown stream: {stream_name}")

        def gen() -> Iterator[dict[str, Any]]:
            msgs = self.generate_messages([stream_name], None)
            records = (
                m.record.data for m in msgs if m.type == "RECORD" and m.record
            )
            # islice = early termination (reference :589-591 stop_event).
            yield from itertools.islice(records, limit) if limit else records

        return LazyDataset(gen(), stream_name)

    def get_samples(self, streams: list[str] | None = None, *, limit: int = 5):
        """Per-stream head (reference base.py:624-658)."""
        streams = streams or self.selected_streams
        return {s: list(self.get_records(s, limit=limit)) for s in streams}

    def print_samples(
        self, streams: list[str] | None = None, *, limit: int = 5
    ) -> None:
        """Readable per-stream sample dump (reference base.py:660)."""
        import json as _json

        for stream, records in self.get_samples(streams, limit=limit).items():
            print(f"## {stream} (first {len(records)} records)")
            for rec in records:
                print(_json.dumps(rec, default=str))

    def get_documents(
        self,
        stream: str,
        title_property: str | None = None,
        content_properties: list[str] | None = None,
        metadata_properties: list[str] | None = None,
        *,
        render_metadata: bool = False,
    ):
        """Stream records rendered as (id, content, metadata) documents
        (reference base.py:600-622) — same renderer the dataset surface
        uses, returned as a DataFrame-backed dataset."""
        from pyairbyte_spark.datasets import InMemoryDataset
        from pyairbyte_spark.session import get_spark

        ds = InMemoryDataset(get_spark(), list(self.get_records(stream)), stream)
        return ds.to_documents(
            title_properties=[title_property] if title_property else None,
            content_properties=content_properties,
            metadata_properties=metadata_properties,
            render_metadata=render_metadata,
        )

    def read(
        self,
        cache: SparkCache,
        *,
        write_strategy: WriteStrategy | str = WriteStrategy.AUTO,
        force_full_refresh: bool = False,
        state_writer: StateWriterBase | None = None,
        progress: ProgressTracker | None = None,
        atomic: bool = False,
    ) -> ReadResult:
        """``atomic=True`` (commit-log caches only) lands the WHOLE
        sync — every stream's table — as one multi-table transaction:
        prepares stay invisible until one decision-file PUT, so a
        consumer joining two synced streams never sees stream A's new
        rows next to stream B's old ones, and a crash mid-sync leaves
        zero partial state (data AND cursors replay together). Trades
        away T7 mid-sync per-stream freshness."""
        write_strategy = WriteStrategy(write_strategy)
        # T9: full refresh drops the state provider.
        state = None if force_full_refresh else cache.get_state_provider(self.name)
        specs = self.configured_specs()
        progress = progress or ProgressTracker()
        processor = MessageStreamProcessor(
            cache,
            source_name=self.name,
            specs=specs,
            write_strategy=write_strategy,
            state_writer=state_writer,
            progress=progress,
            atomic=atomic,
        )
        messages = self.generate_messages(list(specs), state)
        results = processor.process_messages(messages)
        progress.sync_complete()
        return ReadResult(
            cache=cache,
            source_name=self.name,
            processed_streams=list(results),
            record_counts={k: v.record_count for k, v in results.items()},
            progress=progress,
        )
