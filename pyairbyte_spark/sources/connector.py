"""ConnectorSource — a SparkSource backed by an external Airbyte-protocol
connector process.

The §3.1 lifecycle with a real process boundary: ``discover`` builds the
catalog, ``read --config --catalog --state`` streams JSONL records which
flow through the same MessageStreamProcessor as in-repo sources.

Launch methods (docker / venv-python / local path — reference
``airbyte/_executors/{docker,python,local}.py``) reduce to the argv
handed to :class:`SubprocessHost`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyairbyte_spark.callbacks import extract_updated_config

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import AirbyteMessage, parse_message
from pyairbyte_spark.sources.subprocess_host import SubprocessHost
from pyairbyte_spark.state import StateProvider


def _catalog_to_specs(catalog: dict[str, Any]) -> dict[str, StreamSpec]:
    specs: dict[str, StreamSpec] = {}
    for stream in catalog.get("streams", []):
        pks = stream.get("source_defined_primary_key") or []
        cursor = stream.get("default_cursor_field") or []
        modes = stream.get("supported_sync_modes") or ["full_refresh"]
        specs[stream["name"]] = StreamSpec(
            name=stream["name"],
            json_schema=stream.get("json_schema", {}),
            primary_keys=[pk[0] if isinstance(pk, list) else pk for pk in pks],
            cursor_field=cursor[0] if cursor else None,
            sync_mode="incremental" if "incremental" in modes else "full_refresh",
        )
    return specs


class ConnectorSource(SparkSource):
    def __init__(
        self,
        executor: SubprocessHost,
        *,
        name: str = "connector-source",
        config: dict[str, Any] | None = None,
        config_change_callback: "Callable[[dict[str, Any]], None] | None" = None,
    ) -> None:
        super().__init__()
        self.name = name
        self.executor = executor
        self.config = config or {}
        self.config_change_callback = config_change_callback
        self._catalog_cache: dict[str, StreamSpec] | None = None

    def check(self) -> bool:
        return self.executor.check(self.config)

    @property
    def config_spec(self) -> dict[str, Any]:
        """The connector's declared config schema (``spec`` verb)."""
        spec = self.executor.spec()
        return spec.get("connectionSpecification", spec)

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        if self._catalog_cache is None:
            self._catalog_cache = _catalog_to_specs(
                self.executor.discover(self.config)
            )
        return self._catalog_cache

    def _configured_catalog_doc(self, streams: list[str]) -> dict[str, Any]:
        specs = self.discovered_catalog()
        out = []
        for s in streams:
            spec = specs[s]
            out.append(
                {
                    "stream": {
                        "name": spec.name,
                        "json_schema": spec.json_schema,
                        "supported_sync_modes": [spec.sync_mode, "full_refresh"],
                    },
                    "sync_mode": spec.sync_mode,
                    "destination_sync_mode": "append",
                    "primary_key": [[pk] for pk in spec.primary_keys],
                    "cursor_field": [spec.cursor_field] if spec.cursor_field else [],
                }
            )
        return {"streams": out}

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        state_doc = None
        if state is not None:
            state_doc = [
                {
                    "type": "STREAM",
                    "stream": {
                        "stream_descriptor": {"name": a.stream_name},
                        "stream_state": a.state,
                    },
                }
                for a in state.state_artifacts
                if a.state_type == "STREAM"
            ]
        for line in self.executor.read(
            self.config, self._configured_catalog_doc(streams), state_doc
        ):
            msg = parse_message(line)
            if msg is None:
                continue
            if msg.type == "CONTROL" and msg.raw is not None:
                # CONNECTOR_CONFIG orchestration: adopt the new config and
                # notify the caller (reference _connector_base.py:425-434) —
                # e.g. an OAuth source rotating its refresh token mid-sync.
                new_config = extract_updated_config(msg.raw)
                if new_config is not None:
                    self.config = new_config
                    if self.config_change_callback is not None:
                        self.config_change_callback(new_config)
            yield msg
