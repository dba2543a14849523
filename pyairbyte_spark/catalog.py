"""Stream catalog backend.

The reference persists discovered stream catalogs in an
``_airbyte_streams`` table as JSON (``airbyte/caches/_catalog_backend.py:
33-47,179-210``). Here the catalog is a small JSON document in the
warehouse directory — driver-side metadata, never a distributed table
(it is tiny and read once per sync).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any

from pyairbyte_spark.names import LowerCaseNormalizer


@dataclass
class StreamSpec:
    """A configured stream: schema + sync configuration.

    Mirrors the reference's configured-catalog entry
    (``airbyte/sources/base.py:420-488``).
    """

    name: str
    json_schema: dict[str, Any] = field(default_factory=dict)
    primary_keys: list[str] = field(default_factory=list)
    cursor_field: str | None = None
    sync_mode: str = "full_refresh"  # or "incremental"

    @property
    def normalized_name(self) -> str:
        return LowerCaseNormalizer.normalize(self.name)

    @property
    def normalized_primary_keys(self) -> list[str]:
        # Nested (path-style) PKs are rejected, matching
        # catalog_providers.py:146-172.
        out = []
        for pk in self.primary_keys:
            if isinstance(pk, list):
                if len(pk) != 1:
                    raise ValueError(f"Nested primary key not supported: {pk}")
                pk = pk[0]
            out.append(LowerCaseNormalizer.normalize(pk))
        return out

    @property
    def display_name_map(self) -> dict[str, str]:
        """{normalized: declared} column names — the pretty-case
        round-trip map (reference ``to_display_case``,
        ``airbyte/records.py:149-154``)."""
        return {
            LowerCaseNormalizer.normalize(k): k
            for k in self.json_schema.get("properties", {})
        }

    @property
    def declared_columns(self) -> list[str]:
        return [
            LowerCaseNormalizer.normalize(k)
            for k in self.json_schema.get("properties", {})
        ]

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "json_schema": self.json_schema,
            "primary_keys": self.primary_keys,
            "cursor_field": self.cursor_field,
            "sync_mode": self.sync_mode,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> StreamSpec:
        return cls(
            name=d["name"],
            json_schema=d.get("json_schema", {}),
            primary_keys=d.get("primary_keys", []),
            cursor_field=d.get("cursor_field"),
            sync_mode=d.get("sync_mode", "full_refresh"),
        )


def _atomic_write_json(path: str, payload: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, path)


class CatalogBackend:
    """Durable per-cache registry of stream specs (JSON document)."""

    def __init__(self, warehouse_dir: str) -> None:
        self._path = os.path.join(warehouse_dir, "_airbyte_streams.json")

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def register(self, spec: StreamSpec) -> None:
        data = self._load()
        data[spec.normalized_name] = spec.to_dict()
        _atomic_write_json(self._path, data)

    def get(self, stream_name: str) -> StreamSpec | None:
        d = self._load().get(LowerCaseNormalizer.normalize(stream_name))
        return StreamSpec.from_dict(d) if d else None

    def stream_names(self) -> list[str]:
        return sorted(self._load())

    def update_schema(self, stream_name: str, json_schema: dict[str, Any]) -> None:
        data = self._load()
        key = LowerCaseNormalizer.normalize(stream_name)
        if key in data:
            data[key]["json_schema"] = json_schema
            _atomic_write_json(self._path, data)
