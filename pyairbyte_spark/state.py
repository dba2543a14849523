"""Incremental-sync state machine.

Reproduces the reference's state backend / provider / writer triad
(``airbyte/caches/_state_backend.py:100-260``,
``airbyte/shared/state_providers.py:28-169``,
``airbyte/shared/state_writers.py:43-57``) with the crash-consistency
contract of ``sql_processor.py:346-401``:

- STATE artifacts are buffered per stream while records flow,
- a stream's state is only **finalized after that stream's data commit**
  (at-least-once: state is never ahead of data),
- latest state per stream wins,
- STREAM / GLOBAL / LEGACY artifacts supported via pseudo-stream keys.

Storage is a JSON document per (source, table_prefix) scope with atomic
replace — state is tiny driver-side metadata; a real cluster deployment
would point ``warehouse_dir`` at shared storage (S3/HDFS) where
``os.replace`` becomes a PUT, preserving the same protocol.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any

from pyairbyte_spark.constants import GLOBAL_STATE_STREAM, LEGACY_STATE_STREAM


@dataclass
class StateArtifact:
    """One checkpoint blob for a stream (or GLOBAL/LEGACY pseudo-stream)."""

    stream_name: str
    state: dict[str, Any] = field(default_factory=dict)
    state_type: str = "STREAM"  # STREAM | GLOBAL | LEGACY
    updated_at: float = 0.0

    @property
    def key(self) -> str:
        if self.state_type == "GLOBAL":
            return GLOBAL_STATE_STREAM
        if self.state_type == "LEGACY":
            return LEGACY_STATE_STREAM
        return self.stream_name

    def to_dict(self) -> dict[str, Any]:
        return {
            "stream_name": self.stream_name,
            "state": self.state,
            "state_type": self.state_type,
            "updated_at": self.updated_at,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> StateArtifact:
        return cls(
            stream_name=d["stream_name"],
            state=d.get("state", {}),
            state_type=d.get("state_type", "STREAM"),
            updated_at=d.get("updated_at", 0.0),
        )


class StateBackend:
    """Durable store of finalized state artifacts, scoped like the
    reference's ``_airbyte_state`` table (pk = source + table_prefix +
    stream; ``_state_backend.py:100-179``)."""

    def __init__(self, warehouse_dir: str, *, table_name: str = "_airbyte_state") -> None:
        self._path = os.path.join(warehouse_dir, f"{table_name}.json")

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _save(self, data: dict[str, dict]) -> None:
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self._path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, default=str)
        os.replace(tmp, self._path)

    @staticmethod
    def _scope_key(source_name: str, table_prefix: str, stream_key: str) -> str:
        return f"{source_name}\x1f{table_prefix}\x1f{stream_key}"

    def write(self, source_name: str, table_prefix: str, artifact: StateArtifact) -> None:
        data = self._load()
        artifact.updated_at = time.time()
        data[self._scope_key(source_name, table_prefix, artifact.key)] = artifact.to_dict()
        self._save(data)

    def read(self, source_name: str, table_prefix: str) -> list[StateArtifact]:
        prefix = f"{source_name}\x1f{table_prefix}\x1f"
        return [
            StateArtifact.from_dict(v)
            for k, v in self._load().items()
            if k.startswith(prefix)
        ]


class StateProvider:
    """Read-side view of known state artifacts for one source scope.

    Parity: ``state_providers.py:28-117``.
    """

    def __init__(self, artifacts: list[StateArtifact]) -> None:
        self._by_key = {a.key: a for a in artifacts}

    @property
    def known_stream_names(self) -> set[str]:
        return {a.stream_name for a in self._by_key.values() if a.state_type == "STREAM"}

    def get_stream_state(self, stream_name: str) -> StateArtifact | None:
        return self._by_key.get(stream_name) or self._by_key.get(GLOBAL_STATE_STREAM)

    @property
    def state_artifacts(self) -> list[StateArtifact]:
        return list(self._by_key.values())


class StaticInputState(StateProvider):
    """A fixed, caller-supplied set of artifacts (reference parity)."""


class JoinedStateProvider(StateProvider):
    """Per-stream coalesce of two providers: primary wins, secondary
    fills gaps (``state_providers.py:134-169``)."""

    def __init__(self, primary: StateProvider, secondary: StateProvider) -> None:
        merged: dict[str, StateArtifact] = {a.key: a for a in secondary.state_artifacts}
        merged.update({a.key: a for a in primary.state_artifacts})
        super().__init__(list(merged.values()))


class StateWriterBase:
    """Write-side: keeps only the latest state per stream
    (``state_writers.py:43-57``)."""

    def __init__(self) -> None:
        self._latest: dict[str, StateArtifact] = {}

    def write_state(self, artifact: StateArtifact) -> None:
        self._latest[artifact.key] = artifact

    @property
    def latest_artifacts(self) -> list[StateArtifact]:
        return list(self._latest.values())


class BackendStateWriter(StateWriterBase):
    """State writer bound to a durable backend scope."""

    def __init__(self, backend: StateBackend, source_name: str, table_prefix: str) -> None:
        super().__init__()
        self._backend = backend
        self._source_name = source_name
        self._table_prefix = table_prefix

    def flush(self, stream_name: str | None = None) -> None:
        """Finalize buffered state — called only AFTER data commit (T2)."""
        for artifact in self.latest_artifacts:
            if stream_name is None or artifact.key == stream_name:
                self._backend.write(self._source_name, self._table_prefix, artifact)


class PendingStateBuffer:
    """Per-stream buffer of un-finalized STATE messages.

    Mirrors the pending-state dict of ``sql_processor.py:346-353`` and
    the finalize-last-wins pass at ``:393-401``.
    """

    def __init__(self) -> None:
        self._pending: dict[str, list[StateArtifact]] = {}

    def add(self, artifact: StateArtifact) -> None:
        self._pending.setdefault(artifact.key, []).append(artifact)

    def finalize_stream(self, stream_key: str, writer: StateWriterBase) -> None:
        """Push the latest buffered artifact for one stream to the writer."""
        artifacts = self._pending.pop(stream_key, [])
        if artifacts:
            writer.write_state(artifacts[-1])

    def finalize_all(self, writer: StateWriterBase) -> None:
        for key in list(self._pending):
            self.finalize_stream(key, writer)
