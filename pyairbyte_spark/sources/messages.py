"""Airbyte-protocol-shaped messages and JSONL codec.

A minimal, dependency-free equivalent of the protocol models the
reference parses with pydantic (``airbyte/_message_iterators.py:139-161``).
Message kinds handled: RECORD, STATE, TRACE(stream_status), LOG, CATALOG.

The JSONL wire format matches the Airbyte protocol (public spec) so the
subprocess host can talk to real connectors.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any, IO


@dataclass
class RecordMessage:
    stream: str
    data: dict[str, Any]
    emitted_at: int = 0  # epoch millis


@dataclass
class StateMessage:
    state_type: str = "STREAM"  # STREAM | GLOBAL | LEGACY
    stream_name: str | None = None
    state: dict[str, Any] = field(default_factory=dict)


@dataclass
class TraceMessage:
    trace_type: str = "STREAM_STATUS"
    stream_name: str | None = None
    status: str | None = None  # STARTED | RUNNING | COMPLETE | INCOMPLETE


@dataclass
class AirbyteMessage:
    type: str  # RECORD | STATE | TRACE | LOG | CATALOG | OTHER
    record: RecordMessage | None = None
    state: StateMessage | None = None
    trace: TraceMessage | None = None
    raw: dict[str, Any] | None = None


def parse_message(line: str) -> AirbyteMessage | None:
    """One protocol JSONL line → message; non-protocol lines → None."""
    line = line.strip()
    if not line or not line.startswith("{"):
        return None
    try:
        obj = json.loads(line)
    except json.JSONDecodeError:
        return None
    mtype = obj.get("type")
    if mtype == "RECORD":
        r = obj.get("record", {})
        return AirbyteMessage(
            "RECORD",
            record=RecordMessage(
                stream=r.get("stream", ""),
                data=r.get("data", {}),
                emitted_at=r.get("emitted_at", 0),
            ),
            raw=obj,
        )
    if mtype == "STATE":
        s = obj.get("state", {})
        stype = s.get("type", "LEGACY" if "data" in s else "STREAM")
        stream_name = None
        blob: dict[str, Any] = {}
        if stype == "STREAM":
            sd = s.get("stream", {})
            desc = sd.get("stream_descriptor", {})
            stream_name = desc.get("name")
            blob = sd.get("stream_state", {})
        elif stype == "GLOBAL":
            blob = s.get("global", {})
        else:
            blob = s.get("data", {})
        return AirbyteMessage(
            "STATE",
            state=StateMessage(state_type=stype, stream_name=stream_name, state=blob),
            raw=obj,
        )
    if mtype == "TRACE":
        t = obj.get("trace", {})
        ss = t.get("stream_status", {})
        desc = ss.get("stream_descriptor", {})
        return AirbyteMessage(
            "TRACE",
            trace=TraceMessage(
                trace_type=t.get("type", ""),
                stream_name=desc.get("name"),
                status=ss.get("status"),
            ),
            raw=obj,
        )
    return AirbyteMessage(mtype or "OTHER", raw=obj)


def encode_record(stream: str, data: dict[str, Any], emitted_at: int = 0) -> str:
    return json.dumps(
        {"type": "RECORD", "record": {"stream": stream, "data": data, "emitted_at": emitted_at}},
        default=str,
    )


def encode_state(stream_name: str, state: dict[str, Any]) -> str:
    return json.dumps(
        {
            "type": "STATE",
            "state": {
                "type": "STREAM",
                "stream": {
                    "stream_descriptor": {"name": stream_name},
                    "stream_state": state,
                },
            },
        },
        default=str,
    )


def encode_stream_status(stream_name: str, status: str) -> str:
    return json.dumps(
        {
            "type": "TRACE",
            "trace": {
                "type": "STREAM_STATUS",
                "stream_status": {
                    "stream_descriptor": {"name": stream_name},
                    "status": status,
                },
            },
        }
    )


class AirbyteMessageIterator:
    """Message-source adapters (reference ``_message_iterators.py:90-207``)."""

    def __init__(self, messages: Iterable[AirbyteMessage]) -> None:
        self._messages = iter(messages)

    def __iter__(self) -> Iterator[AirbyteMessage]:
        return self._messages

    @classmethod
    def from_str_iterable(cls, lines: Iterable[str]) -> AirbyteMessageIterator:
        return cls(m for m in (parse_message(ln) for ln in lines) if m is not None)

    @classmethod
    def from_str_buffer(cls, buf: IO[str]) -> AirbyteMessageIterator:
        return cls.from_str_iterable(iter(buf.readline, ""))

    @classmethod
    def from_files(cls, paths: list[str]) -> AirbyteMessageIterator:
        def gen() -> Iterator[AirbyteMessage]:
            for p in paths:
                opener = __import__("gzip").open if p.endswith(".gz") else open
                with opener(p, "rt") as f:
                    for ln in f:
                        m = parse_message(ln)
                        if m is not None:
                            yield m

        return cls(gen())

    @classmethod
    def from_stdin(cls) -> AirbyteMessageIterator:
        """Protocol messages piped on stdin (reference
        ``_message_iterators.py:170-180``)."""
        import sys

        return cls.from_str_buffer(sys.stdin)

    @classmethod
    def from_read_result(
        cls, cache, streams: list[str], *, source_name: str | None = None
    ) -> AirbyteMessageIterator:
        """Replay cached tables as RECORD messages + stream-success trace
        (reference ``_message_iterators.py:90-126``).

        ``source_name`` scopes the replayed STATE lookup — state is
        stored under the source that produced it, so omitting it means
        replayed syncs emit no STATE messages downstream."""

        def gen() -> Iterator[AirbyteMessage]:
            provider = cache.get_state_provider(source_name or "__replay__")
            for stream in streams:
                for rec in cache.get_records(stream):
                    data = {
                        k: v for k, v in rec.items() if not k.startswith("_airbyte_")
                    }
                    yield AirbyteMessage(
                        "RECORD", record=RecordMessage(stream=stream, data=data)
                    )
                state = provider.get_stream_state(stream)
                if state is not None:
                    yield AirbyteMessage(
                        "STATE",
                        state=StateMessage(stream_name=stream, state=state.state),
                    )
                yield AirbyteMessage(
                    "TRACE",
                    trace=TraceMessage(
                        trace_type="STREAM_STATUS", stream_name=stream, status="COMPLETE"
                    ),
                )

        return cls(gen())
