"""Seeded faker-style source (users / products / purchases).

Behavioral parity with the source-faker contract asserted by the
reference's integration tests
(``tests/integration_tests/test_source_faker_integration.py:32-41``):

- ``users`` and ``purchases`` scale with ``count`` (200 @ seed A, 300 @
  seed B in the reference tests); ``products`` is always 100.
- Primary key ``id`` everywhere; cursor ``updated_at`` on users,
  ``purchased_at`` on purchases.
- Fully deterministic per (seed, count) — repeat syncs yield identical
  rows, so merge converges and replace is idempotent.
- Incremental: with state present, only records with cursor strictly
  greater than the checkpointed cursor are emitted (second sync of the
  same data processes 0 records — ``test_state_handling.py:78-92``).
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    RecordMessage,
    StateMessage,
    TraceMessage,
)
from pyairbyte_spark.state import StateProvider

_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

_TS = {"type": "string", "format": "date-time"}
_INT = {"type": "integer"}
_STR = {"type": "string"}
_NUM = {"type": "number"}


def _iso(dt: datetime) -> str:
    return dt.isoformat()


class SourceFaker(SparkSource):
    name = "source-faker"

    def __init__(self, *, seed: int = 1234, count: int = 200) -> None:
        super().__init__()
        self.seed = seed
        self.count = count

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        return {
            "users": StreamSpec(
                name="users",
                json_schema={
                    "properties": {
                        "id": _INT,
                        "created_at": _TS,
                        "updated_at": _TS,
                        "name": _STR,
                        "email": _STR,
                        "address": {"type": "object"},
                        "age": _INT,
                    }
                },
                primary_keys=["id"],
                cursor_field="updated_at",
                sync_mode="incremental",
            ),
            "products": StreamSpec(
                name="products",
                json_schema={
                    "properties": {
                        "id": _INT,
                        "make": _STR,
                        "model": _STR,
                        "year": _INT,
                        "price": _NUM,
                        "created_at": _TS,
                    }
                },
                primary_keys=["id"],
            ),
            "purchases": StreamSpec(
                name="purchases",
                json_schema={
                    "properties": {
                        "id": _INT,
                        "user_id": _INT,
                        "product_id": _INT,
                        "added_to_cart_at": _TS,
                        "purchased_at": _TS,
                        "returned_at": _TS,
                    }
                },
                primary_keys=["id"],
                cursor_field="purchased_at",
                sync_mode="incremental",
            ),
        }

    # -- deterministic row generators ---------------------------------------

    def _users(self) -> Iterator[dict]:
        rng = random.Random(42)  # row content depends on id, not seed/count
        names = ["ada", "grace", "alan", "edsger", "barbara", "donald", "tony", "leslie"]
        for i in range(1, self.count + 1):
            created = _BASE + timedelta(hours=i)
            yield {
                "id": i,
                "created_at": _iso(created),
                "updated_at": _iso(created + timedelta(minutes=30)),
                "name": names[i % len(names)] + str(i),
                "email": f"user{i}@example.com",
                "address": {"street": f"{i} Main St", "city": "Springfield", "zip": f"{10000 + i}"},
                "age": 18 + (i * 7) % 60,
            }

    def _products(self) -> Iterator[dict]:
        makes = ["Acme", "Globex", "Initech", "Umbrella", "Stark"]
        for i in range(1, 101):  # always 100, scale-invariant
            yield {
                "id": i,
                "make": makes[i % len(makes)],
                "model": f"Model-{i:03d}",
                "year": 2000 + i % 25,
                "price": round(10.0 + i * 1.25, 2),
                "created_at": _iso(_BASE + timedelta(days=i)),
            }

    def _purchases(self) -> Iterator[dict]:
        for i in range(1, self.count + 1):
            added = _BASE + timedelta(hours=2 * i)
            returned = i % 10 == 0
            yield {
                "id": i,
                "user_id": 1 + (i * 3) % self.count,
                "product_id": 1 + (i * 7) % 100,
                "added_to_cart_at": _iso(added),
                "purchased_at": _iso(added + timedelta(minutes=15)),
                "returned_at": _iso(added + timedelta(days=7)) if returned else None,
            }

    # -- protocol -----------------------------------------------------------

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        generators = {
            "users": (self._users, "updated_at"),
            "products": (self._products, None),
            "purchases": (self._purchases, "purchased_at"),
        }
        for stream in streams:
            gen, cursor = generators[stream]
            last_cursor = None
            if state is not None and cursor:
                artifact = state.get_stream_state(stream)
                if artifact:
                    last_cursor = artifact.state.get("cursor")
            max_cursor = last_cursor
            emitted = 0
            for rec in gen():
                if cursor and last_cursor is not None and rec[cursor] is not None:
                    if rec[cursor] <= last_cursor:
                        continue  # incremental: skip already-synced rows
                if cursor and rec.get(cursor) is not None:
                    max_cursor = max(max_cursor or "", rec[cursor])
                emitted += 1
                yield AirbyteMessage("RECORD", record=RecordMessage(stream=stream, data=rec))
            yield AirbyteMessage(
                "STATE",
                state=StateMessage(
                    stream_name=stream,
                    state={"cursor": max_cursor, "emitted": emitted},
                ),
            )
            yield AirbyteMessage(
                "TRACE",
                trace=TraceMessage(
                    trace_type="STREAM_STATUS", stream_name=stream, status="COMPLETE"
                ),
            )
