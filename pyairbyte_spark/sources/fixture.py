"""Deterministic in-repo fixture source.

Behavioral parity with the reference's golden-input e2e fixture
``tests/integration_tests/fixtures/source-test/source_test/run.py:7-170``:
4 streams — a mixed-type column, an always-empty stream, a dotted
primary key, and a big-number precision check. Used by the strategy /
schema tests (SURVEY §5).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    RecordMessage,
    StateMessage,
    TraceMessage,
)
from pyairbyte_spark.state import StateProvider

_EMITTED_AT = 1704067200_000  # 2024-01-01T00:00:00Z in millis

_NUM = {"type": "number"}
_STR = {"type": "string"}


class SourceTestFixture(SparkSource):
    name = "source-test"

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        return {
            "stream1": StreamSpec(
                name="stream1",
                json_schema={
                    "properties": {
                        "column1": _STR,
                        "column2": _NUM,
                        # mixed-type → failover string column
                        "sometimes_object": {"type": ["null", "string", "object"]},
                    }
                },
                primary_keys=["column1"],
                cursor_field="column1",
                sync_mode="incremental",
            ),
            "stream2": StreamSpec(
                name="stream2",
                json_schema={
                    "properties": {
                        "column1": _STR,
                        "column2": _NUM,
                        "empty_column": _STR,
                        "big_number": _NUM,
                    }
                },
                primary_keys=["column1"],
            ),
            "always-empty-stream": StreamSpec(
                name="always-empty-stream",
                json_schema={
                    "properties": {
                        "column1": _STR,
                        "column2": _NUM,
                        "empty_column": _STR,
                    }
                },
                primary_keys=["column1"],
            ),
            "primary-key-with-dot": StreamSpec(
                name="primary-key-with-dot",
                json_schema={
                    "properties": {
                        "table1.Column1": _STR,
                        "table1.Column2": _NUM,
                        "table1.empty_column": _STR,
                        "table1.big_number": _NUM,
                    }
                },
                primary_keys=["table1.Column1"],
            ),
        }

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        data = {
            "stream1": [
                {
                    "column1": "value1",
                    "column2": 1,
                    "sometimes_object": '{"nested_column": "nested_value"}',
                },
                {"column1": "value2", "column2": 2, "sometimes_object": "string_value"},
            ],
            "stream2": [
                {
                    "column1": "value1",
                    "column2": 1,
                    "empty_column": None,
                    "big_number": 1234567890123456,
                },
                {
                    "column1": "value2",
                    "column2": 2,
                    "empty_column": None,
                    "big_number": 1234567890123456,
                },
            ],
            "always-empty-stream": [],
            "primary-key-with-dot": [
                {
                    "table1.Column1": "value1",
                    "table1.Column2": 1,
                    "table1.empty_column": None,
                    "table1.big_number": 1234567890123456,
                }
            ],
        }
        for stream in streams:
            for rec in data.get(stream, []):
                yield AirbyteMessage(
                    "RECORD",
                    record=RecordMessage(stream=stream, data=rec, emitted_at=_EMITTED_AT),
                )
            yield AirbyteMessage(
                "STATE",
                state=StateMessage(stream_name=stream, state={"rows": len(data.get(stream, []))}),
            )
            yield AirbyteMessage(
                "TRACE",
                trace=TraceMessage(
                    trace_type="STREAM_STATUS", stream_name=stream, status="COMPLETE"
                ),
            )
