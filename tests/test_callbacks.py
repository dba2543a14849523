"""CONTROL / CONNECTOR_CONFIG dispatch (reference
``airbyte/_connector_base.py:425-434``, ``callbacks.py:10-50``): a running
connector can rotate its own config (OAuth refresh tokens); the host must
adopt the new config and notify the registered callback."""

from __future__ import annotations

import json

from pyairbyte_spark.callbacks import extract_updated_config
from pyairbyte_spark.destinations import SparkDestination
from pyairbyte_spark.sources.connector import ConnectorSource
from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

CONTROL_LINE = json.dumps(
    {
        "type": "CONTROL",
        "control": {
            "type": "CONNECTOR_CONFIG",
            "connectorConfig": {"config": {"token": "rotated"}},
        },
    }
)


class _StubExecutor:
    def discover(self, config):
        return {
            "streams": [
                {"name": "s", "json_schema": {"properties": {"a": {"type": "integer"}}}}
            ]
        }

    def read(self, config, catalog, state):
        yield CONTROL_LINE
        yield json.dumps(
            {"type": "RECORD", "record": {"stream": "s", "data": {"a": 1}, "emitted_at": 0}}
        )


def test_extract_updated_config():
    assert extract_updated_config(json.loads(CONTROL_LINE)) == {"token": "rotated"}
    assert extract_updated_config({"control": {"type": "OTHER"}}) is None


def test_source_control_message_updates_config_and_fires_callback():
    seen = []
    src = ConnectorSource(
        _StubExecutor(),
        name="src",
        config={"token": "stale"},
        config_change_callback=seen.append,
    )
    msgs = list(src.generate_messages(["s"], None))
    assert seen == [{"token": "rotated"}]
    assert src.config == {"token": "rotated"}
    # the CONTROL message still flows downstream, like the reference's peek
    assert [m.type for m in msgs] == ["CONTROL", "RECORD"]


def test_destination_control_message_updates_config_and_fires_callback():
    seen = []

    def sink(lines):
        list(lines)  # drain
        yield CONTROL_LINE

    dest = SparkDestination(
        sink=sink,
        name="d",
        config={"token": "stale"},
        config_change_callback=seen.append,
    )
    dest._write_message_stream(
        [AirbyteMessage("RECORD", record=RecordMessage("s", {"a": 1}))], None
    )
    assert seen == [{"token": "rotated"}]
    assert dest.config == {"token": "rotated"}
