"""Config-change callbacks (reference ``airbyte/callbacks.py:10-50``).

A ``ConfigChangeCallback`` is invoked with the connector's FULL updated
configuration whenever the running connector emits an Airbyte-protocol
``CONTROL`` / ``CONNECTOR_CONFIG`` message (dispatch in the reference at
``airbyte/_connector_base.py:425-434``). The canonical use case is OAuth
sources rotating refresh tokens mid-sync: the callback persists the new
config so the next sync does not start from an expired token.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ConfigChangeCallback = Callable[[dict[str, Any]], None]


def extract_updated_config(raw_control_message: dict[str, Any]) -> dict[str, Any] | None:
    """Pull the new config out of a raw CONTROL message dict, or None if the
    message is not a CONNECTOR_CONFIG orchestration."""
    control = raw_control_message.get("control", {})
    if control.get("type") != "CONNECTOR_CONFIG":
        return None
    return control.get("connectorConfig", {}).get("config", {})
