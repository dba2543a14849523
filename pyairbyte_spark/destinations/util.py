"""Destination factories — reference ``airbyte/destinations/util.py``."""

from __future__ import annotations

from typing import Any


def get_destination(*args: Any, **kwargs: Any):
    """Resolve a destination connector (reference ``util.py:22-95``);
    thin forwarder to the package-level factory (lazy import: factories
    itself imports destination classes)."""
    from pyairbyte_spark.factories import get_destination as _get

    return _get(*args, **kwargs)


def get_noop_destination(*, install_if_missing: bool = True):
    """A dev-null destination for pipeline benchmarking (reference
    ``util.py:98-112``): consumes RECORDs, echoes STATE confirmations,
    writes nothing. In-process sink — no connector install needed, so
    ``install_if_missing`` is accepted for parity and ignored."""
    import json

    from pyairbyte_spark.destinations.base import SparkDestination

    def _devnull_sink(lines):
        for line in lines:
            try:
                msg = json.loads(line)
            except (TypeError, ValueError):
                continue
            if msg.get("type") == "STATE":
                yield line

    return SparkDestination(
        name="destination-dev-null",
        config={"test_destination": {"test_destination_type": "SILENT"}},
        sink=_devnull_sink,
    )


__all__ = [
    "get_destination",
    "get_noop_destination",
]
