"""Source factories — reference ``airbyte/sources/util.py``."""

from __future__ import annotations

from typing import Any

from pyairbyte_spark.sources.benchmark import get_benchmark_source  # noqa: F401


def get_source(*args: Any, **kwargs: Any):
    """Resolve a source connector (reference ``util.py:47-196``); thin
    forwarder to the package-level factory (lazy import: factories
    imports source classes)."""
    from pyairbyte_spark.factories import get_source as _get

    return _get(*args, **kwargs)


__all__ = [
    "get_benchmark_source",
    "get_source",
]
