"""Connection APIs — reference ``airbyte/cloud/connections.py``."""

from __future__ import annotations

from pyairbyte_spark.cloud._core import CloudConnection  # noqa: F401

__all__ = [
    "CloudConnection",
]
