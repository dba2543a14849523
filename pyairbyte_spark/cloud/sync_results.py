"""Sync results — reference ``airbyte/cloud/sync_results.py``."""

from __future__ import annotations

from pyairbyte_spark.cloud._core import (  # noqa: F401
    ConnectionSyncError,
    ConnectionSyncTimeoutError,
    SyncResult,
    destination_to_cache,
)

__all__ = [
    "ConnectionSyncError",
    "ConnectionSyncTimeoutError",
    "SyncResult",
    "destination_to_cache",
]
