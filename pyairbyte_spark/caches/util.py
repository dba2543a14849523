"""Cache factory helpers — reference ``airbyte/caches/util.py``."""

from __future__ import annotations

from pathlib import Path

from pyairbyte_spark.factories import (  # noqa: F401  (parity re-exports)
    DEFAULT_CACHE_ROOT,
    get_default_cache,
    new_local_cache,
)


def warehouse_root(*parts: str) -> str:
    """Deterministic warehouse dir under the cache root from config
    fields (slashes/colons sanitized so e.g. ``md:db`` is a dirname)."""
    safe = [str(p).replace("/", "_").replace(":", "_") for p in parts if p]
    return str(Path(DEFAULT_CACHE_ROOT).joinpath(*safe))


__all__ = [
    "get_default_cache",
    "new_local_cache",
    "warehouse_root",
]
