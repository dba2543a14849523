"""Secret-source registration — reference ``airbyte/secrets/config.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import (  # noqa: F401
    clear_secret_sources,
    disable_secret_source,
    register_secret_manager,
)

__all__ = [
    "clear_secret_sources",
    "disable_secret_source",
    "register_secret_manager",
]
