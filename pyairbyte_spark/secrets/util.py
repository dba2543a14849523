"""Secret access helpers — reference ``airbyte/secrets/util.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import (  # noqa: F401
    get_secret,
    hydrate_secrets,
    is_secret_available,
    try_get_secret,
)

__all__ = [
    "get_secret",
    "hydrate_secrets",
    "is_secret_available",
    "try_get_secret",
]
