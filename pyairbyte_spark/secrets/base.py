"""Secret base classes — reference ``airbyte/secrets/base.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import (  # noqa: F401
    SecretHandle,
    SecretManager,
    SecretSourceEnum,
    SecretString,
)

__all__ = [
    "SecretHandle",
    "SecretManager",
    "SecretSourceEnum",
    "SecretString",
]
