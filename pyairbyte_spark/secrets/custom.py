"""Custom secret-manager base — reference ``airbyte/secrets/custom.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import CustomSecretManager  # noqa: F401

__all__ = [
    "CustomSecretManager",
]
