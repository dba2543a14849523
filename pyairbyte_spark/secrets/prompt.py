"""Interactive secret prompt — reference ``airbyte/secrets/prompt.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import SecretsPrompt  # noqa: F401

__all__ = [
    "SecretsPrompt",
]
